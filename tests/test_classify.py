"""Model-based quality scoring (operators/classify.py): the
fastText/CCNet-shape hashed-feature logistic regression. Pins: the
training objective descends and separates a separable corpus, the
hash-bucketed features are exactly the cross-engine hash family,
scoring is hand-verifiable and SHUFFLE-FREE (the 100 TB claim), and
regularization actually shrinks weights."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from mydatasyncer_spark.operators.classify import (
    hashed_token_features,
    logreg_train,
    model_score_column,
    quality_weight_values,
    score_documents,
)


def _hash48(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


@pytest.fixture(scope="module")
def separable(spark):
    import random

    rng = random.Random(7)
    good = [f"good{i}" for i in range(30)]
    junk = [f"junk{i}" for i in range(30)]
    rows, labels = [], []
    for i in range(80):
        y = i % 2
        vocab = good if y else junk
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(20))))
        labels.append((i, y))
    return (
        spark.createDataFrame(rows, "doc_id long, text string"),
        spark.createDataFrame(labels, "doc_id long, label int"),
    )


class TestFeatures:
    def test_feature_ids_are_the_cross_engine_hash(self, spark):
        df = spark.createDataFrame(
            [(1, "alpha beta alpha")], "doc_id long, text string"
        )
        rows = hashed_token_features(df, n_features=16).collect()
        got = {r["feature"]: r["x"] for r in rows}
        want = {
            _hash48("alpha") % 16: 2 / 3,
            _hash48("beta") % 16: 1 / 3,
        }
        assert got == pytest.approx(want)

    def test_weight_values_deterministic_and_bounded(self):
        w = quality_weight_values(64)
        assert w == quality_weight_values(64)
        assert all(-1.0 <= x < 1.0 for x in w)
        assert len(set(w)) > 50  # not degenerate


class TestScoring:
    def test_score_matches_hand_computation(self, spark):
        n = 16
        w = quality_weight_values(n)
        df = spark.createDataFrame(
            [(1, "alpha beta alpha"), (2, ""), (3, "gamma")],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: r["model_quality"]
            for r in score_documents(df, w, bias=-0.1).collect()
        }

        def score(toks):
            if not toks:
                m = -0.1
            else:
                m = sum(w[_hash48(t) % n] for t in toks) / len(toks) - 0.1
            return round(1.0 / (1.0 + math.exp(-m)), 6)

        assert got[1] == pytest.approx(score(["alpha", "beta", "alpha"]))
        assert got[2] == pytest.approx(score([]))
        assert got[3] == pytest.approx(score(["gamma"]))

    def test_scoring_is_shuffle_free(self, spark, sf_dir):
        """The 100 TB contract: attaching the model score to a corpus
        is a narrow projection — NO Exchange anywhere in the plan."""
        import contextlib
        import io

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        scored = score_documents(
            docs, quality_weight_values(64), bias=0.0
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            scored.explain("formatted")
        assert "Exchange" not in buf.getvalue()


class TestTraining:
    # full-suite-only (pytest.ini fast gate); run with -m slow
    pytestmark = pytest.mark.slow
    def test_loss_descends_and_separates(self, spark, separable):
        df, lab = separable
        w, b, losses = logreg_train(
            df, lab, n_features=64, n_iter=15, lr=2.0
        )
        # log-loss starts at ln 2 (zero weights) and strictly drops
        assert losses[0] == pytest.approx(math.log(2.0), abs=1e-6)
        assert losses[-1] < losses[0]
        assert all(
            b2 <= a2 + 1e-9 for a2, b2 in zip(losses, losses[1:])
        )
        scored = score_documents(df, w, b).join(lab, "doc_id")
        acc = scored.select(
            (
                (F.col("model_quality") > 0.5).cast("int")
                == F.col("label")
            )
            .cast("int")
            .alias("ok")
        ).agg(F.avg("ok")).first()[0]
        assert acc == 1.0

    def test_duplicate_labels_do_not_bias_training(
        self, spark, separable
    ):
        """r11 review fix: duplicate ids in the labels frame used to
        fan out the feature join, multiplying those documents'
        gradient contributions. Labels now collapse to one row per id
        (deterministic max), so a triplicated labels frame trains the
        same model as the clean one."""
        df, lab = separable
        w0, b0, l0 = logreg_train(
            df, lab, n_features=32, n_iter=6, lr=1.0
        )
        tripled = lab.unionByName(lab).unionByName(lab)
        w1, b1, l1 = logreg_train(
            df, tripled, n_features=32, n_iter=6, lr=1.0
        )
        assert w1 == pytest.approx(w0, abs=1e-9)
        assert b1 == pytest.approx(b0, abs=1e-9)
        assert l1 == pytest.approx(l0, abs=1e-9)

    def test_l2_shrinks_weights(self, spark, separable):
        df, lab = separable
        w0, _, _ = logreg_train(
            df, lab, n_features=64, n_iter=8, lr=2.0, l2=0.0
        )
        w1, _, _ = logreg_train(
            df, lab, n_features=64, n_iter=8, lr=2.0, l2=0.5
        )
        n0 = sum(x * x for x in w0)
        n1 = sum(x * x for x in w1)
        assert n1 < n0

    def test_generalizes_to_unseen_docs(self, spark, separable):
        """Held-out docs drawn from the same vocabularies classify
        correctly — the hash-bucketed features need no vocabulary
        shared between training and scoring runs (the streaming-
        batch consistency the hashing trick buys)."""
        import random

        df, lab = separable
        w, b, _ = logreg_train(
            df, lab, n_features=64, n_iter=15, lr=2.0
        )
        rng = random.Random(99)
        rows, labels = [], []
        for i in range(40):
            y = i % 2
            vocab = (
                [f"good{j}" for j in range(30)]
                if y
                else [f"junk{j}" for j in range(30)]
            )
            rows.append(
                (1000 + i, " ".join(rng.choice(vocab) for _ in range(15)))
            )
            labels.append((1000 + i, y))
        fresh = spark.createDataFrame(rows, "doc_id long, text string")
        flab = spark.createDataFrame(labels, "doc_id long, label int")
        acc = (
            score_documents(fresh, w, b)
            .join(flab, "doc_id")
            .select(
                (
                    (F.col("model_quality") > 0.5).cast("int")
                    == F.col("label")
                )
                .cast("int")
                .alias("ok")
            )
            .agg(F.avg("ok"))
            .first()[0]
        )
        assert acc == 1.0


class TestScoreDrift:
    """The classifier's decision signal (weight drift as PSI): a
    same-distribution corpus sits near 0, an off-distribution corpus
    crosses the published 0.2 retrain threshold, and
    retrain + re-baseline returns to the fixpoint."""

    def _docs(self, spark, vocab, n, id0=0, seed=11):
        import random

        rng = random.Random(seed)
        return spark.createDataFrame(
            [
                (id0 + i, " ".join(rng.choice(vocab) for _ in range(15)))
                for i in range(n)
            ],
            "doc_id long, text string",
        )

    def test_psi_crosses_then_rebaselines(self, spark, separable):
        from mydatasyncer_spark.operators.classify import (
            score_drift_report,
            score_histogram,
        )

        df, lab = separable
        w, b, _ = logreg_train(df, lab, n_features=64, n_iter=12, lr=2.0)
        baseline = score_histogram(df, w, b)
        assert abs(sum(baseline) - 1.0) < 1e-9
        # the training corpus against its own baseline: stable
        same = score_drift_report(df, w, baseline, bias=b)
        assert same["psi"] < 0.01
        # an off-distribution corpus: novel tokens still HASH into
        # trained weight buckets (the no-vocabulary property), but
        # they mix those buckets uniformly instead of along the
        # trained good/junk split — the score distribution shifts
        # toward the middle and PSI crosses the retrain threshold
        off = self._docs(
            spark, [f"novel{i}" for i in range(40)], 60, id0=5000
        )
        drifted = score_drift_report(off, w, baseline, bias=b)
        assert drifted["psi"] > 0.2
        assert drifted["max_bin_shift"] > same["max_bin_shift"]
        # retrain on the new mix and re-baseline: fixpoint
        import pyspark.sql.functions as F

        mixed = df.unionByName(off)
        mixed_lab = lab.unionByName(
            off.select("doc_id", F.lit(0).alias("label"))
        )
        w2, b2, _ = logreg_train(
            mixed, mixed_lab, n_features=64, n_iter=8, lr=2.0
        )
        base2 = score_histogram(mixed, w2, b2)
        again = score_drift_report(mixed, w2, base2, bias=b2)
        assert again["psi"] < 0.01

    def test_short_baseline_refused(self, spark, separable):
        from mydatasyncer_spark.operators.classify import (
            score_drift_report,
        )

        df, _ = separable
        with pytest.raises(ValueError, match=">= 2 bins"):
            score_drift_report(df, [0.0] * 64, [1.0])
