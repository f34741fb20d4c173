"""Step-wise tests for the end-to-end curation pipeline
(operators/curation.py). Oracle equivalence of the full pipeline is
covered by test_oracle_parity::curation_pipeline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mydatasyncer_spark.operators.curation import (
    CurationConfig,
    annotate_quality,
    curate,
    exact_survivors,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # unique, high-quality docs
        (1, "en", "the quick brown fox jumps over the lazy sleeping dog near town"),
        (
            2,
            "en",
            "a completely different sentence mentioning rivers mountains and "
            "valleys where travelers wander through forests carrying maps and "
            "supplies toward distant villages before nightfall settles",
        ),
        # exact duplicate of doc 1 (after normalization)
        (3, "en", "The  quick brown fox jumps over the lazy sleeping dog near town"),
        # degenerate repetition
        (4, "en", "spam spam spam spam spam spam spam spam spam spam spam spam"),
        # near-duplicate of doc 2 (one word changed at the end)
        (
            5,
            "en",
            "a completely different sentence mentioning rivers mountains and "
            "valleys where travelers wander through forests carrying maps and "
            "supplies toward distant villages before daybreak settles",
        ),
    ]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


class TestAnnotate:
    def test_columns_added(self, corpus):
        out = annotate_quality(corpus)
        assert {"quality", "repetition"} <= set(out.columns)
        vals = {r["doc_id"]: r for r in out.collect()}
        # the spam doc repeats one token: repetition near 1
        assert vals[4]["repetition"] > 0.8
        assert vals[1]["repetition"] == 0.0

    def test_input_columns_preserved(self, corpus):
        out = annotate_quality(corpus)
        assert set(corpus.columns) <= set(out.columns)


class TestExactSurvivors:
    def test_min_id_survives_normalized_group(self, corpus):
        ids = {r["doc_id"] for r in exact_survivors(corpus).collect()}
        assert 1 in ids and 3 not in ids  # doc 3 == doc 1 normalized
        assert {2, 4, 5} <= ids


class TestCurate:
    def test_pipeline_drops_spam_dupes_and_near_dupes(self, corpus):
        cfg = CurationConfig(
            min_quality=0.2, max_repetition=0.5, near_dup_threshold=0.5
        )
        out = curate(corpus, cfg)
        ids = {r["doc_id"] for r in out.collect()}
        assert 4 not in ids  # repetition gate
        assert 3 not in ids  # exact dedup
        assert 5 not in ids  # near-dup of 2 (MinHash)
        assert {1, 2} == ids

    def test_split_assigned_and_total(self, corpus):
        cfg = CurationConfig(min_quality=0.0, max_repetition=1.0)
        out = curate(corpus, cfg)
        assert out.filter(F.col("split").isNull()).count() == 0
        assert set(
            r["split"] for r in out.select("split").distinct().collect()
        ) <= {"train", "valid", "test"}

    def test_deterministic_across_runs(self, corpus):
        cfg = CurationConfig(min_quality=0.2, max_repetition=0.5)
        a = curate(corpus, cfg).select("doc_id", "split")
        b = curate(corpus.repartition(5), cfg).select("doc_id", "split")
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


class TestModelGate:
    """r10: the config's optional stage-2 model gate — the published
    two-stage recipe (heuristics drop the degenerate tail, a trained
    linear model gates on content)."""

    def test_model_gate_drops_offvocab_docs(self, spark):
        from mydatasyncer_spark.operators.classify import logreg_train

        import random

        rng = random.Random(3)
        good = [f"keep{i}" for i in range(20)]
        bad = [f"drop{i}" for i in range(20)]
        train_rows, train_labels = [], []
        for i in range(60):
            y = i % 2
            vocab = good if y else bad
            train_rows.append(
                (i, " ".join(rng.choice(vocab) for _ in range(15)))
            )
            train_labels.append((i, y))
        tdf = spark.createDataFrame(train_rows, "doc_id long, text string")
        tlab = spark.createDataFrame(train_labels, "doc_id long, label int")
        w, b, _ = logreg_train(tdf, tlab, n_features=64, n_iter=12, lr=2.0)

        corpus = spark.createDataFrame(
            [
                (100, " ".join(f"keep{i}" for i in range(12))),
                (101, " ".join(f"drop{i}" for i in range(12))),
            ],
            "doc_id long, text string",
        )
        cfg = CurationConfig(
            min_quality=0.0,
            max_repetition=1.0,
            near_dup_threshold=0.99,
            model_weights=tuple(w),
            model_bias=b,
            min_model_quality=0.5,
        )
        out = curate(corpus, cfg)
        ids = {r["doc_id"] for r in out.collect()}
        assert ids == {100}
        # survivors carry the model score next to the heuristic one
        row = out.collect()[0]
        assert row["model_quality"] > 0.5
        assert "quality" in out.columns

    def test_model_off_by_default_is_unchanged(self, spark, corpus):
        cfg = CurationConfig(
            min_quality=0.2, max_repetition=0.5, near_dup_threshold=0.5
        )
        out = curate(corpus, cfg)
        assert "model_quality" not in out.columns
        assert {r["doc_id"] for r in out.collect()} == {1, 2}


class TestModelStorePath:
    """r12 (r11 verdict, what's-missing #4): the batch pipeline gains
    the stream's configless story — stage-2 weights resolve from a
    self-describing quality_model_frame store, with the identical
    fingerprint-mismatch refusal. The asymmetry the store was built
    to remove (stream configless, batch hand-threaded) is closed."""

    def _model(self, spark, tmp_path):
        from mydatasyncer_spark.operators.classify import (
            quality_model_frame,
            quality_weight_values,
        )
        from mydatasyncer_spark.operators.maintenance import (
            write_model_store,
        )

        w = quality_weight_values(64)
        path = str(tmp_path / "model")
        write_model_store(
            spark, quality_model_frame(spark, w, bias=-0.1), path
        )
        return w, path

    def _corpus(self, spark):
        return spark.createDataFrame(
            [
                (1, "The quick brown fox jumps over the lazy dog."),
                (2, "Another perfectly ordinary sentence, with words."),
                (3, "Pack my box with five dozen liquor jugs today."),
            ],
            "doc_id long, text string",
        )

    def test_store_only_equals_explicit_weights(self, spark, tmp_path):
        w, path = self._model(spark, tmp_path)
        corpus = self._corpus(spark)
        base = dict(
            min_quality=0.0,
            max_repetition=1.0,
            near_dup_threshold=0.99,
            min_model_quality=0.0,
        )
        configless = curate(
            corpus, CurationConfig(**base), model_store_path=path
        )
        explicit = curate(
            corpus,
            CurationConfig(
                **base, model_weights=tuple(w), model_bias=-0.1
            ),
        )
        a = {
            r["doc_id"]: (r["model_quality"], r["split"])
            for r in configless.collect()
        }
        b = {
            r["doc_id"]: (r["model_quality"], r["split"])
            for r in explicit.collect()
        }
        assert a == b and len(a) == 3

    def test_mismatched_explicit_weights_refused(self, spark, tmp_path):
        from mydatasyncer_spark.operators.classify import (
            quality_weight_values,
        )

        _, path = self._model(spark, tmp_path)
        cfg = CurationConfig(
            min_quality=0.0,
            max_repetition=1.0,
            near_dup_threshold=0.99,
            model_weights=tuple(quality_weight_values(64, seed="other")),
            model_bias=0.0,
        )
        with pytest.raises(ValueError, match="do not match the model store"):
            curate(self._corpus(spark), cfg, model_store_path=path)

    def test_matching_explicit_weights_allowed(self, spark, tmp_path):
        w, path = self._model(spark, tmp_path)
        cfg = CurationConfig(
            min_quality=0.0,
            max_repetition=1.0,
            near_dup_threshold=0.99,
            model_weights=tuple(w),
            model_bias=-0.1,
            min_model_quality=0.0,
        )
        out = curate(self._corpus(spark), cfg, model_store_path=path)
        assert out.count() == 3


class TestStoreResolveIsPlanInvisible:
    """The configless resolve is DRIVER-side: the store read happens
    at plan-construction time (n_features rows), and the distributed
    plan that actually scans the corpus must be IDENTICAL to the
    explicit-weights plan — no extra scan, exchange, or join sneaks
    in via the store path. Pinned on the physical plan text with ids
    normalized (the no-Exchange discipline's stronger cousin)."""

    @staticmethod
    def _plan(df) -> str:
        import contextlib
        import io
        import re

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        txt = buf.getvalue()
        # normalize run-order artifacts that differ per construction
        # but not per plan shape: expr ids (#123), plan ids, the
        # localCheckpoint RDD ids, and the no-op self-alias a
        # metadata attach leaves in a Project (`tok#N AS tok#N`)
        txt = re.sub(r"#\d+", "#N", txt)
        txt = re.sub(r"plan_id=\d+", "plan_id=N", txt)
        txt = re.sub(r"MapPartitionsRDD\[\d+\]", "MapPartitionsRDD[N]", txt)
        txt = re.sub(r"\b(\w+)#N(L?) AS \1#N\2\b", r"\1#N\2", txt)
        txt = re.sub(r"\[id=#N\]", "", txt)
        return txt

    def test_curate_store_plan_equals_explicit_plan(
        self, spark, tmp_path, corpus
    ):
        from mydatasyncer_spark.operators.classify import (
            quality_model_frame,
            quality_weight_values,
        )
        from mydatasyncer_spark.operators.maintenance import (
            write_model_store,
        )

        w = quality_weight_values(64)
        path = str(tmp_path / "model")
        write_model_store(
            spark, quality_model_frame(spark, w, bias=-0.1), path
        )
        base = dict(
            min_quality=0.0,
            max_repetition=1.0,
            near_dup_threshold=0.99,
            min_model_quality=0.0,
        )
        configless = curate(
            corpus, CurationConfig(**base), model_store_path=path
        )
        explicit = curate(
            corpus,
            CurationConfig(
                **base, model_weights=tuple(w), model_bias=-0.1
            ),
        )
        assert self._plan(configless) == self._plan(explicit)

    def test_unigram_stored_plan_equals_bare_table_plan(self, spark):
        from mydatasyncer_spark.operators.text import (
            unigram_logprob_table,
            unigram_model_frame,
            unigram_perplexity,
        )

        corpus = spark.createDataFrame(
            [(i, "alpha beta gamma delta " * 2) for i in range(6)],
            "doc_id long, text string",
        )
        model = unigram_logprob_table(corpus)
        base = {"lo": 0.0, "hi": 2.0, "hist": [0.5, 0.5],
                "oov_fraction": 0.0, "docs": 6}
        store = unigram_model_frame(model, base)
        a = unigram_perplexity(corpus, model=model, oov=False)
        b = unigram_perplexity(corpus, model=store, oov=False)
        assert self._plan(a) == self._plan(b)
