"""Trained BPE tokenization (operators/tokenizer.py): merge
learning matches the published algorithm hand-stepped on a tiny
corpus, training is deterministic, encoding round-trips, and the
trained counts dominate the regex proxy exactly where they should
(rare words explode into subwords; frequent words collapse)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mydatasyncer_spark.operators.tokenizer import (
    WORD_END,
    _encode_word,
    bpe_encode,
    bpe_token_count,
    bpe_train,
)


class TestTrain:
    def test_hand_stepped_merges(self, spark):
        """'low' x5 and 'lower' x2: the first merges must follow the
        hand-run of the published algorithm on this dict —
        ('l','o') count 7 first, then ('lo','w') 7, then the
        word-end fold of the dominant word ('low', '</w>') 5."""
        rows = [(i, "low") for i in range(5)] + [
            (10 + i, "lower") for i in range(2)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        merges = bpe_train(df, n_merges=3)
        assert merges == [
            ("l", "o"),
            ("lo", "w"),
            ("low", WORD_END),
        ]

    def test_training_is_deterministic(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(
            100
        )
        m1 = bpe_train(docs, n_merges=50)
        m2 = bpe_train(docs, n_merges=50)
        assert m1 == m2 and len(m1) == 50

    def test_incremental_pair_counts_match_naive_recount(
        self, spark, sf_dir
    ):
        """r11: bpe_train maintains pair counts incrementally (only
        words containing the merged pair are re-segmented, heap
        argmax). The merge table must be byte-identical to the
        published full-recount formulation — pinned here against a
        straight reimplementation of the naive algorithm over the
        same word-frequency table."""

        def naive_train(word_counts, n_merges):
            vocab = dict(word_counts)
            merges = []
            for _ in range(n_merges):
                pair_counts = {}
                for word, cnt in vocab.items():
                    for a, b in zip(word, word[1:]):
                        pair_counts[(a, b)] = (
                            pair_counts.get((a, b), 0) + cnt
                        )
                if not pair_counts:
                    break
                best = min(
                    pair_counts.items(), key=lambda kv: (-kv[1], kv[0])
                )[0]
                if pair_counts[best] < 2:
                    break
                merged = best[0] + best[1]
                new_vocab = {}
                for word, cnt in vocab.items():
                    out, i = [], 0
                    while i < len(word):
                        if (
                            i + 1 < len(word)
                            and word[i] == best[0]
                            and word[i + 1] == best[1]
                        ):
                            out.append(merged)
                            i += 2
                        else:
                            out.append(word[i])
                            i += 1
                    new_vocab[tuple(out)] = (
                        new_vocab.get(tuple(out), 0) + cnt
                    )
                vocab = new_vocab
                merges.append(best)
            return merges

        from mydatasyncer_spark.operators.text import tokens

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(
            150
        )
        wc = {
            (*r["_w"], WORD_END): int(r["_c"])
            for r in docs.select(
                F.explode(tokens(F.col("text"))).alias("_w")
            )
            .groupBy("_w")
            .agg(F.count(F.lit(1)).alias("_c"))
            .collect()
        }
        got = bpe_train(docs, n_merges=120)
        want = naive_train(wc, 120)
        # the 150-doc corpus exhausts its pair space before 120
        # merges — the two formulations must agree on the merges AND
        # on where training stops
        assert got == want
        assert len(got) > 50

    def test_max_words_caps_driver_state(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(
            100
        )
        # a tiny cap still trains (on the most frequent words only)
        merges = bpe_train(docs, n_merges=10, max_words=20)
        assert 0 < len(merges) <= 10


class TestEncode:
    MERGES = [("l", "o"), ("lo", "w"), ("low", WORD_END)]

    def test_greedy_rank_order_application(self):
        ranks = {p: i for i, p in enumerate(self.MERGES)}
        assert _encode_word("low", ranks) == ["low" + WORD_END]
        assert _encode_word("lower", ranks) == ["low", "e", "r", WORD_END]
        assert _encode_word("xyz", ranks) == ["x", "y", "z", WORD_END]

    def test_encode_round_trips_and_counts(self, spark):
        df = spark.createDataFrame(
            [(1, "low lower"), (2, ""), (3, None)],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r["subwords"]
            for r in bpe_encode(df, self.MERGES).collect()
        }
        assert out[1] == [
            "low" + WORD_END,
            "low",
            "e",
            "r",
            WORD_END,
        ]
        assert out[2] == [] and out[3] == []
        # concatenating subwords reconstructs the normalized words
        joined = "".join(out[1]).replace(WORD_END, " ").strip()
        assert joined == "low lower"
        counts = {
            r["doc_id"]: r["n_subwords"]
            for r in bpe_token_count(df, self.MERGES).collect()
        }
        assert counts == {1: 5, 2: 0, 3: 0}

    def test_trained_counts_shrink_with_more_merges(self, spark, sf_dir):
        """More merges can only shorten encodings — the compression
        monotonicity that makes the count a billing-grade number."""
        docs = spark.read.parquet(
            f"{sf_dir}/documents.parquet"
        ).limit(80)
        m_small = bpe_train(docs, n_merges=10)
        m_big = bpe_train(docs, n_merges=120)
        assert m_big[: len(m_small)] == m_small  # prefix property
        tot = {}
        for tag, merges in (("s", m_small), ("b", m_big)):
            tot[tag] = (
                bpe_token_count(docs, merges)
                .agg(F.sum("n_subwords").alias("t"))
                .first()["t"]
            )
        assert tot["b"] < tot["s"]

    def test_rare_words_explode_frequent_words_collapse(
        self, spark, sf_dir
    ):
        docs = spark.read.parquet(
            f"{sf_dir}/documents.parquet"
        ).limit(80)
        merges = bpe_train(docs, n_merges=120)
        probe = spark.createDataFrame(
            [(1, "the the the"), (2, "zqxjkwv bnmpqr")],
            "doc_id long, text string",
        )
        c = {
            r["doc_id"]: r["n_subwords"]
            for r in bpe_token_count(probe, merges).collect()
        }
        # a frequent trained word is few pieces per occurrence; an
        # off-distribution string falls back toward characters
        assert c[1] <= 6  # <= 2 pieces per "the"
        assert c[2] >= 10


class TestBpeDrift:
    """The merge table's decision signal: same-corpus compression is
    the fixpoint, an off-vocabulary corpus crosses the documented
    retrain ratio with the fallback fraction leading, and
    retrain + re-baseline recovers."""

    def test_ratio_crosses_then_retrain_recovers(self, spark, sf_dir):
        from mydatasyncer_spark.operators.tokenizer import (
            bpe_drift_report,
            bpe_pieces_per_word,
            bpe_train,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(
            100
        )
        merges = bpe_train(docs, n_merges=120)
        base = bpe_pieces_per_word(docs, merges)
        same = bpe_drift_report(docs, merges, base)
        assert same["compression_ratio"] == pytest.approx(1.0)
        # off-vocabulary corpus: fall back toward characters
        import random

        rng = random.Random(3)
        off = spark.createDataFrame(
            [
                (
                    i,
                    " ".join(
                        "".join(
                            rng.choice("zqxjwvbk") for _ in range(7)
                        )
                        for _ in range(12)
                    ),
                )
                for i in range(20)
            ],
            "doc_id long, text string",
        )
        drifted = bpe_drift_report(off, merges, base)
        assert drifted["compression_ratio"] > 1.2
        assert (
            drifted["char_fallback_fraction"]
            > same["char_fallback_fraction"]
        )
        # retrain on the union + re-baseline: back to the fixpoint
        union = docs.select("doc_id", "text").unionByName(off)
        merges2 = bpe_train(union, n_merges=200)
        base2 = bpe_pieces_per_word(union, merges2)
        again = bpe_drift_report(union, merges2, base2)
        assert again["compression_ratio"] == pytest.approx(1.0)
        assert again["words"] > 0

    def test_empty_frame_refused(self, spark):
        from mydatasyncer_spark.operators.tokenizer import (
            bpe_drift_report,
            bpe_pieces_per_word,
        )

        empty = spark.createDataFrame([], "doc_id long, text string")
        with pytest.raises(ValueError, match="no tokens"):
            bpe_drift_report(empty, [("l", "o")], 1.5)
        with pytest.raises(ValueError, match="no tokens"):
            bpe_pieces_per_word(empty, [("l", "o")])


class TestEncodeProperties:
    """Hypothesis properties of the pure-Python merge application —
    the invariants that hold for ANY word under ANY merge table:
    lossless reconstruction, piece non-emptiness, and the no-merges
    character fallback."""

    def test_reconstruction_and_fallback(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        words = st.text(
            alphabet="abcdefghijklmnopqrstuvwxyz0123456789",
            min_size=1,
            max_size=12,
        )
        pairs = st.lists(
            st.tuples(
                st.text(alphabet="abcxyz", min_size=1, max_size=3),
                st.text(alphabet="abcxyz", min_size=1, max_size=3),
            ),
            max_size=20,
        )

        @settings(max_examples=200, deadline=None)
        @given(word=words, merges=pairs)
        def check(word, merges):
            ranks = {tuple(p): i for i, p in enumerate(merges)}
            pieces = _encode_word(word, ranks)
            # lossless: concatenation reconstructs word + marker
            assert "".join(pieces) == word + WORD_END
            assert all(pieces)
            # no merges -> pure character fallback
            assert _encode_word(word, {}) == [*word, WORD_END]

        check()
