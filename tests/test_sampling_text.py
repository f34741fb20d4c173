"""Unit tests for deterministic sampling / split operators and the
word n-gram text ops (round-2 training-pipeline additions)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mydatasyncer_spark.operators import sampling as SP
from mydatasyncer_spark.operators import text as X


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 2000).withColumnRenamed("id", "doc_id")


class TestHashBucket:
    def test_range(self, ids):
        mm = ids.select(
            F.min(SP.hash_bucket(F.col("doc_id"))).alias("lo"),
            F.max(SP.hash_bucket(F.col("doc_id"))).alias("hi"),
        ).first()
        assert mm["lo"] >= 0 and mm["hi"] < SP.SPLIT_BUCKETS

    def test_salt_gives_independent_bucketing(self, ids):
        same = ids.select(
            (
                SP.hash_bucket(F.col("doc_id"), salt="a")
                == SP.hash_bucket(F.col("doc_id"), salt="b")
            ).alias("eq")
        )
        n_same = same.filter("eq").count()
        # independent hashes collide at ~1/10000; 2000 draws ≈ 0-2 hits
        assert n_same < 10

    def test_stable_under_repartition(self, ids):
        a = ids.select("doc_id", SP.hash_bucket(F.col("doc_id")).alias("b"))
        b = ids.repartition(13).select(
            "doc_id", SP.hash_bucket(F.col("doc_id")).alias("b")
        )
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


class TestSplit:
    def test_total_and_proportional(self, ids):
        out = SP.train_test_split(ids, "doc_id")
        counts = {
            r["split"]: r["n"]
            for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
        }
        assert sum(counts.values()) == 2000
        assert set(counts) == {"train", "valid", "test"}
        # 80/10/10 ± a few percent at n=2000
        assert 0.75 < counts["train"] / 2000 < 0.85
        assert 0.06 < counts["valid"] / 2000 < 0.14
        assert 0.06 < counts["test"] / 2000 < 0.14

    def test_fractions_must_sum_to_one(self, ids):
        with pytest.raises(ValueError):
            SP.split_column(F.col("doc_id"), {"train": 0.5, "test": 0.4})

    def test_assignment_total(self, ids):
        # every row gets a split (the DuckDB-twin equivalence is
        # covered by test_oracle_parity::train_test_split_assign)
        out = SP.train_test_split(ids, "doc_id")
        assert out.filter(F.col("split").isNull()).count() == 0


class TestSampling:
    def test_sample_fraction(self, ids):
        kept = SP.sample_hash(ids, "doc_id", 0.25).count()
        assert 0.20 < kept / 2000 < 0.30

    def test_sample_deterministic(self, ids):
        a = SP.sample_hash(ids, "doc_id", 0.3)
        b = SP.sample_hash(ids.repartition(7), "doc_id", 0.3)
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    def test_stratified_fractions(self, spark):
        df = spark.range(0, 3000).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 3 == 0, "a")
            .when(F.col("id") % 3 == 1, "b")
            .otherwise("c")
            .alias("grp"),
        )
        out = SP.stratified_sample_hash(
            df, "grp", "doc_id", {"a": 0.5, "b": 0.1}, default_fraction=0.0
        )
        counts = {
            r["grp"]: r["n"]
            for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()
        }
        assert "c" not in counts  # default 0.0 drops the stratum
        assert 0.4 < counts["a"] / 1000 < 0.6
        assert 0.05 < counts["b"] / 1000 < 0.16


class TestWordNgrams:
    def _grams(self, spark, text: str, n: int):
        df = spark.createDataFrame([(text,)], "text string")
        return df.select(
            X.word_ngrams(X.tokens(F.col("text")), n).alias("g")
        ).first()["g"]

    def test_trigrams(self, spark):
        df = spark.createDataFrame([("a b c d",)], "text string")
        toks = df.select(X.tokens(F.col("text")).alias("t"))
        grams = toks.select(X.word_ngrams(F.col("t"), 3).alias("g")).first()["g"]
        assert grams == ["a b c", "b c d"]

    def test_short_doc_whole_gram(self, spark):
        df = spark.createDataFrame([("hello world",)], "text string")
        toks = df.select(X.tokens(F.col("text")).alias("t"))
        grams = toks.select(X.word_ngrams(F.col("t"), 3).alias("g")).first()["g"]
        assert grams == ["hello world"]

    def test_repetition_ratio(self, spark):
        df = spark.createDataFrame([("x y x y x y x y",)], "text string")
        toks = df.select(X.tokens(F.col("text")).alias("t"))
        rep = toks.select(
            F.round(
                X.repetition_ratio(X.word_ngrams(F.col("t"), 2)), 6
            ).alias("r")
        ).first()["r"]
        # 7 bigrams, 2 distinct ('x y', 'y x') -> 1 - 2/7
        assert rep == pytest.approx(1 - 2 / 7, abs=1e-6)

    def test_unique_text_zero_repetition(self, spark):
        df = spark.createDataFrame([("a b c d e f g",)], "text string")
        toks = df.select(X.tokens(F.col("text")).alias("t"))
        rep = toks.select(
            X.repetition_ratio(X.word_ngrams(F.col("t"), 3)).alias("r")
        ).first()["r"]
        assert rep == 0.0


class TestPackSequences:
    def test_contiguous_bins_and_overflow_policy(self, spark):
        rows = [(i, 3000) for i in range(1, 9)]  # 8 docs x 3000 chars
        df = spark.createDataFrame(rows, "doc_id long, n_chars long")
        out = {
            r["doc_id"]: (r["offset"], r["bin_id"])
            for r in SP.pack_sequences(df, "doc_id", "n_chars", 8192).collect()
        }
        # offsets are the running prefix sums in id order
        assert out[1] == (0, 0)
        assert out[2] == (3000, 0)
        # doc 3 starts at 6000 < 8192: stays in bin 0 (overflow policy)
        assert out[3] == (6000, 0)
        assert out[4] == (9000, 1)

    def test_partitioned_packing_restarts_per_group(self, spark):
        rows = [(1, "a", 5000), (2, "a", 5000), (3, "b", 5000)]
        df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
        out = {
            r["doc_id"]: r["offset"]
            for r in SP.pack_sequences(
                df, "doc_id", "n_chars", 8192, partition_col="lang"
            ).collect()
        }
        assert out[3] == 0  # fresh offset in the 'b' partition

    def test_stable_under_repartition(self, spark):
        rows = [(i, (i * 37) % 997 + 1) for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, n_chars long")
        a = SP.pack_sequences(df, "doc_id", "n_chars", 1024)
        b = SP.pack_sequences(df.repartition(13), "doc_id", "n_chars", 1024)
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


class TestMixWeights:
    def test_uniform_target_weights(self, spark):
        rows = [("web",)] * 60 + [("books",)] * 30 + [("code",)] * 10
        df = spark.createDataFrame(rows, "source string")
        out = {r["source"]: r for r in SP.mix_weights(df, "source").collect()}
        assert out["web"]["n_docs"] == 60
        assert out["web"]["share"] == pytest.approx(0.6)
        # uniform target = 1/3; weight = (1/3)/0.6
        assert out["web"]["weight"] == pytest.approx((1 / 3) / 0.6)
        assert out["code"]["weight"] == pytest.approx((1 / 3) / 0.1)

    def test_explicit_targets(self, spark):
        rows = [("web",)] * 80 + [("code",)] * 20
        df = spark.createDataFrame(rows, "source string")
        out = {
            r["source"]: r["weight"]
            for r in SP.mix_weights(
                df, "source", targets={"web": 0.5, "code": 0.5}
            ).collect()
        }
        assert out["web"] == pytest.approx(0.5 / 0.8)
        assert out["code"] == pytest.approx(0.5 / 0.2)


class TestPackSequencesProperties:
    """Hypothesis invariants for the packing layout."""

    def test_invariants_random_sizes(self, spark):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        @settings(
            max_examples=6,
            deadline=None,
            suppress_health_check=[HealthCheck.function_scoped_fixture],
        )
        @given(
            sizes=st.lists(
                st.integers(min_value=1, max_value=5000),
                min_size=1,
                max_size=60,
            ),
            budget=st.integers(min_value=1000, max_value=10000),
            splits=st.one_of(
                st.none(),
                st.lists(
                    st.integers(min_value=-5, max_value=70),
                    max_size=8,
                    unique=True,
                ),
            ),
        )
        def run(sizes, budget, splits):
            rows = [(i, s) for i, s in enumerate(sizes)]
            df = spark.createDataFrame(rows, "doc_id long, n_chars long")
            out = sorted(
                SP.pack_sequences(
                    df, "doc_id", "n_chars", budget,
                    chunk_splits=sorted(splits) if splits else None,
                ).collect(),
                key=lambda r: r["doc_id"],
            )
            # offsets are exact prefix sums in id order
            acc = 0
            for r, s in zip(out, sizes):
                assert r["offset"] == acc
                assert r["bin_id"] == acc // budget
                acc += s
            # bins are contiguous, start at 0, never skip
            bins = [r["bin_id"] for r in out]
            assert bins[0] == 0
            assert all(b2 - b1 in (0, 1) or b2 > b1 for b1, b2 in zip(bins, bins[1:]))
            # each bin's start row begins inside the bin's budget span
            for r in out:
                assert r["bin_id"] * budget <= r["offset"] < (r["bin_id"] + 1) * budget

        run()


class TestMixWeightsProperty:
    def test_weighted_shares_sum_to_target_mass(self, spark):
        """sum(share * weight) over domains == sum of target shares
        (1.0 for the uniform default) — the defining resampling
        identity."""
        rows = (
            [("a",)] * 17 + [("b",)] * 5 + [("c",)] * 71 + [("d",)] * 7
        )
        df = spark.createDataFrame(rows, "source string")
        out = SP.mix_weights(df, "source").collect()
        mass = sum(r["share"] * r["weight"] for r in out)
        assert mass == pytest.approx(1.0)


class TestChunkDocuments:
    def _chunks(self, spark, text, size, overlap):
        from mydatasyncer_spark.operators.text import chunk_documents

        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        return sorted(
            (r["chunk_id"], r["start_offset"], r["chunk_text"])
            for r in chunk_documents(
                df, chunk_size=size, overlap=overlap
            ).collect()
        )

    def test_overlap_and_coverage(self, spark):
        text = "abcdefghijklmnopqrstuvwxyz"  # 26 chars
        got = self._chunks(spark, text, size=10, overlap=4)
        # stride 6: starts 0,6,12,18 -> ceil((26-4)/6)=4 chunks
        assert [g[:2] for g in got] == [(0, 0), (1, 6), (2, 12), (3, 18)]
        assert got[0][2] == "abcdefghij"
        assert got[1][2] == "ghijklmnop"  # 4-char overlap with chunk 0
        assert got[3][2] == "stuvwxyz"    # short tail
        # reassembling strides reproduces the document
        assert "".join(c[:6] for _, _, c in got[:-1]) + got[-1][2] == text

    def test_short_doc_single_chunk(self, spark):
        got = self._chunks(spark, "tiny", size=100, overlap=10)
        assert got == [(0, 0, "tiny")]

    def test_exact_fit_no_phantom_chunk(self, spark):
        # len == chunk_size: exactly one chunk, no empty tail
        got = self._chunks(spark, "x" * 10, size=10, overlap=4)
        assert len(got) == 1

    def test_overlap_must_be_smaller(self, spark):
        import pytest as _pytest

        from mydatasyncer_spark.operators.text import chunk_documents

        df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
        with _pytest.raises(ValueError, match="overlap"):
            chunk_documents(df, chunk_size=10, overlap=10)


class TestSkewReport:
    def test_heavy_key_surfaces_with_ratio(self, spark):
        from mydatasyncer_spark.operators.partitioning import skew_report

        rows = [(1, "x")] * 90 + [(k, "y") for k in range(2, 12)]
        df = spark.createDataFrame(rows, "k long, v string")
        rep = skew_report(df, "k", top_n=3).collect()
        assert rep[0]["key"] == 1
        assert rep[0]["n_rows"] == 90
        assert rep[0]["share"] == 0.9
        # 11 distinct keys, mean load 100/11 ≈ 9.09 -> ratio ≈ 9.9
        assert 9.0 < rep[0]["ratio_to_mean"] < 11.0
        assert all(r["n_rows"] == 1 for r in rep[1:])


class TestCapPerGroup:
    def test_caps_and_orders(self, spark):
        from mydatasyncer_spark.operators.sampling import cap_per_group

        rows = [(i, "a", float(i)) for i in range(10)] + [
            (100, "b", 1.0)
        ]
        df = spark.createDataFrame(rows, "id long, g string, score double")
        kept = cap_per_group(
            df, "g", 3, "score", descending=True, tiebreak_col="id"
        ).collect()
        by_g = {}
        for r in kept:
            by_g.setdefault(r["g"], []).append(r["id"])
        assert sorted(by_g["a"]) == [7, 8, 9]  # top-3 scores
        assert by_g["b"] == [100]  # under-quota group intact

    def test_deterministic_on_ties(self, spark):
        from mydatasyncer_spark.operators.sampling import cap_per_group

        rows = [(i, "a", 1.0) for i in range(20)]
        df = spark.createDataFrame(rows, "id long, g string, score double")
        a = sorted(
            r["id"]
            for r in cap_per_group(
                df, "g", 5, "score", tiebreak_col="id"
            ).collect()
        )
        assert a == [0, 1, 2, 3, 4]


class TestChunkDocumentsProperties:
    """Chunking invariants over arbitrary ASCII documents: stride
    reassembly reproduces the text, every chunk respects the size
    bound, and offsets follow the arithmetic contract."""

    def test_reassembly_and_bounds(self, spark):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from mydatasyncer_spark.operators.text import chunk_documents

        @settings(
            max_examples=12,
            deadline=None,
            suppress_health_check=[HealthCheck.function_scoped_fixture],
        )
        @given(
            text=st.text(
                alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                min_size=0,
                max_size=300,
            ),
            size=st.integers(min_value=2, max_value=50),
            overlap=st.integers(min_value=0, max_value=49),
        )
        def prop(text, size, overlap):
            if overlap >= size:
                return
            stride = size - overlap
            df = spark.createDataFrame(
                [(1, text)], "doc_id long, text string"
            )
            chunks = sorted(
                (r["chunk_id"], r["start_offset"], r["chunk_text"])
                for r in chunk_documents(
                    df, chunk_size=size, overlap=overlap
                ).collect()
            )
            assert chunks, "at least one chunk always"
            for cid, off, ctext in chunks:
                assert off == cid * stride
                assert len(ctext) <= size
                assert ctext == text[off : off + size]
            # stride-prefix reassembly reproduces the document
            rebuilt = "".join(c[:stride] for _, _, c in chunks[:-1])
            rebuilt += chunks[-1][2]
            assert rebuilt == text

        prop()


class TestApplyMixWeights:
    def test_downsamples_heavy_domain_and_is_deterministic(self, spark):
        from mydatasyncer_spark.operators.sampling import (
            apply_mix_weights,
            mix_weights,
        )

        rows = [(i, "heavy") for i in range(3000)] + [
            (10000 + i, "light") for i in range(600)
        ]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        w = mix_weights(df, "source")
        kept = apply_mix_weights(df, w, "source", "doc_id", base_rate=1.0)
        by = {r["source"]: r["n"] for r in kept.groupBy("source").agg(
            __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
        ).collect()}
        # uniform target over 2 domains: heavy weight = 0.5/(3000/3600)=0.6
        # -> ~1800 kept; light weight = 0.5/(600/3600)=3 -> saturates, all kept
        assert by["light"] == 600
        assert 1500 < by["heavy"] < 2100
        # deterministic under repartitioning
        again = apply_mix_weights(
            df.repartition(13), w, "source", "doc_id", base_rate=1.0
        )
        assert sorted(r["doc_id"] for r in kept.collect()) == sorted(
            r["doc_id"] for r in again.collect()
        )


class TestChunkByTokens:
    def test_token_windows_and_overlap(self, spark):
        from mydatasyncer_spark.operators.text import (
            chunk_documents_by_tokens,
        )

        text = " ".join(f"w{i}" for i in range(20))
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        got = sorted(
            (r["chunk_id"], r["start_token"], r["n_tokens"], r["chunk_text"])
            for r in chunk_documents_by_tokens(
                df, chunk_tokens=8, overlap_tokens=2
            ).collect()
        )
        # stride 6: ceil((20-2)/6)=3 chunks at token offsets 0,6,12
        assert [(g[0], g[1]) for g in got] == [(0, 0), (1, 6), (2, 12)]
        assert got[0][3].split() == [f"w{i}" for i in range(8)]
        assert got[1][3].split()[:2] == ["w6", "w7"]  # 2-token overlap
        assert got[2][2] == 8 and got[2][3].split()[-1] == "w19"

    def test_short_doc_one_chunk(self, spark):
        from mydatasyncer_spark.operators.text import (
            chunk_documents_by_tokens,
        )

        df = spark.createDataFrame([(1, "just two")], "doc_id long, text string")
        got = chunk_documents_by_tokens(df, chunk_tokens=50, overlap_tokens=5).collect()
        assert len(got) == 1 and got[0]["n_tokens"] == 2

    def test_null_domain_docs_keep_their_weight(self, spark):
        from mydatasyncer_spark.operators.sampling import (
            apply_mix_weights,
            mix_weights,
        )

        rows = [(i, None) for i in range(50)] + [(100 + i, "a") for i in range(50)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        w = mix_weights(df, "source")
        kept = apply_mix_weights(df, w, "source", "doc_id", base_rate=1.0)
        # uniform 2-group target -> both weights 1.0 -> keep everything,
        # INCLUDING the null-domain docs (an inner join would drop them)
        assert kept.count() == 100


class TestEpochShuffle:
    def test_order_is_deterministic_and_partition_invariant(self, spark):
        from mydatasyncer_spark.operators.sampling import epoch_shuffle

        df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
        a = [r["doc_id"] for r in epoch_shuffle(df, "doc_id", 3).collect()]
        b = [
            r["doc_id"]
            for r in epoch_shuffle(df.repartition(17), "doc_id", 3).collect()
        ]
        assert a == b  # row property, not partitioning accident
        assert sorted(a) == list(range(500))  # a permutation, no loss

    def test_epochs_produce_different_orders(self, spark):
        from mydatasyncer_spark.operators.sampling import epoch_shuffle

        df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
        e0 = [r["doc_id"] for r in epoch_shuffle(df, "doc_id", 0).collect()]
        e1 = [r["doc_id"] for r in epoch_shuffle(df, "doc_id", 1).collect()]
        assert e0 != e1
        assert e0 != list(range(500))  # actually shuffled

    def test_order_is_a_distributed_range_sort(self, spark):
        """The 100 TB contract: one range-partitioned sort, no single
        collect-everything task and no cartesian anything."""
        from mydatasyncer_spark.operators.sampling import epoch_shuffle

        df = spark.range(0, 10_000).withColumnRenamed("id", "doc_id")
        plan = (
            epoch_shuffle(df, "doc_id", 0)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "rangepartitioning" in plan.lower()
        assert "CartesianProduct" not in plan


class TestRemoveRepeatedSegments:
    def _run(self, spark, rows, min_repeat=3):
        from mydatasyncer_spark.operators.text import (
            remove_repeated_segments,
        )

        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {
            r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_dropped"])
            for r in remove_repeated_segments(
                df, min_repeat=min_repeat
            ).collect()
        }

    def test_corpus_wide_boilerplate_dropped_order_kept(self, spark):
        boiler = "subscribe now"
        rows = [
            (1, f"alpha one | {boiler} | omega one"),
            (2, f"{boiler} | beta two"),
            (3, f"gamma three | {boiler}"),
            (4, "delta four"),
        ]
        got = self._run(spark, rows, min_repeat=3)
        assert got[1] == ("alpha one | omega one", 2, 1)
        assert got[2] == ("beta two", 1, 1)
        assert got[3] == ("gamma three", 1, 1)
        assert got[4] == ("delta four", 1, 0)

    def test_repeat_within_one_doc_counts_once(self, spark):
        # "dup" appears 3 times but only in 2 DISTINCT docs -> kept
        rows = [
            (1, "dup | dup | unique a"),
            (2, "dup | unique b"),
            (3, "unique c"),
        ]
        got = self._run(spark, rows, min_repeat=3)
        assert got[1] == ("dup | dup | unique a", 3, 0)
        assert got[2] == ("dup | unique b", 2, 0)

    def test_fully_boilerplate_doc_becomes_empty(self, spark):
        rows = [(i, "legal footer") for i in range(1, 5)]
        got = self._run(spark, rows, min_repeat=3)
        for i in range(1, 5):
            assert got[i] == ("", 0, 1)


class TestWeightedSample:
    def test_deterministic_and_partition_invariant(self, spark):
        from mydatasyncer_spark.operators.sampling import weighted_sample

        df = spark.range(0, 1000).selectExpr(
            "id AS doc_id", "CAST(1 + id % 10 AS DOUBLE) AS w"
        )
        a = [
            r["doc_id"]
            for r in weighted_sample(df, "doc_id", "w", 50).collect()
        ]
        b = [
            r["doc_id"]
            for r in weighted_sample(
                df.repartition(13), "doc_id", "w", 50
            ).collect()
        ]
        assert a == b
        assert len(a) == 50 and len(set(a)) == 50  # without replacement

    def test_heavier_rows_oversampled(self, spark):
        """Across independent salts, weight-10 rows must be drawn far
        more often than weight-1 rows (A-ES proportionality)."""
        from mydatasyncer_spark.operators.sampling import weighted_sample

        df = spark.range(0, 400).selectExpr(
            "id AS doc_id",
            "CAST(CASE WHEN id < 200 THEN 10 ELSE 1 END AS DOUBLE) AS w",
        )
        heavy = 0
        total = 0
        for salt in ("s1", "s2", "s3", "s4"):
            got = weighted_sample(df, "doc_id", "w", 80, salt=salt).collect()
            heavy += sum(1 for r in got if r["doc_id"] < 200)
            total += len(got)
        # heavy rows hold ~10/11 of the total weight; even loosely they
        # must dominate the sample
        assert heavy / total > 0.75

    def test_non_positive_weights_excluded(self, spark):
        from mydatasyncer_spark.operators.sampling import weighted_sample

        df = spark.createDataFrame(
            [(1, 5.0), (2, 0.0), (3, -1.0), (4, None)],
            "doc_id long, w double",
        )
        got = [
            r["doc_id"] for r in weighted_sample(df, "doc_id", "w", 10).collect()
        ]
        assert got == [1]

    def test_plan_is_take_ordered_not_full_sort(self, spark):
        from mydatasyncer_spark.operators.sampling import weighted_sample

        df = spark.range(0, 100_000).selectExpr(
            "id AS doc_id", "CAST(1 + id % 7 AS DOUBLE) AS w"
        )
        plan = (
            weighted_sample(df, "doc_id", "w", 25)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "TakeOrderedAndProject" in plan


class TestUnigramPerplexity:
    def test_mode_text_scores_lower_than_rare_text(self, spark):
        from mydatasyncer_spark.operators.text import unigram_perplexity

        common = "the cat sat on the mat " * 5
        rows = [(i, common) for i in range(1, 10)]
        rows.append((99, "zyzzyva qwertyuiop xylophone"))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: r["perplexity"]
            for r in unigram_perplexity(df).collect()
        }
        assert got[99] > got[1]  # rare vocab = higher perplexity

    def test_frozen_model_scores_new_batch(self, spark):
        from mydatasyncer_spark.operators.text import (
            unigram_logprob_table,
            unigram_perplexity,
        )

        corpus = spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, "alpha beta delta")],
            "doc_id long, text string",
        )
        model = unigram_logprob_table(corpus)
        new = spark.createDataFrame(
            [(10, "alpha beta"), (11, "beta gamma delta")],
            "doc_id long, text string",
        )
        got = unigram_perplexity(new, model=model).collect()
        assert {r["doc_id"] for r in got} == {10, 11}
        assert all(r["perplexity"] > 1.0 for r in got)

    def test_empty_documents_drop_out(self, spark):
        from mydatasyncer_spark.operators.text import unigram_perplexity

        df = spark.createDataFrame(
            [(1, "some words here"), (2, ""), (3, "!!!")],
            "doc_id long, text string",
        )
        ids = {r["doc_id"] for r in unigram_perplexity(df).collect()}
        assert ids == {1}


class TestUnigramVocabCut:
    """min_count vocabulary cut + OOV bucket (the CCNet construction
    that keeps the model broadcast-small at any corpus scale)."""

    def _corpus(self, spark):
        # "alpha"/"beta" appear many times; each "rareN" exactly once
        rows = [(i, "alpha beta alpha") for i in range(1, 11)]
        rows += [(100 + i, f"alpha rare{i}") for i in range(5)]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_cut_model_has_single_null_oov_row(self, spark):
        from pyspark.sql import functions as F

        from mydatasyncer_spark.operators.text import unigram_logprob_table

        model = unigram_logprob_table(self._corpus(spark), min_count=3)
        rows = model.collect()
        vocab = {r["tok"] for r in rows if r["tok"] is not None}
        assert vocab == {"alpha", "beta"}  # rare* fell below the cut
        oov = [r for r in rows if r["tok"] is None]
        assert len(oov) == 1
        # OOV carries the aggregate below-cut mass: 5 rare tokens,
        # N=45+10 tokens total... logp must be finite and < vocab max
        assert oov[0]["logp"] < max(
            r["logp"] for r in rows if r["tok"] is not None
        )

    def test_probabilities_sum_to_one_over_event_space(self, spark):
        """Vocab tokens + the OOV bucket form a proper distribution:
        sum(exp(logp)) over V vocab rows + the bucket must be < 1 and
        approach 1 as alpha's smoothing mass shrinks (add-alpha holds
        back alpha*(V+1)/(N+alpha*(V+1)) exactly for unseen splits)."""
        import math

        from mydatasyncer_spark.operators.text import unigram_logprob_table

        model = unigram_logprob_table(
            self._corpus(spark), alpha=0.01, min_count=3
        ).collect()
        total = sum(math.exp(r["logp"]) for r in model)
        assert 0.99 < total <= 1.0 + 1e-9

    def test_unseen_tokens_score_as_oov_against_frozen_model(self, spark):
        from mydatasyncer_spark.operators.text import (
            unigram_logprob_table,
            unigram_perplexity,
        )

        model = unigram_logprob_table(self._corpus(spark), min_count=3)
        new = spark.createDataFrame(
            [(50, "alpha beta"), (51, "totally unseen words")],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: r
            for r in unigram_perplexity(new, model=model, oov=True).collect()
        }
        # all-OOV doc: every token counted (left join + bucket), and
        # far higher perplexity than the in-vocab doc
        assert got[51]["n_tokens"] == 3
        assert got[50]["n_tokens"] == 2
        assert got[51]["perplexity"] > got[50]["perplexity"]

    def test_bucketless_model_keeps_inner_join_semantics(self, spark):
        """min_count=1 (no OOV row): unmatched tokens drop from BOTH
        the count and the average — the pre-r5 contract, unchanged."""
        from mydatasyncer_spark.operators.text import (
            unigram_logprob_table,
            unigram_perplexity,
        )

        corpus = spark.createDataFrame(
            [(1, "alpha beta gamma")], "doc_id long, text string"
        )
        model = unigram_logprob_table(corpus)
        new = spark.createDataFrame(
            [(9, "alpha unseen")], "doc_id long, text string"
        )
        got = unigram_perplexity(new, model=model).collect()
        assert got[0]["n_tokens"] == 1  # 'unseen' dropped, not counted


class TestCapPerGroupScalable:
    def test_row_identical_to_single_window(self, spark):
        import random

        from mydatasyncer_spark.operators.sampling import (
            cap_per_group,
            cap_per_group_scalable,
        )

        rng = random.Random(3)
        rows = [
            (i, f"g{i % 4}", float(rng.randint(0, 50)))
            for i in range(1, 800)
        ]
        df = spark.createDataFrame(rows, "id long, g string, score double")
        base = sorted(
            (r["id"],)
            for r in cap_per_group(
                df, "g", 7, "score", tiebreak_col="id"
            ).collect()
        )
        for fanout in (1, 4, 32):
            got = sorted(
                (r["id"],)
                for r in cap_per_group_scalable(
                    df, "g", 7, "score", tiebreak_col="id", fanout=fanout
                ).collect()
            )
            assert got == base, fanout

    def test_groups_smaller_than_n_survive_whole(self, spark):
        from mydatasyncer_spark.operators.sampling import (
            cap_per_group_scalable,
        )

        df = spark.createDataFrame(
            [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 9.0)],
            "id long, g string, score double",
        )
        out = cap_per_group_scalable(df, "g", 10, "score", tiebreak_col="id")
        assert out.count() == 3


class TestPackSequencesChunked:
    """The r6 distributed prefix sum: explicit chunk splits, string
    ids, and the numeric-id guard."""

    def test_caller_supplied_splits_match_unsplit_result(self, spark):
        rows = [(i, (i * 37) % 997 + 1) for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, n_chars long")
        a = sorted(
            SP.pack_sequences(df, "doc_id", "n_chars", 1024).collect(),
            key=lambda r: r["doc_id"],
        )
        b = sorted(
            SP.pack_sequences(
                df, "doc_id", "n_chars", 1024,
                chunk_splits=[50, 100, 150],
            ).collect(),
            key=lambda r: r["doc_id"],
        )
        assert [(r["doc_id"], r["offset"], r["bin_id"]) for r in a] == [
            (r["doc_id"], r["offset"], r["bin_id"]) for r in b
        ]

    def test_string_ids_need_explicit_splits(self, spark):
        import pytest as _pytest

        rows = [(f"d{i:03d}", 100) for i in range(20)]
        df = spark.createDataFrame(rows, "doc_id string, n_chars long")
        with _pytest.raises(ValueError, match="numeric id_col"):
            SP.pack_sequences(df, "doc_id", "n_chars", 512)
        out = sorted(
            SP.pack_sequences(
                df, "doc_id", "n_chars", 512,
                chunk_splits=["d005", "d010", "d015"],
            ).collect(),
            key=lambda r: r["doc_id"],
        )
        acc = 0
        for r in out:
            assert r["offset"] == acc and r["bin_id"] == acc // 512
            acc += 100

    def test_explicit_splits_win_over_n_chunks(self, spark):
        """Passing BOTH n_chunks and non-numeric chunk_splits must
        respect the explicit splits (native-ordering comparison), not
        force them through float() because n_chunks is set."""
        rows = [(f"d{i:03d}", 100) for i in range(20)]
        df = spark.createDataFrame(rows, "doc_id string, n_chars long")
        out = sorted(
            SP.pack_sequences(
                df, "doc_id", "n_chars", 512,
                n_chunks=4,
                chunk_splits=["d005", "d010", "d015"],
            ).collect(),
            key=lambda r: r["doc_id"],
        )
        acc = 0
        for r in out:
            assert r["offset"] == acc and r["bin_id"] == acc // 512
            acc += 100

    def test_explicit_int_splits_with_n_chunks_keep_native_typing(
        self, spark
    ):
        rows = [(i, (i * 37) % 997 + 1) for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, n_chars long")
        a = sorted(
            SP.pack_sequences(df, "doc_id", "n_chars", 1024).collect(),
            key=lambda r: r["doc_id"],
        )
        b = sorted(
            SP.pack_sequences(
                df, "doc_id", "n_chars", 1024,
                n_chunks=4, chunk_splits=[50, 100, 150],
            ).collect(),
            key=lambda r: r["doc_id"],
        )
        assert [(r["doc_id"], r["offset"], r["bin_id"]) for r in a] == [
            (r["doc_id"], r["offset"], r["bin_id"]) for r in b
        ]


class TestUnigramDrift:
    """r11: the unigram LM's decision signal — the one trained
    artifact that lacked one. A same-distribution corpus sits at the
    fixpoint, a drifted corpus crosses the retrain threshold on BOTH
    signals (PSI over the ln-perplexity bins, OOV token-mass shift —
    the leading indicator), and retrain + re-baseline returns to ~0."""

    def _docs(self, spark, vocab, n, id0=0, seed=3):
        import random

        rng = random.Random(seed)
        return spark.createDataFrame(
            [
                (
                    id0 + i,
                    " ".join(rng.choice(vocab) for _ in range(12)),
                )
                for i in range(n)
            ],
            "doc_id long, text string",
        )

    def test_psi_and_oov_cross_then_retrain_fixpoint(self, spark):
        from mydatasyncer_spark.operators.text import (
            unigram_baseline,
            unigram_drift_report,
            unigram_logprob_table,
        )

        train_vocab = [f"word{i}" for i in range(30)]
        corpus = self._docs(spark, train_vocab, 60)
        model = unigram_logprob_table(corpus).localCheckpoint(eager=True)
        base = unigram_baseline(corpus, model)
        assert abs(sum(base["hist"]) - 1.0) < 1e-9
        assert base["oov_fraction"] == 0.0  # own corpus, open vocab
        # the training corpus against its own baseline: stable (the
        # score_drift_report convention — PSI over few-hundred-doc
        # fresh samples is sampling noise, not drift)
        same = unigram_drift_report(corpus, model, base)
        assert same["psi"] < 0.01
        assert abs(same["oov_shift"]) < 1e-9
        # drifted batch (half the vocabulary is novel): both signals
        # cross the documented thresholds
        mixed_vocab = train_vocab[:15] + [f"novel{i}" for i in range(15)]
        drifted_docs = self._docs(spark, mixed_vocab, 60, id0=1000)
        drifted = unigram_drift_report(drifted_docs, model, base)
        assert drifted["psi"] > 0.2
        assert drifted["oov_fraction"] > 0.3
        assert drifted["oov_shift"] > 0.3
        assert drifted["max_bin_shift"] > same["max_bin_shift"]
        # retrain on current data + re-baseline: fixpoint again
        model2 = unigram_logprob_table(drifted_docs).localCheckpoint(
            eager=True
        )
        base2 = unigram_baseline(drifted_docs, model2)
        again = unigram_drift_report(drifted_docs, model2, base2)
        assert again["psi"] < 0.01
        assert abs(again["oov_shift"]) < 1e-9

    def test_cut_model_oov_measures_bucket_mass(self, spark):
        """With a min_count cut, OOV fraction is the mass landing in
        the NULL-token bucket — nonzero already at training time (the
        cut tail), rising under drift."""
        from mydatasyncer_spark.operators.text import (
            unigram_baseline,
            unigram_drift_report,
            unigram_logprob_table,
        )

        rows = [(i, "alpha beta alpha gamma") for i in range(40)]
        rows += [(100 + i, f"alpha rare{i}") for i in range(8)]
        corpus = spark.createDataFrame(rows, "doc_id long, text string")
        model = unigram_logprob_table(
            corpus, min_count=3
        ).localCheckpoint(eager=True)
        base = unigram_baseline(corpus, model)
        assert base["oov_fraction"] > 0.0  # the cut tail
        novel = spark.createDataFrame(
            [(500 + i, f"zz{i} qq{i} alpha") for i in range(30)],
            "doc_id long, text string",
        )
        rep = unigram_drift_report(novel, model, base)
        assert rep["oov_shift"] > 0.3

    def test_empty_frame_refused(self, spark):
        import pytest

        from mydatasyncer_spark.operators.text import (
            unigram_baseline,
            unigram_drift_report,
            unigram_logprob_table,
        )

        corpus = spark.createDataFrame(
            [(1, "alpha beta"), (2, "beta gamma")],
            "doc_id long, text string",
        )
        model = unigram_logprob_table(corpus)
        base = unigram_baseline(corpus, model)
        empty = spark.createDataFrame(
            [(9, ""), (10, "!!!")], "doc_id long, text string"
        )
        with pytest.raises(ValueError, match="no document"):
            unigram_drift_report(empty, model, base)
        with pytest.raises(ValueError, match="no document"):
            unigram_baseline(empty, model)
        with pytest.raises(ValueError, match=">= 2 bins"):
            unigram_drift_report(
                corpus, model, {"lo": 0.0, "hi": 1.0, "hist": [1.0],
                                "oov_fraction": 0.0}
            )

    def test_baseline_rides_persisted_model_frame(self, spark, tmp_path):
        """r11 symmetry with the weights/merge stores: the baseline
        rides the logprob table's own footer, so the report resolves
        it configless after a parquet round-trip — and a table
        recording none refuses instead of accepting a hand-guessed
        baseline."""
        import pytest

        from mydatasyncer_spark.operators.text import (
            recorded_unigram_baseline,
            unigram_baseline,
            unigram_drift_report,
            unigram_logprob_table,
            unigram_model_frame,
        )

        corpus = self._docs(spark, [f"w{i}" for i in range(20)], 40)
        model = unigram_logprob_table(corpus).localCheckpoint(eager=True)
        base = unigram_baseline(corpus, model)
        path = str(tmp_path / "lm")
        unigram_model_frame(model, base).write.parquet(path)
        stored = spark.read.parquet(path)
        assert recorded_unigram_baseline(stored) == pytest.approx(base)
        # configless report == explicit-baseline report
        probe = self._docs(spark, [f"w{i}" for i in range(20)], 25, id0=900)
        a = unigram_drift_report(probe, stored)
        b = unigram_drift_report(probe, stored, base)
        assert a == b
        # a table recording no baseline refuses the configless path
        plain = unigram_logprob_table(corpus)
        with pytest.raises(ValueError, match="records no"):
            unigram_drift_report(probe, plain)


class TestCurriculumNullAndUnseenSources:
    """r13 adversarial sweep of curriculum.py: the tier-assignment
    join must follow the family's NULL discipline (apply_mix_weights:
    a NULL group is a regular group) — a plain equality join silently
    DROPPED every NULL-source doc while the cutpoints table dutifully
    computed their cut row; and a source absent from the cutpoints
    (tiers computed on an earlier corpus) must keep its docs in the
    lowest tier via the documented NULL-cuts-compare-false rule, not
    vanish."""

    def test_null_source_docs_keep_their_tiers(self, spark):
        from mydatasyncer_spark.operators.curriculum import (
            assign_quality_tiers,
            quality_tier_cutpoints,
        )

        rows = [(i, None, round(i / 10.0, 6)) for i in range(9)] + [
            (100 + i, "web", round(i / 10.0, 6)) for i in range(9)
        ]
        d = spark.createDataFrame(
            rows, "doc_id long, source string, quality double"
        )
        cuts = quality_tier_cutpoints(d, "source", "quality")
        out = assign_quality_tiers(d, cuts, "source", "quality")
        assert out.count() == 18  # nothing dropped
        null_tiers = {
            r["doc_id"]: r["tier"]
            for r in out.filter(F.col("source").isNull()).collect()
        }
        web_tiers = {
            r["doc_id"] - 100: r["tier"]
            for r in out.filter(F.col("source") == "web").collect()
        }
        # identical quality distribution -> identical tier layout
        assert null_tiers == web_tiers
        assert set(null_tiers.values()) == {"low", "mid", "high"}

    def test_unseen_source_falls_to_lowest_tier(self, spark):
        from mydatasyncer_spark.operators.curriculum import (
            assign_quality_tiers,
            quality_tier_cutpoints,
        )

        train = spark.createDataFrame(
            [(i, "web", round(i / 10.0, 6)) for i in range(9)],
            "doc_id long, source string, quality double",
        )
        cuts = quality_tier_cutpoints(train, "source", "quality")
        newer = spark.createDataFrame(
            [(1, "web", 0.9), (2, "books", 0.9)],
            "doc_id long, source string, quality double",
        )
        out = {
            r["doc_id"]: r["tier"]
            for r in assign_quality_tiers(
                newer, cuts, "source", "quality"
            ).collect()
        }
        assert out[1] == "high"   # seen source, top quality
        assert out[2] == "low"    # unseen source: kept, lowest tier
