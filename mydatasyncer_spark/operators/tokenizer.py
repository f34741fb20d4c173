"""Trained subword tokenization — byte-pair encoding (Sennrich,
Haddow, Birch 2016, the published word-level BPE recipe) for the
pipeline stages that need REAL token counts: sequence packing,
domain-mix weighting, and per-document cost accounting
(``text.token_count`` is the cheap regex proxy; this is the trained
article).

Scale split, which is the whole design:

- **Training is ONE distributed pass + driver work bounded by the
  word vocabulary, never the corpus.** The corpus contributes only
  its word-frequency table (a groupBy over exploded tokens — at
  100 TB that is one shuffle of narrow (word, count) rows);
  ``max_words`` caps what the driver holds (frequency-ranked, so the
  tail it drops cannot affect early merges materially). Merge
  learning then runs on that dict exactly as published: repeatedly
  merge the most frequent adjacent symbol pair, deterministic
  (count desc, pair lexicographic asc) so two training runs over the
  same corpus produce byte-identical merge tables.
- **Encoding is an Arrow-batched pandas UDF** — iterative string
  rewriting is genuinely outside relational algebra (the one
  sanctioned use of the Python path, same rationale as the
  multimodal codecs), memoized per word within each batch: corpora
  repeat words heavily, so the per-row cost collapses to a dict hit.
  The merge table rides the closure (broadcast-sized: ``n_merges``
  string pairs).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mydatasyncer_spark.operators.text import TOKEN_SPLIT_RE, tokens

#: end-of-word marker, as published — distinguishes "est</w>" (word
#: suffix) from "est" (word-internal), which is what lets merges
#: learn suffixes without gluing words together
WORD_END = "</w>"


def bpe_train(
    df: DataFrame,
    n_merges: int = 200,
    text_col: str = "text",
    max_words: int = 100_000,
    min_word_freq: int = 1,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the
    ordered merge table (rank = position), the only artifact the
    encoder needs — persist it with :func:`bpe_merges_frame`.

    The distributed part is exactly one aggregation: exploded tokens
    → (word, count). ``max_words`` bounds the driver-side dict by
    taking the most frequent words (ties id-free: count desc, word
    asc — deterministic under any partitioning).

    Driver complexity (r11): merge learning maintains the pair
    counts INCREMENTALLY — the published optimization: per merge,
    only the vocabulary words actually containing the merged pair
    are re-segmented and their pair deltas applied, and the argmax
    is a lazy-invalidation heap, so each merge costs
    O(Σ|word| over affected words + log #pairs) instead of a full
    vocabulary rescan. A 32k-merge vocabulary over 100k words is
    minutes of driver work, not hours; the selection rule (count
    desc, then pair lexicographic asc) is byte-identical to the
    naive recount, so the merge table is unchanged (pinned against
    a recount reference in tests)."""
    import heapq
    from collections import Counter

    rows = (
        df.select(F.explode(tokens(F.col(text_col))).alias("_w"))
        .groupBy("_w")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= int(min_word_freq))
        .orderBy(F.desc("_c"), F.asc("_w"))
        .limit(int(max_words))
        .collect()
    )
    # one entry per distinct word (the groupBy guarantees it; merging
    # never collides two distinct words — symbol concatenation
    # preserves the underlying string)
    words: list[list] = [
        [(*r["_w"], WORD_END), int(r["_c"])] for r in rows
    ]
    pair_counts: dict[tuple[str, str], int] = {}
    pair_to_words: dict[tuple[str, str], set[int]] = {}
    #: (-count, pair) entries; stale ones (count since changed) are
    #: skipped on pop — the standard lazy-invalidation priority queue
    heap: list[tuple[int, tuple[str, str]]] = []

    def _apply_delta(word, cnt: int, wid: int, sign: int) -> None:
        """Apply one word's pair-occurrence deltas (±cnt per
        occurrence) to the counts, the heap, and the pair→words
        index. Callers remove the OLD segmentation then add the NEW
        one, so pairs present in both are discarded-then-re-added —
        membership stays exact."""
        for p, k in Counter(zip(word, word[1:])).items():
            c = pair_counts.get(p, 0) + sign * k * cnt
            if c > 0:
                pair_counts[p] = c
                heapq.heappush(heap, (-c, p))
            else:
                pair_counts.pop(p, None)
            if sign > 0:
                pair_to_words.setdefault(p, set()).add(wid)
            else:
                s = pair_to_words.get(p)
                if s is not None:
                    s.discard(wid)
                    if not s:
                        del pair_to_words[p]

    for wid, (word, cnt) in enumerate(words):
        _apply_delta(word, cnt, wid, +1)
    merges: list[tuple[str, str]] = []
    for _ in range(int(n_merges)):
        # deterministic argmax: highest count, then lexicographically
        # smallest pair — exactly the naive recount's selection
        best = None
        while heap:
            negc, p = heap[0]
            if pair_counts.get(p) == -negc:
                best = p
                break
            heapq.heappop(heap)  # stale
        if best is None:
            break
        if pair_counts[best] < 2:
            break  # nothing left that ever co-occurs
        merged = best[0] + best[1]
        for wid in sorted(pair_to_words.get(best, ())):
            word, cnt = words[wid]
            out = []
            i = 0
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
            new_word = tuple(out)
            _apply_delta(word, cnt, wid, -1)
            words[wid][0] = new_word
            _apply_delta(new_word, cnt, wid, +1)
        merges.append(best)
    return merges


#: metadata keys for the self-describing merge-table store
_BPE_FP_KEY = "bpe_merges_fingerprint"
_BPE_BASE_KEY = "bpe_baseline_pieces_per_word"


def merges_fingerprint(merges: list[tuple[str, str]]) -> str:
    """Order-sensitive fingerprint of a merge table: rank IS the
    merge priority (:func:`_encode_word` applies the lowest rank
    first), so any reorder changes every encoding."""
    import hashlib

    payload = "|".join(f"{a}\x00{b}" for a, b in merges)
    return hashlib.md5(payload.encode()).hexdigest()


def bpe_merges_frame(
    spark,
    merges: list[tuple[str, str]],
    baseline_pieces_per_word: float | None = None,
):
    """The trained merge table as a SELF-DESCRIBING store frame:
    one ``(rank, left, right)`` row per merge, with the fingerprint
    and the training-time :func:`bpe_pieces_per_word` baseline riding
    ``rank``-column metadata into the parquet footer (the
    ``recorded_centroids`` convention on the tokenizer axis).
    Persist per retrain with :func:`~mydatasyncer_spark.operators.
    maintenance.write_model_store` (the ``_SUCCESS``-gated staged
    swap — a crash mid-retrain leaves the old table serving, never a
    half-deleted path) — write-once, never append-maintained, so no
    compaction wrapper exists or is needed.
    A later session resolves merges AND the drift baseline with
    :func:`recorded_merges` and needs no tokenizer config — and the
    merges/baseline pairing can never mismatch, because both ride
    the same footer."""
    meta: dict = {_BPE_FP_KEY: merges_fingerprint(merges)}
    if baseline_pieces_per_word is not None:
        meta[_BPE_BASE_KEY] = float(baseline_pieces_per_word)
    # pandas/Arrow build for the same reason as quality_model_frame
    # (classify.py): a list-built frame pays a Python-worker job on
    # every resolve collect; the Arrow frame collects driver-side.
    # (An empty frame keeps the explicit-schema path: Arrow cannot
    # infer string columns from zero rows.)
    if not merges:
        return spark.createDataFrame(
            [], "rank int, left string, right string"
        ).select(
            F.col("rank").alias("rank", metadata=meta), "left", "right"
        )
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "rank": pd.Series(range(len(merges)), dtype="int32"),
            "left": pd.Series([a for a, _ in merges], dtype="object"),
            "right": pd.Series([b for _, b in merges], dtype="object"),
        }
    )
    return spark.createDataFrame(pdf).select(
        F.col("rank").alias("rank", metadata=meta), "left", "right"
    )


def recorded_merges(
    store,
) -> tuple[list[tuple[str, str]], float | None]:
    """Resolve ``(merges, baseline_pieces_per_word)`` from a
    :func:`bpe_merges_frame` store — resolve-and-REFUSE: stripped
    provenance, non-contiguous ranks (mixed appends from different
    training runs), or rows that no longer match their own recorded
    fingerprint raise instead of encoding under a silently-wrong
    table (rank is merge priority — one foreign row reorders
    everything after it)."""
    for c in ("rank", "left", "right"):
        if c not in store.columns:
            raise ValueError(
                "recorded_merges: not a BPE merge store — expected "
                "(rank, left, right) columns"
            )
    meta = store.schema["rank"].metadata
    fp = meta.get(_BPE_FP_KEY)
    if fp is None:
        raise ValueError(
            "recorded_merges: the store records no fingerprint — "
            "encoding under a merge table of unknown origin is "
            "silently wrong; rewrite it with bpe_merges_frame"
        )
    rows = store.select("rank", "left", "right").collect()
    ranks = sorted(int(r["rank"]) for r in rows)
    if ranks != list(range(len(rows))):
        raise ValueError(
            "recorded_merges: the store's ranks do not form exactly "
            "0..n_merges-1 — mixed appends from different training "
            "runs; rewrite it with bpe_merges_frame"
        )
    by_rank = {int(r["rank"]): (r["left"], r["right"]) for r in rows}
    merges = [by_rank[i] for i in range(len(rows))]
    if merges_fingerprint(merges) != fp:
        raise ValueError(
            "recorded_merges: the store's rows do not match their "
            "own recorded fingerprint — the store mixes rows from "
            "different training runs; rewrite it with "
            "bpe_merges_frame"
        )
    base = meta.get(_BPE_BASE_KEY)
    return merges, (float(base) if base is not None else None)


def _encode_word(
    word: str, ranks: dict[tuple[str, str], int]
) -> list[str]:
    """The published greedy merge application: repeatedly apply the
    LOWEST-RANK applicable merge until none applies."""
    pieces = [*word, WORD_END]
    while len(pieces) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(pieces, pieces[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        pieces[best_i : best_i + 2] = [
            pieces[best_i] + pieces[best_i + 1]
        ]
    return pieces


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "subwords",
) -> DataFrame:
    """``df`` + an ``array<string>`` column of subword tokens.

    Arrow-batched ``pandas_udf`` with a per-batch word memo: the
    iterative merge rewrite runs once per DISTINCT word per batch
    (Zipf does the rest). The merge table is a closure constant —
    ``n_merges`` pairs, broadcast-sized."""
    from pyspark.sql.functions import pandas_udf

    ranks = {tuple(p): i for i, p in enumerate(merges)}
    # the SAME tokenization as tokens()/bpe_train — the three must
    # never drift apart or counts stop matching training
    token_re = TOKEN_SPLIT_RE

    @pandas_udf("array<string>")
    def _encode(texts: pd.Series) -> pd.Series:
        import re

        memo: dict[str, list[str]] = {}
        splitter = re.compile(token_re)

        def enc(text):
            if text is None:
                return []
            out = []
            for w in splitter.split(text.lower()):
                if not w:
                    continue
                got = memo.get(w)
                if got is None:
                    got = _encode_word(w, ranks)
                    memo[w] = got
                out.extend(got)
            return out

        return texts.map(enc)

    return df.withColumn(out_col, _encode(F.col(text_col)))


def bpe_token_count(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    count_col: str = "n_subwords",
) -> DataFrame:
    """``df`` + the trained-tokenizer token count — the number
    sequence packing and mixture weighting should bill with (the
    regex ``token_count`` systematically undercounts rare/long
    words, which is exactly where subword explosion happens)."""
    out = bpe_encode(df, merges, text_col, "_subwords")
    return out.withColumn(
        count_col, F.size(F.col("_subwords"))
    ).drop("_subwords")


def bpe_drift_report(
    df: DataFrame,
    merges: list[tuple[str, str]],
    baseline_pieces_per_word: float,
    text_col: str = "text",
) -> dict:
    """The merge table's member of the decision-signal family
    (jaccard → order, IVF → centroids, PQ → codebooks, classifier →
    weights, this → MERGES): how well the frozen merges still
    compress today's corpus.

    Drift mechanics: merges are learned from the training corpus's
    pair statistics; a drifted corpus (new domain, new language mix,
    new jargon) matches fewer merges per word, so encodings fall
    back toward characters — token counts inflate, packing bins
    hold fewer documents, and per-token cost accounting skews.
    Reported, from one encode pass (the same memoized Arrow path as
    :func:`bpe_encode`):

    - ``pieces_per_word`` vs the ``baseline_pieces_per_word``
      recorded at training time (``words``-weighted mean of subword
      pieces per word) and their ``compression_ratio`` — > ~1.2
      sustained means the vocabulary has moved: retrain via
      :func:`bpe_train` on current data and re-baseline.
    - ``char_fallback_fraction`` — the share of word occurrences
      whose end-of-word marker never merged into a learned suffix
      piece (a bare ``</w>`` in the encoding): trained words almost
      always end in a merged suffix, so this is the off-vocabulary
      leading indicator, rising before the mean does.
    - ``words`` — the denominator, so callers can gate on sample
      size (a report over a handful of words is noise, and an EMPTY
      frame REFUSES — the family convention)."""
    out = bpe_encode(df, merges, text_col, "_subwords")
    # per-document word and piece counts in one pass: words = number
    # of WORD_END markers, char-fallback words = maximal runs of
    # single-char pieces ending in a bare WORD_END. Counting rides
    # the encoded array (JVM-side), not a second Python pass.
    stats = out.select(
        F.size(
            F.filter(
                F.col("_subwords"),
                lambda p: p.endswith(WORD_END) | (p == WORD_END),
            )
        ).alias("_words"),
        F.size(F.col("_subwords")).alias("_pieces"),
        # a word whose marker never merged contributes a bare "</w>"
        # piece — the no-learned-suffix indicator
        F.size(
            F.filter(F.col("_subwords"), lambda p: p == WORD_END)
        ).alias("_bare"),
    ).agg(
        F.coalesce(F.sum("_words"), F.lit(0)).alias("w"),
        F.coalesce(F.sum("_pieces"), F.lit(0)).alias("p"),
        F.coalesce(F.sum("_bare"), F.lit(0)).alias("b"),
    ).collect()[0]
    words, pieces, bare = int(stats["w"]), int(stats["p"]), int(stats["b"])
    if words == 0:
        raise ValueError(
            "bpe_drift_report: the frame has no tokens — compression "
            "of nothing is not a signal"
        )
    ppw = pieces / words
    return {
        "words": words,
        "pieces_per_word": ppw,
        "baseline_pieces_per_word": float(baseline_pieces_per_word),
        "compression_ratio": ppw / float(baseline_pieces_per_word),
        "char_fallback_fraction": bare / words,
    }


def bpe_drift_from_store(
    df: DataFrame,
    store,
    text_col: str = "text",
) -> dict:
    """:func:`bpe_drift_report` resolved entirely from a
    :func:`bpe_merges_frame` store — merges AND the training-time
    pieces-per-word baseline come from the store's own footer (the
    configless-drift path); a store persisted without a baseline
    REFUSES rather than accepting a hand-guessed one."""
    merges, baseline = recorded_merges(store)
    if baseline is None:
        raise ValueError(
            "bpe_drift_from_store: the store records no "
            "pieces-per-word baseline — persist one "
            "(bpe_merges_frame(..., baseline_pieces_per_word="
            "bpe_pieces_per_word(train_df, merges))) or call "
            "bpe_drift_report with an explicit baseline"
        )
    return bpe_drift_report(df, merges, baseline, text_col)


def bpe_pieces_per_word(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> float:
    """The training-time baseline :func:`bpe_drift_report` compares
    against — persist it next to the merge table."""
    out = bpe_encode(df, merges, text_col, "_subwords")
    row = out.select(
        F.size(
            F.filter(
                F.col("_subwords"),
                lambda p: p.endswith(WORD_END) | (p == WORD_END),
            )
        ).alias("_words"),
        F.size(F.col("_subwords")).alias("_pieces"),
    ).agg(
        F.coalesce(F.sum("_words"), F.lit(0)).alias("w"),
        F.coalesce(F.sum("_pieces"), F.lit(0)).alias("p"),
    ).collect()[0]
    words = int(row["w"])
    if words == 0:
        raise ValueError(
            "bpe_pieces_per_word: the frame has no tokens"
        )
    return int(row["p"]) / words
