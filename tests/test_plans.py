"""Physical-plan regression tests: the optimizations the engine
depends on at scale (pushdown, pruning, broadcast joins, no
pair-space blow-ups) must stay visible in the plans, not just hold by
accident on today's fixture sizes."""

from __future__ import annotations

import contextlib
import io

import __spark_entry__ as entry_mod


def plan_of(spark, sf_dir: str, name: str) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        entry_mod.queries()[name](spark, sf_dir).explain("formatted")
    return buf.getvalue()


def test_q1_pushes_filter_and_prunes_columns(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    # projection pruning: the 16-column lineitem scan must read only
    # the 7 columns the query touches
    read_schema = next(
        line for line in plan.splitlines() if "ReadSchema" in line
    )
    assert "l_comment" not in read_schema
    assert "l_partkey" not in read_schema


def test_q3_broadcasts_dimensions(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q3_top_orders")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_q5_all_joins_broadcast_at_fixture_scale(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q5_region_revenue")
    assert plan.count("BroadcastHashJoin") >= 5
    assert "SortMergeJoin" not in plan


def test_diff_legs_are_anti_joins_with_pruned_probe(spark, sf_dir):
    ins = plan_of(spark, sf_dir, "diff_insert")
    assert "LeftAnti" in ins
    dele = plan_of(spark, sf_dir, "diff_delete")
    assert "LeftAnti" in dele


def test_asof_join_has_no_pair_blowup(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "asof_purchase_view")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the whole operator is one union + one window pass
    assert "Window" in plan


def test_minhash_band_join_is_equi_join(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "dedup_minhash_lsh")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q6_pushes_all_predicates(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q6_forecast_revenue")
    pushed = next(line for line in plan.splitlines() if "PushedFilters" in line)
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, pushed


def test_ivf_join_is_bucket_equi_join(spark, sf_dir):
    """IVF probe joins on the bucket key — never a cross product —
    and the small query side is broadcast."""
    plan = plan_of(spark, sf_dir, "ann_ivf_topk")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_q4_exists_is_semi_join_no_blowup(spark, sf_dir):
    """Q4's EXISTS rides the equi hash join as a left semi — the
    non-equi date predicate must stay a residual, never a loop join."""
    plan = plan_of(spark, sf_dir, "q4_order_priority")
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q16_exclusion_list_broadcast_anti(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q16_supplier_variety")
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_range_join_keys_on_user_never_cross(spark, sf_dir):
    """The banded range join must key on user_id (equi) with the time
    band as residual — a cross product here would be quadratic in the
    event count at scale."""
    plan = plan_of(spark, sf_dir, "range_join_view_purchase")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_split_and_sample_are_narrow(spark, sf_dir):
    """Split assignment and stratified sampling are pure projections/
    filters — any Exchange means the hash-bucket design regressed."""
    for name in ("train_test_split_assign", "stratified_sample_docs"):
        plan = plan_of(spark, sf_dir, name)
        assert "Exchange" not in plan, name


def test_contamination_benchmark_side_broadcast(spark, sf_dir):
    """The r15 Expand split pins the hits frame, which truncates the
    explainable lineage of the final plan — the broadcast-join shape
    is asserted on the un-pinned hits subtree, and the final plan
    must have lost its multi-DISTINCT Expand (the r15 rewrite's
    point) without growing a cartesian pair space."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        entry_mod._contamination_hits(spark, sf_dir, pin=False).explain(
            "formatted"
        )
    hits_plan = buf.getvalue()
    assert "BroadcastHashJoin" in hits_plan
    assert "CartesianProduct" not in hits_plan
    plan = plan_of(spark, sf_dir, "contamination_check")
    assert "Expand" not in plan
    assert "CartesianProduct" not in plan


def test_minhash_verify_has_no_signature_rejoin(spark, sf_dir):
    """The band join carries signatures inline; the only join in the
    plan is the single band self-join (no join-back of the signature
    table, which would add two corpus-sized exchanges at scale).
    eager=False skips the localCheckpoint that otherwise truncates
    the explainable lineage."""
    import contextlib
    import io

    from mydatasyncer_spark.contract import table
    from mydatasyncer_spark.operators.dedup import minhash_lsh_pairs

    import re

    docs = table(spark, sf_dir, "documents")
    out = minhash_lsh_pairs(docs, eager=False)
    buf = io.StringIO()
    try:
        with contextlib.redirect_stdout(buf):
            out.explain("formatted")
    finally:
        # eager=False leaves the signature cache alive by design —
        # release it so later tests see an empty CacheManager
        spark.catalog.clearCache()
    plan = buf.getvalue()
    # count tree nodes, not substrings: formatted explain repeats
    # each node name in the per-node details section
    nodes = re.findall(r"^\s*(?:[:+\-* ]*)\((\d+)\)\s+(\w+)", plan, re.M)
    joins = [n for _, n in nodes if "Join" in n]
    assert joins == ["BroadcastHashJoin"] or joins == ["SortMergeJoin"], joins
    assert "CartesianProduct" not in plan


def test_q7_prefilters_nations_before_fact_join(spark, sf_dir):
    """Q7 broadcasts the 2-nation-filtered supplier/customer dims; the
    fact side must never loop-join and the nation filter must not
    degrade into a post-hoc cross pair check."""
    plan = plan_of(spark, sf_dir, "q7_volume_shipping")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q8_semi_joins_and_broadcasts(spark, sf_dir):
    """Q8 reduces part and ASIA-customer checks to semi joins (no
    payload columns dragged through the fact shuffle)."""
    plan = plan_of(spark, sf_dir, "q8_market_share")
    assert "LeftSemi" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q10_pushes_returnflag_filter(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q10_returned_items")
    pushed = [line for line in plan.splitlines() if "PushedFilters" in line]
    assert any("l_returnflag" in line for line in pushed), pushed
    assert "CartesianProduct" not in plan


def test_q14_pushes_shipdate_and_broadcasts_part(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q14_promo_revenue")
    pushed = [line for line in plan.splitlines() if "PushedFilters" in line]
    assert any("l_shipdate" in line for line in pushed), pushed
    assert "BroadcastHashJoin" in plan


def test_q15_single_fact_scan(spark, sf_dir):
    """Q15's max-of-view subquery is a rank window over the aggregated
    per-supplier table — lineitem must be scanned exactly once."""
    import re

    plan = plan_of(spark, sf_dir, "q15_top_supplier")
    # unique tree nodes: one lineitem scan + one supplier scan
    scan_ids = set(re.findall(r"\((\d+)\) Scan parquet", plan))
    assert len(scan_ids) == 2, plan
    assert "Window" in plan


def test_q19_disjunction_stays_one_hash_join(spark, sf_dir):
    """The OR-of-bands predicate must remain a residual filter on one
    broadcast hash join — not expand to a union of scans or a loop
    join."""
    plan = plan_of(spark, sf_dir, "q19_disjunctive_revenue")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sketch_bounds_plan_shape(spark, sf_dir):
    """Spark plans countDistinct + percentile as two aggregation
    subplans joined on the group key (its standard distinct rewrite)
    — pin that it stays at that: dims broadcast, no cartesian, and no
    third pass over orders."""
    plan = plan_of(spark, sf_dir, "sketch_error_bounds")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Scan parquet") <= 4


def test_pruned_diff_summaries_partial_aggregate(spark, sf_dir):
    """The bucket-fingerprint pre-pass must be a map-side partial
    aggregation over a narrow projection — one exchange of n_buckets
    rows per side, never a row-level shuffle of the snapshots."""
    import contextlib
    import io

    from mydatasyncer_spark.contract import snapshot_db, snapshot_file
    from mydatasyncer_spark.operators.diff import (
        bucket_col,
        row_fingerprint,
    )
    from pyspark.sql import functions as F

    f = snapshot_file(spark, sf_dir)
    summary = (
        f.select(
            bucket_col(f, "o_orderkey", 64).alias("_bucket"),
            row_fingerprint(f, f.columns).alias("_fp"),
        )
        .groupBy("_bucket")
        .agg(F.count(F.lit(1)).alias("_n"), F.bit_xor("_fp").alias("_x"))
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        summary.explain("formatted")
    plan = buf.getvalue()
    # partial agg before the exchange, final after it
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_incremental_minhash_no_corpus_self_join(spark, sf_dir):
    """The incremental band join must contain exactly the new-vs-index
    and new-vs-new equi-joins — no corpus-vs-corpus join, no
    cartesian fallback."""
    import contextlib
    import io

    from mydatasyncer_spark.contract import table
    from mydatasyncer_spark.operators.dedup import (
        minhash_lsh_pairs_incremental,
        minhash_signature,
    )
    from pyspark.sql import functions as F

    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.filter(F.col("doc_id") % 5 != 0)
    new = d.filter(F.col("doc_id") % 5 == 0)
    out = minhash_lsh_pairs_incremental(
        new, minhash_signature(corpus), eager=False
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # two equi-joins exactly: vs-index and vs-new (formatted explain
    # mentions each join in the tree AND a numbered detail section, so
    # count only the detail headers)
    import re

    n_joins = len(
        re.findall(
            r"^\(\d+\) (?:SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)",
            plan,
            re.M,
        )
    )
    assert n_joins == 2, plan


def test_large_large_join_is_sort_merge_without_broadcast(spark, sf_dir):
    """The join-strategy spectrum: two fact tables joined with the
    merge hint (or above the broadcast threshold at real scale) must
    plan as a SortMergeJoin — the strategy a 100 TB fact-fact join
    lands on — with no broadcast of either side."""
    import contextlib
    import io

    from mydatasyncer_spark.contract import table

    li = table(spark, sf_dir, "lineitem").hint("merge")
    o = table(spark, sf_dir, "orders")
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "o_orderdate", "l_quantity"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        j.explain("formatted")
    plan = buf.getvalue()
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan


def test_skew_report_is_two_aggregates_no_row_collect(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "skew_report_lineitem")
    assert plan.count("HashAggregate") >= 2  # partial + final per agg
    assert "CartesianProduct" not in plan or "BroadcastNestedLoopJoin" not in plan


def test_mix_resample_is_broadcast_join_only(spark, sf_dir):
    """Weight application must broadcast the tiny weight table and
    never shuffle the corpus — the whole resample is scan + filter."""
    plan = plan_of(spark, sf_dir, "mix_resample_docs")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_token_chunking_is_narrow(spark, sf_dir):
    """Chunk fan-out is a per-row explode — no Exchange anywhere."""
    plan = plan_of(spark, sf_dir, "doc_chunks_tokens")
    assert "Exchange" not in plan
    assert "Generate" in plan  # the explode


def test_zorder_key_is_pure_projection(spark, sf_dir):
    """The Morton key is bit arithmetic fused into the scan: no
    Exchange, no Python eval, no join."""
    plan = plan_of(spark, sf_dir, "zorder_orders_key")
    assert "Exchange" not in plan
    assert "Python" not in plan
    assert "Join" not in plan


def test_multimodal_frames_stays_jvm_side(spark, sf_dir):
    """The fake-codec frame slicing must compile to JVM binary
    substring + posexplode — the payload never crosses to Python."""
    plan = plan_of(spark, sf_dir, "multimodal_frames")
    assert "Python" not in plan
    assert "Generate" in plan  # the posexplode
    assert "Exchange" not in plan


def test_multimodal_features_stays_jvm_side(spark, sf_dir):
    """The JVM codec twin: zero Arrow transfer in the contract path."""
    plan = plan_of(spark, sf_dir, "multimodal_features")
    assert "Python" not in plan


def test_unigram_vocab_join_is_not_force_broadcast(spark, sf_dir):
    """The perplexity vocab join must carry NO broadcast hint: an
    open-vocabulary table over web-scale text is unbounded, and a
    forced hint would remove Spark's shuffle-join fallback (the r4
    scale flaw). With auto-broadcast disabled the join must therefore
    plan as a shuffle join — a BroadcastHashJoin surviving the
    threshold would mean the mandatory hint is back."""
    key = "spark.sql.autoBroadcastJoinThreshold"
    old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try:
        for name in ("unigram_perplexity_docs", "unigram_perplexity_oov"):
            plan = plan_of(spark, sf_dir, name)
            assert "BroadcastHashJoin" not in plan, name
    finally:
        spark.conf.set(key, old)


def test_curriculum_scalable_windows_only_the_preaggregate(spark, sf_dir):
    """The scalable tier path must never sort documents inside a
    per-source window (the r4 scale flaw): its only Window runs over
    the bounded (source, quality) pre-aggregate — so in the plan tree
    every Window sits above a HashAggregate, never directly above a
    scan — and tier assignment is a broadcast join."""
    import re

    plan = plan_of(spark, sf_dir, "curriculum_tiers_scalable")
    assert "BroadcastHashJoin" in plan
    assert "percent_rank" not in plan
    # tree section: after each Window line, a HashAggregate must occur
    # before the first Scan in its (top-down printed) subtree
    tree = plan.split("\n\n")[0].splitlines()
    win_lines = [i for i, ln in enumerate(tree) if re.search(r"\bWindow\b", ln)]
    assert win_lines, plan
    for i in win_lines:
        below = tree[i + 1 :]
        scan_at = next(
            j for j, ln in enumerate(below) if "Scan parquet" in ln
        )
        assert any(
            "HashAggregate" in ln for ln in below[:scan_at]
        ), "Window sits directly on the corpus scan:\n" + plan


def test_salted_join_is_salt_keyed_equi_join(spark, sf_dir):
    """The salted join must stay an equi join whose keys include the
    salt column (that's what scatters a hot key across tasks) — never
    a cross/loop join, and the fan-out explode on the dim side is a
    Generate, not a shuffle multiplier."""
    plan = plan_of(spark, sf_dir, "skew_salted_join")
    assert "_salt" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Generate" in plan  # the dim-side replica explode


def test_scalable_cap_phase1_windows_on_salted_cells(spark, sf_dir):
    """The two-phase per-group cap must show TWO Windows, the first
    partitioned on (group, salt) — no single window ever sorts a
    whole group's corpus in one task."""
    import re

    plan = plan_of(spark, sf_dir, "cap_docs_per_lang_scalable")
    # exact node name: "(n) Window" — NOT WindowGroupLimit, which
    # Spark adds around each as its top-k pushdown (a bonus: phase 1
    # filters to n-per-cell before its exchange even runs)
    wins = len(re.findall(r"^\(\d+\) Window\s*$", plan, re.M))
    assert wins == 2, plan
    assert "_cap_salt" in plan


def test_plain_rank_caps_get_window_group_limit_pushdown(spark, sf_dir):
    """Single-window rank<=k shapes must keep Spark's WindowGroupLimit
    pushdown (map partitions pre-filter to top-k before the group
    exchange) — the native mitigation of the per-group single-task
    sort. If a refactor moves the filter off the window, this
    disappears and the query regresses to whole-group sorts."""
    for name in ("cap_docs_per_lang", "window_topk_customers"):
        plan = plan_of(spark, sf_dir, name)
        assert "WindowGroupLimit" in plan, name


def test_scd2_is_onepass_classification_no_window(spark, sf_dir):
    """SCD2 maintenance is the one-pass classification shape (r14,
    scd2_apply_onepass): exactly ONE full-outer equi-join on the key
    classifies every row, each key exploding into its version rows —
    no window pass, no pair blow-up, and none of the legacy leg-wise
    anti/semi rescans of the snapshots."""
    plan = plan_of(spark, sf_dir, "scd2_orders_history")
    assert "FullOuter" in plan
    assert "Generate" in plan
    assert "LeftAnti" not in plan
    assert "LeftSemi" not in plan
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pack_sequences_prefix_sum_is_chunk_distributed(spark, sf_dir):
    """The packing prefix sum must be the distributed two-level form:
    the per-row running sum partitions on (partition_col, _chunk) —
    never a whole language (or the whole corpus) through one task —
    and the only window without _chunk in its partition spec is the
    one over the bounded per-chunk cell table."""
    import re

    plan = plan_of(spark, sf_dir, "pack_sequences_docs")
    win_heads = [
        m.start() for m in re.finditer(r"^\(\d+\) Window\s*$", plan, re.M)
    ]
    assert len(win_heads) == 2, plan
    # the row-level window (summing the size column) must include the
    # chunk column in its partition spec
    row_win = next(
        seg
        for seg in (plan[p : p + 400] for p in win_heads)
        if "sum(n_chars" in seg
    )
    part_spec = re.search(
        r"windowspecdefinition\(([^)]*)\)", row_win
    ).group(1)
    assert "_chunk" in part_spec, row_win
    # and the cell-table window runs over the bounded aggregate, not
    # raw corpus rows
    cell_win = next(
        seg
        for seg in (plan[p : p + 400] for p in win_heads)
        if "sum(_cell_sum" in seg
    )
    assert "_cell_sum" in cell_win


def test_salted_right_join_stays_equi_with_aggregated_probe(
    spark, sf_dir
):
    """how='right' must keep the salted equi join AND detect
    unmatched dim rows through an aggregated distinct-key probe —
    never a nested-loop join, and the probe side must show a
    HashAggregate (map-side combine is what absorbs the hot key)."""
    plan = plan_of(spark, sf_dir, "skew_salted_join_right")
    assert "_salt" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftAnti" in plan
    assert "HashAggregate" in plan


def test_join_view_maintenance_is_delta_keyed_joins(spark, sf_dir):
    """Join-view IVM must stay anti/semi/equi joins keyed on the join
    key — no window, no pair blow-up; the affected-key legs visible
    as LeftAnti + LeftSemi."""
    plan = plan_of(spark, sf_dir, "ivm_join_view_orders")
    assert "LeftAnti" in plan
    assert "LeftSemi" in plan
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_jaccard_join_exact_is_equi_not_cartesian(spark, sf_dir):
    """The prefix-filter candidate stage must be an EQUI join on the
    prefix token (tiny rare-token buckets), never a cross/nested-loop
    product — that is the entire scale claim of the SSJoin family."""
    plan = plan_of(spark, sf_dir, "dedup_jaccard_join_exact")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # across-prefix pair dedup is the final aggregate
    assert "HashAggregate" in plan


def test_left_join_view_repair_is_null_safe(spark, sf_dir):
    """The left-view repair legs must join null-safely — Catalyst
    rewrites a <=> equi join into (coalesce(k, 0), isnull(k)) join
    keys, so the isnull key marker must appear on the join-key
    column (a plain '=' would strand NULL-key rows)."""
    plan = plan_of(spark, sf_dir, "ivm_join_view_left")
    assert "LeftAnti" in plan
    assert "LeftSemi" in plan
    assert "isnull(o_custkey" in plan
    assert "CartesianProduct" not in plan


def test_incremental_jaccard_and_containment_stay_equi(spark, sf_dir):
    """Both r7 similarity joins must candidate via EQUI joins (prefix
    tokens / inverted index) — never a cross product."""
    for name in ("dedup_jaccard_incremental", "dedup_containment_join"):
        plan = plan_of(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_scd2_asof_join_is_equi_with_residual(spark, sf_dir):
    """The point-in-time lookup must ride the key equi join with the
    effectivity range as a residual — no range-join blow-up, no
    window."""
    plan = plan_of(spark, sf_dir, "scd2_asof_join_lineitem")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" not in plan


def _tree_nodes(plan: str):
    """Parse the tree section of a formatted explain into
    ``[(depth, name, id)]`` rows (id None for unnumbered nodes)."""
    import re

    nodes = []
    for line in plan.splitlines():
        m = re.match(
            r"^([ :+|-]*)([A-Za-z][\w .]*?)(?:\s+\((\d+)\))?\s*$", line
        )
        if not m:
            continue
        prefix, name, nid = m.groups()
        nodes.append((len(prefix), name.strip(), nid))
    return nodes


def _scan_chains(plan: str, scan_name: str):
    """For every tree node whose name starts with ``scan_name``,
    return the list of ancestor names from the scan (exclusive) up
    the tree to the root."""
    nodes = _tree_nodes(plan)
    chains = []
    for i, (depth, name, _) in enumerate(nodes):
        if not name.startswith(scan_name):
            continue
        chain, d = [], depth
        for j in range(i - 1, -1, -1):
            pdepth, pname, _ = nodes[j]
            if pdepth < d:
                chain.append(pname)
                d = pdepth
        chains.append(chain)
    return chains


def test_ordered_incremental_jaccard_corpus_side_is_scan_only(
    spark, tmp_path
):
    """VERDICT r7 #1: with a stored-order index the per-ingest plan
    must contain NO corpus-wide Exchange/Aggregate/Sort — every
    stored-table (parquet) scan flows through narrow Filter/Project/
    Generate nodes straight into a join; all exchanges sit above
    joins, i.e. on batch- or candidate-sized data. The legacy path
    (re-ordering the corpus per ingest) must FAIL this pin, proving
    it distinguishes."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from mydatasyncer_spark.operators.dedup import (
        jaccard_join_incremental,
        jaccard_ordered_index,
        jaccard_prefix_index,
        jaccard_token_order,
    )

    corpus = spark.createDataFrame(
        [(i, f"tok{i} tok{i + 1} tok{i + 2} common") for i in range(0, 40, 2)],
        "doc_id long, text string",
    )
    idx = jaccard_prefix_index(corpus)
    order = jaccard_token_order(idx)
    jaccard_ordered_index(idx, token_order=order).write.parquet(
        str(tmp_path / "idx")
    )
    order.write.parquet(str(tmp_path / "order"))
    sidx = spark.read.parquet(str(tmp_path / "idx"))
    sorder = spark.read.parquet(str(tmp_path / "order"))
    batch = spark.createDataFrame(
        [(i, f"tok{i} tok{i + 1} tok{i + 2} common") for i in range(1, 11, 2)],
        "doc_id long, text string",
    )

    def fmt(df) -> str:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    plan = fmt(
        jaccard_join_incremental(
            batch, sidx, threshold=0.8,
            token_order=sorder, corpus_ordered=True,
        )
    )
    chains = _scan_chains(plan, "Scan parquet")
    # the stored index is read for candidates AND verification, the
    # stored order once => at least 3 parquet scans
    assert len(chains) >= 3, plan
    for chain in chains:
        upto_join = []
        for name in chain:
            if "Join" in name:
                break
            upto_join.append(name)
        else:
            raise AssertionError(f"no join above a stored scan: {chain}")
        bad = [
            n
            for n in upto_join
            if "Exchange" in n or "Aggregate" in n or "Sort" in n
        ]
        assert not bad, (bad, chain)
    # contrast: the legacy path re-aggregates the corpus below any
    # join (ObjectHashAggregate building ordered arrays) — the pin
    # must catch exactly that
    legacy = fmt(jaccard_join_incremental(batch, sidx, threshold=0.8))
    legacy_chains = _scan_chains(legacy, "Scan parquet")
    assert any(
        any("Aggregate" in n or "Exchange" in n for n in c[: _first_join(c)])
        for c in legacy_chains
    ), "legacy path unexpectedly scan-only — pin would be vacuous"


def _first_join(chain):
    for i, name in enumerate(chain):
        if "Join" in name:
            return i
    return len(chain)


def test_containment_probe_mode_semi_prefilters_index(spark, sf_dir):
    """VERDICT r7 #3: in probe-vs-corpus mode the corpus inverted
    index must be semi-joined by the broadcast probe prefix tokens
    BEFORE the candidate join — the semi join sits between the
    corpus scan and the candidate join in the plan."""
    plan = plan_of(spark, sf_dir, "dedup_containment_probe")
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_containment_inv_store_path_is_bucket_keyed(spark, sf_dir):
    """r9: with a bucketed inverted store the candidate join keys on
    (bucket, token) and verification prunes the index to candidate
    ids — no cartesian, no nested loop; the bucket column appears as
    a join key (the gate query builds the store inline; the
    DPP-over-parquet pin lives in
    test_m4_operators.TestContainmentInvertedStore)."""
    plan = plan_of(spark, sf_dir, "dedup_containment_inv")
    assert "_tok_bucket" in plan
    assert "LeftSemi" in plan  # verify-side candidate-id prune
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semantic_dedup_pair_space_is_cluster_bounded(spark, sf_dir):
    """r9 SemDeDup: the within-cluster cosine self-join must be an
    equi join on (cluster, salt) — never a cross-cluster or
    all-pairs product."""
    plan = plan_of(spark, sf_dir, "dedup_semantic")
    assert "_sem_cluster" in plan
    assert "salt" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semantic_dedup_probe2_still_cluster_bounded(spark, sf_dir):
    """r10 probe-2 recall knob: doubling assignments must not change
    the join SHAPE — still an equi join on (cluster, salt), never a
    product; pair space ≤ 2× probe-1, enforced by the same keys."""
    plan = plan_of(spark, sf_dir, "dedup_semantic_p2")
    assert "_sem_cluster" in plan
    assert "salt" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pq_adc_corpus_side_streams_codes_not_vectors(spark, sf_dir):
    """r10 IVF-PQ: the ADC gate query's corpus side must stream only
    (id, codes, norm) into the pair space — the embedding column may
    be read once to ENCODE, but the scored join must not carry it
    (the ~60x byte win is the point); the probe side is the
    broadcast."""
    plan = plan_of(spark, sf_dir, "ann_pq_topk")
    # the probe side is the broadcast build (brute ADC is the
    # compressed twin of cosine_topk's broadcast cross join)
    assert "BroadcastNestedLoopJoin Cross BuildLeft" in plan
    # the corpus side enters the join as (neighbor_id, codes, cn) —
    # some Project block must emit codes+cn WITHOUT the raw vector
    blocks = plan.split("\n\n")
    assert any(
        "Project" in b
        and "codes#" in b
        and "cn#" in b
        and "embedding" not in b
        for b in blocks
    ), plan
    assert "adc_cosine" in plan


def test_pq_refined_is_bucket_equi_then_candidate_joins(spark, sf_dir):
    """r10 IVF-PQ refined: stage 1 joins on the coarse bucket (equi,
    never an all-pairs product), stage 3's exact re-rank joins by
    candidate id — the true-vector corpus is touched per candidate,
    not per pair."""
    plan = plan_of(spark, sf_dir, "ann_pq_refined")
    assert "bucket" in plan
    assert "CartesianProduct" not in plan
    # ADC stage + exact stage both present
    assert "adc_cosine" in plan
    assert "cosine" in plan


def test_quality_model_score_is_shuffle_free(spark, sf_dir):
    """r10 model-based quality scoring: the gate query's whole plan
    must contain NO Exchange — scoring a corpus is a narrow
    projection through broadcast weight literals, which is the
    entire 100 TB claim (a scoring sweep runs at scan speed)."""
    plan = plan_of(spark, sf_dir, "quality_model_score")
    assert "Exchange" not in plan
    assert "model_quality" in plan


def test_scored_curation_adds_zero_shuffles(spark, sf_dir):
    """r11 model-ON curation twin: the stage-2 model gate is a narrow
    filter (CurationConfig's docstring claim), so the scored pipeline
    must plan NO MORE Exchanges than the unscored one — turning the
    trained gate on costs scan-side work only. (Strictly fewer is
    possible and fine: the gate shrinks the surviving corpus, which
    can flip a downstream join to broadcast.)"""
    base = plan_of(spark, sf_dir, "curation_pipeline")
    scored = plan_of(spark, sf_dir, "curation_pipeline_scored")
    assert scored.count("Exchange") <= base.count("Exchange")
    assert "model_quality" in scored


def test_stored_weights_scoring_is_shuffle_free(spark, sf_dir):
    """The store-resolved scoring path keeps the no-Exchange plan —
    resolving weights from the footer happens at plan time, not as a
    join against the store frame."""
    plan = plan_of(spark, sf_dir, "quality_model_score_stored")
    assert "Exchange" not in plan
    assert "model_quality" in plan
