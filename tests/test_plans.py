"""Plan-shape regression tests: the scale-critical physical properties
(SURVEY.md §4) must survive refactors. These assert on .explain output,
so a change that silently de-optimizes a plan fails here."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cyborgdb_encrypted_vector_search_spark.plans import explain as X
from cyborgdb_encrypted_vector_search_spark.plans.catalog import entries
from cyborgdb_encrypted_vector_search_spark.sources.registry import load


@pytest.fixture(scope="module")
def cat():
    return entries()


def test_flagship_is_topk_with_broadcast_target(spark, sf_dir, cat):
    df = cat["knn_topk_cosine"].fn(spark, sf_dir)
    X.assert_in_plan(df, "TakeOrderedAndProject", "BroadcastNestedLoopJoin")
    # no wide exchange: corpus side never shuffles
    X.assert_not_in_plan(df, "SortMergeJoin")


def test_batch_knn_rank_limit_is_partial(spark, sf_dir, cat):
    df = cat["knn_batch_topk"].fn(spark, sf_dir)
    plan = X.physical_plan(df)
    partial = plan.index("Partial")
    assert "WindowGroupLimit" in plan
    # partial window-group-limit must appear below (after, in tree print
    # order) the exchange — per-partition top-k before the shuffle
    assert "Exchange" in plan[: plan.rindex("WindowGroupLimit")]
    assert partial > 0


def test_point_get_pushes_filter_to_scan(spark, sf_dir):
    emb = load(spark, "embeddings", sf_dir)
    df = emb.filter(F.col("vec_id") == 42).select("vec_id")
    plan = X.physical_plan(df)
    assert "PushedFilters: [IsNotNull(vec_id), EqualTo(vec_id,42)]" in plan


def test_column_pruning_reaches_scan(spark, sf_dir):
    li = load(spark, "lineitem", sf_dir)
    df = li.groupBy("l_returnflag").count()
    cols = X.scan_columns(df)
    assert cols == ["l_returnflag"]  # 1 of 11 columns read


def test_dim_joins_broadcast(spark, sf_dir, cat):
    df = cat["q5_nation_revenue"].fn(spark, sf_dir)
    plan = X.physical_plan(df)
    assert plan.count("BroadcastHashJoin") >= 3  # customer, nation, region


def test_global_topk_never_full_sorts(spark, sf_dir, cat):
    df = cat["q3_top_unshipped_orders"].fn(spark, sf_dir)
    X.assert_in_plan(df, "TakeOrderedAndProject")


def test_filter_evaluates_before_join(spark, sf_dir):
    # selective dim filter must sit under the join, not above it
    c = load(spark, "customer", sf_dir).filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, "orders", sf_dir)
    df = o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"]).select("o_orderkey")
    plan = X.physical_plan(df)
    assert "PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)" in plan


def test_q6_predicates_push_to_scan(spark, sf_dir, cat):
    plan = X.physical_plan(cat["q6_forecast_revenue"].fn(spark, sf_dir))
    # all three range predicates reach the parquet reader
    assert "PushedFilters" in plan
    for frag in ("l_shipdate", "l_discount", "l_quantity"):
        pushed = plan[plan.index("PushedFilters") :].splitlines()[0]
        assert frag in pushed, f"{frag} not pushed: {pushed}"


def test_q18_semi_join_broadcasts(spark, sf_dir, cat):
    plan = X.physical_plan(cat["q18_large_orders"].fn(spark, sf_dir))
    assert "LeftSemi" in plan
    assert "BroadcastHashJoin" in plan


def test_q10_topk_is_take_ordered(spark, sf_dir, cat):
    X.assert_in_plan(
        cat["q10_returned_items"].fn(spark, sf_dir), "TakeOrderedAndProject"
    )


def test_stratified_sample_uses_window_group_limit(spark, sf_dir, cat):
    plan = X.physical_plan(cat["q_sample_stratified"].fn(spark, sf_dir))
    assert "WindowGroupLimit" in plan


def test_q22_anti_join_in_plan(spark, sf_dir, cat):
    plan = X.physical_plan(cat["q22_idle_rich_customers"].fn(spark, sf_dir))
    assert "LeftAnti" in plan


def test_q7_nation_pair_filter_above_broadcast_joins(spark, sf_dir, cat):
    plan = X.physical_plan(cat["q7_nation_volume"].fn(spark, sf_dir))
    # four dimension legs broadcast; only lineitem⋈orders may shuffle
    assert plan.count("BroadcastHashJoin") >= 4


def test_q2_only_shuffles_cost_aggregate(spark, sf_dir, cat):
    plan = X.physical_plan(cat["q2_min_cost_supplier"].fn(spark, sf_dir))
    # all dim legs + the per-part min frame broadcast; no sort-merge join
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 5
    X.assert_in_plan(
        cat["q2_min_cost_supplier"].fn(spark, sf_dir), "TakeOrderedAndProject"
    )


def test_q20_semi_join_and_pushed_dates(spark, sf_dir, cat):
    plan = X.physical_plan(cat["q20_heavy_shippers"].fn(spark, sf_dir))
    assert "LeftSemi" in plan
    assert "PushedFilters" in plan and "l_shipdate" in plan


def test_grouping_sets_single_expand_one_shuffle(spark, sf_dir, cat):
    plan = X.physical_plan(cat["q_grouping_sets_orders"].fn(spark, sf_dir))
    # three grouping sets = one Expand feeding one agg, not three scans
    assert plan.count("Expand") >= 1
    assert plan.count("Scan parquet") == 1


def test_incremental_dedup_broadcasts_batch_side(spark, sf_dir, cat):
    plan = X.physical_plan(cat["dedup_incremental_minhash"].fn(spark, sf_dir))
    # corpus signatures never shuffle: the batch side is broadcast
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_runtime_bloom_filter_prunes_smj_probe_side(spark, sf_dir):
    # At cluster scale, big-big joins run as SMJ and Spark's runtime
    # bloom filter (InjectRuntimeFilter) builds a bloom from the
    # selective build side and prunes the probe side MAP-SIDE, before
    # the shuffle. Local data is below the default creation thresholds,
    # so pin the behavior by widening them — the plan shape is the one
    # a 100 TB join gets with stock confs.
    tuned = {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    saved = {k: spark.conf.get(k, None) for k in tuned}
    try:
        for k, v in tuned.items():
            spark.conf.set(k, v)
        li = load(spark, "lineitem", sf_dir)
        orders = load(spark, "orders", sf_dir).filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        joined = (
            li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        X.assert_in_plan(joined, "might_contain", "bloom_filter_agg", "SortMergeJoin")
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_curation_pipeline_windows_dedup_and_broadcasts_losers(
    spark, sf_dir, cat
):
    plan = X.physical_plan(cat["pipeline_corpus_curation"].fn(spark, sf_dir))
    # exact dedup is a rank-1 window with map-side group limit,
    # not groupBy-min + join-back
    assert "WindowGroupLimit" in plan
    # every join has a broadcastable side (loser ids, band candidates)
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_decontaminate_broadcasts_benchmark_shingles(spark, sf_dir, cat):
    plan = X.physical_plan(cat["text_decontaminate"].fn(spark, sf_dir))
    # the benchmark shingle set is the small side everywhere: the
    # corpus never shuffles on content
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_batch_ann_serving_plans_broadcast_probes(spark, sf_dir, cat):
    """The batch ANN serving paths must keep the corpus un-shuffled:
    probe lists broadcast onto the index (one BroadcastHashJoin), the
    only hash exchanges carry per-query window partials, and no
    SortMergeJoin appears anywhere in the serving plan."""
    for name in ("ann_lsh_batch_topk", "ann_ivf_batch_topk"):
        plan = X.physical_plan(cat[name].fn(spark, sf_dir))
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, name
        assert "WindowGroupLimit" in plan, name


def test_sketch_gate_predicates_recomputed_from_raw_frame(spark, sf_dir):
    """The q_approx_sketches booleans must equal the tolerance
    predicates recomputed in Python from the raw sketch-vs-exact frame
    — so a trivially-true Spark-side expression can't hide behind the
    oracle's own independently-computed booleans."""
    from cyborgdb_encrypted_vector_search_spark.plans import catalog as C

    raw = {
        r["event_type"]: r
        for r in C.sketch_accuracy_frame(spark, sf_dir).collect()
    }
    gate = {
        r["event_type"]: r
        for r in C.q_approx_sketches(spark, sf_dir).collect()
    }
    assert set(raw) == set(gate) and raw
    for et, r in raw.items():
        want_hll = abs(r["hll_users"] - r["n_users"]) <= 0.15 * r["n_users"]
        want_p50 = r["p40_exact"] <= r["p50_approx"] <= r["p60_exact"]
        assert gate[et]["hll_ok"] == want_hll, et
        assert gate[et]["p50_ok"] == want_p50, et
        # and the sketches genuinely meet the contract on testdata
        assert want_hll and want_p50, et


def test_ivf_layout_scan_prunes_to_probed_partitions(spark, sf_dir, cat):
    """The materialized IVF layout must behave as an inverted file: the
    probe's centroid IN-filter appears as a PartitionFilter on the
    parquet scan (pruned before any file IO) listing exactly the
    nprobe=2 probed lists, while the layout on disk holds all 8."""
    import glob
    import hashlib
    import os
    import re
    import tempfile

    plan = X.physical_plan(cat["ann_ivf_layout_search"].fn(spark, sf_dir))
    m = re.search(
        r"PartitionFilters: \[[^\]]*centroid_id[^\]]*?IN \(([^)]*)\)", plan
    )
    assert m, plan
    assert len(m.group(1).split(",")) == 2
    # recompute the artifact tag the same way the gate does (content
    # checksum included since r4 — the bare-sf_dir tag is stale)
    from cyborgdb_encrypted_vector_search_spark.plans.catalog import (
        _content_tag,
    )

    ctag = _content_tag(spark, sf_dir, "embeddings", "vec_id")
    tag = hashlib.md5(f"{sf_dir}:{ctag}".encode()).hexdigest()[:10]
    layout = os.path.join(tempfile.gettempdir(), f"ivf_layout_{tag}")
    n_parts = len(glob.glob(os.path.join(layout, "centroid_id=*")))
    assert n_parts == 8


def test_time_partitioned_scan_prunes_to_window(spark, sf_dir, cat):
    """The date-partitioned events layout must prune: the 3-day window
    appears as a PartitionFilter on event_date (directories outside the
    window are never read), while the layout on disk holds ~30 daily
    partitions."""
    import glob
    import hashlib
    import os
    import re
    import tempfile

    from cyborgdb_encrypted_vector_search_spark.plans.catalog import (
        _content_tag,
    )

    plan = X.physical_plan(cat["q_time_partitioned_events"].fn(spark, sf_dir))
    assert re.search(r"PartitionFilters: \[[^\]]*event_date[^\]]*\]", plan), plan
    ctag = _content_tag(spark, sf_dir, "events", "event_id")
    tag = hashlib.md5(f"{sf_dir}:tpart_v1:{ctag}".encode()).hexdigest()[:10]
    path = os.path.join(tempfile.gettempdir(), f"events_bydate_{tag}")
    n_parts = len(glob.glob(os.path.join(path, "event_date=*")))
    assert n_parts >= 28  # ~one directory per January day


def test_zorder_layout_files_skip_outside_box(spark, sf_dir, cat):
    """The Z-ordered lineitem copy must make BOTH box predicates
    effective data skipping: each file's footer min/max over (ship_day,
    l_partkey) covers a tight rectangle, so most files' stats ranges
    don't intersect the gate's query box at all — the parquet reader
    rejects them without decoding a page. Pinned from the footers
    directly (the same stats the reader consults)."""
    import datetime
    import glob
    import hashlib
    import os
    import tempfile

    import pyarrow.parquet as pq

    from cyborgdb_encrypted_vector_search_spark.plans.catalog import (
        _content_tag,
    )

    df = cat["q_zorder_pruned_scan"].fn(spark, sf_dir)
    df.collect()  # builds the layout on first run
    plan = X.physical_plan(df)
    assert "PushedFilters" in plan and "ship_day" in plan, plan

    ctag = _content_tag(spark, sf_dir, "lineitem", "l_orderkey")
    tag = hashlib.md5(f"{sf_dir}:zorder_v1:{ctag}".encode()).hexdigest()[:10]
    path = os.path.join(tempfile.gettempdir(), f"lineitem_zorder_{tag}")
    files = glob.glob(os.path.join(path, "*.parquet"))
    assert len(files) >= 16

    epoch = datetime.date(1970, 1, 1)
    x_lo = (datetime.date(1994, 1, 1) - epoch).days
    x_hi = (datetime.date(1994, 3, 31) - epoch).days
    y_lo, y_hi = 100, 600

    def ranges(md, col):
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                if c.path_in_schema == col:
                    mins.append(c.statistics.min)
                    maxs.append(c.statistics.max)
        return min(mins), max(maxs)

    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        xmn, xmx = ranges(md, "ship_day")
        ymn, ymx = ranges(md, "l_partkey")
        if xmx >= x_lo and xmn <= x_hi and ymx >= y_lo and ymn <= y_hi:
            hit += 1
    # the box covers a few % of the (day, part) area; a linear layout
    # leaves every file intersecting on the unsorted dimension, the
    # z-layout leaves only the files whose rectangle the box touches
    assert hit / len(files) <= 0.5, (hit, len(files))


def test_bm25_probe_broadcasts_query_terms(spark, sf_dir, cat):
    """The BM25 retrieval plan must be an inverted-index PROBE, not a
    corpus-side shuffle join: the exploded query-term batch (and the
    derived idf table) broadcast into the postings join, and the final
    per-query top-k is a rank-limited window."""
    df = cat["text_bm25_topk"].fn(spark, sf_dir)
    plan = X.physical_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "WindowGroupLimit" in plan, plan
    # the postings side must never sort-merge against the query batch
    assert "SortMergeJoin" not in plan, plan
    # the persisted index probe prunes to the query terms' buckets:
    # term_bucket IN (...) must land in PartitionFilters (zero bytes
    # read from unprobed directories)
    import re

    assert re.search(
        r"PartitionFilters: \[[^\]]*term_bucket[^\]]*\]", plan
    ), plan


def test_hll_rollup_merge_is_lossless(spark, sf_dir):
    """Datasketches HLL union must be exactly lossless: merging the
    per-day sketches yields the SAME estimate as one direct sketch over
    all rows — the property that lets a daily rollup table answer any
    day-range distinct-count with full-scan accuracy. (The gate's
    tolerance boolean can't see a silent merge degradation; this pins
    exact equality.)"""
    from pyspark.sql import functions as F

    ev = load(spark, "events", sf_dir)
    direct = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("d")
    )
    merged = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.hll_sketch_agg("user_id").alias("s"))
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("s")).alias("m"))
    )
    rows = direct.join(merged, "event_type").collect()
    assert rows
    for r in rows:
        assert r["d"] == r["m"], r


def test_scalable_rank_range_partitions_no_global_sort(spark, sf_dir, cat):
    """q_rank_scalable_orders (operators/ranking.py): the global
    ranking family over raw rows must range-partition the data and
    enumerate partitions in parallel — never plan a single-partition
    Sort over the data rows (the q_rank_family_orders shape that only
    an aggregate's output can afford)."""
    df = cat["q_rank_scalable_orders"].fn(spark, sf_dir)
    plan = X.physical_plan(df)
    assert "rangepartitioning" in plan, plan
    # the Arrow enumerator: partition-local row numbers, no shuffle
    assert "MapInPandas" in plan or "InMemoryTableScan" in plan, plan
    # rank/dense join stages are keyed or broadcast, never sort-merge
    assert "SortMergeJoin" not in plan, plan
    # every Window here is hash-partitioned by the rank key or runs
    # over P counter rows / tie-group reps; the raw-row branch's first
    # exchange must be the range exchange, never SinglePartition
    scan_pos = plan.find("orders")
    sp = plan.find("Exchange SinglePartition")
    rp = plan.find("rangepartitioning")
    assert rp != -1 and (sp == -1 or rp < sp or scan_pos == -1), plan


def test_scalable_row_number_matches_window(spark):
    """scalable_row_number == row_number() over the same total order,
    on a frame with heavy ties and enough rows to cross many range
    partitions."""
    from pyspark.sql import Window

    from cyborgdb_encrypted_vector_search_spark.operators import ranking as R

    df = spark.range(0, 5000).select(
        (F.col("id") % 37).alias("g"), F.col("id").alias("k")
    )
    got = R.scalable_row_number(df, [("g", False), ("k", True)], out_col="rn")
    w = Window.orderBy(F.desc("g"), F.asc("k"))
    want = df.withColumn("rn", F.row_number().over(w))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_scalable_rank_family_matches_sql_windows(spark):
    """rank/dense_rank/percent_rank/ntile from the scalable operator
    equal the SQL window functions on a ties-heavy frame."""
    from pyspark.sql import Window

    from cyborgdb_encrypted_vector_search_spark.operators import ranking as R

    df = spark.range(0, 3000).select(
        (F.col("id") % 17).alias("g"), F.col("id").alias("k")
    )
    got = R.scalable_rank_family(
        df, rank_order=[("g", True)], tiebreak=[("k", True)], ntile_buckets=7
    )
    wo = Window.orderBy(F.asc("g"), F.asc("k"))
    wk = Window.orderBy(F.asc("g"))
    want = df.select(
        "g",
        "k",
        F.row_number().over(wo).cast("long").alias("rn"),
        F.rank().over(wk).cast("long").alias("rnk"),
        F.dense_rank().over(wk).cast("long").alias("drnk"),
        F.round(F.percent_rank().over(wk), 7).alias("prk"),
        F.ntile(7).over(wo).cast("int").alias("ntile_7"),
    )
    got = got.select("g", "k", "rn", "rnk", "drnk", "prk", "ntile_7")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_dpp_star_join_prunes_partitions_dynamically(spark, sf_dir, cat):
    """The fact scan must carry a dynamicpruningexpression in
    PartitionFilters: the busy-day dim is only known at runtime, so
    without DPP the partitioned fact would be read in full."""
    from cyborgdb_encrypted_vector_search_spark.plans import explain as X

    df = cat["q_dpp_star_join"].fn(spark, sf_dir)
    plan = X.physical_plan(df)
    assert "dynamicpruning" in plan
    # the pruning filter sits on the partition column of the fact scan
    import re

    scans = [
        line for line in plan.splitlines()
        if "PartitionFilters" in line and "dynamicpruning" in line
    ]
    assert scans, plan[:3000]
    assert re.search(r"PartitionFilters: \[[^\]]*event_date", scans[0])


def test_bloom_filtered_join_injects_runtime_filter(spark, sf_dir, cat):
    """InjectRuntimeFilter must plant a bloom_filter_agg over the dim
    keys and a might_contain probe on the fact side, and the
    conf-scoped planning must not leak settings into the session."""
    from cyborgdb_encrypted_vector_search_spark.plans import explain as X

    before = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    df = cat["q_bloom_filtered_join"].fn(spark, sf_dir)
    plan = X.physical_plan(df)
    assert "bloom_filter_agg" in plan
    assert "might_contain" in plan
    # confs restored: the shared session must be untouched after planning
    after = {k: spark.conf.get(k) for k in before}
    assert after == before
    # and a FRESH identical join planned now (under restored confs)
    # must NOT carry the bloom filter — proof the scope didn't leak
    from cyborgdb_encrypted_vector_search_spark.sources.registry import load
    from pyspark.sql import functions as F

    li = load(spark, "lineitem", sf_dir)
    o = load(spark, "orders", sf_dir).filter(F.col("o_totalprice") > 400000)
    fresh = li.join(o, li["l_orderkey"] == o["o_orderkey"]).groupBy(
        "l_returnflag"
    ).count()
    assert "bloom_filter_agg" not in X.physical_plan(fresh)
