"""Scale-curve measurement: same queries, 1x / 4x / 16x the data.

The correctness gate runs at sf0.01 and bench at sf0.1 — both small
enough that fixed local-mode overhead (~0.3-0.8 s/query: scheduling,
codegen, driver round-trips) dominates. This tool materializes
id-offset blowups of the scan-heavy tables (lineitem, documents,
embeddings; other tables copied) under $TMPDIR and re-times
representative queries, so the DATA-dependent term is observable:
a scalable plan shows t ≈ fixed + slope * rows with the same plan
shape at every size, and slope * rows growing ~linearly.

Ids are offset per replica (doc_id/vec_id/l_orderkey + i * 10^9) so
key-based semantics (point-get of vec_id 42, dedup fingerprint groups)
keep one canonical hit and the blowup adds *distinct* rows, not
key collisions.

Prints one JSON line per (scale, query). Usage:
  python tools/scale_curve.py [base_sf_dir] [scales e.g. 1,4,16] \
      [only e.g. entity_resolution_curve,graph_bfs_curve]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# Per-table id columns offset per replica. events offsets user_id too:
# replicating events with the SAME users would make the user-keyed
# self-joins (interval join, sessionization) grow quadratically across
# replicas — offsetting both keys keeps replicas independent, so an
# honest linear-in-rows workload is what the curve measures.
BLOWUP = {
    "lineitem": ["l_orderkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
    # r6: orders joins the blowup so the raw-row global-rank curve is
    # observable (no curve query JOINS orders against a blown-up fact,
    # so offsetting o_orderkey perturbs nothing else in QUERIES)
    "orders": ["o_orderkey"],
}
COPY = ["region", "nation", "customer", "supplier", "part"]
QUERIES = [
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "dedup_exact_groups",
    "knn_topk_cosine",
    "text_profile",
    "ann_ivf_batch_topk",
    "streaming_incremental_dedup",
    # r3 additions (VERDICT r3 item 8)
    "collection_query_topk",
    "streaming_interval_join",
    # r4 addition: broadcast-LM scoring — the model stays alphabet-bounded
    # while the gram stream grows with the corpus
    "text_perplexity_filter",
    # r5 additions: window-hash group pairs (linear gram stream, one
    # grouping shuffle) and bucketed CRUD (cost tracks touched buckets,
    # which stays FIXED as the table grows)
    "dedup_substring_pairs",
    "collection_upsert_delete",
    # late-r5 additions: clustered box scan (build amortized by
    # min-of-2), partition-pruned BM25 probe + rerank funnel, and the
    # sketch-rollup merge (query cost tracks days, not events)
    "q_zorder_pruned_scan",
    "text_bm25_topk",
    "pipeline_rag_rerank",
    "q_sketch_rollup_users",
    # r6 additions: raw-row global ranking (range shuffle + parallel
    # enumeration should scale ~linearly in rows with the same plan at
    # every size) and the retrieve->prompt->model funnel (corpus side
    # grows; the 5-target broadcast and 5 UDF calls stay fixed)
    "q_rank_scalable_orders",
    "knn_llm_reconstruction",
    # r6 embedding-space additions: Gram (per-batch matmul — cost is
    # one scan, shuffle fixed at dim² per batch), JL projection (pure
    # narrow fold + 8-group agg), MMR (corpus-wide shortlist scan +
    # fixed 12-candidate greedy)
    "embed_pca_gram",
    "embed_random_projection",
    "knn_mmr_rerank",
    # r6: DPP star join — prune fraction is scale-invariant, so cost
    # tracks the busy-day partitions only
    "q_dpp_star_join",
    # r6: bloom-filtered join — fact rows surviving the probe scale
    # with the dim selectivity, not the fact size
    "q_bloom_filtered_join",
    # r6: CMS heavy hitters — sketch size is FIXED (depth x width);
    # cost tracks the distinct-user frame, not the fact table
    "q_heavy_hitters_cms",
    # r6: compaction — cost is the rewrite itself (linear in bytes)
    "q_compact_small_files",
    # r6: gap fill — grid is O(hours x types) at any fact size; cost
    # tracks the one hourly-aggregate scan
    "q_events_gapfill_hourly",
    # r6: EMA — user-keyed fold; replicas are disjoint (user_id offset)
    # so cost is linear in users x events-per-user
    "q_events_ema_user",
    # r6: OLS — one map-combinable groupBy; K stat rows shuffle, never
    # data rows
    "q_stats_regression_lineitem",
    # r7: per-row EMA — output linear in events, fold key-parallel
    "q_events_ema_rows",
    # r7: approx-vs-exact quantile bounds — two scans of orders (sketch
    # + rank counts) plus the range-shuffle exact machinery
    "q_quantile_bounds_orders",
    # NOTE: the q_graph_* gates ride the curve through replica-DISJOINT
    # twins in `extra` below — the blowup replicates identical
    # timestamps, so the raw gates would measure cross-replica
    # densification (16x co-occurrence pairs per 4x data), not the
    # operator. dedup_editdist_pairs is excluded entirely: replicated
    # identical TEXT is the adversarial duplicate-dense corpus for any
    # content blocking (no tag neutralizes it) — its raw numbers and
    # analysis live in docs/COSTS.md.
]


def materialize(spark, base: str, scale: int, out: str) -> None:
    """Build (or reuse) the scaled copy of ``base`` under ``out``.

    STALENESS GUARD: a ``_BASE.json`` marker records the base path and
    per-table base row counts; an existing dir whose marker doesn't
    match the current base is REBUILT. Without this, regenerated
    testdata (or a curve run against a different sf) silently serves
    blowups of the OLD base and the published 1x/4x/16x rows compare
    different datasets — exactly what happened to the early round-6
    measurements (4x/16x dirs built from sf0.01 under an sf0.1 \"1x\")."""
    from pyspark.sql import functions as F

    marker = os.path.join(out, "_BASE.json")
    counts = {
        t: spark.read.parquet(os.path.join(base, f"{t}.parquet")).count()
        for t in BLOWUP
    }
    want = {"base": base, "scale": scale, "counts": counts}
    if os.path.exists(marker):
        try:
            with open(marker) as f:
                if json.load(f) == want:
                    return
        except Exception:
            pass
    # Any mismatch — and any pre-marker dir (no marker to vouch for its
    # COPY tables) — is rebuilt from scratch. Keeping COPY tables from
    # an unmarked dir would pair old-base dims with new-base facts and
    # then stamp a fresh marker vouching for the mix.
    if os.path.exists(out):
        shutil.rmtree(out)
    os.makedirs(out, exist_ok=True)
    for t in COPY:
        dst = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(dst):
            shutil.copy(os.path.join(base, f"{t}.parquet"), dst)
    for t, keys in BLOWUP.items():
        dst = os.path.join(out, f"{t}.parquet")
        df = spark.read.parquet(os.path.join(base, f"{t}.parquet"))
        reps = []
        for i in range(scale):
            r = df
            for key in keys:
                r = r.withColumn(key, F.col(key) + F.lit(i * 1_000_000_000))
            reps.append(r)
        full = reps[0]
        for r in reps[1:]:
            full = full.unionByName(r)
        full.write.mode("overwrite").parquet(dst)
    with open(marker, "w") as f:
        json.dump(want, f)


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    scales = [int(s) for s in (sys.argv[2] if len(sys.argv) > 2 else "1,4,16").split(",")]
    # optional 3rd arg: comma-list of query/twin names — run ONLY
    # those (a new operator's same-round curve point shouldn't re-pay
    # the full suite)
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    tmp = os.environ.get("TMPDIR", "/tmp")

    from cyborgdb_encrypted_vector_search_spark.caching import release_all
    from cyborgdb_encrypted_vector_search_spark.plans.catalog import entries
    from cyborgdb_encrypted_vector_search_spark.session import get_spark

    spark = get_spark(
        app_name="cyborgdb-scale-curve",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    spark.range(1000).selectExpr("sum(id)").collect()
    cat = entries()
    from cyborgdb_encrypted_vector_search_spark.plans import catalog as C

    # Serve twins: dedup_simhash_wide's GATE carries an O(n^2)
    # brute-force ground truth, and the SQ8 gate carries exact-kNN
    # ground truth; the curve times the production paths.
    extra = {
        "dedup_simhash_wide_serve": C.simhash_wide_serve,
        # r13 twin: the xxhash64 MinHash+LSH candidate pipeline (the
        # md5 gate is the parity contract; this is the 100 TB path)
        "dedup_minhash_xxhash_serve": C.minhash_xxhash_serve,
        "ann_sq8_batch_serve": C.sq8_batch_serve,
        # replica-disjoint twins (see QUERIES note); editdist has no
        # twin — text replication can't be tag-neutralized (see the
        # catalog note above GATE_PRIORITY) — its raw 1x/4x numbers
        # live in docs/COSTS.md with the substring-pairs narrative
        "graph_triangles_curve": C.graph_triangles_curve,
        "graph_pagerank_curve": C.graph_pagerank_curve,
        # r7 twins: iterative peeling and SCAN clustering over the same
        # replica-disjoint graph
        "graph_ktruss_curve": C.graph_ktruss_curve,
        "graph_scan_curve": C.graph_scan_curve,
        # r8 twins: degree peeling and the common-neighbor wedge join
        "graph_kcore_curve": C.graph_kcore_curve,
        "graph_linkpred_curve": C.graph_linkpred_curve,
        # r9 twin: the weighted (Adamic-Adar/RA) scoring on the same
        # wedge machinery
        "graph_adamic_curve": C.graph_adamic_curve,
        # r10 twins: the ORIENTED kernel's growth curve — replica-
        # disjoint hub-dominated fixture (one hub per id-offset block)
        # so the power-law code path's O(m^1.5) bound is measured, not
        # argued (the r9 verdict's top item). Covers the one-pass
        # count, the enumerate-then-explode support, and the 4-round
        # peel.
        "graph_skew_triangles_curve": C.graph_skew_triangles_curve,
        "graph_skew_support_curve": C.graph_skew_support_curve,
        "graph_skew_ktruss_curve": C.graph_skew_ktruss_curve,
        # r11 twin: multi-source BFS — seeds re-derived per id-offset
        # block so every replica contributes a full frontier expansion
        "graph_bfs_curve": C.graph_bfs_curve,
        # r11 twin: entity resolution (blocking -> predicate -> CC)
        # on the blown-up orders keys (customer is a COPY table)
        "entity_resolution_curve": C.entity_resolution_curve,
        # r12 twin: FIXED batch absorbed into the GROWING resolved
        # corpus (old labels built once into a content-tagged /tmp
        # parquet; the timed work is the absorb alone — scan slope,
        # not closure)
        "entity_resolution_incremental_curve": (
            C.entity_resolution_incremental_curve
        ),
    }

    for scale in scales:
        sf_dir = base if scale == 1 else os.path.join(tmp, f"scale_curve_{scale}x")
        if scale != 1:
            materialize(spark, base, scale, sf_dir)
        for name in [*QUERIES, *extra]:
            if only is not None and name not in only:
                continue
            fn = cat[name].fn if name in cat else extra[name]
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).collect()
                best = min(best, time.perf_counter() - t0)
                release_all()  # per-query correctness persists
            print(
                json.dumps(
                    {"scale": scale, "query": name, "sec": round(best, 3)}
                )
            )
    spark.stop()


if __name__ == "__main__":
    main()
