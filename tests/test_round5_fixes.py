"""Round-5 hardening: the ADVICE.md findings, each pinned by a test.

1. foreachBatch replay idempotency (commit markers).
2. q_events_json_agg NULL-user semantics vs count(DISTINCT).
3. _publish_dir re-raises non-race OSErrors.
4. rotate_key carries plaintext metadata through rotation.
5. read_time_range day-inclusive bounds on hour-partitioned layouts.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cyborgdb_encrypted_vector_search_spark.sources.collections import Collection


def test_run_idempotent_batch_skips_committed(tmp_path):
    from cyborgdb_encrypted_vector_search_spark.streaming.ingest import (
        run_idempotent_batch,
    )

    sink = str(tmp_path / "sink")
    os.makedirs(sink)
    ran = []
    assert run_idempotent_batch(sink, "tagA", 0, lambda: ran.append("a")) is True
    # replay of the same (stream, batch): action must NOT run again
    assert run_idempotent_batch(sink, "tagA", 0, lambda: ran.append("b")) is False
    # a different batch id / different stream tag both still run
    assert run_idempotent_batch(sink, "tagA", 1, lambda: ran.append("c")) is True
    assert run_idempotent_batch(sink, "tagB", 0, lambda: ran.append("d")) is True
    assert ran == ["a", "c", "d"]
    # marker dir is underscore-prefixed -> invisible to Spark listing
    assert os.path.isdir(os.path.join(sink, "_stream_commits"))


def test_stream_ivf_ingest_replay_does_not_duplicate(spark, tmp_path):
    """End-to-end: after a completed stream run, re-invoking the batch
    sink with the same (checkpoint-derived tag, batch id) — what a
    crash-recovery replay does — appends nothing."""
    from cyborgdb_encrypted_vector_search_spark.operators import ann
    from cyborgdb_encrypted_vector_search_spark.streaming import ingest as I

    src = str(tmp_path / "src")
    emb = spark.createDataFrame(
        [(i, [float(i), float(i % 3)], i % 2) for i in range(40)],
        "vec_id long, embedding array<float>, label int",
    )
    emb.write.parquet(src)
    cent = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [30.0, 1.0])],
        "centroid_id int, centroid array<float>",
    )
    layout = str(tmp_path / "layout")
    ckpt = str(tmp_path / "ckpt")
    stream = I.read_embeddings_stream(spark, src)
    I.stream_append_to_ivf_layout(spark, stream, cent, layout, checkpoint=ckpt)
    n0 = spark.read.parquet(layout).count()
    assert n0 == 40

    # simulate the at-least-once replay of batch 0 for this stream
    tag = I._stream_tag(ckpt)
    ran = I.run_idempotent_batch(
        layout,
        tag,
        0,
        lambda: ann.append_to_ivf_layout(
            emb.select("vec_id", "embedding"), cent, layout
        ),
    )
    assert ran is False
    assert spark.read.parquet(layout).count() == n0


def test_events_json_agg_excludes_null_users(spark, tmp_path):
    """Differential: with NULL user_ids present, the two-level rewrite
    must still equal count(DISTINCT user_id) (NULL excluded)."""
    import duckdb

    from cyborgdb_encrypted_vector_search_spark.plans import catalog as C

    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 10, "click", 1.5, '{"k": 60}'),
            (2, "2024-01-01 00:01:00", None, "click", 2.5, '{"k": 10}'),
            (3, "2024-01-01 00:02:00", 10, "click", 3.0, '{"k": 99}'),
            (4, "2024-01-01 00:03:00", None, "view", 1.0, "{}"),
            (5, "2024-01-01 00:04:00", None, "view", 2.0, '{"k": 70}'),
        ],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    ev.write.parquet(str(tmp_path / "events.parquet"))

    got = {
        r["event_type"]: r.asDict()
        for r in C.CATALOG["q_events_json_agg"].fn(spark, str(tmp_path)).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    want = con.execute(C.CATALOG["q_events_json_agg"].sql).fetchall()
    for event_type, n_events, n_users, total_value, n_high_k in want:
        g = got[event_type]
        assert g["n_events"] == n_events
        assert g["n_users"] == n_users, (event_type, g, n_users)
        assert g["total_value"] == pytest.approx(total_value)
        assert g["n_high_k"] == n_high_k
    # the interesting case: 'view' has only NULL users -> n_users == 0
    assert got["view"]["n_users"] == 0
    assert got["click"]["n_users"] == 1


def test_publish_dir_race_vs_real_error(tmp_path):
    from cyborgdb_encrypted_vector_search_spark.plans.catalog import _publish_dir

    # lost-the-race: final exists non-empty -> swallowed, tmp discarded
    tmp = tmp_path / "build.tmp"
    tmp.mkdir()
    (tmp / "part").write_text("x")
    final = tmp_path / "final"
    final.mkdir()
    (final / "part").write_text("winner")
    _publish_dir(str(tmp), str(final))
    assert not tmp.exists()
    assert (final / "part").read_text() == "winner"

    # real failure (missing parent -> ENOENT) must re-raise, not vanish
    tmp2 = tmp_path / "build2.tmp"
    tmp2.mkdir()
    with pytest.raises(OSError):
        _publish_dir(str(tmp2), str(tmp_path / "no" / "such" / "parent"))
    assert tmp2.exists()  # the artifact is preserved for inspection


def test_rotate_key_carries_plaintext_metadata(spark, tmp_path):
    old_key, new_key = "0123456789abcdef", "aaaabbbbccccdddd"
    src = Collection.create(spark, "rot_meta", str(tmp_path / "src"))
    df = spark.createDataFrame(
        [
            (1, "alpha secret", [1.0, 2.0], {"source": "demo", "lang": "en"}),
            (2, "beta secret", [3.0, 4.0], {"source": "web"}),
        ],
        "doc_id long, document string, embedding array<double>, "
        "metadata map<string,string>",
    )
    src.add_encrypted(df, old_key, id_col="doc_id", metadata_col="metadata")

    # stored plaintext metadata sits beside the ciphertext entry
    stored = {r["id"]: r["metadata"] for r in src.scan().collect()}
    assert stored["1"]["source"] == "demo"
    assert "embedding_ct" in stored["1"]

    rot = src.rotate_key(old_key, new_key, str(tmp_path / "dst"))
    rdec = {r["id"]: r for r in rot.decrypt(new_key).collect()}
    assert rdec["1"]["document"] == "alpha secret"
    assert rdec["1"]["metadata"] == {"source": "demo", "lang": "en"}
    assert rdec["2"]["metadata"] == {"source": "web"}
    # the rotated store's ciphertext entry is fresh, not carried over
    old_ct = {r["id"]: r["embedding_ct"] for r in src.extract_encrypted().collect()}
    new_ct = {r["id"]: r["embedding_ct"] for r in rot.extract_encrypted().collect()}
    assert all(old_ct[k] != new_ct[k] for k in old_ct)


def test_read_time_range_hour_granularity_day_inclusive(spark, tmp_path):
    from cyborgdb_encrypted_vector_search_spark.operators import layout as L

    df = spark.createDataFrame(
        [
            (1, "2024-01-10 03:00:00"),
            (2, "2024-01-11 23:30:00"),
            (3, "2024-01-12 01:00:00"),
            (4, "2024-01-12 22:00:00"),  # end-day LATE hour: must be kept
            (5, "2024-01-13 00:30:00"),  # past the end day: dropped
        ],
        "event_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    path = str(tmp_path / "hourly")
    L.build_time_partitioned(df, "ts", path, granularity="hour")
    got = L.read_time_range(spark, path, "2024-01-11", "2024-01-12")
    ids = sorted(r["event_id"] for r in got.collect())
    assert ids == [2, 3, 4]
    # the bound predicate still prunes partitions (stays in PartitionFilters)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan

    # day granularity unchanged
    path2 = str(tmp_path / "daily")
    L.build_time_partitioned(df, "ts", path2, granularity="day")
    got2 = L.read_time_range(spark, path2, "2024-01-11", "2024-01-12")
    assert sorted(r["event_id"] for r in got2.collect()) == [2, 3, 4]
