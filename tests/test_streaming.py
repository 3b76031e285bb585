"""Structured Streaming golden tests (SURVEY.md §5.2-4): multi-batch file
streams, watermark late-data semantics, and the custom stateful operator."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from ps_datalake_spark.streaming.stateful import running_user_stats


def _write_batch(spark, path, rows):
    from datetime import datetime

    rows = [
        (eid, datetime.fromisoformat(ts), uid, val) for eid, ts, uid, val in rows
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, value double")
    df.coalesce(1).write.mode("append").parquet(path)


@pytest.fixture()
def stream_dir(tmp_path):
    return str(tmp_path / "stream_src")


def _start(spark, stream_dir, build, out_name, mode, checkpoint=None):
    """One availableNow run. Passing the same `checkpoint` across runs makes
    batch boundaries (and the persisted watermark) deterministic."""
    schema = "event_id long, ts timestamp, user_id long, value double"
    src = spark.readStream.schema(schema).parquet(stream_dir)
    w = build(src).writeStream.format("memory").queryName(out_name).outputMode(mode)
    if checkpoint is not None:
        w = w.option("checkpointLocation", checkpoint)
    q = w.trigger(availableNow=True).start()
    q.awaitTermination()
    return spark.table(out_name)


def test_watermark_drops_late_rows(spark, stream_dir, tmp_path):
    """Append-mode windowed agg: a row arriving behind the watermark is dropped.

    Two availableNow runs share a checkpoint, so run 2 resumes with the
    watermark persisted after run 1 (12:00 − 10 min = 11:50)."""
    cp = str(tmp_path / "cp_late")

    def build(src):
        return (
            src.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "5 minutes").alias("w"))
            .agg(F.count("*").alias("cnt"), F.sum("value").alias("sv"))
            .select(F.col("w.start").alias("ws"), "cnt", "sv")
        )

    out_dir = str(tmp_path / "late_out")
    schema = "event_id long, ts timestamp, user_id long, value double"

    def run_once():
        src = spark.readStream.schema(schema).parquet(stream_dir)
        q = (
            build(src)
            .writeStream.format("parquet")  # file sink: supports checkpoint recovery
            .option("path", out_dir)
            .option("checkpointLocation", cp)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # run 1: events up to 12:00 → checkpointed watermark 11:50
    _write_batch(
        spark,
        stream_dir,
        [
            (1, "2024-01-01 11:00:00", 1, 1.0),
            (2, "2024-01-01 11:04:00", 1, 2.0),
            (3, "2024-01-01 12:00:00", 2, 3.0),
        ],
    )
    run_once()
    # run 2: one on-time row (12:05) and one LATE row (11:01, behind 11:50)
    _write_batch(
        spark,
        stream_dir,
        [
            (4, "2024-01-01 12:05:00", 1, 10.0),
            (5, "2024-01-01 11:01:00", 1, 99.0),  # late → must be dropped
        ],
    )
    run_once()

    out = spark.read.parquet(out_dir)
    emitted = {r["ws"].isoformat(): (r["cnt"], r["sv"]) for r in out.collect()}
    # the 11:00 window must contain ONLY the two on-time rows (1.0 + 2.0),
    # never the late 99.0 — whether it was flushed in run 1 or run 2
    assert emitted.get("2024-01-01T11:00:00") == (2, 3.0), (rows1, rows2)
    # windows still open at end-of-stream (12:05) are unemitted in append mode
    assert "2024-01-01T12:05:00" not in emitted


def test_streaming_dedup_across_batches(spark, stream_dir):
    _write_batch(spark, stream_dir, [(1, "2024-01-01 10:00:00", 1, 1.0)])
    _write_batch(
        spark,
        stream_dir,
        [
            (1, "2024-01-01 10:00:00", 1, 1.0),  # duplicate id from batch 1
            (2, "2024-01-01 10:01:00", 1, 2.0),
        ],
    )

    def build(src):
        return src.withWatermark("ts", "1 hour").dropDuplicates(["event_id"])

    out = _start(spark, stream_dir, build, "dedup_test", "append")
    assert sorted(r["event_id"] for r in out.collect()) == [1, 2]


def test_apply_in_pandas_with_state(spark, stream_dir):
    _write_batch(
        spark,
        stream_dir,
        [(1, "2024-01-01 10:00:00", 1, 1.0), (2, "2024-01-01 10:01:00", 1, 2.0)],
    )
    _write_batch(
        spark,
        stream_dir,
        [(3, "2024-01-01 10:02:00", 1, 4.0), (4, "2024-01-01 10:03:00", 2, 8.0)],
    )
    out = _start(spark, stream_dir, running_user_stats, "state_test", "update")
    # last emission per user reflects accumulated state across microbatches
    rows = out.orderBy("batches").collect()
    final = {}
    for r in rows:
        final[r["user_id"]] = (r["n_events"], r["total_value"])
    assert final[1] == (3, 7.0), rows  # 1+2 in batch1, +4 in batch2
    assert final[2] == (1, 8.0), rows


def test_stateful_results_identical_under_rocksdb_provider(spark, sf_dir):
    """State-backend independence: the custom stateful operator must produce
    the same final per-user states under the RocksDB state-store provider —
    the production backend whose on-disk state survives executor loss at
    100 TB — as under the default HDFS-backed provider. The provider conf is
    read per-query-start, so it can be flipped on a live session."""
    from ps_datalake_spark.queries.event_windows import _events_stream, _run_to_memory

    def run(provider: str | None):
        key = "spark.sql.streaming.stateStore.providerClass"
        old = spark.conf.get(key, None)
        if provider:
            spark.conf.set(key, provider)
        try:
            out = running_user_stats(_events_stream(spark, sf_dir))
            mem = _run_to_memory(out, "update")
            final = (
                mem.groupBy("user_id")
                .agg(F.max(F.struct("n_events", "total_value")).alias("s"))
                .select("user_id", "s.n_events", "s.total_value")
            )
            return sorted(tuple(r) for r in final.collect())
        finally:
            if provider:
                if old:
                    spark.conf.set(key, old)
                else:
                    spark.conf.unset(key)

    default = run(None)
    rocks = run(
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    assert default == rocks and len(default) > 0


def test_transform_with_state_running_stats(spark, sf_dir):
    """Spark 4 transformWithState: the named-ValueState per-user running
    (count, sum) must equal the batch aggregation. Gated on protobuf —
    the TWS state protocol needs google.protobuf in the Python workers,
    which this container does not ship (streaming/stateful.py documents
    the gate)."""
    pytest.importorskip("google.protobuf")
    from ps_datalake_spark.queries.event_windows import _events_stream, _run_to_memory
    from ps_datalake_spark.streaming.stateful import running_user_stats_tws

    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        out = running_user_stats_tws(_events_stream(spark, sf_dir))
        mem = _run_to_memory(out, "update")
        final = {
            r["user_id"]: (r["n_events"], round(r["total_value"], 2))
            for r in mem.groupBy("user_id")
            .agg(F.max(F.struct("n_events", "total_value")).alias("s"))
            .select("user_id", "s.n_events", "s.total_value")
            .collect()
        }
    finally:
        if old:
            spark.conf.set(key, old)
        else:
            spark.conf.unset(key)
    from ps_datalake_spark.io import load_table

    batch = {
        r["user_id"]: (r["n"], round(r["t"], 2))
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    assert final == batch and len(final) > 0


def test_b89_stream_kmv_bounded_state(spark, sf_dir):
    """b89's maintenance contract: the stream really ran multiple
    micro-batches, the cross-batch state it exchanged is bounded by
    k * n_batches summary rows (never corpus-proportional), and the
    maintained summary reproduced the batch recompute exactly."""
    from ps_datalake_spark.queries import sketch_pack as sp
    from ps_datalake_spark.registry import all_queries

    row = (
        all_queries()["b89_stream_kmv_maintain"]
        .build(spark, sf_dir)
        .first()
    )
    assert row["multi_batch"] == 1
    assert row["stream_lossless"] == 1
    assert row["summary_k"] <= sp._KMV_K
    # introspection recorded by the run: 4 staged files x maxFilesPerTrigger=1
    assert sp._B89_LAST["n_batches"] == 4
    assert sp._B89_LAST["summary_rows"] <= 4 * sp._KMV_K


def test_b90_stream_priority_bounded_state(spark, sf_dir):
    """b90's maintenance contract, mirroring b89's: multiple real
    micro-batches, cross-batch state bounded by (k+1) * n_batches summary
    rows, and the maintained sample reproduced the batch recompute."""
    from ps_datalake_spark.queries import sketch_pack as sp
    from ps_datalake_spark.registry import all_queries

    row = (
        all_queries()["b90_stream_priority_maintain"]
        .build(spark, sf_dir)
        .first()
    )
    assert row["multi_batch"] == 1
    assert row["stream_lossless"] == 1
    assert row["n_sample"] <= sp._PS_K
    assert sp._B90_LAST["n_batches"] == 4
    assert sp._B90_LAST["summary_rows"] <= 4 * (sp._PS_K + 1)


def test_stream_staging_rejects_dropped_rows(spark, tmp_path):
    """b89/b90's shared staging (_stage_stream_files) must fail LOUDLY when
    the group split drops rows — a NULL key pmods to NULL and matches no
    group, silently shrinking the stream's population relative to the
    full-recompute witness and the DuckDB oracle (r11 advisor items 1-2).
    Negative keys must NOT trip it: pmod lands them in a real group."""
    import pytest as _pt

    from ps_datalake_spark.queries.sketch_pack import _stage_stream_files

    ok_dir = tmp_path / "ok"
    ok_dir.mkdir()
    import datetime as _dt

    _ts = _dt.datetime(2024, 1, 1)
    spark.createDataFrame(
        [(5, "a", _ts), (-3, "b", _ts), (0, "c", _ts), (7, "d", _ts),
         (-1, "e", _ts)],
        "event_id bigint, event_type string, ts timestamp",
    ).write.parquet(str(ok_dir / "events.parquet"))
    stage = _stage_stream_files(
        spark, str(ok_dir), "events", ("event_id", "event_type"),
        "event_id", "test_stage_ok",
    )
    import os
    total = sum(
        spark.read.parquet(os.path.join(stage, f)).count()
        for f in os.listdir(stage) if f.endswith(".parquet")
    )
    assert total == 5  # negative keys staged, nothing dropped

    bad_dir = tmp_path / "bad"
    bad_dir.mkdir()
    spark.createDataFrame(
        [(5, "a", _ts), (None, "b", _ts), (7, "c", _ts)],
        "event_id bigint, event_type string, ts timestamp",
    ).write.parquet(str(bad_dir / "events.parquet"))
    with _pt.raises(ValueError, match="dropped rows"):
        _stage_stream_files(
            spark, str(bad_dir), "events", ("event_id", "event_type"),
            "event_id", "test_stage_bad",
        )


def test_b91_stream_hh_bounded_state(spark, sf_dir):
    """b91's maintenance contract, completing the streaming triple
    (b89 KMV, b90 priority sample, b91 heavy hitters): multiple real
    micro-batches, cross-batch state bounded by T rows per batch
    (<= T-1 retained terms by pigeonhole + 1 sentinel), and the
    maintained candidate set equal to the batch-split recompute."""
    from ps_datalake_spark.queries import sketch_pack as sp
    from ps_datalake_spark.registry import all_queries

    row = (
        all_queries()["b91_stream_hh_maintain"]
        .build(spark, sf_dir)
        .first()
    )
    assert row["multi_batch"] == 1
    assert row["maintain_matches"] == 1
    assert row["n_missed_true_hh"] == 0  # pigeonhole across batch splits
    assert row["within_bound"] == 1
    assert sp._B91_LAST["n_batches"] == sp._HH_STREAM_B
    assert sp._B91_LAST["summary_rows"] <= sp._HH_STREAM_B * sp._HH_T


def test_b92_incremental_neardup_bounded_index(spark, sf_dir):
    """b92's maintenance contract: multiple real micro-batches; the dedup
    index grows exactly bands rows per signed document (proportional to
    document COUNT, never text size); every planted cross-batch duplicate
    is found via the index; and the incremental pair set equals the
    from-scratch recompute."""
    from pyspark.sql import functions as F

    from ps_datalake_spark.io import load_table
    from ps_datalake_spark.queries import llm_ops as lo
    from ps_datalake_spark.registry import all_queries

    rows = (
        all_queries()["b92_incremental_neardup"]
        .build(spark, sf_dir)
        .collect()
    )
    assert len(rows) > 0
    for r in rows:
        assert r["via_index"] == 1          # detected across batches
        assert r["est_jaccard"] == 1.0      # exact copies
        assert r["incremental_matches_recompute"] == 1
        assert r["multi_batch"] == 1
    assert lo._B92_LAST["n_batches"] == lo._INCR_B
    # index growth: exactly bands rows per document that signed (text
    # non-NULL with >= 3 tokens — minhash_signatures' own skip rule),
    # counted over the planted corpus
    corpus = lo._incr_plant(load_table(spark, sf_dir, "documents"))
    n_signed = corpus.where(
        F.col("text").isNotNull()
        & (F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")) >= 3)
    ).count()
    assert lo._B92_LAST["index_rows"] == lo._INCR_BANDS * n_signed
