"""Event-time windows + Structured Streaming: SURVEY.md §2B B30–B33.

Batch queries use the same ``window()`` / ``session_window()`` expressions the
streaming engine uses, so their DuckDB oracles double as golden outputs for
the streaming variants. The ``*_stream`` queries run a real Structured
Streaming job (readStream → watermark → stateful op → memory sink) with an
availableNow trigger inside the callable and return the sink as a DataFrame —
end-to-end streaming, still oracle-checkable.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ._util import T, dround, tiny_sort


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as a stream with ts normalized (ns→µs, UTC timestamp).

    The file stream source requires a directory, so the single parquet file is
    staged (symlinked) into a scratch dir once per (process, sf_dir).
    """
    import os

    from ..session import configure
    from ._util import scratch_dir

    import hashlib

    configure(spark)  # vanilla driver sessions need nanosAsLong before any read
    token = hashlib.md5(sf_dir.encode()).hexdigest()[:8]  # stable across processes
    stage = scratch_dir(f"events_stream_{token}")
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        try:
            os.symlink(f"{sf_dir}/events.parquet", link)
        except OSError:
            import shutil

            shutil.copy2(f"{sf_dir}/events.parquet", link)
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = spark.readStream.schema(raw_schema).parquet(stage)
    if dict(stream.dtypes)["ts"] == "bigint":
        # integer division: ns epoch exceeds 2^53 (see io.load_table)
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def _run_to_memory(stream_df: DataFrame, mode: str) -> DataFrame:
    """Execute a streaming DF with availableNow into a memory sink; return a
    checkpointed copy and drop the sink table (repeated bench/driver runs
    would otherwise accumulate one in-memory table per invocation)."""
    name = f"mem_{uuid.uuid4().hex[:12]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = stream_df.sparkSession
    result = spark.table(name).localCheckpoint(eager=True)
    spark.catalog.dropTempView(name)
    return result


# ---------------------------------------------------------------------------
# B30 — tumbling windows (batch + true streaming)
# ---------------------------------------------------------------------------

_TUMBLING_ORACLE = """
    SELECT window_start,
           window_start + INTERVAL 10 MINUTE AS window_end,
           event_type,
           count(*) AS cnt,
           round(sum(value), 2) AS sum_val
    FROM (SELECT time_bucket(INTERVAL '10 minutes', ts::TIMESTAMP) AS window_start,
                 event_type, value
          FROM events)
    GROUP BY window_start, event_type
    ORDER BY window_start, event_type
    """


@query(
    "b30_tumbling_window",
    oracle=_TUMBLING_ORACLE,
    tags=("B30",),
    doc="Tumbling 10-minute event-time windows (batch execution of the streaming expression).",
)
def b30_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    w = F.window(F.col("ts"), "10 minutes")
    return (
        ev.groupBy(w.alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"), dround(F.sum("value"), 2).alias("sum_val"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            F.col("w.end").cast("timestamp_ntz").alias("window_end"),
            "event_type",
            "cnt",
            "sum_val",
        )
        # groups bounded by time-span × event types, not data volume
        .transform(tiny_sort, "window_start", "event_type")
    )


@query(
    "b30_tumbling_stream",
    oracle=_TUMBLING_ORACLE,
    tags=("B30", "streaming"),
    doc="True Structured Streaming: readStream → watermark → tumbling window agg "
    "→ memory sink (complete mode), availableNow trigger. Hash-matches the "
    "batch oracle — exactly-once window semantics.",
)
def b30_tumbling_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window(F.col("ts"), "10 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"), dround(F.sum("value"), 2).alias("sum_val"))
    )
    mem = _run_to_memory(agg, "complete")
    return mem.select(
        F.col("w.start").cast("timestamp_ntz").alias("window_start"),
        F.col("w.end").cast("timestamp_ntz").alias("window_end"),
        "event_type",
        "cnt",
        "sum_val",
    ).orderBy("window_start", "event_type")


# ---------------------------------------------------------------------------
# B31 — sliding + session windows
# ---------------------------------------------------------------------------

@query(
    "b31_sliding_window",
    oracle="""
    SELECT window_start,
           window_start + INTERVAL 10 MINUTE AS window_end,
           count(*) AS cnt,
           round(sum(value), 2) AS sum_val
    FROM (SELECT unnest([tb5, tb5 - INTERVAL 5 MINUTE]) AS window_start, value
          FROM (SELECT time_bucket(INTERVAL '5 minutes', ts::TIMESTAMP) AS tb5, value
                FROM events))
    GROUP BY window_start
    ORDER BY window_start
    """,
    tags=("B31",),
    doc="Sliding windows (10 min length, 5 min slide): each event lands in two windows.",
)
def b31_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    w = F.window(F.col("ts"), "10 minutes", "5 minutes")
    return (
        ev.groupBy(w.alias("w"))
        .agg(F.count("*").alias("cnt"), dround(F.sum("value"), 2).alias("sum_val"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            F.col("w.end").cast("timestamp_ntz").alias("window_end"),
            "cnt",
            "sum_val",
        )
        .orderBy("window_start")
    )


@query(
    "b31_session_window",
    oracle="""
    WITH e AS (SELECT user_id, ts::TIMESTAMP AS ts FROM events),
    marked AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL 5 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sessioned AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 5 MINUTE AS session_end,
           count(*) AS cnt
    FROM sessioned
    GROUP BY user_id, sid
    """,
    tags=("B31",),
    doc="Session windows (5-minute gap) per user; oracle is the classic "
    "gaps-and-islands rewrite. Spark merges events with gap < 5 min strictly; "
    "session end = last event + gap. Data-proportional output: final sort "
    "omitted on both sides (sorted-multiset comparison — see "
    "b37_token_stats).",
)
def b31_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window(F.col("ts"), "5 minutes").alias("s"), "user_id")
        .agg(F.count("*").alias("cnt"))
        .select(
            "user_id",
            F.col("s.start").cast("timestamp_ntz").alias("session_start"),
            F.col("s.end").cast("timestamp_ntz").alias("session_end"),
            "cnt",
        )
    )


@query(
    "b46_asof_join",
    oracle="""
    WITH purchases AS (SELECT event_id, user_id, ts::TIMESTAMP AS ts, value
                       FROM events WHERE event_type = 'purchase'),
    views AS (SELECT user_id, ts::TIMESTAMP AS ts, value
              FROM events WHERE event_type = 'view')
    SELECT p.event_id, p.user_id,
           v.ts AS asof_ts,
           round(v.value, 6) AS asof_value
    FROM purchases p ASOF LEFT JOIN views v
      ON p.user_id = v.user_id AND v.ts <= p.ts
    ORDER BY p.event_id
    """,
    tags=("B46", "B8"),
    doc="As-of join (custom operator the brief names): each purchase enriched "
    "with the user's most recent prior view. Spark side is the "
    "union+sort+last(ignoreNulls) composition — one shuffle, O(n), no range "
    "blowup; oracle is DuckDB's native ASOF LEFT JOIN.",
)
def b46_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.temporal import asof_join

    ev = T(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    views = ev.where(F.col("event_type") == "view").select("user_id", "ts", "value")
    out = asof_join(purchases, views, on="user_id", right_cols=("value",))
    return out.select(
        "event_id",
        "user_id",
        F.col("asof_ts"),
        dround(F.col("asof_value"), 6).alias("asof_value"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# B32 — dedup (batch + streaming with watermark)
# ---------------------------------------------------------------------------

_DEDUP_ORACLE = """
    SELECT count(*) AS cnt,
           CAST(sum(user_id) AS BIGINT) AS sum_user,
           CAST(count(DISTINCT event_id) AS BIGINT) AS n_ids
    FROM (SELECT DISTINCT event_id, user_id FROM events)
    """


@query(
    "b32_dedup",
    oracle=_DEDUP_ORACLE,
    tags=("B32",),
    doc="dropDuplicates over a doubled input (union of events with itself).",
)
def b32_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events").select("event_id", "user_id")
    doubled = ev.unionByName(ev)
    deduped = doubled.dropDuplicates(["event_id"])
    return deduped.agg(
        F.count("*").alias("cnt"),
        F.sum("user_id").alias("sum_user"),
        F.countDistinct("event_id").alias("n_ids"),
    )


@query(
    "b32_dedup_stream",
    oracle=_DEDUP_ORACLE,
    tags=("B32", "streaming"),
    doc="Streaming dedup: two readStreams of the same source unioned, "
    "withWatermark + dropDuplicates(event_id), append mode. Each event_id is "
    "emitted exactly once.",
)
def b32_dedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    s1 = _events_stream(spark, sf_dir).select("event_id", "user_id", "ts")
    s2 = _events_stream(spark, sf_dir).select("event_id", "user_id", "ts")
    doubled = s1.unionByName(s2)
    deduped = doubled.withWatermark("ts", "1 hour").dropDuplicates(["event_id"])
    mem = _run_to_memory(deduped, "append")
    return mem.agg(
        F.count("*").alias("cnt"),
        F.sum("user_id").alias("sum_user"),
        F.countDistinct("event_id").alias("n_ids"),
    )


@query(
    "b68_dedup_within_watermark",
    oracle=_DEDUP_ORACLE,
    tags=("B32", "streaming"),
    doc="Streaming dedup with BOUNDED state: dropDuplicatesWithinWatermark "
    "drops a duplicate only while its first sighting is within the "
    "watermark delay, letting the engine EVICT dedup state as the "
    "watermark advances — the API that makes streaming dedup viable over "
    "unbounded streams (plain dropDuplicates keeps every key forever). "
    "The doubled availableNow source replays every duplicate inside one "
    "micro-batch — well within the 1h delay — so the emitted set equals "
    "batch DISTINCT and the b32 oracle applies unchanged; the "
    "state-eviction semantics beyond the fixture are the engine's "
    "contract, selected by this API.",
)
def b68_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    s1 = _events_stream(spark, sf_dir).select("event_id", "user_id", "ts")
    s2 = _events_stream(spark, sf_dir).select("event_id", "user_id", "ts")
    doubled = s1.unionByName(s2)
    deduped = doubled.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    mem = _run_to_memory(deduped, "append")
    return mem.agg(
        F.count("*").alias("cnt"),
        F.sum("user_id").alias("sum_user"),
        F.countDistinct("event_id").alias("n_ids"),
    )


@query(
    "b32_late_data",
    oracle="""
    SELECT TIMESTAMP '2024-01-01 11:00:00' AS ws,
           CAST(2 AS BIGINT) AS cnt,
           CAST(3.0 AS DOUBLE) AS sv
    """,
    tags=("B32", "streaming"),
    doc="Watermark late-data semantics, end to end: two availableNow runs "
    "share a checkpoint; run 1 advances the persisted watermark to 11:50, "
    "run 2 delivers one on-time row (12:05) and one LATE row (11:01, behind "
    "the watermark). The oracle encodes the post-watermark drop: the 11:00 "
    "window closes with ONLY its two on-time rows (never the late 99.0), "
    "and still-open windows stay unemitted in append mode. File sink + "
    "checkpoint because the memory sink cannot resume a checkpoint.",
)
def b32_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..session import configure
    from ._util import scratch_dir

    configure(spark)
    # sweep STALE prior-invocation scratch (each run needs a FRESH
    # checkpoint — the memory sink cannot resume one — so the dirs are
    # uuid-keyed, but without a sweep every driver/bench run leaks one
    # forever). Only dirs idle >1h are removed: the result DataFrame reads
    # its out/ lazily, and a concurrent process's live run must not be raced.
    import re as _re
    import shutil as _sh
    import time as _time

    parent = os.path.dirname(scratch_dir("x"))
    cutoff = _time.time() - 3600
    for d in os.listdir(parent):
        full = os.path.join(parent, d)
        try:
            stale = os.path.getmtime(full) < cutoff
        except OSError:
            continue
        if stale and _re.fullmatch(r"late_data_[0-9a-f]{8}", d):
            _sh.rmtree(full, ignore_errors=True)
    base = scratch_dir(f"late_data_{uuid.uuid4().hex[:8]}")
    src_dir = os.path.join(base, "src")
    cp = os.path.join(base, "cp")
    out_dir = os.path.join(base, "out")
    os.makedirs(src_dir, exist_ok=True)
    schema = "event_id long, ts timestamp, user_id long, value double"

    def write_batch(rows):
        spark.createDataFrame(
            [(i, ts, u, v) for i, ts, u, v in rows], "event_id long, ts string, user_id long, value double"
        ).select(
            "event_id", F.to_timestamp("ts").alias("ts"), "user_id", "value"
        ).coalesce(1).write.mode("append").parquet(src_dir)

    def run_once():
        src = spark.readStream.schema(schema).parquet(src_dir)
        q = (
            src.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "5 minutes").alias("w"))
            .agg(F.count("*").alias("cnt"), F.sum("value").alias("sv"))
            .select(F.col("w.start").alias("ws"), "cnt", "sv")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", cp)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write_batch(
        [
            (1, "2024-01-01 11:00:00", 1, 1.0),
            (2, "2024-01-01 11:04:00", 1, 2.0),
            (3, "2024-01-01 12:00:00", 2, 3.0),
        ]
    )
    run_once()
    write_batch(
        [
            (4, "2024-01-01 12:05:00", 1, 10.0),
            (5, "2024-01-01 11:01:00", 1, 99.0),  # behind the 11:50 watermark
        ]
    )
    run_once()
    return (
        spark.read.parquet(out_dir)
        .select(
            F.col("ws").cast("timestamp_ntz").alias("ws"),
            F.col("cnt").cast("bigint").alias("cnt"),
            dround("sv", 2).alias("sv"),
        )
        .orderBy("ws")
        .localCheckpoint(eager=True)
    )


@query(
    "b32_stream_stream_join",
    oracle="""
    WITH v AS (SELECT user_id, event_id, ts::TIMESTAMP AS ts FROM events
               WHERE event_type = 'view'),
         p AS (SELECT user_id, event_id, ts::TIMESTAMP AS ts FROM events
               WHERE event_type = 'purchase')
    SELECT count(*) AS pair_cnt,
           CAST(count(DISTINCT v.user_id) AS BIGINT) AS users,
           CAST(sum(v.event_id + p.event_id) AS BIGINT) AS id_checksum
    FROM v JOIN p
      ON v.user_id = p.user_id
     AND p.ts >= v.ts
     AND p.ts <= v.ts + INTERVAL 10 MINUTE
    """,
    tags=("B32", "streaming"),
    doc="Stream-stream interval join (the attribution join): views and "
    "purchases read as two watermarked streams, inner-joined per user within "
    "10 minutes, append mode. An availableNow pass emits exactly the matched "
    "pairs (watermarks bound state, not inner-join emission), so the batch "
    "join oracle matches. State is bounded by watermark-horizon x key "
    "cardinality at scale.",
)
def b32_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    views = (
        _events_stream(spark, sf_dir)
        .where(F.col("event_type") == "view")
        .select("user_id", F.col("event_id").alias("v_id"), F.col("ts").alias("v_ts"))
        .withWatermark("v_ts", "1 hour")
    )
    purchases = (
        _events_stream(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("p_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = views.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 10 MINUTES")),
    )
    mem = _run_to_memory(joined, "append")
    return mem.agg(
        F.count("*").alias("pair_cnt"),
        F.countDistinct("user_id").alias("users"),
        F.sum(F.col("v_id") + F.col("p_id")).cast("bigint").alias("id_checksum"),
    )


# ---------------------------------------------------------------------------
# B33 — stateful streaming aggregation, output modes
# ---------------------------------------------------------------------------

@query(
    "b33_stateful_agg_stream",
    oracle="""
    SELECT event_type,
           count(*) AS cnt,
           round(sum(value), 2) AS sum_val,
           round(min(value), 6) AS min_val,
           round(max(value), 6) AS max_val
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    tags=("B33", "streaming"),
    doc="Unwindowed stateful streaming aggregation per event_type "
    "(complete output mode) — global running state across microbatches.",
)
def b33_stateful_agg_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = _events_stream(spark, sf_dir)
    agg = stream.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        dround(F.sum("value"), 2).alias("sum_val"),
        dround(F.min("value"), 6).alias("min_val"),
        dround(F.max("value"), 6).alias("max_val"),
    )
    mem = _run_to_memory(agg, "complete")
    return mem.select("event_type", "cnt", "sum_val", "min_val", "max_val").orderBy("event_type")


@query(
    "b33_custom_stateful",
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events GROUP BY user_id ORDER BY user_id
    """,
    tags=("B33", "streaming"),
    doc="Custom stateful operator via applyInPandasWithState: one explicit "
    "(count, sum) state row per user maintained across microbatches "
    "(streaming/stateful.py running_user_stats). The final per-user state is "
    "taken with max() so the result is batch-split-independent and matches "
    "the batch aggregation oracle exactly.",
)
def b33_custom_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.stateful import running_user_stats

    stream = _events_stream(spark, sf_dir)
    stats = running_user_stats(stream)
    mem = _run_to_memory(stats, "update")
    # n_events strictly increases per emission, so the struct max picks each
    # user's FINAL state row whatever the microbatch split was
    final = mem.groupBy("user_id").agg(
        F.max(F.struct("n_events", "total_value")).alias("s")
    )
    return final.select(
        "user_id",
        F.col("s.n_events").cast("bigint").alias("n_events"),
        dround(F.col("s.total_value"), 2).alias("total_value"),
    ).orderBy("user_id")


@query(
    "b33_update_mode_stream",
    oracle="""
    SELECT time_bucket(INTERVAL '10 minutes', ts::TIMESTAMP) AS window_start,
           count(*) AS cnt
    FROM events GROUP BY window_start ORDER BY window_start
    """,
    tags=("B33", "streaming"),
    doc="Update output mode: windowed agg with watermark emits each updated "
    "window per microbatch. A window's count only ever grows, so max(cnt) "
    "per window reduces the batch-split-dependent emission log to the final "
    "state, which must hash-match the batch-SQL window counts (converted "
    "from rows-only in round 3). ASSUMPTION (ADVICE r3): the availableNow "
    "file source processes the single staged events file in ONE microbatch, "
    "so the 30-minute watermark never drops out-of-order rows the batch "
    "oracle counts; if the source were ever split into multiple batches, the "
    "watermark would need to exceed the fixture's max event-time disorder.",
)
def b33_update_mode_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window(F.col("ts"), "10 minutes").alias("w"))
        .agg(F.count("*").alias("cnt"))
    )
    mem = _run_to_memory(agg, "update")
    return (
        mem.select(F.col("w.start").cast("timestamp_ntz").alias("window_start"), "cnt")
        .groupBy("window_start")
        .agg(F.max("cnt").alias("cnt"))
        .orderBy("window_start")
    )
