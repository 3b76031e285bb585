"""Time-series operators (round 5, session 2): gap-filling resample with
forward fill, OHLC bar resampling, sweep-line interval concurrency, and
exact distributed percentiles — the hypertable-rollup family a time-series
workload runs over the ``events`` stream table.

Scale design notes (100 TB):
  * the resample spine is built PER KEY from each key's own min/max bounds
    (``sequence`` + ``explode``) — fully distributed, no driver-side
    calendar loop and no global cross join against a date dimension;
  * forward fill and running concurrency are per-key window frames — they
    shuffle once on the partition key and stream within each partition;
  * the sweep-line concurrency operator turns interval overlap counting
    (quadratic as a self-join) into a linear union + running sum;
  * exact percentiles use a single row_number pass; at petabyte scale the
    declared engine answer is ``approx_percentile`` (b12), this operator is
    the exact counterpart for bounded groups.

Determinism: sums of doubles are cast to DECIMAL(18,2) before aggregation
(exact, order-independent); ratios are rounded via ``dround`` on both
engines; ties on timestamps are totally ordered by (ts, event_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ._util import T, dround, tiny_sort


@query(
    "b57_gap_fill",
    oracle="""
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS hr,
             sum(CAST(value AS DECIMAL(18,2))) AS s, count(*) AS c
      FROM events WHERE user_id < 16
      GROUP BY user_id, date_trunc('hour', ts)
    ),
    bounds AS (
      SELECT user_id, min(hr) AS lo, max(hr) AS hi FROM hourly GROUP BY user_id
    ),
    spine AS (
      SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
      FROM bounds
    ),
    j AS (
      SELECT spine.user_id, spine.hr,
             CAST(hourly.s AS DOUBLE) / hourly.c AS avg_obs
      FROM spine LEFT JOIN hourly
        ON spine.user_id = hourly.user_id AND spine.hr = hourly.hr
    )
    SELECT user_id, hr,
           round(last_value(avg_obs IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY hr
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 100)
             / 100 AS avg_value,
           CAST(avg_obs IS NOT NULL AS INT) AS observed
    FROM j
    """,
    tags=("B16", "temporal"),
    doc="Hourly resample with gap filling: each user's event stream is "
    "bucketed to hours, missing hours are materialized from a per-key "
    "sequence() spine (distributed — no driver calendar), and gaps are "
    "forward-filled with last(ignorenulls) over a per-key frame. The first "
    "spine hour is each key's own min, so the fill is never NULL. "
    "Data-proportional output — no final sort (sorted-multiset compare).",
)
def b57_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events").where(F.col("user_id") < 16)
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(
        F.sum(F.col("value").cast("decimal(18,2)")).alias("s"),
        F.count("*").alias("c"),
    # materialize the hourly rollup ONCE: both the bounds/spine branch and
    # the fill join consume it — without this the fact scan + aggregation
    # would execute twice (the rollup is hours x keys, far smaller than the
    # event stream it replaces)
    ).localCheckpoint(eager=True)
    bounds = hourly.groupBy("user_id").agg(
        F.min("hr").alias("lo"), F.max("hr").alias("hi")
    )
    spine = bounds.select(
        "user_id",
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hr"),
    )
    j = spine.join(hourly, ["user_id", "hr"], "left").withColumn(
        "avg_obs", F.col("s").cast("double") / F.col("c")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "user_id",
        "hr",
        dround(F.last("avg_obs", ignorenulls=True).over(w), 2).alias("avg_value"),
        F.col("avg_obs").isNotNull().cast("int").alias("observed"),
    )


@query(
    "b57_resample_ohlc",
    oracle="""
    WITH base AS (
      -- CAST: DuckDB's date_trunc('day') yields DATE, Spark's a TIMESTAMP
      SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             ts, event_id, CAST(value AS DECIMAL(18,2)) AS v
      FROM events
    ),
    rn AS (
      SELECT *,
             row_number() OVER (PARTITION BY event_type, day
                                ORDER BY ts, event_id) AS rn_o,
             row_number() OVER (PARTITION BY event_type, day
                                ORDER BY ts DESC, event_id DESC) AS rn_c
      FROM base
    )
    SELECT event_type, day,
           CAST(max(CASE WHEN rn_o = 1 THEN v END) AS DOUBLE) AS open,
           CAST(max(v) AS DOUBLE) AS high,
           CAST(min(v) AS DOUBLE) AS low,
           CAST(max(CASE WHEN rn_c = 1 THEN v END) AS DOUBLE) AS close,
           CAST(sum(v) AS DOUBLE) AS volume,
           CAST(count(*) AS BIGINT) AS n_events
    FROM rn GROUP BY event_type, day
    ORDER BY event_type, day
    """,
    tags=("B16", "temporal"),
    doc="OHLC bar resampling per (event_type, day): open/close are the "
    "first/last value by a total (ts, event_id) order — one row_number "
    "window pass, no self-join — high/low/volume are plain aggregates. "
    "Volume sums DECIMAL(18,2) so it is exact and shuffle-order-"
    "independent. Output is bounded (types x days) -> tiny_sort.",
)
def b57_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = T(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("day", F.col("ts")).alias("day"),
        "ts",
        "event_id",
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    w_o = Window.partitionBy("event_type", "day").orderBy("ts", "event_id")
    w_c = Window.partitionBy("event_type", "day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    rn = base.withColumn("rn_o", F.row_number().over(w_o)).withColumn(
        "rn_c", F.row_number().over(w_c)
    )
    agg = rn.groupBy("event_type", "day").agg(
        F.max(F.when(F.col("rn_o") == 1, F.col("v"))).cast("double").alias("open"),
        F.max("v").cast("double").alias("high"),
        F.min("v").cast("double").alias("low"),
        F.max(F.when(F.col("rn_c") == 1, F.col("v"))).cast("double").alias("close"),
        F.sum("v").cast("double").alias("volume"),
        F.count("*").cast("bigint").alias("n_events"),
    )
    return tiny_sort(agg, "event_type", "day")


@query(
    "b57_sweep_concurrency",
    oracle="""
    WITH iv AS (
      SELECT event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS s,
             CAST(floor(epoch(ts)) AS BIGINT)
               + CAST(floor(value * 60) AS BIGINT) AS e
      FROM events
    ),
    pts AS (
      SELECT event_type, s AS t, 1 AS delta FROM iv
      UNION ALL
      SELECT event_type, e AS t, -1 AS delta FROM iv
    ),
    run AS (
      SELECT event_type,
             sum(delta) OVER (PARTITION BY event_type ORDER BY t
                              RANGE BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS conc
      FROM pts
    )
    SELECT event_type,
           CAST(max(conc) AS BIGINT) AS max_concurrent,
           CAST(count(*) AS BIGINT) AS n_points
    FROM run GROUP BY event_type ORDER BY event_type
    """,
    tags=("B8", "temporal"),
    doc="Sweep-line interval concurrency: each event spans "
    "[ts, ts + value*60 s]; max concurrent overlap per event_type is a "
    "union of +1/-1 endpoints and a RANGE-frame running sum — linear, "
    "never the quadratic interval self-join. The RANGE frame makes tied "
    "endpoints order-insensitive (closed-interval semantics on both "
    "engines). Epochs are floored BIGINT seconds on both sides (DuckDB's "
    "epoch() is a DOUBLE; Spark's unix_timestamp truncates).",
)
def b57_sweep_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    iv = T(spark, sf_dir, "events").select(
        "event_type",
        F.unix_timestamp("ts").alias("s"),
        (
            F.unix_timestamp("ts") + F.floor(F.col("value") * 60).cast("bigint")
        ).alias("e"),
    )
    # ONE scan: explode each interval into its two endpoint deltas (a union
    # of two selects would read the events table twice)
    pts = iv.select(
        "event_type",
        F.explode(
            F.array(
                F.struct(F.col("s").alias("t"), F.lit(1).alias("delta")),
                F.struct(F.col("e").alias("t"), F.lit(-1).alias("delta")),
            )
        ).alias("pt"),
    ).select("event_type", "pt.t", "pt.delta")
    w = (
        Window.partitionBy("event_type")
        .orderBy("t")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = pts.withColumn("conc", F.sum("delta").over(w))
    agg = run.groupBy("event_type").agg(
        F.max("conc").cast("bigint").alias("max_concurrent"),
        F.count("*").cast("bigint").alias("n_points"),
    )
    return tiny_sort(agg, "event_type")


@query(
    "b57_exact_percentiles",
    oracle="""
    WITH d AS (
      SELECT c_mktsegment, CAST(c_acctbal AS DECIMAL(18,2)) AS bal
      FROM customer
    ),
    rn AS (
      SELECT c_mktsegment, bal,
             row_number() OVER (PARTITION BY c_mktsegment ORDER BY bal) AS rn,
             count(*) OVER (PARTITION BY c_mktsegment) AS n
      FROM d
    )
    SELECT c_mktsegment,
           CAST(max(CASE WHEN rn = (50*n + 99) // 100 THEN bal END)
                AS DOUBLE) AS p50,
           CAST(max(CASE WHEN rn = (90*n + 99) // 100 THEN bal END)
                AS DOUBLE) AS p90,
           CAST(max(CASE WHEN rn = (99*n + 99) // 100 THEN bal END)
                AS DOUBLE) AS p99,
           CAST(max(n) AS BIGINT) AS n
    FROM rn GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    tags=("B12", "temporal"),
    doc="Exact nearest-rank percentiles (p50/p90/p99) per segment via one "
    "row_number pass — integer ceil((p*n)/100) indices on both engines, so "
    "no interpolated float arithmetic can straddle a rounding boundary. "
    "Ties on bal are index-order-independent: the value at rank k is "
    "unique even when row numbers among equal values are not. The exact "
    "counterpart of b12_approx_percentile; at 100 TB the approx sketch is "
    "the default and this pass runs on bounded groups.",
)
def b57_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "customer").select(
        "c_mktsegment", F.col("c_acctbal").cast("decimal(18,2)").alias("bal")
    )
    w = Window.partitionBy("c_mktsegment").orderBy("bal")
    wn = Window.partitionBy("c_mktsegment")
    rn = d.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(wn)
    )

    def at(p: int):
        return F.max(
            F.when(F.col("rn") == F.expr(f"({p}*n + 99) div 100"), F.col("bal"))
        ).cast("double")

    agg = rn.groupBy("c_mktsegment").agg(
        at(50).alias("p50"),
        at(90).alias("p90"),
        at(99).alias("p99"),
        F.max("n").cast("bigint").alias("n"),
    )
    return tiny_sort(agg, "c_mktsegment")


@query(
    "b57_ewma",
    oracle=r"""
    WITH ev AS (
      SELECT user_id, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS s, value
      FROM events WHERE user_id < 8
    ),
    framed AS (
      SELECT user_id, event_id, s,
             list(struct_pack(t := s, v := value))
               OVER (PARTITION BY user_id ORDER BY s, event_id
                     ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS hist
      FROM ev
    ),
    terms AS (
      SELECT user_id, event_id, s,
             CAST(len(hist) AS BIGINT) AS n_frame,
             list_sum(list_transform(hist, e ->
               CAST(round(e.v * pow(0.5, (s - e.t) / 1800.0) * 1000000000)
                    / 1000000000 AS DECIMAL(28,9)))) AS num,
             list_sum(list_transform(hist, e ->
               CAST(round(pow(0.5, (s - e.t) / 1800.0) * 1000000000)
                    / 1000000000 AS DECIMAL(28,9)))) AS den
      FROM framed
    )
    SELECT user_id, event_id, s, n_frame,
           round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS ewma
    FROM terms
    """,
    tags=("B15", "timeseries"),
    doc="Time-decayed exponentially-weighted moving average per user "
    "(half-life 30 min over the last 10 events) — the streaming-feature "
    "shape (recency-weighted engagement) a training pipeline derives "
    "from event history. One keyed window pass: the bounded ROWS frame "
    "is collected per row (<=10 structs) and folded JVM-side with "
    "frame-local weights pow(0.5, dt/halflife) — the weights depend on "
    "the CURRENT row's time, so no prefix-sum trick applies without "
    "overflowing pow(2, epoch/h); the bounded-frame fold is exact and "
    "scales as one shuffle on user_id. Per-term 9dp decimal rounding "
    "before the fixed-order sum (the b56 discipline) absorbs cross-"
    "engine pow() ulp drift. No final ORDER BY: rows are compared as "
    "sorted multisets (r5 retune discipline).",
)
def b57_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events").where(F.col("user_id") < 8).select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").alias("s"),
        "value",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(-9, Window.currentRow)
    )
    framed = ev.select(
        "user_id",
        "event_id",
        "s",
        F.collect_list(F.struct(F.col("s").alias("t"), F.col("value").alias("v")))
        .over(w)
        .alias("hist"),
    )
    cur = F.col("s")
    zero = F.lit(0).cast("decimal(28,9)")

    def fold(term):
        return F.aggregate(
            "hist",
            zero,
            lambda acc, e: (acc + dround(term(e), 9).cast("decimal(28,9)")).cast(
                "decimal(38,9)"
            ).cast("decimal(28,9)"),
        )

    out = framed.select(
        "user_id",
        "event_id",
        "s",
        F.size("hist").cast("bigint").alias("n_frame"),
        dround(
            fold(lambda e: e["v"] * F.pow(0.5, (cur - e["t"]) / 1800.0)).cast(
                "double"
            )
            / fold(lambda e: F.pow(0.5, (cur - e["t"]) / 1800.0)).cast("double"),
            6,
        ).alias("ewma"),
    )
    return out
