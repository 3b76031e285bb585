"""Robust/distributional statistics: Gini concentration, exact two-sample
Kolmogorov-Smirnov, and winsorized moments — the distribution-shift and
outlier-handling diagnostics a training-data pipeline runs per data source.

Scale design notes (100 TB):
  * Gini needs per-group ranks, which is ONE range-shuffle per group
    partition (row_number over a hash-partitioned window); everything after
    is a map-side-combined aggregate.  The rank sum Σi·x is data-
    proportional through exactly one exchange — the same cost envelope as
    any per-source sort — and the final relation is bounded (one row per
    source).
  * The KS cumulative distribution is the textbook single-ordering prefix
    sum — but a global window is a one-reducer scale killer, so the cumsum
    runs TWO-LEVEL: per-value counts bucket by a fixed value-width, each
    bucket cumsums in parallel (window partitioned by bucket), and the
    bounded bucket-total relation (range/width rows) prefix-sums on the
    driver-side-tiny window and broadcasts back as per-bucket offsets (the
    b57 gap-fill discipline).  No stage sees more than one bucket's rows in
    one task; D = max|c1·n2 − c2·n1| is then a plain max aggregate in exact
    integers.
  * Winsorization needs two order statistics per group, not a full sort:
    ranks come from the per-group window pass, the two boundary rows per
    group form a BOUNDED relation that broadcasts back, and the clipped
    re-aggregate is map-side combined.  Values live on the exact 1e-6
    integer grid (the repo-wide discipline) so sums are associative BIGINTs
    — order- and partitioning-independent.

Determinism: every reported number is an exact integer (counts, e6-grid
values, integer-division ratios with DIV / // which agree for non-negative
operands); no cross-engine float boundary exists anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ._util import T, tiny_sort

_KS_BUCKET_WIDTH = 10.0  # events.value spans [0, ~500] → ~50 bounded buckets


@query(
    "b76_gini_concentration",
    oracle="""
    WITH r AS (
      SELECT source, CAST(n_chars AS BIGINT) AS x,
             row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS i
      FROM documents WHERE n_chars IS NOT NULL
    ),
    g AS (
      SELECT source, count(*) AS n, sum(x) AS sx, sum(i * x) AS six
      FROM r GROUP BY 1
    )
    SELECT source,
           CAST(n AS BIGINT) AS n_docs,
           CAST(sx AS BIGINT) AS total_chars,
           CAST((2 * six - (n + 1) * sx) * 1000000 // (n * sx) AS BIGINT) AS gini_e6
    FROM g ORDER BY source
    """,
    tags=("B10", "llm", "robust"),
    doc="Per-source Gini concentration of document lengths (the data-mixture "
    "inequality diagnostic): G = (2*Sum(i*x_i) - (n+1)*Sum(x)) / (n*Sum(x)) over "
    "ranks i from an (n_chars, doc_id)-ordered per-source window. The rank-"
    "weighted sum and the scaled numerator run in DECIMAL(38,0) on the Spark "
    "side (mirroring DuckDB's HUGEINT sum promotion) — n*Sum(x)*1e6 passes "
    "int64 around 1e5 10k-char docs per source, so BIGINT intermediates "
    "would silently wrap in non-ANSI Spark while the oracle survives. The "
    "ratio ships on a 1e-6 grid via floor division (DECIMAL DIV / HUGEINT "
    "// agree for non-negative operands) — no float anywhere. One range-"
    "shuffle for ranks, then bounded output.",
)
def b76_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL guard is load-bearing for cross-engine rank parity: Spark sorts
    # NULLs first ascending, DuckDB last — a NULL n_chars would silently
    # shift every rank in its source group.
    docs = T(spark, sf_dir, "documents").where(F.col("n_chars").isNotNull()).select(
        "source", F.col("n_chars").cast("bigint").alias("x"), "doc_id"
    )
    w = Window.partitionBy("source").orderBy("x", "doc_id")
    ranked = docs.withColumn("i", F.row_number().over(w))
    # Per-row i*x fits int64 (rank ~1e9 × chars ~1e5 → 1e14); the SUM and the
    # *1e6-scaled numerator do not — accumulate in DECIMAL(38,0) so Spark
    # matches DuckDB's HUGEINT exactly instead of wrapping.
    g = ranked.groupBy("source").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum((F.col("i") * F.col("x")).cast("decimal(38,0)")).alias("six"),
    )
    out = g.select(
        "source",
        F.col("n").cast("bigint").alias("n_docs"),
        F.col("sx").cast("bigint").alias("total_chars"),
        F.expr(
            "CAST((2 * six - (CAST(n AS DECIMAL(38,0)) + 1) * sx) * 1000000"
            " DIV (CAST(n AS DECIMAL(38,0)) * sx) AS BIGINT)"
        ).alias("gini_e6"),
    )
    return tiny_sort(out, "source")


@query(
    "b76_ks_test",
    oracle="""
    WITH ev AS (
      SELECT value, event_type FROM events
      WHERE event_type IN ('purchase', 'view') AND value IS NOT NULL
    ),
    g AS (
      SELECT value,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS a1,
             sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS a2
      FROM ev GROUP BY 1
    ),
    c AS (
      SELECT sum(a1) OVER (ORDER BY value) AS c1,
             sum(a2) OVER (ORDER BY value) AS c2
      FROM g
    ),
    t AS (SELECT sum(a1) AS n1, sum(a2) AS n2 FROM g)
    SELECT CAST(n1 AS BIGINT) AS n1,
           CAST(n2 AS BIGINT) AS n2,
           CAST(max(abs(c1 * n2 - c2 * n1)) AS BIGINT) AS d_num,
           CAST(max(abs(c1 * n2 - c2 * n1)) * 1000000 // (n1 * n2) AS BIGINT) AS d_e6
    FROM c, t GROUP BY n1, n2
    """,
    tags=("B10", "robust"),
    doc="Exact two-sample Kolmogorov-Smirnov statistic between the purchase "
    "and view value distributions: D = max_x |F1(x) - F2(x)| computed as the "
    "exact integer max |c1*n2 - c2*n1| over the pooled jump points, shipped "
    "on a 1e-6 grid by floor division. The c*n cross-products and the *1e6 "
    "scaling run in DECIMAL(38,0) on the Spark side (they pass int64 once "
    "n1*n2 > ~9.2e12, i.e. ~3M samples per side) so the arithmetic matches "
    "DuckDB's HUGEINT promotion instead of wrapping; d_e6 is therefore exact "
    "at any corpus size, while the raw d_num DIAGNOSTIC column stays a "
    "BIGINT report and saturates only past n1*n2 > 9.2e18. The Spark cumsum "
    "is two-level (per-value counts -> fixed-width value buckets cumsum in "
    "parallel -> bounded bucket-offset relation broadcast back), so no "
    "single reducer ever sees the full distribution; the DuckDB oracle uses "
    "the plain global window.",
)
def b76_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "view") & F.col("value").isNotNull()
    )
    g = ev.groupBy("value").agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("a1"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("a2"),
    )
    g = g.withColumn("bkt", F.floor(F.col("value") / F.lit(_KS_BUCKET_WIDTH)).cast("bigint"))

    # Parallel within-bucket cumulative counts.
    wb = Window.partitionBy("bkt").orderBy("value")
    g2 = g.withColumn("ca1", F.sum("a1").over(wb)).withColumn("ca2", F.sum("a2").over(wb))

    # Bounded bucket totals -> exclusive prefix offsets (tiny window) -> broadcast.
    btot = g.groupBy("bkt").agg(F.sum("a1").alias("s1"), F.sum("a2").alias("s2"))
    woff = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    off = btot.select(
        "bkt",
        F.coalesce(F.sum("s1").over(woff), F.lit(0)).alias("off1"),
        F.coalesce(F.sum("s2").over(woff), F.lit(0)).alias("off2"),
    )
    totals = btot.agg(F.sum("s1").alias("n1"), F.sum("s2").alias("n2"))

    j = (
        g2.join(F.broadcast(off), "bkt")
        .withColumn("c1", F.col("ca1") + F.col("off1"))
        .withColumn("c2", F.col("ca2") + F.col("off2"))
        .crossJoin(F.broadcast(totals))
    )
    # c1*n2 exceeds int64 past ~3M samples per side — run the cross-products
    # and the magnified ratio in DECIMAL(38,0) (DuckDB already promotes its
    # BIGINT sums to HUGEINT, so only Spark needed the widening).
    d = F.abs(
        F.col("c1").cast("decimal(38,0)") * F.col("n2")
        - F.col("c2").cast("decimal(38,0)") * F.col("n1")
    )
    return (
        j.groupBy("n1", "n2")
        .agg(F.max(d).alias("d_num_raw"))
        .select(
            F.col("n1").cast("bigint").alias("n1"),
            F.col("n2").cast("bigint").alias("n2"),
            F.col("d_num_raw").cast("bigint").alias("d_num"),
            F.expr(
                "CAST(d_num_raw * 1000000"
                " DIV (CAST(n1 AS DECIMAL(38,0)) * n2) AS BIGINT)"
            ).alias("d_e6"),
        )
    )


@query(
    "b76_winsorized_stats",
    oracle="""
    WITH ev AS (
      SELECT event_type, event_id,
             CAST(round(value * 1000000.0) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL
    ),
    r AS (
      SELECT event_type, v,
             row_number() OVER (PARTITION BY event_type ORDER BY v, event_id) AS rn
      FROM ev
    ),
    n AS (SELECT event_type, count(*) AS n FROM ev GROUP BY 1),
    b AS (
      SELECT r.event_type,
             min(CASE WHEN rn = (n + 19) // 20 THEN v END) AS lo_v,
             min(CASE WHEN rn = (19 * n + 19) // 20 THEN v END) AS hi_v
      FROM r JOIN n USING (event_type) GROUP BY 1
    )
    SELECT ev.event_type,
           CAST(min(n.n) AS BIGINT) AS n_events,
           CAST(min(lo_v) AS BIGINT) AS lo_e6,
           CAST(min(hi_v) AS BIGINT) AS hi_e6,
           CAST(sum(least(greatest(v, lo_v), hi_v)) AS BIGINT) AS wsum_e6,
           CAST(sum(CASE WHEN v < lo_v THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_lo,
           CAST(sum(CASE WHEN v > hi_v THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_hi
    FROM ev JOIN b USING (event_type) JOIN n USING (event_type)
    GROUP BY 1 ORDER BY 1
    """,
    tags=("B10", "robust"),
    doc="Per-type winsorized statistics: the 5th/95th order statistics (exact "
    "rank ceil(n/20) / ceil(19n/20) with (value, event_id) tie-break) clip "
    "the tails and the clipped sum re-aggregates map-side. Values live on "
    "the exact 1e-6 integer grid so every sum is an associative BIGINT; the "
    "two boundary rows per group form a bounded broadcast relation — one "
    "rank shuffle, no global sort.",
)
def b76_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events").where(F.col("value").isNotNull()).select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 1000000.0).cast("bigint").alias("v"),
    )
    w = Window.partitionBy("event_type").orderBy("v", "event_id")
    # n comes from a partition-frame count over the SAME exchange as the rank
    # window (two WindowExecs, one shuffle, second sort a no-op) — the old
    # separate groupBy(n)+broadcast-join cost a third scan of events and an
    # extra shuffle for what the window pass already knows (r7 verdict #7:
    # the 10x draw straddled 2x on a sub-second absolute; less work beats
    # more draws).
    r = ev.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(Window.partitionBy("event_type"))
    )
    b = (
        r.where(
            (F.col("rn") == F.expr("(n + 19) DIV 20"))
            | (F.col("rn") == F.expr("(19 * n + 19) DIV 20"))
        )
        .groupBy("event_type")
        .agg(
            F.min(F.when(F.col("rn") == F.expr("(n + 19) DIV 20"), F.col("v"))).alias("lo_v"),
            F.min(F.when(F.col("rn") == F.expr("(19 * n + 19) DIV 20"), F.col("v"))).alias(
                "hi_v"
            ),
            F.min("n").alias("n"),
        )
    )
    clipped = F.least(F.greatest(F.col("v"), F.col("lo_v")), F.col("hi_v"))
    out = (
        ev.join(F.broadcast(b), "event_type")
        .groupBy("event_type")
        .agg(
            F.min("n").cast("bigint").alias("n_events"),
            F.min("lo_v").cast("bigint").alias("lo_e6"),
            F.min("hi_v").cast("bigint").alias("hi_e6"),
            F.sum(clipped).cast("bigint").alias("wsum_e6"),
            F.sum(F.when(F.col("v") < F.col("lo_v"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clip_lo"),
            F.sum(F.when(F.col("v") > F.col("hi_v"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clip_hi"),
        )
    )
    return tiny_sort(out, "event_type")
