"""Classifier-evaluation and apportionment diagnostics: exact ROC-AUC
(Mann-Whitney rank form), expected calibration error, and Hamilton
largest-remainder quota allocation — the measurements a training-data
pipeline runs when a quality classifier gates admission and a mixture
budget turns shares into integer document counts.

Scale design notes (100 TB):
  * ROC-AUC needs per-group ranks over the score — ONE range-shuffle per
    group partition.  Tie handling uses the min+max rank identity
    (2·avgrank = rank_asc + n − rank_desc + 1) so BOTH windows partition by
    the same key: Spark reuses a single hash exchange and only re-sorts
    between them (no second shuffle — pinned in tests/test_plans.py).
    Everything after the windows is a map-side-combined aggregate to one
    bounded row per group.
  * ECE is a single 10-bucket hash aggregation (map-side combined) plus a
    second aggregate over the bounded 10-row bin relation — no row count
    ever exceeds the bin count after the first exchange.
  * Quota allocation aggregates to one row per source FIRST (map-side
    combined); the apportionment window runs on that bounded relation
    (≤ |sources| rows — the tiny-relation discipline used by the b57
    gap-fill offsets), so the single-reducer sort touches dozens of rows,
    never the corpus.

Determinism: every reported number is an exact integer on the 1e-6 grid
(integer DIV; Spark DECIMAL(38,0) intermediates mirror DuckDB's HUGEINT sum
promotion — the b76 overflow discipline) — no cross-engine float boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ._util import T, tiny_sort

# Label/score convention shared by the AUC and calibration queries: the
# "classifier" score is the deterministic n_chars column (longer documents
# really are likelier to be English in this fixture family), the label is
# lang = 'en'.  Both sides derive them with identical integer expressions.
_LABEL_SQL = "CASE WHEN lang = 'en' THEN 1 ELSE 0 END"


@query(
    "b77_roc_auc",
    oracle=f"""
    WITH scored AS (
      SELECT source, CAST(n_chars AS BIGINT) AS x,
             {_LABEL_SQL} AS y
      FROM documents WHERE n_chars IS NOT NULL AND lang IS NOT NULL
    ),
    ranked AS (
      SELECT source, x, y,
             rank() OVER (PARTITION BY source ORDER BY x ASC)  AS r_asc,
             rank() OVER (PARTITION BY source ORDER BY x DESC) AS r_desc,
             count(*) OVER (PARTITION BY source) AS n
      FROM scored
    ),
    g AS (
      SELECT source,
             CAST(sum(y) AS BIGINT) AS n_pos,
             CAST(count(*) - sum(y) AS BIGINT) AS n_neg,
             -- 2*Sum_pos(avgrank): min+max rank identity, ties exact
             CAST(sum(CASE WHEN y = 1 THEN r_asc + n - r_desc + 1 ELSE 0 END)
                  AS BIGINT) AS s2
      FROM ranked GROUP BY source
    )
    SELECT source, n_pos, n_neg,
           -- HUGEINT, not DECIMAL: DuckDB's // on DECIMAL operands degrades
           -- to float division (754385.96 where exact floor is 754385);
           -- HUGEINT // is exact 128-bit integer floor
           CASE WHEN n_pos > 0 AND n_neg > 0 THEN
             CAST(CAST(s2 - n_pos * (n_pos + 1) AS HUGEINT) * 1000000
                  // (2 * n_pos * n_neg) AS BIGINT)
           END AS auc_e6
    FROM g ORDER BY source
    """,
    tags=("B14", "llm", "eval"),
    doc="Per-source exact ROC-AUC of the length score predicting lang='en' "
    "(Mann-Whitney: AUC = (2·R_pos − n_pos(n_pos+1)) / (2·n_pos·n_neg) with "
    "tie-averaged ranks via the min+max rank identity, so both rank windows "
    "share ONE source-partitioned exchange). The quality-classifier "
    "admission gate's standard evaluation, exact on the 1e-6 grid.",
)
def b77_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents").where(
        F.col("n_chars").isNotNull() & F.col("lang").isNotNull()
    )
    scored = docs.select(
        "source",
        F.col("n_chars").cast("bigint").alias("x"),
        F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0)).alias("y"),
    )
    part = Window.partitionBy("source")
    ranked = scored.select(
        "source",
        "y",
        F.rank().over(part.orderBy(F.col("x").asc())).alias("r_asc"),
        F.rank().over(part.orderBy(F.col("x").desc())).alias("r_desc"),
        F.count("*").over(part).alias("n"),
    )
    g = ranked.groupBy("source").agg(
        F.sum("y").cast("bigint").alias("n_pos"),
        (F.count("*") - F.sum("y")).cast("bigint").alias("n_neg"),
        F.sum(
            F.when(
                F.col("y") == 1, F.col("r_asc") + F.col("n") - F.col("r_desc") + 1
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("s2"),
    )
    # s2 ≤ 2·n², so s2·1e6 OVERFLOWS int64 near n ~ 2M rows per source
    # (2·(2e6)²·1e6 ≈ 8e18 vs the 9.2e18 max) — hence the DECIMAL(38,0)
    # widening below, mirroring DuckDB's HUGEINT promotion (b76 rule).
    # Do not simplify the cast away: it is load-bearing past fixture scale.
    out = g.select(
        "source",
        "n_pos",
        "n_neg",
        F.expr(
            "CASE WHEN n_pos > 0 AND n_neg > 0 THEN "
            "CAST(CAST(s2 - n_pos * (n_pos + 1) AS DECIMAL(38,0)) * 1000000 "
            "DIV (2 * n_pos * n_neg) AS BIGINT) END"
        ).alias("auc_e6"),
    )
    return tiny_sort(out, "source")  # bounded: one row per source


@query(
    "b77_calibration_ece",
    oracle=f"""
    WITH scored AS (
      SELECT (n_chars % 100) AS conf_pct,
             (n_chars % 100) // 10 AS bin,
             {_LABEL_SQL} AS y
      FROM documents WHERE n_chars IS NOT NULL AND lang IS NOT NULL
    ),
    bins AS (
      SELECT bin,
             CAST(count(*) AS BIGINT) AS n_bin,
             CAST(sum(y) AS BIGINT) AS pos,
             CAST(sum(conf_pct) AS BIGINT) AS sum_conf
      FROM scored GROUP BY bin
    ),
    per_bin AS (
      -- HUGEINT scaling: BIGINT*1e6 errors loudly past ~9e12-row bins in
      -- DuckDB while Spark BIGINT silently wraps — both sides widen (the
      -- b76 overflow discipline); // on HUGEINT is exact integer floor
      SELECT CAST(bin AS BIGINT) AS bin, n_bin,
             CAST(CAST(pos AS HUGEINT) * 1000000 // n_bin AS BIGINT)
               AS pos_rate_e6,
             CAST(CAST(sum_conf AS HUGEINT) * 1000000 // (100 * n_bin)
                  AS BIGINT) AS conf_e6,
             CAST(CAST(abs(100 * pos - sum_conf) AS HUGEINT) * 1000000
                  // (100 * n_bin) AS BIGINT) AS gap_e6
      FROM bins
    ),
    total AS (
      SELECT CAST(-1 AS BIGINT) AS bin,
             CAST(sum(n_bin) AS BIGINT) AS n_bin,
             CAST(NULL AS BIGINT) AS pos_rate_e6,
             CAST(NULL AS BIGINT) AS conf_e6,
             -- ECE = Sum_b |100*pos_b - sum_conf_b| / (100*n)
             CAST(CAST(sum(abs(100 * pos - sum_conf)) AS HUGEINT) * 1000000
                  // (100 * sum(n_bin)) AS BIGINT) AS gap_e6
      FROM bins
    )
    SELECT * FROM per_bin UNION ALL SELECT * FROM total
    ORDER BY bin
    """,
    tags=("B10", "llm", "eval"),
    doc="Expected calibration error of a centesimal pseudo-confidence "
    "(n_chars mod 100) against lang='en': per-decile-bin accuracy vs mean "
    "confidence plus the bin=-1 corpus ECE row. One 10-bucket map-side-"
    "combined aggregation; the total re-aggregates the bounded bin "
    "relation. Exact rationals on the 1e-6 grid — the |acc−conf| gap is "
    "|100·pos − Σconf| / (100·n_bin), no float anywhere.",
)
def b77_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents").where(
        F.col("n_chars").isNotNull() & F.col("lang").isNotNull()
    )
    scored = docs.select(
        (F.col("n_chars") % 100).alias("conf_pct"),
        ((F.col("n_chars") % 100) / 10).cast("int").alias("bin"),
        F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0)).alias("y"),
    )
    bins = scored.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n_bin"),
        F.sum("y").cast("bigint").alias("pos"),
        F.sum("conf_pct").cast("bigint").alias("sum_conf"),
    )
    # DECIMAL(38,0) scaling mirrors the oracle's HUGEINT: BIGINT*1e6 would
    # silently wrap in non-ANSI Spark past ~9e12-row bins (b76 rule)
    per_bin = bins.select(
        F.col("bin").cast("bigint").alias("bin"),
        "n_bin",
        F.expr(
            "CAST(CAST(pos AS DECIMAL(38,0)) * 1000000 DIV n_bin AS BIGINT)"
        ).alias("pos_rate_e6"),
        F.expr(
            "CAST(CAST(sum_conf AS DECIMAL(38,0)) * 1000000 DIV (100 * n_bin)"
            " AS BIGINT)"
        ).alias("conf_e6"),
        F.expr(
            "CAST(CAST(abs(100 * pos - sum_conf) AS DECIMAL(38,0)) * 1000000"
            " DIV (100 * n_bin) AS BIGINT)"
        ).alias("gap_e6"),
    )
    total = bins.agg(
        F.lit(-1).cast("bigint").alias("bin"),
        F.sum("n_bin").cast("bigint").alias("n_bin"),
        F.lit(None).cast("bigint").alias("pos_rate_e6"),
        F.lit(None).cast("bigint").alias("conf_e6"),
        F.expr(
            "CAST(CAST(sum(abs(100 * pos - sum_conf)) AS DECIMAL(38,0)) * 1000000"
            " DIV (100 * sum(n_bin)) AS BIGINT)"
        ).alias("gap_e6"),
    )
    return tiny_sort(per_bin.unionByName(total), "bin")  # ≤ 11 rows


_QUOTA_BUDGET = 10_000


@query(
    "b77_quota_allocation",
    oracle=f"""
    WITH per_src AS (
      SELECT source, CAST(sum(n_chars) AS BIGINT) AS chars
      FROM documents WHERE n_chars IS NOT NULL GROUP BY source
    ),
    tot AS (SELECT CAST(sum(chars) AS BIGINT) AS total FROM per_src),
    base AS (
      -- HUGEINT, not DECIMAL: // and % on DECIMAL degrade to float in
      -- DuckDB (a half-up rounding masquerading as a floor); HUGEINT
      -- keeps the apportionment exact 128-bit integer arithmetic
      SELECT source, chars,
             CAST(CAST({_QUOTA_BUDGET} AS HUGEINT) * chars // total
                  AS BIGINT) AS floor_q,
             CAST((CAST({_QUOTA_BUDGET} AS HUGEINT) * chars) % total
                  AS BIGINT) AS rem
      FROM per_src CROSS JOIN tot
    ),
    ranked AS (
      SELECT *, row_number() OVER (ORDER BY rem DESC, source ASC) AS pri,
             CAST({_QUOTA_BUDGET} AS BIGINT) - sum(floor_q) OVER () AS leftover
      FROM base
    )
    SELECT source, chars,
           CAST(floor_q + CASE WHEN pri <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS quota
    FROM ranked ORDER BY source
    """,
    tags=("B10", "llm", "eval"),
    doc="Hamilton largest-remainder apportionment of a 10000-document "
    "sampling budget across sources, weighted by total characters: floor "
    "quotas by exact integer division (DECIMAL(38,0) product — budget×chars "
    "passes int64 near 1e15 chars), the leftover distributed to the largest "
    "remainders (source-name tie-break). The mixture-to-integer-counts step "
    "after b65_domain_mixture picks shares. Corpus work is ONE map-side-"
    "combined sum per source; the apportionment windows run on the bounded "
    "per-source relation only.",
)
def b77_quota_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_src = (
        T(spark, sf_dir, "documents")
        .where(F.col("n_chars").isNotNull())
        .groupBy("source")
        .agg(F.sum("n_chars").cast("bigint").alias("chars"))
    )
    # bounded from here on (one row per source): the 1-row total attaches
    # as a broadcast, the priority/leftover windows sort dozens of rows
    tot = per_src.agg(F.sum("chars").cast("bigint").alias("total"))
    base = per_src.join(F.broadcast(tot)).select(
        "source",
        "chars",
        F.expr(
            f"CAST(CAST({_QUOTA_BUDGET} AS DECIMAL(38,0)) * chars DIV total"
            " AS BIGINT)"
        ).alias("floor_q"),
        F.expr(
            f"CAST((CAST({_QUOTA_BUDGET} AS DECIMAL(38,0)) * chars) % total"
            " AS BIGINT)"
        ).alias("rem"),
    )
    w_pri = Window.orderBy(F.col("rem").desc(), F.col("source").asc())
    w_all = Window.partitionBy()
    ranked = base.select(
        "source",
        "chars",
        "floor_q",
        F.row_number().over(w_pri).alias("pri"),
        (F.lit(_QUOTA_BUDGET) - F.sum("floor_q").over(w_all)).alias("leftover"),
    )
    out = ranked.select(
        "source",
        "chars",
        (
            F.col("floor_q")
            + F.when(F.col("pri") <= F.col("leftover"), F.lit(1)).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("quota"),
    )
    return tiny_sort(out, "source")
