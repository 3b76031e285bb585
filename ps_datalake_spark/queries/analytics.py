"""Classic analytics workloads over the events/orders tables: histograms,
funnel analysis, cohort retention. All oracle-checked."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ._util import T, dround, tiny_sort


@query(
    "b45_histogram",
    oracle="""
    SELECT CAST(least(floor(o_totalprice / 50000), 9) AS BIGINT) AS bin,
           count(*) AS cnt,
           round(min(o_totalprice), 2) AS bin_min,
           round(max(o_totalprice), 2) AS bin_max
    FROM orders
    GROUP BY 1 ORDER BY 1
    """,
    tags=("B45",),
    doc="Fixed-width histogram (50k bins, top-coded at bin 9).",
)
def b45_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = T(spark, sf_dir, "orders")
    bin_ = F.least(F.floor(F.col("o_totalprice") / 50000), F.lit(9)).cast("bigint")
    return (
        o.groupBy(bin_.alias("bin"))
        .agg(
            F.count("*").alias("cnt"),
            dround(F.min("o_totalprice"), 2).alias("bin_min"),
            dround(F.max("o_totalprice"), 2).alias("bin_max"),
        )
        .orderBy("bin")
    )


@query(
    "b45_funnel",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts::TIMESTAMP END) AS t_view,
             min(CASE WHEN event_type = 'click' THEN ts::TIMESTAMP END) AS t_click,
             min(CASE WHEN event_type = 'purchase' THEN ts::TIMESTAMP END) AS t_buy
      FROM events GROUP BY user_id
    )
    SELECT count(*) AS n_users,
           CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS step_view,
           CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                THEN 1 ELSE 0 END) AS BIGINT) AS step_click,
           CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view AND t_buy > t_click
                THEN 1 ELSE 0 END) AS BIGINT) AS step_buy
    FROM firsts
    """,
    tags=("B45",),
    doc="Ordered funnel: users whose first view precedes first click precedes "
    "first purchase (conditional aggregation, one pass).",
)
def b45_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_buy"),
    )
    return firsts.agg(
        F.count("*").alias("n_users"),
        F.sum(F.when(F.col("t_view").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("step_view"),
        F.sum(
            F.when(F.col("t_view").isNotNull() & (F.col("t_click") > F.col("t_view")), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("step_click"),
        F.sum(
            F.when(
                F.col("t_view").isNotNull()
                & (F.col("t_click") > F.col("t_view"))
                & (F.col("t_buy") > F.col("t_click")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("step_buy"),
    )


@query(
    "b45_cohort_retention",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, date_trunc('week', min(ts::TIMESTAMP))::DATE AS cohort
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts::TIMESTAMP)::DATE AS wk
      FROM events
    )
    SELECT cohort,
           CAST(datediff('week', cohort, wk) AS BIGINT) AS week_n,
           CAST(count(*) AS BIGINT) AS active_users
    FROM first_seen JOIN activity USING (user_id)
    GROUP BY cohort, week_n
    ORDER BY cohort, week_n
    """,
    tags=("B45",),
    doc="Cohort retention: users grouped by first-seen week × weeks since.",
)
def b45_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("wk")
    ).distinct()
    j = first_seen.join(activity, "user_id")
    week_n = (F.datediff(F.col("wk"), F.col("cohort")) / 7).cast("bigint")
    return (
        j.groupBy("cohort", week_n.alias("week_n"))
        .agg(F.count("*").cast("bigint").alias("active_users"))
        .orderBy("cohort", "week_n")
    )


@query(
    "b45_rolling_mau",
    oracle="""
    WITH daily AS (
      SELECT DISTINCT ts::TIMESTAMP::DATE AS d, user_id FROM events
    ),
    days AS (SELECT DISTINCT d FROM daily)
    SELECT w.d AS day, CAST(count(DISTINCT e.user_id) AS BIGINT) AS mau7
    FROM days w
    JOIN daily e ON e.d BETWEEN w.d - 6 AND w.d
    GROUP BY w.d ORDER BY w.d
    """,
    tags=("B45", "B22"),
    doc="Rolling 7-day active users per day (the windowed COUNT DISTINCT "
    "no frame supports): dedup to (day, user) once, then EXPLODE each "
    "active day into the <=7 observation days it contributes to and "
    "dedup (window_day, user) before counting — the linear rewrite "
    "(7x the deduped rows, two keyed shuffles) of the quadratic "
    "day-range self-join, and the standard scalable rolling-MAU shape. "
    "Observation days are restricted to days that actually occur, "
    "matching the oracle's day spine.",
)
def b45_rolling_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        T(spark, sf_dir, "events")
        .select(F.col("ts").cast("date").alias("d"), "user_id")
        .distinct()
    )
    days = daily.select("d").distinct()
    contrib = (
        daily.select(
            F.explode(
                F.sequence(F.col("d"), F.date_add(F.col("d"), 6))
            ).alias("day"),
            "user_id",
        )
        .distinct()
        .join(F.broadcast(days.select(F.col("d").alias("day"))), "day", "semi")
    )
    out = contrib.groupBy("day").agg(
        F.countDistinct("user_id").cast("bigint").alias("mau7")
    )
    return tiny_sort(out, "day")


@query(
    "b44_incremental_agg",
    oracle="""
    SELECT event_type,
           ts::TIMESTAMP::DATE AS day,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM events
    GROUP BY event_type, day
    ORDER BY event_type, day
    """,
    tags=("B10", "warehouse"),
    doc="Incremental materialized-view maintenance: the stored aggregate "
    "(events before the split date, grouped per (event_type, day)) is "
    "REFRESHED with a late-arriving delta batch (event_id % 4 == 0 — rows "
    "landing in EXISTING groups, the hard case) by merging "
    "PARTIAL aggregates — counts add, decimal sums add — via a full-outer "
    "combine keyed on the group, never re-scanning the base data. The "
    "oracle recomputes the aggregate from scratch over all events: "
    "incremental-merge == full-recompute is exactly the MV-maintenance "
    "invariant (sum/count are the self-maintainable algebra; the same "
    "shape maintains avg via (sum, count)). At 100 TB the base relation "
    "is the stored MV table and only the delta is scanned.",
)
def b44_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.col("ts").cast("date").alias("day"),
        F.col("value").cast("decimal(18,2)").alias("v"),
    )

    def partial(df):
        return df.groupBy("event_type", "day").agg(
            F.count("*").alias("n"), F.sum("v").alias("total")
        )

    base = partial(ev.where(F.col("event_id") % 4 != 0))
    delta = partial(ev.where(F.col("event_id") % 4 == 0))
    merged = (
        base.select("event_type", "day", "n", "total")
        .unionByName(delta.select("event_type", "day", "n", "total"))
        .groupBy("event_type", "day")
        .agg(F.sum("n").alias("n"), F.sum("total").alias("total"))
    )
    out = merged.select(
        "event_type",
        "day",
        F.col("n").cast("bigint").alias("n"),
        F.col("total").cast("double").alias("total"),
    )
    return tiny_sort(out, "event_type", "day")


@query(
    "b10_regression_agg",
    oracle="""
    WITH d AS (
      SELECT event_type,
             CAST(ts::TIMESTAMP::DATE - DATE '2024-01-01' AS DOUBLE) AS t,
             value AS y
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(regr_slope(y, t), 6) AS slope,
           round(regr_intercept(y, t), 6) AS icept,
           round(regr_r2(y, t), 6) AS r2,
           round(corr(y, t), 6) AS r
    FROM d GROUP BY event_type ORDER BY event_type
    """,
    tags=("B10", "stats"),
    doc="Statistical regression aggregates: per-event-type least-squares "
    "slope/intercept/R2 and Pearson correlation of value against "
    "days-since-epoch-start — the trend-detection aggregate family "
    "(regr_*), computed JVM-side as distributive moment partials "
    "(sum, sum x, sum xy, ...) with constant shuffle state per group, "
    "the same scale shape as b65_embedding_covariance. The time axis is "
    "anchored to the fixture start and measured in DAYS so the moment "
    "sums stay small enough that 6dp rounding absorbs cross-engine "
    "float-summation drift (epoch-second axes would square to 1e18 and "
    "lose the rounding margin).",
)
def b10_regression_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = T(spark, sf_dir, "events").select(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("double")
        .alias("t"),
        F.col("value").alias("y"),
    )
    out = d.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        dround(F.regr_slope("y", "t"), 6).alias("slope"),
        dround(F.regr_intercept("y", "t"), 6).alias("icept"),
        dround(F.regr_r2("y", "t"), 6).alias("r2"),
        dround(F.corr("y", "t"), 6).alias("r"),
    )
    return tiny_sort(out, "event_type")


@query(
    "b45_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
    ),
    pairs AS (
      SELECT prev, event_type AS next, count(*) AS c
      FROM seq WHERE prev IS NOT NULL GROUP BY prev, next
    ),
    tot AS (SELECT prev, sum(c) AS n FROM pairs GROUP BY prev)
    SELECT p.prev, p.next, CAST(p.c AS BIGINT) AS c,
           round(CAST(p.c AS DOUBLE) / t.n * 1000000) / 1000000 AS p
    FROM pairs p JOIN tot t USING (prev)
    ORDER BY p.prev, p.next
    """,
    tags=("B45", "B15"),
    doc="Event-sequence transition matrix (first-order Markov): lag() over "
    "each user's (ts, event_id)-ordered stream pairs every event with "
    "its predecessor, then the (prev, next) counts normalize into "
    "conditional transition probabilities — the product-analytics "
    "primitive behind next-action prediction and funnel discovery. One "
    "keyed window shuffle plus a bounded (|types|^2) aggregation at any "
    "scale.",
)
def b45_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = T(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.lag("event_type").over(w).alias("prev"),
    )
    pairs = (
        seq.where(F.col("prev").isNotNull())
        .groupBy("prev", F.col("event_type").alias("next"))
        .agg(F.count("*").alias("c"))
    )
    tot = pairs.groupBy("prev").agg(F.sum("c").alias("n"))
    out = pairs.join(tot, "prev").select(
        "prev",
        "next",
        F.col("c").cast("bigint").alias("c"),
        dround(F.col("c").cast("double") / F.col("n"), 6).alias("p"),
    )
    return tiny_sort(out, "prev", "next")


@query(
    "b45_batch_sessionize",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS s,
             lag(CAST(floor(epoch(ts)) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_s
      FROM events WHERE user_id < 40
    ),
    marked AS (
      SELECT *, CASE WHEN prev_s IS NULL OR s - prev_s > 1800
                     THEN 1 ELSE 0 END AS new_sess
      FROM seq
    ),
    sess AS (
      SELECT user_id, s,
             sum(new_sess) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked
    ),
    per_sess AS (
      SELECT user_id, session_no, count(*) AS n_events,
             max(s) - min(s) AS dur_s
      FROM sess GROUP BY user_id, session_no
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(n_events) AS BIGINT) AS n_events,
           CAST(max(n_events) AS BIGINT) AS max_session_events,
           CAST(max(dur_s) AS BIGINT) AS max_session_s
    FROM per_sess GROUP BY user_id ORDER BY user_id
    """,
    tags=("B45", "B15"),
    doc="Batch sessionization (the lag+cumsum idiom — the batch counterpart "
    "of the streaming session_window in b31): a 30-minute inactivity gap "
    "starts a new session; session ids are the running sum of gap flags "
    "over each user's (ts, event_id)-ordered stream — one keyed window "
    "shuffle, then per-session and per-user aggregates. Timestamps are "
    "compared in integer epoch seconds so gap arithmetic is exact on "
    "both engines.",
)
def b45_batch_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = (
        T(spark, sf_dir, "events")
        .where(F.col("user_id") < 40)
        .select(
            "user_id",
            "ts",
            "event_id",
            F.unix_timestamp("ts").alias("s"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.withColumn("prev_s", F.lag("s").over(w)).withColumn(
        "new_sess",
        F.when(
            F.col("prev_s").isNull() | (F.col("s") - F.col("prev_s") > 1800), 1
        ).otherwise(0),
    )
    sess = marked.withColumn(
        "session_no",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_sess = sess.groupBy("user_id", "session_no").agg(
        F.count("*").alias("n_events"),
        (F.max("s") - F.min("s")).alias("dur_s"),
    )
    out = per_sess.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_sessions"),
        F.sum("n_events").cast("bigint").alias("n_events"),
        F.max("n_events").cast("bigint").alias("max_session_events"),
        F.max("dur_s").cast("bigint").alias("max_session_s"),
    )
    return tiny_sort(out, "user_id")


@query(
    "b10_argmax_quantiles",
    oracle="""
    SELECT event_type,
           CAST(arg_min(event_id, lpad(CAST(epoch_us(ts::TIMESTAMP) AS VARCHAR), 20, '0')
                                  || lpad(CAST(event_id AS VARCHAR), 12, '0'))
                AS BIGINT) AS first_event,
           CAST(arg_max(event_id, lpad(CAST(epoch_us(ts::TIMESTAMP) AS VARCHAR), 20, '0')
                                  || lpad(CAST(event_id AS VARCHAR), 12, '0'))
                AS BIGINT) AS last_event,
           round(quantile_cont(value, 0.5) * 1000000) / 1000000 AS p50c,
           round(quantile_cont(value, 0.9) * 1000000) / 1000000 AS p90c,
           round(median(value) * 1000000) / 1000000 AS med
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    tags=("B10", "B12", "stats"),
    doc="Argmax aggregates and exact interpolated percentiles: "
    "max_by/min_by (DuckDB arg_max/arg_min) pick each event type's first "
    "and last event id ordered by a fixed-width (ts, event_id) string key "
    "— timestamp ties (absent in the base fixture, present across the "
    "scale probe's copies) break identically on both engines — and "
    "percentile()/median() "
    "compute the exact continuous (interpolated) quantiles, the "
    "complement of b12's approx sketch and b57's nearest-rank discrete "
    "variant. 6dp rounding absorbs the one-ulp difference between the "
    "engines' algebraically-equal interpolation formulas. All "
    "distributive/sorted-group aggregates — one shuffle on the group "
    "key.",
)
def b10_argmax_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = T(spark, sf_dir, "events")
    # composite (ts, event_id) ordering encoded as a fixed-width string so
    # BOTH engines break timestamp ties identically — ts is unique in the
    # base fixture but collides across the scale probe's salted copies
    # (caught by the 10x full-registry sweep)
    ordk = F.concat(
        F.lpad(
            F.unix_micros(F.col("ts").cast("timestamp")).cast("string"), 20, "0"
        ),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    out = ev.groupBy("event_type").agg(
        F.min_by("event_id", ordk).cast("bigint").alias("first_event"),
        F.max_by("event_id", ordk).cast("bigint").alias("last_event"),
        dround(F.percentile("value", 0.5), 6).alias("p50c"),
        dround(F.percentile("value", 0.9), 6).alias("p90c"),
        dround(F.median("value"), 6).alias("med"),
    )
    return tiny_sort(out, "event_type")


@query(
    "b45_market_basket",
    oracle="""
    WITH b AS (
      SELECT DISTINCT l_orderkey, l_partkey % 20 AS item FROM lineitem
    ),
    n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM b),
    i1 AS (
      SELECT CAST(item AS VARCHAR) AS itemset, 1 AS sz, count(*) AS freq
      FROM b GROUP BY item
    ),
    i2 AS (
      SELECT CAST(a.item AS VARCHAR) || ',' || CAST(c.item AS VARCHAR)
               AS itemset, 2 AS sz, count(*) AS freq
      FROM b a JOIN b c ON a.l_orderkey = c.l_orderkey AND a.item < c.item
      GROUP BY 1
    )
    SELECT itemset, CAST(sz AS INT) AS sz, CAST(freq AS BIGINT) AS freq
    FROM (SELECT * FROM i1 UNION ALL SELECT * FROM i2) u CROSS JOIN n
    WHERE freq >= ceil(0.02 * n_orders)
    ORDER BY sz, itemset
    """,
    tags=("B45", "ml"),
    doc="Frequent-itemset mining via distributed FP-Growth (ml.fpm — "
    "parallel PFP, the market-basket algorithm): baskets are each "
    "order's distinct item set (l_partkey mod 20), minSupport 0.02. "
    "FP-Growth is EXACT, so the size-1/size-2 itemsets hash-match a "
    "direct SQL count (singleton group-by + within-order pair self-join "
    "with a < canonical order); size-3+ itemsets are excluded on both "
    "sides so the oracle stays polynomial. Itemsets serialize as "
    "numerically-sorted comma strings on both engines. The PFP shuffle "
    "is keyed on item suffixes — the published scale-out of FP-Growth.",
)
def b45_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.fpm import FPGrowth

    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", (F.col("l_partkey") % 20).alias("item")
    )
    baskets = li.groupBy("l_orderkey").agg(F.collect_set("item").alias("items"))
    model = FPGrowth(itemsCol="items", minSupport=0.02).fit(baskets)
    fi = model.freqItemsets.where(F.size("items") <= 2)
    out = fi.select(
        F.array_join(
            F.transform(F.array_sort("items"), lambda x: x.cast("string")), ","
        ).alias("itemset"),
        F.size("items").cast("int").alias("sz"),
        F.col("freq").cast("bigint").alias("freq"),
    )
    return tiny_sort(out, "sz", "itemset")


@query(
    "b45_naive_bayes",
    oracle=r"""
    WITH t AS (
      SELECT lang,
             len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                             x -> x = 'table')) AS f0,
             len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                             x -> x = 'scan')) AS f1,
             len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                             x -> x = 'fast')) AS f2
      FROM documents WHERE text IS NOT NULL
    ),
    per AS (
      SELECT lang, count(*) AS n_docs,
             sum(f0) AS c0, sum(f1) AS c1, sum(f2) AS c2
      FROM t GROUP BY lang
    ),
    tot AS (SELECT sum(n_docs) AS n, count(*) AS k FROM per)
    SELECT lang, j,
           round(ln((c + 1.0) / (c0 + c1 + c2 + 3.0)) * 1000000) / 1000000
             AS theta,
           round(ln((n_docs + 1.0) / (n + k)) * 1000000) / 1000000 AS pi
    FROM (
      SELECT p.lang, u.j,
             CASE u.j WHEN 0 THEN p.c0 WHEN 1 THEN p.c1 ELSE p.c2 END AS c,
             p.c0, p.c1, p.c2, p.n_docs
      FROM per p CROSS JOIN (SELECT unnest(range(3)) AS j) u
    ) x CROSS JOIN tot
    ORDER BY lang, j
    """,
    tags=("B45", "ml"),
    doc="Distributed ML training with EXACTLY checkable parameters: a "
    "multinomial Naive Bayes classifier (ml.classification) fit on "
    "per-language counts of three marker tokens. NB training is pure "
    "counting, so the fitted log-likelihood matrix equals the closed "
    "form ln((count+smoothing)/(class_total+V)) and the class priors "
    "equal ln((n_class+1)/(n+k)) — both computed independently in SQL "
    "and rounded at 6dp (ln ulp drift). The label index is the "
    "alphabetical language rank on both sides; model matrices are "
    "driver-bounded (k x V = 5 x 3). The same count aggregation is the "
    "scalable path at 100 TB — model fit IS one groupBy.",
)
def b45_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.classification import NaiveBayes
    from pyspark.ml.feature import VectorAssembler
    from pyspark.sql import Window

    docs = T(spark, sf_dir, "documents").where(F.col("text").isNotNull())

    def cnt(w):
        return F.size(
            F.filter(
                F.split(F.lower(F.trim("text")), r"\s+"), lambda x: x == w
            )
        ).cast("double")

    feats = docs.select(
        "lang", cnt("table").alias("f0"), cnt("scan").alias("f1"),
        cnt("fast").alias("f2"),
    )
    lab = feats.withColumn(
        "label", F.dense_rank().over(Window.orderBy("lang")) - 1
    )
    data = VectorAssembler(
        inputCols=["f0", "f1", "f2"], outputCol="features"
    ).transform(lab).select(F.col("label").cast("double"), "features")
    model = NaiveBayes(smoothing=1.0, modelType="multinomial").fit(data)

    langs = [
        r["lang"]
        for r in docs.select("lang").distinct().orderBy("lang").collect()
    ]
    theta = model.theta.toArray()
    pi = model.pi.toArray()
    rows = [
        (langs[i], j, float(theta[i][j]), float(pi[i]))
        for i in range(len(langs))
        for j in range(3)
    ]
    raw = spark.createDataFrame(
        rows, "lang string, j int, theta_raw double, pi_raw double"
    )
    out = raw.select(
        "lang",
        "j",
        dround("theta_raw", 6).alias("theta"),
        dround("pi_raw", 6).alias("pi"),
    )
    return tiny_sort(out, "lang", "j")


@query(
    "b45_chi_square",
    oracle="""
    WITH t AS (SELECT lang, source FROM documents WHERE text IS NOT NULL),
    cell AS (SELECT lang, source, count(*) AS c FROM t GROUP BY 1, 2),
    r AS (SELECT lang, sum(c) AS rc FROM cell GROUP BY 1),
    col AS (SELECT source, sum(c) AS cc FROM cell GROUP BY 1),
    n AS (SELECT sum(c) AS n FROM cell),
    grid AS (
      SELECT r.lang, col.source, r.rc, col.cc, coalesce(cell.c, 0) AS obs
      FROM r CROSS JOIN col
      LEFT JOIN cell ON cell.lang = r.lang AND cell.source = col.source
    )
    SELECT round(sum(pow(obs - rc * cc / n.n, 2) / (rc * cc / n.n))
                 * 1000000) / 1000000 AS statistic,
           CAST((SELECT count(*) - 1 FROM r)
                * (SELECT count(*) - 1 FROM col) AS BIGINT) AS dof
    FROM grid CROSS JOIN n
    """,
    tags=("B45", "ml", "stats"),
    doc="Chi-square independence test (ml.stat.ChiSquareTest) between "
    "document language and source: the statistic is the closed-form "
    "sum((obs - expected)^2 / expected) over the contingency table, so "
    "the distributed test must match the SQL recomputation exactly "
    "(6dp — float-sum ulp only); degrees of freedom (r-1)(c-1) match as "
    "integers. The contingency counts are one groupBy — the test "
    "scales as a bounded-cell aggregation at any corpus size.",
)
def b45_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.stat import ChiSquareTest
    from pyspark.sql import Window

    docs = T(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    d = docs.withColumn(
        "label", F.dense_rank().over(Window.orderBy("lang")) - 1
    ).withColumn(
        "srcidx", (F.dense_rank().over(Window.orderBy("source")) - 1).cast("double")
    )
    data = (
        VectorAssembler(inputCols=["srcidx"], outputCol="features")
        .transform(d)
        .select(F.col("label").cast("double"), "features")
    )
    r = ChiSquareTest.test(data, "features", "label").collect()[0]
    raw = spark.createDataFrame(
        [(float(r.statistics[0]), int(r.degreesOfFreedom[0]))],
        "statistic_raw double, dof bigint",
    )
    return raw.select(
        dround("statistic_raw", 6).alias("statistic"), "dof"
    )


@query(
    "b45_isotonic",
    # PAVA by hand on y = (1, 3, 2, 6, 5, 4): [3,2] violate -> pool 2.5;
    # [6,5,4] violate -> pool 5; monotone sequence 1, 2.5, 2.5, 5, 5, 5.
    oracle="""
    SELECT * FROM (VALUES
      (1.0, 1.0), (2.0, 2.5), (3.0, 2.5),
      (4.0, 5.0), (5.0, 5.0), (6.0, 5.0)
    ) AS t(x, fitted)
    ORDER BY x
    """,
    tags=("B45", "ml"),
    doc="Isotonic regression (ml.regression — pool-adjacent-violators): "
    "the monotone least-squares fit used to CALIBRATE model scores into "
    "probabilities. PAVA's solution is exact block means, so the fitted "
    "values at the training points equal the hand-derived pooled "
    "sequence for the planted violations (3,2 -> 2.5; 6,5,4 -> 5) — a "
    "literal oracle independent of the implementation. Spark "
    "parallelizes PAVA per partition then merges pools — the "
    "distributed shape of the sequential algorithm.",
)
def b45_isotonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.functions import vector_to_array
    from pyspark.ml.linalg import Vectors
    from pyspark.ml.regression import IsotonicRegression

    ys = [1.0, 3.0, 2.0, 6.0, 5.0, 4.0]
    data = spark.createDataFrame(
        [(y, Vectors.dense(float(x))) for x, y in zip(range(1, 7), ys)],
        ["label", "features"],
    )
    model = IsotonicRegression().fit(data)
    fitted = model.transform(data).select(
        F.element_at(vector_to_array("features"), 1).cast("double").alias("x"),
        F.col("prediction").alias("fitted"),
    )
    return tiny_sort(fitted, "x")
