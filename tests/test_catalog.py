"""Catalog surface: lake.attach / lake.sql / lake.table over testdata views
and the lake's own metadata tables."""

from __future__ import annotations

from ps_datalake_spark.config import LakeConfig, StoreEntry
from ps_datalake_spark.lake import Lake


def test_lake_sql_over_attached_tables(spark, sf_dir, tmp_path):
    lake = Lake.open(
        spark, LakeConfig(stores=(StoreEntry(str(tmp_path / "cat_store")),)), prefix_len=1
    )
    lake.attach_dir(sf_dir, ("orders", "customer"))
    out = lake.sql(
        """
        SELECT c_mktsegment, count(*) AS n
        FROM customer JOIN orders ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment
        """
    ).collect()
    assert len(out) > 0 and all(r["n"] > 0 for r in out)
    assert lake.table("orders").count() > 0


def test_lake_internal_tables(spark, sf_dir, tmp_path):
    lake = Lake.open(
        spark, LakeConfig(stores=(StoreEntry(str(tmp_path / "meta_store")),)), prefix_len=1
    )
    lake.put_blob(b"m" * 500)
    big = bytes(1500000)  # tree tier
    lake.put_blob(big)
    lake.attach_internal()
    chunks = lake.sql("SELECT count(*) AS n FROM lake_chunks").head()["n"]
    manifests = lake.sql("SELECT count(*) AS n FROM lake_manifests").head()["n"]
    assert chunks >= 3  # sentinel + blob + ≥2 tree children (deduped zeros → ≥1)
    assert manifests >= 2


# -- pslake SQL surface (register_store_sql; r8 verdict #8 stretch) ----------


def _sql_store(spark, tmp_path, n=10):
    from ps_datalake_spark.lake.store import Store

    st = Store.create(spark, str(tmp_path / "sqlstore"), prefix_len=1)
    st.put_blobs(
        spark.createDataFrame(
            [(i, bytes(f"sql-{i}-".encode() * 60)) for i in range(n)],
            "id long, data binary",
        )
    ).count()
    return st


def test_register_store_sql_view_is_reuse_safe(spark, tmp_path):
    """The default (pushdown-off) view must survive interleaved filtered and
    unfiltered SQL: Spark 4.1 caches post-pushdown read info per relation,
    so a pushdown-on long-lived view would serve a pushed lookup's pruned
    partition list to later full scans (measured full 11 -> lookup 1 ->
    full 1).  The registered view declines pushdown, Spark applies the
    filter above the scan, and every query stays correct."""
    from ps_datalake_spark.sources import register_store_sql

    st = _sql_store(spark, tmp_path)
    register_store_sql(spark, "sqlv", st.path)
    full1 = spark.sql("SELECT count(*) c FROM sqlv").head()["c"]
    assert full1 == 11  # 10 blobs + sentinel
    h = spark.sql("SELECT min(hash) h FROM sqlv").head()["h"]
    assert spark.sql(f"SELECT count(*) c FROM sqlv WHERE hash='{h}'").head()["c"] == 1
    assert spark.sql("SELECT count(*) c FROM sqlv").head()["c"] == full1
    # catalog resolution: spark.table sees the same relation
    assert spark.table("sqlv").count() == full1


def test_fresh_loads_are_pushdown_isolated(spark, tmp_path):
    """A fresh load() per query keeps full pushdown AND isolation: a pushed
    lookup on one relation must not poison a subsequent fresh relation."""
    from ps_datalake_spark.sources import register_pslake

    st = _sql_store(spark, tmp_path)
    register_pslake(spark)

    def fresh():
        return spark.read.format("pslake").option("path", st.path).load()

    h = fresh().selectExpr("min(hash) h").head()["h"]
    d1 = fresh()
    assert d1.where(d1.hash == h).count() == 1
    assert fresh().count() == 11


def test_create_table_using_pslake_limits_pinned(spark, tmp_path):
    """CREATE TABLE ... USING pslake parses and CREATEs (the reader defers
    its path check for the create-time probe), but Spark 4.1 forwards
    neither OPTIONS nor LOCATION to a Python data source's scan — the scan
    must fail with OUR clear error, not a silent empty result.  If this
    test ever starts failing because the SELECT returns rows, upstream
    fixed option forwarding: flip register_store_sql to CREATE TABLE."""
    import pytest

    from ps_datalake_spark.sources import register_pslake

    st = _sql_store(spark, tmp_path)
    register_pslake(spark)
    spark.sql("DROP TABLE IF EXISTS pslake_ct")
    spark.sql(f"CREATE TABLE pslake_ct USING pslake OPTIONS (path '{st.path}')")
    try:
        with pytest.raises(Exception, match="requires a store path"):
            spark.sql("SELECT count(*) FROM pslake_ct").collect()
    finally:
        spark.sql("DROP TABLE pslake_ct")
