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
