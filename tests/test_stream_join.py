"""Stream-stream inner join with watermarks: clicks joined to impressions
within a bounded event-time window (the canonical attribution join)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F


def _write(spark, path, schema, rows):
    rows = [tuple(datetime.fromisoformat(v) if isinstance(v, str) else v for v in r) for r in rows]
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(path)


def test_stream_stream_join(spark, tmp_path):
    imp_dir = str(tmp_path / "impressions")
    clk_dir = str(tmp_path / "clicks")
    _write(
        spark,
        imp_dir,
        "ad_id long, imp_ts timestamp",
        [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 10:05:00"), (3, "2024-01-01 10:30:00")],
    )
    _write(
        spark,
        clk_dir,
        "ad_id long, clk_ts timestamp",
        [
            (1, "2024-01-01 10:02:00"),  # within 10 min of impression → joins
            (2, "2024-01-01 10:30:00"),  # 25 min later → outside window
            (3, "2024-01-01 10:31:00"),  # within → joins
        ],
    )
    imps = (
        spark.readStream.schema("ad_id long, imp_ts timestamp").parquet(imp_dir)
        .withWatermark("imp_ts", "1 hour")
    )
    clks = (
        spark.readStream.schema("ad_id long, clk_ts timestamp").parquet(clk_dir)
        .withWatermark("clk_ts", "1 hour")
    )
    joined = imps.join(
        clks,
        (imps.ad_id == clks.ad_id)
        & (clks.clk_ts >= imps.imp_ts)
        & (clks.clk_ts <= imps.imp_ts + F.expr("interval 10 minutes")),
    )
    q = (
        joined.select(imps.ad_id, "imp_ts", "clk_ts")
        .writeStream.format("memory")
        .queryName("attrib")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(r["ad_id"] for r in spark.table("attrib").collect())
    assert got == [1, 3], got
