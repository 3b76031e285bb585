"""Streaming ingestion into the content-addressed lake: events stream →
foreachBatch → Store.put_blobs. The dedup anti-join makes re-delivered
batches idempotent — exactly-once storage from at-least-once delivery."""

from __future__ import annotations

from pyspark.sql import functions as F

from ps_datalake_spark.lake import Store


def test_stream_ingest_foreachbatch(spark, tmp_path):
    store = Store.create(spark, str(tmp_path / "ingest_store"), prefix_len=1)
    src_dir = str(tmp_path / "ingest_src")

    rows = [(i, f"payload-{i:04d}-" + "x" * 200) for i in range(40)]
    spark.createDataFrame(rows, "id long, payload string").coalesce(2).write.parquet(src_dir)

    stream = spark.readStream.schema("id long, payload string").parquet(src_dir)
    blobs = stream.select("id", F.col("payload").cast("binary").alias("data"))

    def ingest(batch_df, batch_id):
        store.put_blobs(batch_df).count()

    q = (
        blobs.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", str(tmp_path / "ingest_cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    stats = store.stats()
    assert stats["n_chunks"] == 41, stats  # 40 distinct payloads + sentinel

    # simulate at-least-once redelivery: ingest the same data again in batch
    store.put_blobs(
        spark.createDataFrame(rows, "id long, payload string").select(
            "id", F.col("payload").cast("binary").alias("data")
        )
    ).count()
    assert store.stats()["n_chunks"] == 41, "redelivery must be idempotent"

    # and the content round-trips
    hk = store.put_blob(rows[7][1].encode())
    assert store.get(hk) == rows[7][1].encode()
