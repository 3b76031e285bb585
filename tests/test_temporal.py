"""asof_join operator: exact semantics + tolerance handling."""

from __future__ import annotations

from datetime import datetime

from ps_datalake_spark.operators.temporal import asof_join


def _df(spark, schema, rows):
    rows = [tuple(datetime.fromisoformat(v) if isinstance(v, str) and "-" in v else v for v in r) for r in rows]
    return spark.createDataFrame(rows, schema)


def test_asof_basic_and_boundary(spark):
    left = _df(
        spark,
        "id long, k long, ts timestamp",
        [(1, 7, "2024-01-01 10:00:00"), (2, 7, "2024-01-01 11:00:00"), (3, 8, "2024-01-01 10:30:00")],
    )
    right = _df(
        spark,
        "k long, ts timestamp, v double",
        [
            (7, "2024-01-01 09:00:00", 1.0),
            (7, "2024-01-01 10:00:00", 2.0),  # exactly at left #1 → matches (at-or-before)
            (7, "2024-01-01 10:59:00", 3.0),
            (8, "2024-01-01 11:00:00", 9.0),  # after left #3 → no match
        ],
    )
    out = {r["id"]: r["asof_v"] for r in asof_join(left, right, on="k", right_cols=("v",)).collect()}
    assert out == {1: 2.0, 2: 3.0, 3: None}


def test_asof_tolerance(spark):
    left = _df(spark, "id long, k long, ts timestamp", [(1, 7, "2024-01-01 12:00:00")])
    right = _df(spark, "k long, ts timestamp, v double", [(7, "2024-01-01 10:00:00", 5.0)])
    with_tol = asof_join(
        left, right, on="k", right_cols=("v",), tolerance_expr="INTERVAL 1 HOUR"
    ).collect()
    assert with_tol[0]["asof_v"] is None  # match is 2h old, tolerance 1h
    without = asof_join(left, right, on="k", right_cols=("v",)).collect()
    assert without[0]["asof_v"] == 5.0
