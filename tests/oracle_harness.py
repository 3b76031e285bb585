"""Local emulation of the driver's DuckDB-oracle comparison.

Canonicalization mirrors FIXTURES.md: columns sorted by name, doubles rounded
to 6 decimals, timestamps ISO-8601, NULL → sentinel; rows compared as sorted
multisets. Used by tests/test_oracle.py so every registered query is validated
before the driver ever sees it.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import duckdb

NULL = "␀NULL"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon_val(v):
    if v is None:
        return NULL
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("num", "nan")
        r = round(v, 6)
        if r == int(r) and abs(r) < 2**53:
            return ("num", float(int(r)))
        return ("num", r)
    if isinstance(v, Decimal):
        return canon_val(float(v))
    if isinstance(v, int):
        return ("num", float(v)) if abs(v) < 2**53 else ("num", v)
    if isinstance(v, _dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds"))
    if isinstance(v, _dt.date):
        return ("date", v.isoformat())
    if isinstance(v, (bytes, bytearray)):
        return ("bytes", bytes(v).hex())
    if isinstance(v, (list, tuple)):
        return ("list", tuple(canon_val(x) for x in v))
    if isinstance(v, dict):
        return ("map", tuple(sorted((k, canon_val(x)) for k, x in v.items())))
    return ("str", str(v))


def canon_rows(rows: list[tuple], names: list[str]) -> list[tuple]:
    order = sorted(range(len(names)), key=lambda i: names[i])
    out = [tuple(canon_val(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return out


def run_spark(spec, spark, sf_dir):
    df = spec.build(spark, sf_dir)
    names = df.columns
    rows = [tuple(r) for r in df.collect()]
    return rows, list(names)


def run_oracle(spec, con):
    cur = con.execute(spec.oracle)
    names = [d[0] for d in cur.description]
    rows = cur.fetchall()
    return rows, names


def compare(spec, spark, sf_dir) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    s_rows, s_names = run_spark(spec, spark, sf_dir)
    if spec.oracle is None:
        return problems
    con = duck_connection(sf_dir)
    try:
        o_rows, o_names = run_oracle(spec, con)
    finally:
        con.close()
    if sorted(s_names) != sorted(o_names):
        problems.append(f"column names differ: spark={sorted(s_names)} oracle={sorted(o_names)}")
        return problems
    if len(s_rows) != len(o_rows):
        problems.append(f"row count differs: spark={len(s_rows)} oracle={len(o_rows)}")
    sc = canon_rows(s_rows, s_names)
    oc = canon_rows(o_rows, o_names)
    if sc != oc:
        diffs = [(a, b) for a, b in zip(sc, oc) if a != b]
        problems.append(
            f"values differ ({len(diffs)} of {max(len(sc), len(oc))} rows); "
            f"first diff: spark={diffs[0][0] if diffs else sc[:1]} "
            f"oracle={diffs[0][1] if diffs else oc[:1]} (cols sorted: {sorted(s_names)})"
        )
    return problems
