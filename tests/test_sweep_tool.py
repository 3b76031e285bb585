"""Unit tests for tools/sweep.py's copy-0 subset helper (r6 verdict #9):
the heavy O(n²) oracles are compared on a base-population subset of a
scaled corpus — the helper must build that subset correctly and must be a
no-op on unscaled dirs (where the full oracle runs, by design)."""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench  # noqa: E402
from sweep import _SUBSET_TABLES, _heavy_subset_dir  # noqa: E402


def test_unscaled_dir_is_noop(sf_dir):
    assert _heavy_subset_dir(sf_dir) is None


# (table, id column, per-table copy offset) — offsets mirror bench._SCALED_SQL:
# documents/embeddings hardcode 10M, TPC-H tables use bench._KEY_OFFSET.
_SUB = tuple((t, key, bound) for t, (key, bound) in _SUBSET_TABLES.items())


def _make_scaled(tmp_path, sf_dir):
    scaled = tmp_path / "scaled"
    scaled.mkdir()
    con = duckdb.connect()
    # two copies of the subset tables with the bench copy-offset scheme
    for t, key, bound in _SUB:
        con.execute(
            f"COPY (SELECT * REPLACE ({key} + copy * {bound} AS {key})"
            f" FROM read_parquet('{sf_dir}/{t}.parquet'), range(2) r(copy))"
            f" TO '{scaled}/{t}.parquet' (FORMAT parquet)"
        )
    for t in bench.SCALE_TABLES:
        if t in {s for s, _k, _b in _SUB}:
            continue
        os.symlink(f"{sf_dir}/{t}.parquet", f"{scaled}/{t}.parquet")
    return scaled, con


def test_scaled_dir_filters_to_copy0(tmp_path, sf_dir):
    scaled, con = _make_scaled(tmp_path, sf_dir)
    sub = _heavy_subset_dir(str(scaled))
    assert sub == str(scaled / "copy0_subset_v2")
    for t, key, bound in _SUB:
        n_base = con.execute(
            f"SELECT count(*) FROM read_parquet('{sf_dir}/{t}.parquet')"
        ).fetchone()[0]
        n_sub, mx = con.execute(
            f"SELECT count(*), max({key}) FROM read_parquet('{sub}/{t}.parquet')"
        ).fetchone()
        assert n_sub == n_base, t
        assert mx < bound, t
    # every other table is shared (symlinked), and the cache marker exists
    for t in bench.SCALE_TABLES:
        assert os.path.exists(os.path.join(sub, f"{t}.parquet")), t
    assert os.path.exists(os.path.join(sub, "_DONE"))
    # second call hits the cache (no rebuild — mtime unchanged)
    before = os.stat(os.path.join(sub, "documents.parquet")).st_mtime_ns
    assert _heavy_subset_dir(str(scaled)) == sub
    assert os.stat(os.path.join(sub, "documents.parquet")).st_mtime_ns == before
    con.close()


def test_stale_partial_subset_self_repairs(tmp_path, sf_dir):
    """A partial copy0 dir without _DONE (crashed pre-tempdir build) must be
    cleared and rebuilt, not wedge every subsequent run with ENOTEMPTY
    (advisor r8 item)."""
    scaled, con = _make_scaled(tmp_path, sf_dir)
    stale = scaled / "copy0_subset_v2"
    stale.mkdir()
    (stale / "documents.parquet").write_bytes(b"partial garbage")
    sub = _heavy_subset_dir(str(scaled))
    assert sub == str(stale)
    assert os.path.exists(os.path.join(sub, "_DONE"))
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{sub}/documents.parquet')"
    ).fetchone()[0]
    assert n > 0  # real parquet, not the planted garbage
    con.close()
