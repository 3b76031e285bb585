"""Retrieval-pack pins.

The r13 bm25 postings build moved tokenization from the JVM expression
``split(lower(trim(text)), '\\s+')`` into a Python ``mapInPandas`` pass.
The two tokenizers MUST agree on every document, or b64_bm25_topk's tf/dl
relations silently diverge from the DuckDB oracle (the exact fixture-
robustness risk that kept the pandas variant unshipped in r12).  This pin
compares the token STREAM per document over every fixture corpus on disk —
stream equality implies tf (Counter) and dl (length) equality.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ps_datalake_spark.queries.retrieval_pack import _py_tokens

_FIXTURES = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


@pytest.mark.parametrize("fixture_dir", _FIXTURES)
def test_bm25_python_tokenizer_matches_jvm(spark, fixture_dir):
    path = os.path.join(fixture_dir, "documents.parquet")
    if not os.path.exists(path):
        pytest.skip(f"fixture not present: {path}")
    docs = spark.read.parquet(path).select(
        "doc_id",
        "text",
        F.filter(
            F.split(F.lower(F.trim("text")), r"\s+"), lambda t: t != ""
        ).alias("jvm_tokens"),
    )
    rows = docs.collect()
    assert rows, f"empty documents fixture at {path}"
    n_checked = 0
    for r in rows:
        if r["text"] is None:
            # NULL text: the JVM expression yields NULL (explode drops it);
            # the Python pass skips the row — both emit zero postings
            assert r["jvm_tokens"] is None
            continue
        assert _py_tokens(r["text"]) == r["jvm_tokens"], (
            f"tokenizer divergence at doc_id={r['doc_id']} in {fixture_dir}: "
            f"py={_py_tokens(r['text'])[:10]}... jvm={r['jvm_tokens'][:10]}..."
        )
        n_checked += 1
    assert n_checked > 0


def test_py_tokens_edge_cases():
    # ASCII-whitespace-only splitting (Java regex \s), '' tokens dropped
    assert _py_tokens("  A\tb\nc\x0b d\f e\r ") == ["a", "b", "c", "d", "e"]
    assert _py_tokens("") == []
    assert _py_tokens("   ") == []
    # Unicode spaces are NOT separators on the JVM (\s is ASCII-only there)
    assert _py_tokens("a\xa0b") == ["a\xa0b"]
