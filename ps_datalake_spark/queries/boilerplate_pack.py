"""Web-corpus cleaning operators (round 5, session 4): cross-document
repeated-line (boilerplate) removal and Unicode NFC text normalization —
the CCNet/RefinedWeb-style cleanup stage that runs BEFORE dedup and
quality filtering in a pre-training pipeline.

Scale design notes (100 TB):
  * line dedup is the CCNet paragraph-dedup shape: segment each document
    into lines JVM-side (pure array expressions, no shuffle), aggregate
    line document-frequencies (one shuffle on the line hash, map-side
    partial counts), and anti-join the exploded lines against the
    high-DF boilerplate set.  The boilerplate relation is TINY relative
    to the corpus (lines repeated across >=K documents — navigation,
    cookie banners, footers), so the anti-join broadcasts at any corpus
    size; reassembly is one keyed aggregation per document;
  * NFC normalization is embarrassingly parallel: an Arrow-batched
    mapInPandas pass (Spark has no built-in Unicode normalizer — the one
    genuinely Python-bound step), zero shuffle, one corpus scan.

Determinism: line segmentation is a pure function of the text (fixed
8-word lines over a \\s+ split) computed independently by both engines;
the planted boilerplate line makes the >=K document-frequency threshold
exact, not statistical.  Normalization compares Python's unicodedata NFC
against DuckDB's nfc_normalize — both implement UAX #15; the planted
strings avoid locale-sensitive case mappings.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ._util import T, dumps_by_value, tiny_sort

# one exact 8-word line (= the segmenter's line width) planted as the
# boilerplate header on every even doc_id — the repeated-across-documents
# chrome a real crawl carries
_BOILER = "cookie policy accept banner navigation menu footer copyright"

_LINE_WORDS = 8
_MIN_DF = 50


@query(
    "b69_line_dedup",
    oracle=rf"""
    WITH base AS (
      SELECT doc_id,
             CASE WHEN doc_id % 2 = 0 THEN '{_BOILER} ' || text
                  ELSE text END AS t
      FROM documents WHERE doc_id % 10000000 < 200 AND text IS NOT NULL
    ),
    words AS (
      SELECT doc_id, string_split_regex(trim(t), '\s+') AS w FROM base
    ),
    nums AS (
      SELECT doc_id, w,
             unnest(range(CAST(ceil(len(w) / {_LINE_WORDS}.0) AS BIGINT))) AS i
      FROM words
    ),
    lines AS (
      SELECT doc_id, i AS line_no,
             array_to_string(w[(i * {_LINE_WORDS} + 1):(i * {_LINE_WORDS} + {_LINE_WORDS})], ' ') AS line
      FROM nums
    ),
    boiler AS (
      SELECT line FROM lines GROUP BY line
      HAVING count(DISTINCT doc_id) >= {_MIN_DF}
    ),
    kept AS (
      SELECT l.doc_id, l.line_no, l.line
      FROM lines l ANTI JOIN boiler b USING (line)
    )
    SELECT l.doc_id,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(count(k.line) AS BIGINT) AS n_kept,
           CAST(coalesce(length(string_agg(k.line, ' ' ORDER BY l.line_no)), 0)
                AS BIGINT) AS clean_chars
    FROM lines l
    LEFT JOIN kept k ON l.doc_id = k.doc_id AND l.line_no = k.line_no
    GROUP BY l.doc_id
    ORDER BY l.doc_id
    """,
    tags=("B37", "llm", "curation"),
    doc="Cross-document repeated-line removal (CCNet/RefinedWeb boilerplate "
    "strip): segment every document into fixed 8-word lines with pure "
    "array expressions (no shuffle), count each line's document frequency "
    "(one hash shuffle with map-side partials), drop lines present in "
    ">=50 documents via anti-join against the small high-DF set (which "
    "broadcasts at any corpus scale), and reassemble the cleaned text in "
    "one keyed aggregation. A known boilerplate header is planted on "
    "every even doc_id so the removal set is exact by construction; "
    "content lines (unique word soup) all survive.",
)
def b69_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = (
        T(spark, sf_dir, "documents")
        .where((F.col("doc_id") % 10000000 < 200) & F.col("text").isNotNull())
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 2 == 0,
                F.concat(F.lit(_BOILER + " "), F.col("text")),
            )
            .otherwise(F.col("text"))
            .alias("t"),
        )
    )
    words = base.select(
        "doc_id", F.split(F.trim("t"), r"\s+").alias("w")
    )
    lw = F.lit(_LINE_WORDS)
    lines = (
        words.select(
            "doc_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.ceil(F.size("w") / lw.cast("double")).cast("int") - 1,
                )
            ).alias("line_no"),
            "w",
        )
        .select(
            "doc_id",
            "line_no",
            F.array_join(
                F.slice(F.col("w"), F.col("line_no") * lw + 1, _LINE_WORDS), " "
            ).alias("line"),
        )
    )
    boiler = (
        lines.groupBy("line")
        .agg(F.countDistinct("doc_id").alias("df"))
        .where(F.col("df") >= _MIN_DF)
        .select("line")
    )
    # Build-side discipline for the boilerplate anti-join (r5 verdict): the
    # high-DF set is tiny on any sane crawl slice, but at 100 TB the count of
    # lines repeated across >=50 documents can outgrow the driver's broadcast
    # limit.  Gate on the corpus size (the boiler relation scales with the
    # distinct-repeated-line count, itself bounded by corpus bytes): under
    # ~64 MB of documents the broadcast is the usual free win; past it, a
    # keyed shuffle-hash anti-join — identical semantics, the build side is
    # still only the boiler hash per partition, and the exploded lines
    # relation shuffles on the same line key the DF aggregation already used.
    from ._util import table_bytes

    doc_bytes = table_bytes(sf_dir, "documents")
    if doc_bytes is not None and doc_bytes < 64 << 20:
        boiler_side = F.broadcast(boiler)
    else:
        boiler_side = boiler.hint("shuffle_hash")
    kept = lines.join(boiler_side, "line", "left_anti")
    per_doc_kept = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.length(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("line_no", "line"))
                    ),
                    lambda s: s["line"],
                ),
                " ",
            )
        ).cast("bigint")
        .alias("clean_chars"),
    )
    out = (
        lines.groupBy("doc_id")
        .agg(F.count("*").alias("n_lines"))
        .join(per_doc_kept, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_lines").cast("bigint").alias("n_lines"),
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
            F.coalesce("clean_chars", F.lit(0)).alias("clean_chars"),
        )
    )
    return tiny_sort(out, "doc_id")


# planted normalization fixtures: NFD combining sequences, compatibility
# singletons, mixed case, and space/tab whitespace runs.  Combining marks
# and singletons are spelled via chr() on BOTH sides so neither source
# file depends on an editor preserving decomposed Unicode.
def nfc_clean(s: str) -> str:
    """NFC + lower + collapse ASCII whitespace runs + trim — the pure
    normalizer the mapInPandas pass applies per string.  The whitespace
    class is spelled explicitly ([ \\t\\n\\f\\r]) so Python's re and
    DuckDB's RE2 agree (Python's \\s would also match Unicode spaces)."""
    import re
    import unicodedata

    nfc = unicodedata.normalize("NFC", s)
    return re.sub(r"[ \t\n\f\r]+", " ", nfc.lower()).strip()


_NORM_CASES: tuple[tuple[int, str], ...] = (
    (1, "Cafe" + chr(0x0301)),               # e + COMBINING ACUTE -> é
    (2, "Caf" + chr(0x00E9)),                # already NFC é
    (3, chr(0x212B) + "ngstrom Lab"),        # ANGSTROM SIGN -> Å (singleton)
    (4, "A" + chr(0x030A) + "ngstrom"),      # A + COMBINING RING -> Å
    (5, "  Mixed \t  CASE   text  "),        # whitespace runs + case
    (6, "plain ascii already clean"),
    (7, "O" + chr(0x0308) + "lfond" + chr(0x0075) + chr(0x0301)),  # Ö…ú
)


@query(
    "b69_text_normalize",
    oracle=r"""
    WITH raws AS (
      SELECT * FROM (VALUES
        (1, 'Cafe' || chr(769)),
        (2, 'Caf' || chr(233)),
        (3, chr(8491) || 'ngstrom Lab'),
        (4, 'A' || chr(778) || 'ngstrom'),
        (5, '  Mixed ' || chr(9) || '  CASE   text  '),
        (6, 'plain ascii already clean'),
        (7, 'O' || chr(776) || 'lfond' || chr(117) || chr(769))
      ) AS t(sid, raw)
    )
    SELECT sid,
           trim(regexp_replace(lower(nfc_normalize(raw)), '\s+', ' ', 'g'))
             AS norm,
           CAST(length(raw) AS BIGINT) AS len_raw,
           CAST(length(trim(regexp_replace(lower(nfc_normalize(raw)),
                                           '\s+', ' ', 'g'))) AS BIGINT)
             AS len_norm,
           (nfc_normalize(raw) <> raw) AS recomposed
    FROM raws ORDER BY sid
    """,
    tags=("B37", "llm", "curation"),
    doc="Unicode text normalization: NFC recomposition (combining "
    "sequences and compatibility singletons collapse to precomposed "
    "forms), case folding, and whitespace-run collapse — the first pass "
    "of any web-corpus pipeline, and a prerequisite for exact dedup "
    "(visually identical NFD/NFC strings hash differently). Spark has no "
    "built-in Unicode normalizer, so NFC runs in an Arrow-batched "
    "mapInPandas over unicodedata — zero shuffle, one scan, the honest "
    "Python-bound step — checked against DuckDB's native nfc_normalize "
    "(both implement UAX #15).",
)
def b69_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    raws = spark.createDataFrame(list(_NORM_CASES), "sid int, raw string")

    # ship nfc_clean BY VALUE (not by module path) — see _util.dumps_by_value
    _clean_blob = dumps_by_value(nfc_clean)

    def _norm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pickle as _pickle
        import unicodedata

        clean = _pickle.loads(_clean_blob)
        for pdf in batches:
            nfc = [unicodedata.normalize("NFC", s) for s in pdf["raw"]]
            norm = [clean(s) for s in pdf["raw"]]
            yield pd.DataFrame(
                {
                    "sid": pdf["sid"],
                    "norm": norm,
                    "len_raw": [len(s) for s in pdf["raw"]],
                    "len_norm": [len(s) for s in norm],
                    "recomposed": [a != b for a, b in zip(nfc, pdf["raw"])],
                }
            )

    out = raws.mapInPandas(
        _norm,
        "sid int, norm string, len_raw bigint, len_norm bigint, recomposed boolean",
    )
    return tiny_sort(out, "sid")
