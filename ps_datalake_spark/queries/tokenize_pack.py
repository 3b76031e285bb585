"""Tokenizer-application operators (round 5, session 3): BPE merge
application and character-distribution entropy — the tokenize-side pieces
between pre-tokenization counting (b37_token_count_bpe) and sequence
packing (b56).

Scale design notes (100 TB):
  * BPE application is embarrassingly parallel per word: the merge table is
    a small broadcast-side constant (real vocabularies are ~50k merges) and
    the Arrow-batched pandas UDF applies it with zero shuffle — the exact
    shape a production tokenizer job runs, one pass over the corpus;
  * entropy is two keyed aggregations (per-(doc,char) then per-doc) — one
    shuffle on doc_id; per-char terms round to fixed-precision decimals
    BEFORE the sum so the aggregate is exact and shuffle-order-independent
    (the b56 discipline).

Determinism: the BPE oracle is a HAND-DERIVED literal token table for a
planted word list (not computed by the same code under test — the merges
are small enough to verify on paper); pytest properties cover arbitrary
words (reconstruction, greedy-rank order).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ._util import T, dumps_by_value, tiny_sort

# ranked merge table (rank = priority, lowest first) — tiny by design so
# every planted tokenization below is verifiable by hand
BPE_MERGES: tuple[tuple[str, str], ...] = (
    ("t", "h"),
    ("th", "e"),
    ("i", "n"),
    ("a", "n"),
    ("an", "d"),
)

_PLANTED_WORDS = ("the", "then", "and", "hand", "thin", "in", "band", "theta")


def bpe_encode(word: str, merges=BPE_MERGES) -> list[str]:
    """Classic greedy BPE: split to characters, then repeatedly merge every
    (left-to-right, non-overlapping) occurrence of the LOWEST-ranked
    adjacent pair present, until no merge applies. Pure function — shipped
    to executors inside the Arrow-batched UDF below."""
    rank = {pair: i for i, pair in enumerate(merges)}
    toks = list(word)
    while len(toks) > 1:
        pairs = {(toks[i], toks[i + 1]) for i in range(len(toks) - 1)}
        ranked = [rank[p] for p in pairs if p in rank]
        if not ranked:
            break
        a, b = merges[min(ranked)]
        out: list[str] = []
        i = 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out
    return toks


@query(
    "b68_bpe_apply",
    # hand-derived expected tokenizations (verify on paper against
    # BPE_MERGES: e.g. "theta" = t,h,e,t,a → th,e,t,a (rank 1) →
    # the,t,a (rank 2) → no adjacent pair remains in the table)
    oracle="""
    SELECT word, CAST(seq AS BIGINT) AS seq, token FROM (VALUES
      ('the',   1, 'the'),
      ('then',  1, 'the'), ('then',  2, 'n'),
      ('and',   1, 'and'),
      ('hand',  1, 'h'),   ('hand',  2, 'and'),
      ('thin',  1, 'th'),  ('thin',  2, 'in'),
      ('in',    1, 'in'),
      ('band',  1, 'b'),   ('band',  2, 'and'),
      ('theta', 1, 'the'), ('theta', 2, 't'), ('theta', 3, 'a')
    ) AS t(word, seq, token)
    ORDER BY word, seq
    """,
    tags=("B37", "llm", "tokenize"),
    doc="BPE merge application: an Arrow-batched pandas UDF applies the "
    "ranked merge table to each word (greedy lowest-rank-first, "
    "left-to-right non-overlapping — the GPT-2 algorithm) and emits "
    "(word, position, token). The oracle is a HAND-DERIVED literal token "
    "table for eight planted words — independent of the code under test; "
    "pytest properties cover arbitrary words (concatenation reconstructs "
    "the word; token count only shrinks). At corpus scale the merge table "
    "broadcasts and the UDF runs shuffle-free over one scan — the "
    "production tokenizer-job shape.",
)
def b68_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    words = spark.createDataFrame(
        [(w,) for w in _PLANTED_WORDS], "word string"
    )

    _enc_blob = dumps_by_value(bpe_encode)

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pickle as _pickle

        enc = _pickle.loads(_enc_blob)
        for pdf in batches:
            out = {"word": [], "toks": []}
            for w in pdf["word"]:
                out["word"].append(w)
                out["toks"].append(enc(str(w)))
            yield pd.DataFrame(out)

    encoded = words.mapInPandas(_encode, "word string, toks array<string>")
    exploded = encoded.select(
        "word", F.posexplode("toks").alias("pos0", "token")
    ).select("word", (F.col("pos0") + 1).cast("bigint").alias("seq"), "token")
    return tiny_sort(exploded, "word", "seq")


# BPE training corpus: the classic (word, frequency) example from the BPE
# literature — small enough that every merge round is verifiable by hand,
# with REAL count ties in rounds 1 and 3 exercising the deterministic
# lexicographic tie-break.
_TRAIN_CORPUS: tuple[tuple[str, int], ...] = (
    ("low", 5),
    ("lower", 2),
    ("newest", 6),
    ("widest", 3),
)


@query(
    "b68_bpe_train",
    # hand-derived merge sequence (verify on paper):
    #   round 1: (e,s)=9 ties (s,t)=9 -> lexicographic pick (e,s)
    #   round 2: (es,t)=9
    #   round 3: (l,o)=7 ties (o,w)=7 -> pick (l,o)
    #   round 4: (lo,w)=7
    oracle="""
    SELECT * FROM (VALUES
      (CAST(1 AS BIGINT), 'e',  's', CAST(9 AS BIGINT)),
      (CAST(2 AS BIGINT), 'es', 't', CAST(9 AS BIGINT)),
      (CAST(3 AS BIGINT), 'l',  'o', CAST(7 AS BIGINT)),
      (CAST(4 AS BIGINT), 'lo', 'w', CAST(7 AS BIGINT))
    ) AS t(rank, lhs, rhs, pair_count)
    ORDER BY rank
    """,
    tags=("B37", "llm", "tokenize"),
    doc="Distributed BPE merge INDUCTION (the training side of "
    "b68_bpe_apply): each round counts adjacent symbol pairs across the "
    "corpus weighted by word frequency (one groupBy shuffle with map-side "
    "partials), picks the max-count pair with a deterministic "
    "(count DESC, pair ASC) tie-break — a 1-row driver collect per round, "
    "the bounded-driver-state pattern of IVF — and applies the merge to "
    "every symbol sequence JVM-side via an aggregate() fold (greedy "
    "left-to-right, non-overlapping). The oracle is the hand-derived "
    "merge table for the classic 4-word corpus, which contains two "
    "genuine count ties. At 100 TB each round is one pass; real "
    "vocabularies run the same loop with the word-frequency table "
    "pre-aggregated once (Σ unique words, not corpus tokens).",
)
def b68_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    state = spark.createDataFrame(
        [(w, f) for w, f in _TRAIN_CORPUS], "word string, freq bigint"
    ).select(
        "freq",
        F.filter(F.split("word", ""), lambda c: c != "").alias("toks"),
    )

    merges: list[tuple[int, str, str, int]] = []
    for rnd in range(1, 5):
        sz = F.size("toks")
        pairs = state.select(
            "freq",
            F.explode(
                F.zip_with(
                    F.slice("toks", 1, sz - 1),
                    F.slice("toks", 2, sz - 1),
                    lambda a, b: F.struct(a.alias("lhs"), b.alias("rhs")),
                )
            ).alias("p"),
        ).select("freq", "p.lhs", "p.rhs")
        best = (
            pairs.groupBy("lhs", "rhs")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "lhs", "rhs")
            .limit(1)
            .collect()[0]
        )
        a, b, cnt = best["lhs"], best["rhs"], int(best["cnt"])
        merges.append((rnd, a, b, cnt))
        # greedy left-to-right single-pair application as a JVM-side fold:
        # merge when the accumulator's tail is `a` and the next symbol is
        # `b`; the replaced tail cannot re-merge (non-overlapping).
        state = state.select(
            "freq",
            F.aggregate(
                "toks",
                F.array().cast("array<string>"),
                lambda acc, x: F.when(
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == F.lit(a))
                    & (x == F.lit(b)),
                    F.concat(
                        F.slice(acc, 1, F.size(acc) - 1),
                        F.array(F.lit(a + b)),
                    ),
                ).otherwise(F.concat(acc, F.array(x))),
            ).alias("toks"),
        )

    out = spark.createDataFrame(
        merges, "rank bigint, lhs string, rhs string, pair_count bigint"
    )
    return tiny_sort(out, "rank")


@query(
    "b68_char_entropy",
    oracle=r"""
    WITH chars AS (
      SELECT doc_id, unnest(string_split_regex(text, '')) AS ch
      FROM documents WHERE doc_id < 100 AND text IS NOT NULL
    ),
    freq AS (
      SELECT doc_id, ch, CAST(count(*) AS DOUBLE) AS c
      FROM chars WHERE ch <> '' GROUP BY doc_id, ch
    ),
    tot AS (SELECT doc_id, sum(c) AS n FROM freq GROUP BY doc_id)
    SELECT f.doc_id,
           CAST(max(n) AS BIGINT) AS n_chars,
           CAST(count(*) AS BIGINT) AS alphabet,
           CAST(sum(CAST(round(-(c/n) * log2(c/n) * 1000000000)
                         / 1000000000 AS DECIMAL(12,9))) AS DOUBLE)
             AS entropy_bits
    FROM freq f JOIN tot USING (doc_id)
    GROUP BY f.doc_id ORDER BY f.doc_id
    """,
    tags=("B37", "llm", "tokenize"),
    doc="Character-distribution Shannon entropy per document (bits/char "
    "over the doc's own alphabet) — the quality signal that flags "
    "repetitive or low-diversity text a length filter misses. Per-char "
    "terms round to 9dp decimals BEFORE summation (the b56 discipline), "
    "so the aggregate is exact, shuffle-order-independent, and immune to "
    "cross-engine log2 ulp differences. Two keyed aggregations, one "
    "doc_id shuffle.",
)
def b68_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = T(spark, sf_dir, "documents").where(
        (F.col("doc_id") < 100) & F.col("text").isNotNull()
    )
    chars = docs.select(
        "doc_id", F.explode(F.split("text", "")).alias("ch")
    ).where(F.col("ch") != "")
    freq = chars.groupBy("doc_id", "ch").agg(
        F.count("*").cast("double").alias("c")
    )
    tot = freq.groupBy("doc_id").agg(F.sum("c").alias("n"))
    p = F.col("c") / F.col("n")
    term = (
        F.round(-p * F.log2(p) * F.lit(1000000000)) / F.lit(1000000000)
    ).cast("decimal(12,9)")
    agg = (
        freq.join(tot, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.max("n").cast("bigint").alias("n_chars"),
            F.count("*").cast("bigint").alias("alphabet"),
            F.sum(term).cast("double").alias("entropy_bits"),
        )
    )
    return tiny_sort(agg, "doc_id")


@query(
    "b37_pmi_collocations",
    oracle=r"""
    WITH t AS (
      SELECT DISTINCT doc_id, term FROM (
        SELECT doc_id,
               unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        FROM documents WHERE text IS NOT NULL
      ) WHERE term <> ''
    ),
    top_terms AS (
      SELECT term, count(*) AS df FROM t
      GROUP BY term ORDER BY df DESC, term LIMIT 12
    ),
    n AS (SELECT count(DISTINCT doc_id) AS nd FROM t),
    tt AS (SELECT t.doc_id, t.term, p.df FROM t JOIN top_terms p USING (term)),
    co AS (
      SELECT a.term AS x, b.term AS y,
             a.df AS dfx, b.df AS dfy, count(*) AS dfxy
      FROM tt a JOIN tt b ON a.doc_id = b.doc_id AND a.term < b.term
      GROUP BY 1, 2, 3, 4
    )
    SELECT x, y, CAST(dfxy AS BIGINT) AS dfxy,
           round(ln((CAST(dfxy AS DOUBLE) * nd)
                    / (CAST(dfx AS DOUBLE) * dfy)) * 1000000) / 1000000
             AS pmi
    FROM co CROSS JOIN n
    WHERE dfxy >= 5
    ORDER BY x, y
    """,
    tags=("B37", "llm", "tokenize"),
    doc="PMI collocation mining over document co-occurrence: restrict to "
    "the top-12 document-frequency terms (deterministic df DESC, term "
    "ASC), self-join their postings on doc_id with a < ordering (each "
    "unordered pair counted once), and score pointwise mutual "
    "information ln(P(x,y)/(P(x)P(y))) — the corpus-statistics primitive "
    "behind collocation extraction and phrase vocabulary induction. The "
    "co-occurrence join is bounded by (top-k postings)^2 per document — "
    "never all-terms x all-terms — and the top-k restriction is the same "
    "df-cap discipline the near-dup posting joins document for 100 TB.",
)
def b37_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = (
        T(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("term"),
        )
        .where(F.col("term") != "")
        .distinct()
    )
    top_terms = (
        t.groupBy("term")
        .agg(F.count("*").alias("df"))
        .orderBy(F.col("df").desc(), "term")
        .limit(12)
    )
    nd = t.select("doc_id").distinct().count()
    tt = t.join(F.broadcast(top_terms), "term").select("doc_id", "term", "df")
    a = tt.alias("a")
    b = tt.alias("b")
    co = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.term") < F.col("b.term")),
        )
        .groupBy(
            F.col("a.term").alias("x"),
            F.col("b.term").alias("y"),
            F.col("a.df").alias("dfx"),
            F.col("b.df").alias("dfy"),
        )
        .agg(F.count("*").alias("dfxy"))
        .where(F.col("dfxy") >= 5)
    )
    out = co.select(
        "x",
        "y",
        F.col("dfxy").cast("bigint").alias("dfxy"),
        (
            F.round(
                F.log(
                    (F.col("dfxy").cast("double") * F.lit(float(nd)))
                    / (F.col("dfx").cast("double") * F.col("dfy"))
                )
                * F.lit(1000000.0)
            )
            / F.lit(1000000.0)
        ).alias("pmi"),
    )
    return tiny_sort(out, "x", "y")


_STEM_CASES = (
    "caresses", "ponies", "cats", "agreed", "plastered", "motoring",
    "hopping", "falling", "filing", "sized", "relational", "conditional",
    "rational", "digitizer", "operator", "feudalism", "decisiveness",
    "hopefulness", "electricity", "goodness", "adjustable", "adoption",
    "activate", "controlling", "probate", "rate", "cease",
)


@query(
    "b37_stemming",
    # end-to-end stems derived BY HAND from the published algorithm
    # (each word walked through steps 1a-5b on paper; see
    # operators/stemmer.py for the rules) — the oracle is independent of
    # the implementation under test.
    oracle="""
    SELECT * FROM (VALUES
      ('caresses','caress'), ('ponies','poni'), ('cats','cat'),
      ('agreed','agre'), ('plastered','plaster'), ('motoring','motor'),
      ('hopping','hop'), ('falling','fall'), ('filing','file'),
      ('sized','size'), ('relational','relat'), ('conditional','condit'),
      ('rational','ration'), ('digitizer','digit'), ('operator','oper'),
      ('feudalism','feudal'), ('decisiveness','decis'),
      ('hopefulness','hope'), ('electricity','electr'),
      ('goodness','good'), ('adjustable','adjust'), ('adoption','adopt'),
      ('activate','activ'), ('controlling','control'),
      ('probate','probat'), ('rate','rate'), ('cease','ceas')
    ) AS t(word, stem)
    ORDER BY word
    """,
    tags=("B37", "llm", "tokenize"),
    doc="Porter stemming (the standard English suffix-stripper, Porter "
    "1980): operators/stemmer.py implements the published steps 1a-5b "
    "(measure/cvc conditions, longest-suffix-match per step) and runs "
    "over an Arrow-batched mapInPandas — embarrassingly parallel, zero "
    "shuffle, the IR-normalization pass between tokenization and index "
    "construction (b64_bm25_topk). The oracle is 27 end-to-end stems "
    "derived BY HAND from the paper's rules — covering every step, both "
    "1b repair branches, longest-match tie cases (rational vs "
    "relational), and the m/cvc guards of step 5.",
)
def b37_stemming(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import stemmer as _stem_mod

    words = spark.createDataFrame([(w,) for w in _STEM_CASES], "word string")

    import sys as _sys

    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(_stem_mod)
    try:
        _blob = _cp.dumps(_stem_mod.porter_stem)
    finally:
        _cp.unregister_pickle_by_value(_stem_mod)

    def _apply(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pickle as _pickle

        stem = _pickle.loads(_blob)
        for pdf in batches:
            yield pd.DataFrame(
                {"word": pdf["word"], "stem": [stem(w) for w in pdf["word"]]}
            )

    out = words.mapInPandas(_apply, "word string, stem string")
    return tiny_sort(out, "word")


# planted WordPiece vocabulary — small enough that every tokenization
# below is verifiable by hand (greedy longest-match-first, '##'
# continuation prefix, [UNK] when no prefix matches)
WP_VOCAB: tuple[str, ...] = (
    "un", "affable", "aff", "##able", "##ab", "##le", "run", "##ning",
    "##n", "play", "##ing", "s", "##s", "the",
)

_WP_WORDS = (
    "unaffable", "running", "plays", "playing", "the", "thes", "zzz",
    "run", "runs",
)


def wordpiece_encode(word: str, vocab=WP_VOCAB) -> list[str]:
    """Greedy longest-match-first WordPiece: at each position take the
    LONGEST vocab entry matching the remaining suffix (continuations
    carry the '##' prefix); if none matches, the whole word becomes
    [UNK]."""
    vs = set(vocab)
    out: list[str] = []
    i = 0
    while i < len(word):
        end = len(word)
        cur = None
        while end > i:
            piece = word[i:end]
            if i > 0:
                piece = "##" + piece
            if piece in vs:
                cur = piece
                break
            end -= 1
        if cur is None:
            return ["[UNK]"]
        out.append(cur)
        i = end
    return out


@query(
    "b37_wordpiece",
    # hand-derived tokenizations against WP_VOCAB (greedy longest-match,
    # whole-word [UNK] on any positional failure): e.g. 'unaffable' ->
    # greedy picks 'un' at pos 0, then the remainder 'affable' has NO
    # matching continuation ('##affable'..'##a' all absent — the vocab's
    # 'aff' lacks the ## prefix and '##ab' does not match 'af...') so
    # the WHOLE word collapses to [UNK] per the published algorithm.
    oracle="""
    SELECT * FROM (VALUES
      ('unaffable', 1, '[UNK]'),
      ('running',   1, 'run'), ('running', 2, '##ning'),
      ('plays',     1, 'play'), ('plays', 2, '##s'),
      ('playing',   1, 'play'), ('playing', 2, '##ing'),
      ('the',       1, 'the'),
      ('thes',      1, 'the'), ('thes', 2, '##s'),
      ('zzz',       1, '[UNK]'),
      ('run',       1, 'run'),
      ('runs',      1, 'run'), ('runs', 2, '##s')
    ) AS t(word, seq, token)
    ORDER BY word, seq
    """,
    tags=("B37", "llm", "tokenize"),
    doc="WordPiece tokenization (greedy longest-match-first with '##' "
    "continuation pieces and whole-word [UNK] fallback — the BERT-family "
    "subword algorithm, complementing the merge-driven BPE of "
    "b68_bpe_apply): Arrow-batched mapInPandas over a broadcast planted "
    "vocabulary, zero shuffle. The oracle is a hand-derived token table; "
    "note 'unaffable' exposes greedy WordPiece's whole-word [UNK] "
    "semantics: greedy 'un' strands a remainder with no continuation "
    "match, so the entire word collapses to [UNK] even though the vocab "
    "covers other splits of it.",
)
def b37_wordpiece(spark: SparkSession, sf_dir: str) -> DataFrame:
    words = spark.createDataFrame([(w,) for w in _WP_WORDS], "word string")

    _blob = dumps_by_value(wordpiece_encode)

    def _enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pickle as _pickle

        enc = _pickle.loads(_blob)
        for pdf in batches:
            out = {"word": [], "toks": []}
            for w in pdf["word"]:
                out["word"].append(w)
                out["toks"].append(enc(str(w)))
            yield pd.DataFrame(out)

    enc = words.mapInPandas(_enc, "word string, toks array<string>")
    exploded = enc.select(
        "word", F.posexplode("toks").alias("pos0", "token")
    ).select("word", (F.col("pos0") + 1).cast("int").alias("seq"), "token")
    return tiny_sort(exploded, "word", "seq")
