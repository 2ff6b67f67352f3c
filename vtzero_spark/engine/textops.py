"""Training-data text pipeline operators over the documents table.

Each operator is expressed with built-in pyspark.sql.functions (JVM
side, whole-stage codegen) and integer arithmetic wherever the DuckDB
oracle must reproduce values exactly. MinHash-LSH and SimHash use
vectorized pandas UDFs (their hash mixing isn't worth re-expressing in
two SQL dialects) and are verified against brute-force pytest oracles
instead.

Operators: exact dedup, char-ngram Jaccard similarity, MinHash+LSH
near-dup candidates, SimHash fingerprints, language-ID heuristic,
quality scoring, token stats, rolling-hash document fingerprint.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ------------------------------------------------------------ exact dedup

def dedup_exact(docs: DataFrame) -> DataFrame:
    """Exact duplicate groups by full text: keep the smallest doc_id.
    groupBy(text) shuffles on the text hash; at 100 TB you'd pre-hash
    to a fixed-width key — provided via ``key_col='text_hash'``."""
    return (
        docs.groupBy("text")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
        .select("keep_id", "n_copies")
    )


DEDUP_EXACT_SQL = """
SELECT min(doc_id) AS keep_id, count(*) AS n_copies
FROM documents GROUP BY text
"""


# ------------------------------------------------------ n-gram Jaccard

def _shingles(col: str, prefix: int = 64, n: int = 3):
    p = f"substring({col}, 1, {prefix})"
    return F.expr(
        f"array_distinct(transform(sequence(1, greatest(1, length({p}) - {n - 1})),"
        f" i -> substring({p}, i, {n})))"
    )


def ngram_jaccard_adjacent(docs: DataFrame, prefix: int = 64) -> DataFrame:
    """Exact 3-gram Jaccard similarity for adjacent doc_id pairs
    (deterministic linear-cost pair set; the all-pairs path is
    minhash_lsh below). jaccard_x1000 is integer-exact."""
    d = docs.select("doc_id", _shingles("text", prefix).alias("sh"))
    a = d.alias("a")
    b = d.alias("b")
    joined = a.join(
        b, F.col("b.doc_id") == F.col("a.doc_id") + 1, "inner"
    ).select(
        F.col("a.doc_id").alias("doc_id"),
        (F.col("a.doc_id") + 1).alias("other_id"),
        F.size(F.array_intersect("a.sh", "b.sh")).alias("n_inter"),
        (F.size("a.sh") + F.size("b.sh")).alias("n_total"),
    )
    return joined.select(
        "doc_id", "other_id", "n_inter",
        (F.col("n_total") - F.col("n_inter")).alias("n_union"),
        F.expr("(1000 * n_inter) div (n_total - n_inter)").alias("jaccard_x1000"),
    )


def ngram_jaccard_adjacent_sql(prefix: int = 64) -> str:
    sh = (f"list_distinct([substr(substr(text, 1, {prefix}), CAST(i AS INT), 3)"
          f" FOR i IN range(1, greatest(1, length(substr(text, 1, {prefix})) - 2) + 1)])")
    return f"""
WITH d AS (SELECT doc_id, {sh} AS sh FROM documents)
SELECT a.doc_id AS doc_id, a.doc_id + 1 AS other_id,
       len(list_intersect(a.sh, b.sh)) AS n_inter,
       len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS n_union,
       (1000 * len(list_intersect(a.sh, b.sh)))
         // (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard_x1000
FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
"""


# ------------------------------------------------------ MinHash + LSH

_MINHASH_P = (1 << 61) - 1
_N_HASH = 64
_N_BANDS = 16  # 4 rows per band


def _minhash_params() -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(12345)
    a = rng.randint(1, _MINHASH_P, size=_N_HASH, dtype=np.int64)
    b = rng.randint(0, _MINHASH_P, size=_N_HASH, dtype=np.int64)
    return a, b


def _minhash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    a, b = _minhash_params()
    au = a.astype(np.uint64)
    bu = b.astype(np.uint64)
    for pdf in batches:
        out = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            p = text[:64]
            shingles = {p[i:i + 3] for i in range(max(1, len(p) - 2))}
            hv = np.array(
                [zlib.crc32(s.encode("utf-8")) for s in shingles], dtype=np.uint64
            )
            # (a*h + b) mod p, computed in uint64 (p = 2^61-1 keeps products
            # overflow-prone, so reduce via Python ints per hash lane batch)
            sig = np.empty(_N_HASH, dtype=np.int64)
            for j in range(_N_HASH):
                sig[j] = int(np.min((int(au[j]) * hv.astype(object) + int(bu[j])) % _MINHASH_P))
            out.append({"doc_id": int(doc_id), "sig": sig.tolist()})
        yield pd.DataFrame(out, columns=["doc_id", "sig"])


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """64-lane MinHash signature per document (Arrow-batched UDF)."""
    return docs.select("doc_id", "text").mapInPandas(
        _minhash_batch, schema="doc_id long, sig array<long>"
    )


def minhash_lsh_pairs(docs: DataFrame, threshold_x1000: int = 500) -> DataFrame:
    """LSH candidate pairs: 16 bands x 4 rows; a pair is a candidate if
    any band's 4-lane slice matches; candidates verified by estimated
    Jaccard (matching lanes / 64) >= threshold.

    The band bucket join is the scale path: groupBy(band, bucket_hash)
    — a pure shuffle join, no quadratic blowup."""
    sig = minhash_signatures(docs)
    rows_per_band = _N_HASH // _N_BANDS
    bands = sig.select(
        "doc_id", "sig",
        F.explode(F.sequence(F.lit(0), F.lit(_N_BANDS - 1))).alias("band"),
    ).withColumn(
        "bucket",
        F.xxhash64(F.col("band"), F.expr(f"slice(sig, band * {rows_per_band} + 1, {rows_per_band})")),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(b, ["band", "bucket"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_id"),
                F.col("b.doc_id").alias("other_id"),
                F.col("a.sig").alias("sig_a"), F.col("b.sig").alias("sig_b"))
        .dropDuplicates(["doc_id", "other_id"])
    )
    est = cand.withColumn(
        "est_jaccard_x1000",
        F.expr(
            "(1000 * size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v)))"
            f" div {_N_HASH}"
        ),
    )
    return est.where(F.col("est_jaccard_x1000") >= threshold_x1000).select(
        "doc_id", "other_id", "est_jaccard_x1000"
    )


# ------------------------------------------------------------- SimHash

def _simhash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            tokens = text.split()
            acc = np.zeros(32, dtype=np.int64)
            if tokens:
                hv = np.array([zlib.crc32(t.encode("utf-8")) for t in tokens],
                              dtype=np.uint64)
                bits = ((hv[:, None] >> np.arange(32, dtype=np.uint64)) & 1).astype(np.int64)
                acc = (2 * bits - 1).sum(axis=0)
            sh = int(((acc > 0).astype(np.int64) << np.arange(32)).sum())
            out.append({"doc_id": int(doc_id), "simhash": sh})
        yield pd.DataFrame(out, columns=["doc_id", "simhash"])


def simhash(docs: DataFrame) -> DataFrame:
    """32-bit SimHash over whitespace tokens (crc32 token hashes)."""
    return docs.select("doc_id", "text").mapInPandas(
        _simhash_batch, schema="doc_id long, simhash long"
    )


def simhash_neardup_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, candidate-generated
    by 4-way bit-slab blocking (pigeonhole: distance<=3 implies at
    least one identical 8-bit slab)."""
    sh = simhash(docs)
    slabs = sh.select(
        "doc_id", "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("slab"),
    ).withColumn("slab_val", F.expr("(simhash div CAST(pow(256, slab) AS BIGINT)) % 256"))
    a = slabs.alias("a")
    b = slabs.alias("b")
    cand = (
        a.join(b, ["slab", "slab_val"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_id"), F.col("b.doc_id").alias("other_id"),
                F.col("a.simhash").alias("ha"), F.col("b.simhash").alias("hb"))
        .dropDuplicates(["doc_id", "other_id"])
    )
    return cand.withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))) \
        .where(F.col("hamming") <= max_hamming).select("doc_id", "other_id", "hamming")


# ----------------------------------------------------- language ID

_LANG_PROFILES = [
    ("en", ["the", "and"]),
    ("de", ["der", "und"]),
    ("es", ["el", "los"]),
    ("fr", ["le", "les"]),
]


def _occ(col: str, sub: str, div: str = "div") -> str:
    return f"((length({col}) - length(replace({col}, '{sub}', ''))) {div} {len(sub)})"


def lang_id(docs: DataFrame) -> DataFrame:
    """Deterministic stopword-count language heuristic; argmax with
    fixed tie order en > de > es > fr."""
    d = docs
    for lang, subs in _LANG_PROFILES:
        expr = " + ".join(_occ("text", s) for s in subs)
        d = d.withColumn(f"s_{lang}", F.expr(expr))
    pred = F.expr(
        "CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en' "
        "WHEN s_de >= s_es AND s_de >= s_fr THEN 'de' "
        "WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END"
    )
    return d.select(
        "doc_id", "lang",
        pred.alias("pred_lang"),
        F.expr("greatest(s_en, s_de, s_es, s_fr)").alias("score"),
    )


def lang_id_sql() -> str:
    cols = []
    for lang, subs in _LANG_PROFILES:
        expr = " + ".join(_occ("text", s, div="//") for s in subs)
        cols.append(f"({expr}) AS s_{lang}")
    return f"""
WITH d AS (SELECT doc_id, lang, {', '.join(cols)} FROM documents)
SELECT doc_id, lang,
       CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
            WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
            WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END AS pred_lang,
       greatest(s_en, s_de, s_es, s_fr) AS score
FROM d
"""


# ----------------------------------------------------- quality / tokens

def token_stats(docs: DataFrame) -> DataFrame:
    """Whitespace token count, vowel ratio, mean token length — all
    integer-exact (x1000 fixed point)."""
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars_m"),
        (F.length("text") - F.length(F.expr("replace(text, ' ', '')")) + 1).alias("n_tokens"),
        F.expr(
            "(1000 * (length(text) - length(translate(text, 'aeiou', '')))) div length(text)"
        ).alias("vowel_x1000"),
        F.expr(
            "(100 * (length(replace(text, ' ', '')))) div "
            "(length(text) - length(replace(text, ' ', '')) + 1)"
        ).alias("tok_len_x100"),
    )


TOKEN_STATS_SQL = """
SELECT doc_id,
       length(text) AS n_chars_m,
       length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
       (1000 * (length(text) - length(translate(text, 'aeiou', '')))) // length(text) AS vowel_x1000,
       (100 * length(replace(text, ' ', ''))) //
         (length(text) - length(replace(text, ' ', '')) + 1) AS tok_len_x100
FROM documents
"""


def quality_score(docs: DataFrame) -> DataFrame:
    """Integer quality score in [0, 1000]: rewards mid-length docs,
    healthy vowel ratio, and bounded token length (a deterministic
    stand-in for a trained quality model)."""
    t = token_stats(docs)
    return t.select(
        "doc_id",
        F.expr(
            "least(1000, (least(n_chars_m, 400) * 400) div 400"
            " + (least(vowel_x1000, 400) * 400) div 400"
            " + (least(n_tokens, 100) * 200) div 100)"
        ).alias("quality"),
    )


QUALITY_SCORE_SQL = """
WITH t AS (
  SELECT doc_id,
         length(text) AS n_chars_m,
         length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
         (1000 * (length(text) - length(translate(text, 'aeiou', '')))) // length(text) AS vowel_x1000
  FROM documents
)
SELECT doc_id,
       least(1000, (least(n_chars_m, 400) * 400) // 400
         + (least(vowel_x1000, 400) * 400) // 400
         + (least(n_tokens, 100) * 200) // 100) AS quality
FROM t
"""


# ----------------------------------------------------- fingerprint

_FP_MOD = 1000000007
_FP_SEED = 7
_FP_LEN = 32


def fingerprint(docs: DataFrame) -> DataFrame:
    """Polynomial rolling hash of the first 32 chars (base 31 mod 1e9+7)
    — the document fingerprinting primitive, exact in both engines."""
    return docs.select(
        "doc_id",
        F.expr(
            f"aggregate(transform(sequence(1, least({_FP_LEN}, length(text))),"
            f" i -> ascii(substring(text, i, 1))),"
            f" CAST({_FP_SEED} AS BIGINT), (a, c) -> (a * 31 + c) % {_FP_MOD})"
        ).alias("fp"),
    )


FINGERPRINT_SQL = f"""
SELECT doc_id,
       list_reduce(
         list_concat([CAST({_FP_SEED} AS BIGINT)],
           [CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT)
            FOR i IN range(1, least({_FP_LEN}, length(text)) + 1)]),
         (a, c) -> (a * 31 + c) % {_FP_MOD}) AS fp
FROM documents
"""
