"""Deduplication operators for the LLM-data-pipeline layer (SURVEY §2.3).

Four dedup families over `documents`, each in its scale-correct shape:

- exact dedup      — hash-groupBy with map-side combine (never a window
                     over the full corpus when only keepers are needed)
- keep-first by key— row_number window (the deterministic form of
                     dropDuplicates, whose keeper choice is partition-
                     order dependent and therefore unstable on a cluster)
- n-gram Jaccard   — blocked self-join (blocking key caps the pair
                     space; the unblocked all-pairs form is O(n²) and
                     banned at 100 TB)
- MinHash + LSH    — shingle → 64 minhashes → 16 banded signatures →
                     bucket join → exact-Jaccard verify. The bucket join
                     IS the scale story: candidate pairs only ever form
                     inside equal-signature buckets.
- SimHash          — 64-bit signature via per-bit majority of token
                     hashes; near-dups collide on signature prefixes.

All token/shingle/hash work is Spark built-ins (split/transform/
aggregate/xxhash64) — JVM-side, whole-stage-codegen'd, no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from pandas_reporter_spark.registry import query
from pandas_reporter_spark.session import configure
from pandas_reporter_spark.tables import load


def tokens_col(col: str = "text"):
    """Distinct lowercase whitespace tokens (set semantics for Jaccard)."""
    return F.array_distinct(F.split(F.lower(F.col(col)), " "))


def shingles_col(col: str = "text", k: int = 3):
    """k-token shingles as strings; empty array for docs shorter than k."""
    toks = F.split(F.lower(F.col(col)), " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(1), n - (k - 1))
    make = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(k)])
    )
    return F.when(n >= k, F.array_distinct(make)).otherwise(
        F.array().cast("array<string>")
    )


@query(
    "q_dedup_exact",
    oracle="""
    SELECT doc_id, lang, source, n_chars FROM (
      SELECT MIN(doc_id) AS doc_id,
             MIN_BY(lang, doc_id) AS lang,
             MIN_BY(source, doc_id) AS source,
             MIN_BY(n_chars, doc_id) AS n_chars
      FROM documents GROUP BY text
    )
    """,
)
def q_dedup_exact(spark, sf):
    """Exact dedup by full text, keep lowest doc_id.

    groupBy(text) + min/min_by, NOT a row_number window: aggregation
    gets map-side partial combine (each task pre-dedups its partition
    before the shuffle), so shuffled bytes ≈ distinct texts, not total
    rows. At 100 TB with heavy duplication that is the difference
    between shuffling the corpus and shuffling the dictionary.
    """
    configure(spark)
    d = load(spark, sf, "documents")
    return (
        d.groupBy("text")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min_by("lang", "doc_id").alias("lang"),
            F.min_by("source", "doc_id").alias("source"),
            F.min_by("n_chars", "doc_id").alias("n_chars"),
        )
        .select("doc_id", "lang", "source", "n_chars")
    )


@query(
    "q_dedup_keep_first",
    oracle="""
    SELECT doc_id, lang, source FROM (
      SELECT doc_id, lang, source,
             ROW_NUMBER() OVER (PARTITION BY lang, source ORDER BY doc_id) AS rn
      FROM documents
    ) WHERE rn = 1
    """,
)
def q_dedup_keep_first(spark, sf):
    """Keep-first per (lang, source): the deterministic dropDuplicates.

    dropDuplicates([...]) keeps an arbitrary (partition-order dependent)
    row — unstable across cluster runs; the row_number form pins the
    keeper by explicit order (reference keep-first semantics).
    """
    configure(spark)
    d = load(spark, sf, "documents")
    w = W.partitionBy("lang", "source").orderBy("doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "source")
    )


@query(
    "q_dedup_ngram_jaccard",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang,
             list_distinct(string_split(lower(text), ' ')) AS toks
      FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                 / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))), 6)
             AS jaccard
    FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
          / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.9
    """,
)
def q_dedup_ngram_jaccard(spark, sf):
    """Near-dup pairs by token-set Jaccard ≥ 0.9, blocked by lang.

    The self-join runs INSIDE a blocking key (lang), never all-pairs:
    pair space is Σ n_block² instead of n². At 100 TB the blocking key
    would be an LSH band (see q_dedup_minhash) — same plan shape, and a
    skewed block is handled by AQE skew-join or salting the block key.
    """
    configure(spark)
    d = load(spark, sf, "documents").select(
        "doc_id", "lang", tokens_col().alias("toks")
    )
    a = d.select(
        F.col("doc_id").alias("doc_a"), "lang", F.col("toks").alias("toks_a")
    )
    b = d.select(
        F.col("doc_id").alias("doc_b"),
        F.col("lang").alias("lang_b"),
        F.col("toks").alias("toks_b"),
    )
    inter = F.size(F.array_intersect("toks_a", "toks_b")).cast("double")
    union = F.size("toks_a") + F.size("toks_b") - F.size(
        F.array_intersect("toks_a", "toks_b")
    )
    jac = inter / union
    return (
        a.join(b, (a.lang == b.lang_b) & (a.doc_a < b.doc_b))
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= 0.9)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


#: MinHash geometry: 64 hash functions in 16 bands of 4 rows.
#: P(candidate | J) = 1 - (1 - J^4)^16 — ~0.97 at J=0.8, ~0.07 at J=0.3.
_N_HASH, _N_BANDS, _BAND_ROWS = 64, 16, 4


@query("q_dedup_minhash")  # rows-only: hash-dependent candidates, no SQL oracle
def q_dedup_minhash(spark, sf):
    """MinHash-LSH near-dup detection — the 100 TB dedup path.

    Pipeline (all JVM expressions): 3-token shingles → 64 minhashes
    (min over shingle xxhash64 per seed) → 16 band signatures (xxhash64
    of each 4-minhash slice) → explode → self-join on (band, signature)
    → distinct candidate pairs → exact shingle-Jaccard verify ≥ 0.8.

    Scale: candidates only form inside equal-signature buckets, so the
    join shuffles (doc_id, band_sig) pairs — 16 small rows per doc —
    never the corpus text, and never an all-pairs product. A hot bucket
    (boilerplate docs) is a salting candidate; AQE skew-join covers it.
    """
    configure(spark)
    d = load(spark, sf, "documents").select(
        "doc_id", shingles_col().alias("sh")
    )
    sigs = d.select(
        "doc_id",
        "sh",
        F.transform(
            F.sequence(F.lit(0), F.lit(_N_HASH - 1)),
            lambda seed: F.array_min(
                F.transform(F.col("sh"), lambda s: F.xxhash64(s, seed))
            ),
        ).alias("mh"),
    )
    bands = sigs.select(
        "doc_id",
        "sh",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(_N_BANDS - 1)),
                lambda b: F.xxhash64(F.slice(F.col("mh"), b * _BAND_ROWS + 1, _BAND_ROWS)),
            )
        ).alias("band", "sig"),
    )
    left = bands.select(
        F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"), "band", "sig"
    )
    right = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"), "band", "sig"
    )
    cand = (
        left.join(right, ["band", "sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size("sh_a") + F.size("sh_b") - F.size(F.array_intersect("sh_a", "sh_b"))
    return (
        cand.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= 0.8)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


@query("q_dedup_simhash")  # rows-only: signature values are hash-defined
def q_dedup_simhash(spark, sf):
    """64-bit SimHash signatures + near-dup pairs at Hamming distance 0.

    Per doc: bit j of the signature is the sign of Σ_tokens (±1) where
    the sign is bit j of xxhash64(token). Near-dup docs (token multisets
    mostly shared) agree on most bits; exact-signature collision is the
    cheapest (groupBy, no join) near-dup screen. Wider Hamming radii use
    the standard trick of joining on signature quarters (any d≤3 pair
    shares at least one exact quarter) — same banded-join shape as LSH.
    """
    configure(spark)
    d = load(spark, sf, "documents").select(
        "doc_id", F.split(F.lower(F.col("text")), " ").alias("toks")
    )
    # bit j vote: Σ_tokens ±1 by bit j of xxhash64(token). shiftright
    # needs a literal shift, so test the bit with a computed mask
    # (2^j is exact in double for j ≤ 62, then cast to long).
    bit_vote = lambda j: F.aggregate(  # noqa: E731
        F.col("toks"),
        F.lit(0).cast("long"),
        lambda acc, t: acc
        + F.when(
            F.xxhash64(t).bitwiseAND(F.pow(F.lit(2.0), j).cast("long")) != 0, 1
        ).otherwise(-1),
    )
    sigs = (
        # 63 bits (not 64) keeps the signature positive in a signed long;
        # pack MSB-first via acc*2 + bit — pure Column arithmetic, no
        # shiftleft-by-Column (unsupported).
        d.withColumn(
            "bits",
            F.transform(
                F.sequence(F.lit(0), F.lit(62)),
                lambda j: F.when(bit_vote(j) > 0, 1).otherwise(0).cast("long"),
            ),
        )
        .withColumn(
            "simhash",
            F.aggregate(
                F.col("bits"),
                F.lit(0).cast("long"),
                lambda acc, b: acc * 2 + b,
            ),
        )
        .select("doc_id", "simhash")
    )
    a = sigs.select(F.col("doc_id").alias("doc_a"), "simhash")
    b = sigs.select(F.col("doc_id").alias("doc_b"), "simhash")
    return (
        a.join(b, "simhash")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "simhash")
    )
