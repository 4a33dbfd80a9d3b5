"""Similarity-search operators over `embeddings` (SURVEY §2.3).

`embeddings` is (vec_id long, embedding array<float> [64-dim], label int).
Four shapes:

- brute-force cosine top-k     — the exact baseline; TakeOrderedAndProject
- blocked all-pairs sim join   — pairs inside a blocking key, never n²
- random-hyperplane LSH ANN    — sign-bucket join; the 100 TB path
- IVF (inverted-file) search   — centroid assignment + probe-cell scan

Dot products are pure Column expressions (`zip_with` + `aggregate`) with
explicit per-element double casts so Spark and DuckDB accumulate
identically (both left-to-right over doubles); cosines are round(6)-ed
before hashing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window as W

from pandas_reporter_spark.registry import query
from pandas_reporter_spark.session import configure
from pandas_reporter_spark.tables import load


def dot(a, b):
    """Σ aᵢ·bᵢ with double accumulation, left-to-right (oracle-exact)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a):
    return F.sqrt(dot(a, a))


def cosine(a, b):
    return dot(a, b) / (norm(a) * norm(b))


#: Oracle-side dot product over DuckDB lists, mirroring `dot` exactly:
#: element-wise double-cast multiply, then left-to-right double sum.
_DUCK_DOT = (
    "list_aggregate(list_transform(range(1, 65), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), 'sum')"
)


def _duck_cos(a: str, b: str) -> str:
    d = _DUCK_DOT.format(a=a, b=b)
    na = f"sqrt({_DUCK_DOT.format(a=a, b=a)})"
    nb = f"sqrt({_DUCK_DOT.format(a=b, b=b)})"
    return f"({d} / ({na} * {nb}))"


@query(
    "q_similarity_topk",
    oracle=f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT vec_id, label, round({_duck_cos('e.embedding', 'q.qv')}, 6) AS cos
    FROM embeddings e CROSS JOIN q
    WHERE e.vec_id <> 0
    ORDER BY {_duck_cos('e.embedding', 'q.qv')} DESC, vec_id
    LIMIT 10
    """,
)
def q_similarity_topk(spark, sf):
    """Exact cosine top-10 against the vec_id=0 query vector.

    The single-row query side is crossJoin-broadcast (a literal in the
    plan after AQE); orderBy+limit compiles to TakeOrderedAndProject —
    each task keeps its local top-10, the driver merges 10×n_tasks
    rows. No global sort, no full shuffle: this is the shape that
    survives a 100 TB scan. Deterministic tiebreak on vec_id.
    """
    configure(spark)
    e = load(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    cos = cosine(F.col("embedding"), F.col("qv"))
    return (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "label", cos.alias("_cos"))
        .orderBy(F.col("_cos").desc(), "vec_id")
        .limit(10)
        .select("vec_id", "label", F.round("_cos", 6).alias("cos"))
    )


@query(
    "q_similarity_join",
    oracle=f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label,
           round({_duck_cos('a.embedding', 'b.embedding')}, 6) AS cos
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_duck_cos('a.embedding', 'b.embedding')} >= 0.99
    """,
)
def q_similarity_join(spark, sf):
    """All-pairs cosine ≥ 0.99 inside label blocks (near-dup embeddings).

    The self-join is blocked on `label`, so the pair space is
    Σ n_block², not n² — the blocking key is what makes an embedding
    near-dup sweep feasible at all; at 100 TB the block would be an
    LSH bucket (q_similarity_ann_lsh) with this same join shape.
    """
    configure(spark)
    e = load(spark, sf, "embeddings")
    # per-vector norms hoisted into the scan projection — one dot per
    # pair instead of three; bit-identical to the per-pair recompute
    en = e.select(
        "vec_id", "label", "embedding", norm(F.col("embedding")).alias("nrm")
    )
    a = en.select(
        F.col("vec_id").alias("vec_a"),
        "label",
        F.col("embedding").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
    )
    b = en.select(
        F.col("vec_id").alias("vec_b"),
        F.col("label").alias("label_b"),
        F.col("embedding").alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
    )
    cos = dot(F.col("emb_a"), F.col("emb_b")) / (F.col("nrm_a") * F.col("nrm_b"))
    return (
        a.join(b, (a.label == b.label_b) & (a.vec_a < b.vec_b))
        .withColumn("_cos", cos)
        .filter(F.col("_cos") >= 0.99)
        .select("vec_a", "vec_b", "label", F.round("_cos", 6).alias("cos"))
    )


#: LSH geometry: 8 hash tables × 8 signed hyperplanes. Candidates are
#: vectors sharing ANY table's 8-bit bucket with the query —
#: P(candidate | cosθ) = 1 - (1 - (1 - θ/π)^8)^8.
_N_TABLES, _N_PLANES = 8, 8


def _hyperplane(table: int, plane: int, dim: int = 64):
    """One deterministic pseudo-random ±1 hyperplane as a literal array.

    Components derive from xxhash64(table·10⁵ + plane·10³ + i) — ships
    inside the plan, zero data movement. Returned as a standalone
    Column (not built inside an outer lambda): nested HOFs capturing an
    outer lambda variable drop out of codegen (40× measured — see
    dedup.q_dedup_minhash).
    """
    base = table * 100000 + plane * 1000
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.when(
            F.xxhash64(F.lit(base) + i).bitwiseAND(F.lit(1)) == 1, 1.0
        ).otherwise(-1.0),
    )


def _lsh_buckets(df: DataFrame) -> DataFrame:
    """(vec_id, label, embedding, table, sig): one row per hash table.

    Table signatures are python-unrolled: sig_t = Σ_p bit(t,p)·2^p with
    each bit a flat `dot ≥ 0` expression over a literal plane array.
    """
    sigs = F.array(
        *[
            sum(
                [
                    F.when(dot(F.col("embedding"), _hyperplane(t, p)) >= 0, 1)
                    .otherwise(0)
                    .cast("long")
                    * (1 << p)
                    for p in range(_N_PLANES)
                ],
                F.lit(0).cast("long"),
            )
            for t in range(_N_TABLES)
        ]
    )
    return df.withColumn("sigs", sigs).select(
        "vec_id",
        "label",
        "embedding",
        F.posexplode("sigs").alias("table", "sig"),
    )


@query("q_similarity_ann_lsh")  # rows-only: buckets are hash-defined
def q_similarity_ann_lsh(spark, sf):
    """ANN via multi-table random-hyperplane LSH: bucket join + rerank.

    Signatures are computed in the scan projection (no shuffle); the
    query's 8 (table, sig) buckets broadcast; candidates = distinct
    vectors hitting any bucket; exact cosine only on candidates. At
    100 TB the bucket join shuffles ~L·n/2^b rows, rerank cost is the
    candidate set — recall/cost dials are L (tables) and b (planes).
    """
    configure(spark)
    e = load(spark, sf, "embeddings")
    buckets = _lsh_buckets(e)
    qb = buckets.filter(F.col("vec_id") == 0).select(
        "table", "sig", F.col("embedding").alias("qv")
    )
    cand = (
        buckets.join(F.broadcast(qb), ["table", "sig"])
        .filter(F.col("vec_id") != 0)
        .select("vec_id", "label", "embedding", "qv")
        .dropDuplicates(["vec_id"])
    )
    cos = cosine(F.col("embedding"), F.col("qv"))
    return (
        cand.select("vec_id", "label", F.round(cos, 6).alias("cos"))
        .orderBy(F.col("cos").desc(), "vec_id")
        .limit(10)
    )


@query("q_similarity_ivf")  # rows-only: centroids are data/order-dependent
def q_similarity_ivf(spark, sf):
    """IVF-style ANN: label-mean centroids, probe the 2 nearest cells.

    Build phase: per-label per-dim mean → 10 centroids (tiny,
    broadcast). Query phase: rank cells by centroid cosine, scan only
    vectors in the top-2 cells, exact-rerank top-10. At 100 TB the
    centroid build is one map-side-combined groupBy over the corpus
    (or a sampled k-means); the probe scan reads 2/k of the data —
    partition the parquet by cell id and the probe becomes partition
    pruning at the source.
    """
    configure(spark)
    e = load(spark, sf, "embeddings")
    # per-label mean vector: explode dims -> avg -> re-assemble
    dims = e.select(
        "label",
        F.posexplode(F.col("embedding")).alias("dim", "v"),
    )
    cent = (
        dims.groupBy("label", "dim")
        .agg(F.avg(F.col("v").cast("double")).alias("c"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("dc"))
        .select(
            F.col("label").alias("cell"),
            F.transform(F.col("dc"), lambda s: s["c"]).alias("centroid"),
        )
    )
    qv = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    # rank cells by centroid-vs-query cosine, keep 2 probe cells
    cell_rank = (
        cent.crossJoin(F.broadcast(qv))
        .select("cell", cosine(F.col("centroid"), F.col("qv")).alias("ccos"))
        .orderBy(F.col("ccos").desc(), "cell")
        .limit(2)
        .select("cell")
    )
    cos = cosine(F.col("embedding"), F.col("qv"))
    return (
        e.join(F.broadcast(cell_rank), e.label == F.col("cell"))
        .filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select("vec_id", "label", F.round(cos, 6).alias("cos"))
        .orderBy(F.col("cos").desc(), "vec_id")
        .limit(10)
    )


@query(
    "q_embed_stats",
    oracle=f"""
    SELECT label,
           COUNT(*) AS n,
           round(CAST(SUM(CAST(round(sqrt({_DUCK_DOT.format(a='embedding', b='embedding')}), 6)
                 AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_norm
    FROM embeddings GROUP BY label
    """,
)
def q_embed_stats(spark, sf):
    """Per-label embedding count + mean L2 norm.

    Norms are rounded to 6dp BEFORE the mean and summed through
    DECIMAL so the aggregate is accumulation-order independent —
    the pattern every float aggregate in this engine uses to stay
    bit-stable across partition counts (and engines).
    """
    configure(spark)
    e = load(spark, sf, "embeddings")
    nrm = F.round(norm(F.col("embedding")), 6)
    return (
        e.select("label", nrm.alias("nrm"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.sum(F.col("nrm").cast("decimal(18,6)")).cast("double")
                / F.count("*"),
                6,
            ).alias("avg_norm"),
        )
    )
