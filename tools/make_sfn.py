"""Synthesize larger scale factors from the driver's sf0.1 snapshot.

The driver ships sf{0.001,0.01,0.1}; SCALING.md's marginal-cost
argument needs at least one more 10× step to be measurement, not
extrapolation. This tool builds sfN (N ∈ {1, 10}) by unioning K=10N
key-offset copies of sf0.1 — the same construction TPC-H dbgen uses
for its scale ladder (independent key ranges, shared dimensions):

- fact/entity keys shift by copy·(1 + max(key)) so every copy joins
  ONLY within itself: per-key join fan-outs, group cardinalities per
  key, and selectivity of every key predicate are preserved exactly,
  while distinct-key counts scale linearly.
- `region`/`nation` stay fixed (dimensions, like dbgen).
- `events.user_id` shifts by the CUSTOMER offset so the stream/enrich
  join keeps its hit rate.
- `embeddings.embedding` is sign-decorrelated per copy (deterministic
  xxhash64(vec_id, dim, copy) sign flips): copies of a vector become
  ~orthogonal instead of exact duplicates, so similarity/ANN workloads
  scale like a genuinely larger corpus (norms, per-dim magnitude
  distributions unchanged).
- `customer.c_name` is perturbed per copy (v3/v4, round 8) under the
  same bounded-dup-group policy as documents below: an absolutely
  bounded number of (cust, copy) pairs keep the exact name
  (_verbatim_mod; E[verbatim copies] = min(K/5, 2)), the rest gain a
  per-copy suffix token — without this, verbatim name replication
  inflated the SymSpell distance-≤1 pair count ~100× (q_dedup_fuzzy
  1.7 s → 24–83 s at sf1 on the v2 tree; 192 s at sf10 on the v3
  tree: the synthesis artifact, not the operator).
- `documents.text` is PERTURBED per copy (v2, round 8): copy 0 is
  verbatim; for copies i>0, an absolutely bounded number of (doc,
  copy) pairs (chosen by xxhash64(doc_id, i); _verbatim_mod, v4)
  stay verbatim — exact dups with dup-GROUP size bounded at
  E[group] ≈ 1 + min(K/5, 2) independent of K, the quantity
  all-pairs-within-group operators' cost depends on — and the rest
  get deterministic ~15% token dropout (xxhash64(doc_id, position,
  i)). Dropout kills ~56% of 3-token shingles (0.85³), putting
  copy↔original Jaccard ≈ 0.28 — far below the 0.8 near-dup
  threshold and below LSH banding's collision knee — so near-dup
  candidate sets scale ~linearly like a real corpus instead of K².
  This is what lets scale_bench measure the minhash/span-dedup
  family at sf1 and sf10 (the round-7 synthesis copied text
  verbatim, inflating candidates K² and excluding the whole family).

Usage: python tools/make_sfn.py [N] [out_base]   (default 1 /dev/shm)
Writes <out_base>/prs_sf<N>/<table>.parquet directories (multi-file),
readable by tables.load and by DuckDB via glob.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.1"

#: key columns to offset, per table: (column, offset-space table)
_OFFSETS = {
    "customer": [("c_custkey", "customer")],
    "supplier": [("s_suppkey", "supplier")],
    "part": [("p_partkey", "part")],
    "orders": [("o_orderkey", "orders"), ("o_custkey", "customer")],
    "lineitem": [
        ("l_orderkey", "orders"),
        ("l_partkey", "part"),
        ("l_suppkey", "supplier"),
    ],
    "events": [("event_id", "events"), ("user_id", "customer")],
    "documents": [("doc_id", "documents")],
    "embeddings": [("vec_id", "embeddings")],
}
_FIXED = ("region", "nation")


def _key_spaces(spark):
    """1 + max(primary key) per table — the per-copy offset stride."""
    spaces = {}
    pk = {
        "customer": "c_custkey",
        "supplier": "s_suppkey",
        "part": "p_partkey",
        "orders": "o_orderkey",
        "events": "event_id",
        "documents": "doc_id",
        "embeddings": "vec_id",
    }
    for t, col in pk.items():
        df = spark.read.parquet(os.path.join(SRC, f"{t}.parquet"))
        spaces[t] = int(df.agg(F.max(col)).collect()[0][0]) + 1
    return spaces


def _verbatim_mod(k: int) -> int:
    """Modulus of the verbatim-copy rule: a (row, copy) pair stays
    VERBATIM iff pmod(xxhash64(key, copy), mod) == 0, giving an
    expected k/mod verbatim copies per base row.

    v3 used the constant 5, which bounds the dup RATE (20%) but lets
    the dup-GROUP size grow linearly with the copy count k — at sf10
    (k=100) that meant ~20-strong exact-dup groups, and
    every all-pairs-within-group near-dup operator (minhash verify,
    SymSpell fuzzy) saw its pair volume grow ~k^2/25: q_dedup_fuzzy
    192 s / q_dedup_minhash 18 s at sf10 measured the synthesis, not
    the operator. A real 10x-bigger crawl has ~10x more DISTINCT
    pages with roughly CONSTANT dup-group size, so v4 bounds the
    group ABSOLUTELY: mod = max(5, k // 2) keeps the expected
    verbatim copies per base row at min(k/5, 2) — identical to v3
    for k <= 10 (the sf1 tree is bit-identical), bounded ~2 above.
    The falling exact-dup RATE is the honest tradeoff: replicated
    base rows cannot hold both rate and group size constant, and
    group size is what the operators' cost depends on.
    """
    return max(5, k // 2)


def build(spark, n: int, out_base: str = "/dev/shm") -> str:
    from pandas_reporter_spark.tables import normalize_ts

    k = 10 * n  # copies of sf0.1
    out = os.path.join(out_base, f"prs_sf{n}")
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        # v2 perturbed document copies; v3 additionally perturbed
        # customer names; v4 bounds verbatim dup-group size
        # ABSOLUTELY (_verbatim_mod) — older trees must not be
        # silently reused for near-dup measurements. (For k <= 10
        # the v3 and v4 rules coincide, so a v3 sf1 tree is
        # bit-identical to its v4 rebuild.)
        if open(done).read().strip() == "v4":
            return out
        import shutil

        shutil.rmtree(out)
    os.makedirs(out, exist_ok=True)
    spaces = _key_spaces(spark)
    for t in _FIXED:
        df = spark.read.parquet(os.path.join(SRC, f"{t}.parquet"))
        df.write.mode("overwrite").parquet(
            os.path.join(out, f"{t}.parquet")
        )
    for t, offs in _OFFSETS.items():
        if t == "events":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            base = normalize_ts(
                spark.read.parquet(os.path.join(SRC, f"{t}.parquet"))
            )
        else:
            base = spark.read.parquet(os.path.join(SRC, f"{t}.parquet"))
        parts = []
        for i in range(k):
            df = base
            for col, space_t in offs:
                df = df.withColumn(
                    col, F.col(col) + F.lit(i * spaces[space_t])
                )
            if t == "customer" and i > 0:
                # same bounded-dup-group policy as documents: name
                # groups of ~10 verbatim copies would inflate the
                # SymSpell distance-<=1 pair count ~100x (measured:
                # q_dedup_fuzzy 1.7 s -> 24-83 s at sf1 on the v2
                # tree). Verbatim copies are bounded ABSOLUTELY (see
                # _verbatim_mod); the rest gain a per-copy suffix
                # token (edit distance > 1 from every other variant,
                # so cross-copy fuzzy pairs form only inside the
                # bounded verbatim group).
                df = df.withColumn(
                    "c_name",
                    F.when(
                        F.expr(
                            f"pmod(xxhash64(c_custkey, {i}),"
                            f" {_verbatim_mod(k)}) = 0"
                        ),
                        F.col("c_name"),
                    ).otherwise(
                        F.concat(F.col("c_name"), F.lit(f" q{i}"))
                    ),
                )
            if t == "documents" and i > 0:
                # deterministic per-copy text perturbation (see module
                # docstring): a BOUNDED number of (doc, copy) pairs
                # verbatim (exact dups; _verbatim_mod), the rest ~15%
                # token dropout
                dropout = (
                    "array_join(filter(split(text, ' '), (w, p) -> "
                    f"pmod(xxhash64(doc_id, p, {i}), 100) >= 15), ' ')"
                )
                df = df.withColumn(
                    "text",
                    F.when(
                        F.expr(
                            f"pmod(xxhash64(doc_id, {i}),"
                            f" {_verbatim_mod(k)}) = 0"
                        ),
                        F.col("text"),
                    ).otherwise(F.expr(dropout)),
                )
            if t == "embeddings" and i > 0:
                # deterministic per-copy sign decorrelation (see module
                # docstring); transform index is 0-based
                df = df.withColumn(
                    "embedding",
                    F.expr(
                        f"transform(embedding, (x, d) -> CAST(x * "
                        f"(1 - 2 * pmod(xxhash64(vec_id, d, {i}), 2)) "
                        f"AS FLOAT))"
                    ),
                )
            parts.append(df)
        full = parts[0]
        for p in parts[1:]:
            full = full.unionAll(p)
        nfiles = max(8, min(64, 2 * k))
        full.repartition(nfiles).write.mode("overwrite").parquet(
            os.path.join(out, f"{t}.parquet")
        )
    open(done, "w").write("v4")
    return out


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    out_base = sys.argv[2] if len(sys.argv) > 2 else "/dev/shm"
    from pandas_reporter_spark.session import get_session

    spark = get_session("make_sfn")
    print(build(spark, n, out_base))
