"""PageRank (operators/graph.py) semantics + determinism pins.

What matters for the 100 TB contract:
- integer-unit updates are partition-count independent (the whole
  reason the operator avoids float accumulation), and
- the rank ordering matches hand-computed PageRank on a tiny graph.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pandas_reporter_spark.operators.graph import (
    _BASE,
    _D_DEN,
    _D_NUM,
    _ITERS,
    _R0,
    q_graph_pagerank,
)


def _write_docs(spark, tmp_path, texts, n_parts=1):
    df = spark.createDataFrame(
        [(i, t, "en", f"s{i % 2}", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).repartition(n_parts)
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


@pytest.fixture(scope="module")
def chain_dir(spark, tmp_path_factory):
    # bigrams: a->b (x3 via three docs), b->c, c->a — a weighted cycle
    # plus a hub: every doc ends "... hub", so hub has high in-degree.
    texts = [
        "a b c a hub",
        "a b hub",
        "a b c hub",
    ]
    return _write_docs(
        spark, tmp_path_factory.mktemp("pr_chain"), texts
    )


def _ranks(spark, sf_dir):
    return {
        r["token"]: r["r"]
        for r in q_graph_pagerank(spark, sf_dir).collect()
    }


def test_pagerank_hand_computed_iteration(spark, chain_dir):
    """One iteration by hand must equal the engine's iteration rule.

    Edges from the fixture (doc1: a-b, b-c, c-a, a-hub; doc2: a-b,
    b-hub; doc3: a-b, b-c, c-hub): a->b:3, a->hub:1, b->c:2,
    b->hub:1, c->a:1, c->hub:1. Out-weights: a:4, b:3, c:2. The loop
    below replays the exact integer update rule _ITERS times.
    """
    edges = {
        ("a", "b"): 3,
        ("a", "hub"): 1,
        ("b", "c"): 2,
        ("b", "hub"): 1,
        ("c", "a"): 1,
        ("c", "hub"): 1,
    }
    wtot = {"a": 4, "b": 3, "c": 2}
    nodes = {"a", "b", "c", "hub"}
    r = {n: _R0 for n in nodes}
    for _ in range(_ITERS):
        nxt = {n: _BASE for n in nodes}
        for (u, v), w in edges.items():
            nxt[v] += (_D_NUM * r[u] * w) // (_D_DEN * wtot[u])
        r = nxt
    got = _ranks(spark, chain_dir)
    assert got == r


def test_pagerank_partition_count_invariant(spark, tmp_path_factory):
    """Identical ranks from 1-partition and 7-partition inputs: the
    integer-unit discipline makes the iteration exactly reproducible
    on any layout (the float version would differ in low bits)."""
    texts = [f"w{i} w{(i * 3) % 11} w{(i * 7) % 11} end" for i in range(40)]
    d1 = _write_docs(
        spark, tmp_path_factory.mktemp("pr_p1"), texts, n_parts=1
    )
    d7 = _write_docs(
        spark, tmp_path_factory.mktemp("pr_p7"), texts, n_parts=7
    )
    assert _ranks(spark, d1) == _ranks(spark, d7)


def test_pagerank_hub_outranks_periphery(spark, chain_dir):
    """The all-docs sink token collects the most rank."""
    got = _ranks(spark, chain_dir)
    hub = got["hub"]
    assert all(hub >= v for v in got.values())


def test_pagerank_tolerates_short_and_empty_docs(spark, tmp_path_factory):
    """Single-token and empty documents must be silently edge-free, not
    a crash: F.sequence(1, size-1) with size=1 yields the DESCENDING
    [1, 0] and element_at(toks, 0) raises INVALID_INDEX_OF_ZERO unless
    guarded (round-7 advice fix). The DuckDB oracle's range(1,
    len(toks)) is naturally empty for those docs, so the guarded
    engine also stays value-identical to it."""
    texts = ["solo", "", "a b c", "x"]
    d = _write_docs(
        spark, tmp_path_factory.mktemp("pr_short"), texts
    )
    got = _ranks(spark, d)
    # only the 3-token doc contributes edges: nodes a, b, c
    assert set(got) == {"a", "b", "c"}


def _brute_triangles(edges):
    """Per-node triangle counts by direct adjacency intersection."""
    from collections import defaultdict

    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    counts = defaultdict(int)
    nodes = sorted(adj)
    for i, u in enumerate(nodes):
        for v in sorted(adj[u]):
            if v <= u:
                continue
            for w in adj[u] & adj[v]:
                if w > v:
                    counts[u] += 1
                    counts[v] += 1
                    counts[w] += 1
    return dict(counts)


def test_triangle_counts_property_sweep(spark):
    """triangle_counts vs a brute-force adjacency-intersection oracle
    on seeded random graphs: dense, sparse, a triangle-free star, a
    complete graph (C(n-1,2) per node), and a chain (zero triangles).
    Same sweep discipline as the connected-components union-find
    oracle."""
    from pandas_reporter_spark.operators.graph import triangle_counts

    def mix(x):
        x = (x ^ (x >> 33)) * 0xFF51AFD7ED558CCD % (1 << 64)
        x = (x ^ (x >> 33)) * 0xC4CEB9FE1A85EC53 % (1 << 64)
        return x ^ (x >> 33)

    cases = []
    for seed, n, denom in ((1, 14, 3), (2, 22, 6), (3, 30, 14)):
        edges = sorted(
            (f"n{i:02d}", f"n{j:02d}")
            for i in range(n)
            for j in range(i + 1, n)
            if mix(seed * 1_000_003 + i * n + j) % denom == 0
        )
        cases.append(edges)
    cases.append([("hub", f"leaf{i}") for i in range(9)])  # star: 0 tris
    cases.append(
        [
            (f"k{i}", f"k{j}")
            for i in range(7)
            for j in range(i + 1, 7)
        ]
    )  # K7: C(6,2)=15 per node
    cases.append([(f"c{i:02d}", f"c{i + 1:02d}") for i in range(12)])
    for edges in cases:
        if not edges:
            continue
        und = spark.createDataFrame(edges, "u string, v string")
        got = {
            r.node: r.n_triangles
            for r in triangle_counts(spark, und).collect()
        }
        assert got == _brute_triangles(edges), f"mismatch on {len(edges)} edges"


def test_triangle_invariants_small(spark):
    """The sf100 self-consistency harness (tools/triangle_invariants.py,
    VERDICT r10 item 6), pinned continuously at test scale: handshake
    (per-node sum == 3 x independent lexicographic-orientation total)
    and shuffle-width invariance of the full per-node output. The same
    `check` function runs at sf100 where the DuckDB oracle OOMs, so
    this test keeps the harness itself honest."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from triangle_invariants import check

    res = check(spark, "/root/testdata/sf0.001", alt_width=5)
    assert res["handshake_ok"], res
    assert res["width_invariance_ok"], res
    assert res["triangles_lex_total"] > 0, "degenerate: no triangles at sf0.001"
