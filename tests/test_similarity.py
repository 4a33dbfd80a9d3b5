"""LSH similarity pins: recall on PLANTED near-duplicates.

The driver corpus has no pairs above cosine ~0.51, so the oracle gate
never exercises the ≥0.99 near-dup path with real positives. These
tests plant near-identical vectors and pin that the deterministic
hyperplane buckets recover them (P(candidate | cos≥0.999) ≈ 1-3e-5
per pair with 8 tables × 8 planes — and the planes are fixed
constants, so the outcome is deterministic, not probabilistic).
"""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from pandas_reporter_spark.operators.similarity import (
    _mix64,
    lsh_candidate_pairs,
    lsh_signatures,
    plane_signs,
)
from pandas_reporter_spark.registry import QUERIES, load_all

load_all()

N_BASE, N_PLANTED, DIM = 60, 12, 64


def _base_vec(i: int) -> list[float]:
    # deterministic pseudo-random unit-ish vector from splitmix64
    return [(_mix64(i * DIM + j) % 2001 - 1000) / 1000.0 for j in range(DIM)]


def _vectors():
    rows = []
    for i in range(N_BASE):
        rows.append((i, [float(v) for v in _base_vec(i)], i % 5))
    for k in range(N_PLANTED):  # vec 100+k ≈ vec k (cos > 0.999)
        v = _base_vec(k)
        pert = [x + 0.001 * ((_mix64(9_000_000 + k * DIM + j) % 3) - 1) for j, x in enumerate(v)]
        rows.append((100 + k, [float(x) for x in pert], k % 5))
    return rows


@pytest.fixture(scope="module")
def planted(spark):
    return spark.createDataFrame(
        _vectors(), "vec_id long, embedding array<float>, label int"
    )


def test_plane_signs_deterministic_and_balanced():
    p = plane_signs(3, 5)
    assert p == plane_signs(3, 5)
    assert set(p) == {1.0, -1.0}
    # splitmix64 bit 0 is well-mixed: signs roughly balanced
    assert 16 <= sum(1 for v in p if v > 0) <= 48


def test_lsh_signatures_shape(spark, planted):
    sigs = lsh_signatures(planted)
    assert sigs.columns == ["vec_id", "tbl", "sig"]
    n = planted.count()
    assert sigs.count() == n * 8  # one sig per vector per table
    assert sigs.filter((F.col("sig") < 0) | (F.col("sig") > 255)).count() == 0


def test_lsh_recall_on_planted_near_dups(spark, planted):
    pairs = {
        (r.vec_a, r.vec_b) for r in lsh_candidate_pairs(planted).collect()
    }
    planted_pairs = {(k, 100 + k) for k in range(N_PLANTED)}
    missed = planted_pairs - pairs
    assert not missed, f"LSH buckets missed planted near-dups: {missed}"


def test_dedup_embedding_keeps_lowest_id(spark, planted, tmp_path):
    sf = str(tmp_path)
    planted.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf, "embeddings.parquet")
    )
    kept = {r.vec_id for r in QUERIES["q_dedup_embedding"](spark, sf).collect()}
    # every planted duplicate (higher id) dropped, every base kept
    for k in range(N_PLANTED):
        assert k in kept and (100 + k) not in kept
    assert all(i in kept for i in range(N_BASE))
