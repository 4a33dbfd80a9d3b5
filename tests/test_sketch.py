"""HLL sketch accuracy pins (no SQL oracle possible: estimates are
DataSketches-algorithm-defined; the correctness contract here is
estimate-vs-exact tolerance and merge consistency)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pandas_reporter_spark.operators.sketch import q_sketch_hll
from pandas_reporter_spark.tables import load

SF = "/root/testdata/sf0.01"


def test_hll_verdict_grid(spark):
    """The registered query emits exact counts + the tolerance verdict
    per type (and the merged '__all__'); every cell must pass."""
    rows = q_sketch_hll(spark, SF).collect()
    types = {r.event_type for r in rows}
    assert "__all__" in types and len(types) >= 3
    assert all(r.est_ok == 1 for r in rows), rows


def test_hll_estimates_within_tolerance(spark):
    from pandas_reporter_spark.operators.sketch import hll_estimates

    est = {r["event_type"]: r["approx_users"] for r in hll_estimates(spark, SF).collect()}
    ev = load(spark, SF, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact["__all__"] = ev.select("user_id").distinct().count()
    assert set(est) == set(exact)
    for k, e in exact.items():
        # lgK=12 standard error ~1.6%; 2% bound with driver-data margin
        assert abs(est[k] - e) <= max(2, 0.02 * e), (k, est[k], e)


def test_quantile_verdict_grid_all_within_bound(spark):
    """The registered query emits the GK guarantee verdict per
    (flag, quantile) cell — every cell must pass, over the full grid."""
    from pandas_reporter_spark.operators.sketch import q_sketch_quantile

    rows = q_sketch_quantile(spark, SF).collect()
    flags = {r.l_returnflag for r in rows}
    assert len(rows) == 3 * len(flags) and len(flags) >= 2
    assert all(r.within_bound == 1 for r in rows), rows


def test_quantile_sketch_close_to_exact(spark):
    from pandas_reporter_spark.operators.sketch import approx_quantiles
    from pyspark.sql import functions as F

    got = {r.l_returnflag: r for r in approx_quantiles(spark, SF).collect()}
    li = load(spark, SF, "lineitem")
    exact = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_extendedprice", F.lit(0.5)).alias("p50"),
            F.percentile("l_extendedprice", F.lit(0.9)).alias("p90"),
            F.percentile("l_extendedprice", F.lit(0.99)).alias("p99"),
        )
        .collect()
    }
    for flag, g in got.items():
        e = exact[flag]
        for p in ("p50", "p90", "p99"):
            # rank error 1e-4 at sf0.01 (~20k rows/group) is ~2 ranks:
            # allow a 1% relative value slack for interpolation diffs
            assert abs(getattr(g, p) - getattr(e, p)) <= 0.02 * abs(getattr(e, p))


def test_heavy_hitters_exact_on_skewed_partitions(spark, tmp_path_factory):
    """A token heavy GLOBALLY but diluted per partition must survive
    candidate generation (the pigeonhole bound), and the verified
    result must equal the exact HAVING answer."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pandas_reporter_spark.registry import QUERIES, load_all

    load_all()
    sf = str(tmp_path_factory.mktemp("hh"))
    # 2000 docs: token 'hot' appears once per doc (global freq 2000 of
    # ~22000 tokens -> way over n/256); fillers are near-unique so the
    # MG counters churn constantly
    rows = []
    for i in range(2000):
        fillers = " ".join(f"w{i}_{j}" for j in range(10))
        rows.append((i, f"hot {fillers}", "en", "s", 0))
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([r[4] for r in rows], pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(sf, "documents.parquet"))
    got = {
        r.token: r.cnt
        for r in QUERIES["q_sketch_heavy_hitters"](spark, sf).collect()
    }
    assert got == {"hot": 2000}  # 2000/22000 > 1/256; every filler below
    # the bounded-state MG variant must agree exactly on the same
    # churn-heavy corpus (near-unique fillers prune every batch)
    from pandas_reporter_spark.operators.sketch import heavy_hitters_mg

    assert {
        r.token: r.cnt for r in heavy_hitters_mg(spark, sf).collect()
    } == got


def test_heavy_hitters_mg_variant_matches_registered(spark):
    from pandas_reporter_spark.operators.sketch import heavy_hitters_mg
    from pandas_reporter_spark.registry import QUERIES, load_all

    load_all()
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        exact = sorted(
            tuple(r)
            for r in QUERIES["q_sketch_heavy_hitters"](spark, sf).collect()
        )
        mg = sorted(tuple(r) for r in heavy_hitters_mg(spark, sf).collect())
        assert mg == exact, sf


def test_heavy_hitters_plan_is_one_scan_with_reused_exchange(spark):
    """The threshold's grand total must ride the grouped result's
    exchange (ReusedExchange), not rescan the corpus: one FileScan of
    documents in the whole plan."""
    from pandas_reporter_spark.registry import QUERIES, load_all

    load_all()
    df = QUERIES["q_sketch_heavy_hitters"](spark, "/root/testdata/sf0.001")
    df.collect()  # AQE performs exchange reuse at runtime
    plan = df._jdf.queryExecution().executedPlan().toString()
    # toString appends the pre-AQE "Initial Plan" (which legitimately
    # shows two scans); judge only the executed Final Plan section
    final = plan.split("== Initial Plan ==")[0]
    assert "ReusedExchange" in final, plan
    assert final.count("FileScan parquet") == 1, plan


def test_cms_guarantees_on_tiny_corpus(spark, tmp_path_factory):
    """CMS verdict columns must both hold on a hand corpus (31 distinct
    tokens in 4×1024 buckets: collisions possible, overshoot bounded)."""
    from pandas_reporter_spark.operators.sketch import q_sketch_cms

    tmp = tmp_path_factory.mktemp("cms")
    rows = [
        (i, " ".join(f"tok{j}" for j in range(i % 7 + 1)), "en", "s0", 10)
        for i in range(50)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))
    out = q_sketch_cms(spark, str(tmp)).collect()
    assert out and all(r["est_ge"] == 1 and r["est_within"] == 1 for r in out)


def test_bloom_no_false_negatives_and_fp_accounting(spark, tmp_path):
    """q_sketch_bloom contract on a planted corpus: a doc sharing a
    shingle with the benchmark set (doc_id < 25) must be reported
    with n_exact >= 1 and n_bloom_pos >= n_exact (no false
    negatives); a disjoint doc can appear only as a pure
    false-positive row (n_exact = 0, still no_fn = 1)."""
    import os

    from pandas_reporter_spark.registry import QUERIES, load_all

    load_all()
    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        {"doc_id": i, "text": bench_text} for i in range(3)
    ] + [
        # doc 30 shares the benchmark shingles verbatim
        {"doc_id": 30, "text": bench_text},
        # doc 40 disjoint vocabulary
        {"doc_id": 40, "text": "one two three four five six seven"},
    ]
    sf = str(tmp_path)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        os.path.join(sf, "documents.parquet")
    )
    out = {r["doc_id"]: r for r in QUERIES["q_sketch_bloom"](spark, sf).collect()}
    assert 30 in out
    r30 = out[30]
    assert r30["n_exact"] >= 1
    assert r30["n_bloom_pos"] >= r30["n_exact"]
    assert r30["no_fn"] == 1
    for r in out.values():
        assert r["no_fn"] == 1


def test_kmv_merge_equals_union_and_sample_is_coordinated(spark, tmp_path):
    """The KMV property the 100 TB rollup leans on: the bottom-k of a
    UNION equals merge(bottom-k(A), bottom-k(B)) = re-rank + truncate
    of the two sketches — so per-ingest-batch sketches roll up without
    rescanning. Also pins coordination: a key sampled in the union was
    sampled in whichever half contained it (same hash, same order)."""
    import os

    from pyspark.sql import functions as F

    from pandas_reporter_spark.operators.dedup import portable_token_hash
    from pandas_reporter_spark.operators.sketch import _KMV_K

    rows = [{"k": i} for i in range(5000)]
    df = spark.createDataFrame(rows).withColumn(
        "h", portable_token_hash(F.col("k").cast("string"))
    )
    half_a = df.filter(F.col("k") % 2 == 0)
    half_b = df.filter(F.col("k") % 2 == 1)

    def bottom_k(frame):
        return [
            r["h"]
            for r in frame.select("h")
            .orderBy("h")
            .limit(_KMV_K)
            .collect()
        ]

    sk_a, sk_b, sk_union = bottom_k(half_a), bottom_k(half_b), bottom_k(df)
    merged = sorted(set(sk_a) | set(sk_b))[:_KMV_K]
    assert merged == sk_union
    # coordination: every sampled key of the union is sampled in its half
    in_a, in_b = set(sk_a), set(sk_b)
    assert all(h in in_a or h in in_b for h in sk_union)
