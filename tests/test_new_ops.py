"""Semantic pins for the round-6 additions: MaxSim, temperature
mixing, vocabulary overlap, incremental dedup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pandas_reporter_spark.operators.dedup import q_dedup_incremental
from pandas_reporter_spark.operators.similarity import q_similarity_maxsim
from pandas_reporter_spark.operators.text import (
    q_mix_temperature,
    q_text_vocab_overlap,
)


def _docs_dir(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


@pytest.fixture(scope="module")
def embed_dir(spark, tmp_path_factory):
    """16 vectors in 4 labels; label 3 contains EXACT copies of the
    four query vectors (vec_id 0-3)."""
    import math

    def vec(seed):
        return [float(math.sin(seed * 13 + i)) for i in range(64)]

    rows = []
    for vid in range(16):
        label = vid % 4
        if label == 3 and vid >= 4:
            # vids 7/11/15 -> exact copies of query vectors 0/1/2
            # (vid 3 itself already equals query vector 3)
            src = vec(vid // 4 - 1)
        else:
            src = vec(vid)
        rows.append((vid, src, label))
    tmp = tmp_path_factory.mktemp("maxsim")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp / "embeddings.parquet"))
    return str(tmp)


def test_maxsim_perfect_label_scores_full(spark, embed_dir):
    scores = {
        r["label"]: r["score_micro"]
        for r in q_similarity_maxsim(spark, embed_dir).collect()
    }
    # label 3 holds exact copies of every query vector: each of the 4
    # per-query maxima is cos=1.0 -> 4 * 1e6 micro-units exactly
    assert scores[3] == 4_000_000
    assert all(v <= 4_000_000 for v in scores.values())
    # every label scores > 0 only if some cosine is positive; at least
    # the self-label of each query vector contains it exactly
    for lbl in (0, 1, 2):
        assert scores[lbl] >= 1_000_000  # contains its own query vector


def test_mix_temperature_keeps_scarcest_source_whole(spark, tmp_path_factory):
    rows = []
    did = 0
    for src, n in (("s0", 40), ("s1", 10), ("s2", 160)):
        for _ in range(n):
            rows.append((did, f"t {did}", "en", src, 5))
            did += 1
    d = _docs_dir(spark, tmp_path_factory.mktemp("mixt"), rows)
    out = {r["source"]: r for r in q_mix_temperature(spark, d).collect()}
    # scarcest source: threshold saturates, everything kept
    assert out["s1"]["thr"] == 65536 and out["s1"]["n_kept"] == 10
    # n_s/n_min = 4 and 16 -> expected keep-rates 1/2 and 1/4
    assert out["s0"]["thr"] == 32768
    assert out["s2"]["thr"] == 16384
    for r in out.values():
        assert 0 <= r["n_kept"] <= r["n_orig"]


def test_vocab_overlap_hand_computed(spark, tmp_path_factory):
    rows = [
        (0, "alpha beta", "en", "s0", 10),
        (1, "alpha gamma", "en", "s1", 11),
    ]
    d = _docs_dir(spark, tmp_path_factory.mktemp("vocab"), rows)
    out = {
        r["source"]: r for r in q_text_vocab_overlap(spark, d).collect()
    }
    # alpha is universal; beta/gamma exclusive
    assert out["s0"]["vocab"] == 2 and out["s1"]["vocab"] == 2
    assert out["s0"]["n_exclusive"] == 1 and out["s1"]["n_exclusive"] == 1
    assert out["s0"]["n_universal"] == 1 and out["s1"]["n_universal"] == 1


def test_incremental_dedup_admits_only_fresh_content(spark, tmp_path_factory):
    rows = [
        # corpus (doc_id % 10 != 7)
        (1, "known text", "c", "s0", 10),
        (2, "other text", "c", "s0", 10),
        # batch (doc_id % 10 == 7)
        (7, "known text", "b", "s1", 10),   # dup of corpus -> dropped
        (17, "fresh text", "b", "s1", 10),  # fresh -> kept
        (27, "fresh text", "b", "s1", 10),  # in-batch dup -> dropped
        (37, "unique text", "b", "s1", 11), # fresh -> kept
    ]
    d = _docs_dir(spark, tmp_path_factory.mktemp("incr"), rows)
    kept = sorted(
        r["doc_id"] for r in q_dedup_incremental(spark, d).collect()
    )
    assert kept == [17, 37]


def test_pipeline_pretrain_stage_composition(spark, tmp_path_factory):
    """The capstone DAG must gate short docs, dedup normalized copies,
    keep the scarcest source whole, and split deterministically."""
    from pandas_reporter_spark.operators.text import q_pipeline_pretrain

    rows = []
    did = 0
    long_text = "alpha beta gamma delta epsilon zeta"
    for src, n in (("s0", 30), ("s1", 6)):
        for _ in range(n):
            rows.append((did, f"{long_text} {did}", "en", src, 40))
            did += 1
    rows.append((100, "short doc", "en", "s0", 9))       # gated out (<5 tok)
    rows.append((101, f"{long_text} 0", "en", "s0", 40)) # dup of doc 0
    d = _docs_dir(spark, tmp_path_factory.mktemp("pretrain"), rows)
    out = q_pipeline_pretrain(spark, d).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], 0)
        by_src[r["source"]] += r["n_docs"]
    # scarcest source survives whole; dup + short doc never counted
    assert by_src["s1"] == 6
    assert by_src["s0"] <= 30  # dup 101 collapsed, short 100 gated, mix <= 1
    assert all(r["split"] in ("train", "val") for r in out)
    # deterministic: second run identical
    out2 = q_pipeline_pretrain(spark, d).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_weighted_median_hand_computed(spark, tmp_path_factory):
    """w-median crossing: values 10,20,30 with weights 1,1,3 -> half
    of total (2.5 cents-scaled) is crossed by 30."""
    from pandas_reporter_spark.operators.relational import (
        q_agg_weighted_median,
    )

    tmp = tmp_path_factory.mktemp("wmed")
    rows = [("A", 10.0, 1.0), ("A", 20.0, 1.0), ("A", 30.0, 3.0),
            ("B", 5.0, 2.0), ("B", 50.0, 1.0)]
    spark.createDataFrame(
        rows, "l_returnflag string, l_extendedprice double, l_quantity double"
    ).write.mode("overwrite").parquet(str(tmp / "lineitem.parquet"))
    out = {
        r["l_returnflag"]: r["weighted_median"]
        for r in q_agg_weighted_median(spark, str(tmp)).collect()
    }
    assert out == {"A": 30.0, "B": 5.0}


def test_weighted_median_approx_bound_holds(spark, tmp_path_factory):
    """The histogram-sketch tier: exact medians in the output, verdict
    pinned 1 — including a degenerate single-value group (binwidth 0)
    and a skewed group whose mass sits at one end of the range."""
    from pandas_reporter_spark.operators.relational import (
        q_agg_weighted_median_approx,
    )

    tmp = tmp_path_factory.mktemp("wmed_apx")
    rows = [("A", 10.0, 1.0), ("A", 20.0, 1.0), ("A", 30.0, 3.0),
            ("B", 5.0, 2.0), ("B", 50.0, 1.0),
            ("C", 7.0, 4.0),  # degenerate: min == max
            # skew: 1000 light rows spread wide, heavy mass at 1.0
            *[("D", float(i), 0.01) for i in range(1, 1001)],
            ("D", 1.0, 100.0)]
    spark.createDataFrame(
        rows, "l_returnflag string, l_extendedprice double, l_quantity double"
    ).write.mode("overwrite").parquet(str(tmp / "lineitem.parquet"))
    out = {
        r["l_returnflag"]: (r["weighted_median"], r["within_bound"])
        for r in q_agg_weighted_median_approx(spark, str(tmp)).collect()
    }
    assert out == {"A": (30.0, 1), "B": (5.0, 1), "C": (7.0, 1),
                   "D": (1.0, 1)}


def test_chi2_zero_under_independence(spark, tmp_path_factory):
    """A perfectly independent lang x source table must score chi2 = 0
    (every observed cell equals its expectation exactly)."""
    from pandas_reporter_spark.operators.text import q_text_chi2

    tmp = tmp_path_factory.mktemp("chi2")
    rows = []
    did = 0
    for lang, ln in (("en", 2), ("de", 1)):   # row totals 2:1
        for src, sn in (("s0", 3), ("s1", 1)):  # col totals 3:1
            for _ in range(ln * sn):
                rows.append((did, "t", lang, src, 1))
                did += 1
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))
    out = q_text_chi2(spark, str(tmp)).collect()[0]
    assert out["chi2_micro"] == 0 and out["dof"] == 1 and out["n_cells"] == 4


def test_weighted_median_two_phase_equals_full_sort(spark, tmp_path_factory):
    """r8 two-phase rework equivalence: the histogram+crossing-bin
    plan must reproduce the full-sort definition exactly on seeded
    random data — including duplicated values, values landing on bin
    edges (constructed multiples of range/4096), and a heavy tie run
    straddling the half-weight point."""
    import random

    from pandas_reporter_spark.operators.relational import (
        q_agg_weighted_median,
    )

    rng = random.Random(8)
    rows = []
    for flag in ("A", "B"):
        lo, hi = 10.0, 20.0
        binw = (hi - lo) / 4096
        for _ in range(500):
            v = round(lo + rng.randrange(4097) * binw, 10)  # on-edge
            rows.append((flag, v, float(rng.randint(1, 9))))
        rows.append((flag, lo, 1.0))
        rows.append((flag, hi, 1.0))
        # heavy tie run at one value
        rows += [(flag, 15.0, 50.0)] * 3

    def exact(flag):
        sub = sorted(
            ((v, int(q * 100 + 0.5)) for f, v, q in rows if f == flag)
        )
        tot = sum(w for _, w in sub)
        cum = 0
        for v, w in sub:
            cum += w
            if 2 * cum >= tot:
                return round(v, 2)

    tmp = tmp_path_factory.mktemp("wmed_eq")
    spark.createDataFrame(
        rows, "l_returnflag string, l_extendedprice double, l_quantity double"
    ).write.mode("overwrite").parquet(str(tmp / "lineitem.parquet"))
    out = {
        r["l_returnflag"]: r["weighted_median"]
        for r in q_agg_weighted_median(spark, str(tmp)).collect()
    }
    assert out == {"A": exact("A"), "B": exact("B")}


def test_group_ols_recovers_planted_trend(spark, tmp_path):
    """OLS over planted exact lines (2 and 5 cents/second) must
    recover slope and intercept exactly: integer inputs on an exact
    line make the normal equations closed-form exact."""
    import datetime
    import os

    from pandas_reporter_spark.registry import QUERIES, load_all

    load_all()
    base = datetime.datetime(2024, 1, 1)
    rows = []
    for g, slope_cents in (("a", 2), ("b", 5)):
        for i in range(100):
            rows.append({
                "event_id": len(rows),
                "user_id": 1,
                "event_type": g,
                "ts": base + datetime.timedelta(seconds=i),
                # value in currency units: cents = 300 + slope*i
                "value": (300 + slope_cents * i) / 100.0,
            })
    sf = str(tmp_path)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        os.path.join(sf, "events.parquet")
    )
    out = {r["event_type"]: r for r in
           QUERIES["q_agg_group_ols"](spark, sf).collect()}
    assert out["a"]["n"] == 100 and out["b"]["n"] == 100
    # slope_nano = cents/second * 1e9
    assert out["a"]["slope_nano"] == 2_000_000_000
    assert out["b"]["slope_nano"] == 5_000_000_000
    assert out["a"]["intercept_cents"] == 300
    assert out["b"]["intercept_cents"] == 300


# ---- round-13 additions: RRF hybrid retrieval + hashed linear
# quality classifier ----


def _hybrid_dir(spark, tmp_path):
    """documents + embeddings where each leg's rank-1 is PLANTED to be
    id 5: doc 5 carries 3x every BM25 query term (others at most one),
    and vec 5 is an exact copy of the vec_id=0 query vector (cos=1)."""
    docs = [
        (0, "the a of to and", "en", "src0", 15),
        (1, "spark alpha beta gamma", "en", "src0", 22),
        (2, "spark delta epsilon zeta", "en", "src1", 24),
        (3, "spark eta theta iota", "en", "src1", 20),
        (4, "spark kappa lambda mu", "en", "src0", 21),
        (5, "spark join filter spark join filter spark join filter",
         "en", "src1", 53),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    from pandas_reporter_spark.operators.similarity import _mix64

    def vec(seed):
        return [
            float((_mix64(seed * 64 + j) % 2001 - 1000) / 1000.0)
            for j in range(64)
        ]

    vecs = [(i, vec(i + 1), i % 2) for i in range(5)]
    vecs.append((5, vec(1), 1))  # exact copy of vec 0 -> cosine 1.0
    spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def test_hybrid_rrf_two_leg_winner_and_exact_score(spark, tmp_path):
    """A doc that is rank-1 in BOTH legs must top the fusion with the
    closed-form score 2·(10^9 DIV 61) and legs=2; single-leg docs
    carry legs=1. Pins the RRF arithmetic end-to-end (integer
    contributions, k=60) against hand computation."""
    from pandas_reporter_spark.registry import QUERIES, load_all

    load_all()
    sf = _hybrid_dir(spark, tmp_path)
    rows = QUERIES["q_search_hybrid_rrf"](spark, sf).collect()
    top = rows[0]
    assert (top["doc_id"], top["legs"]) == (5, 2)
    assert top["rrf_nano"] == 2 * (1_000_000_000 // 61)
    by_id = {r["doc_id"]: r for r in rows}
    # docs 1-4 appear in both legs here (tiny corpus: every vector is
    # a dense top-20 candidate) but never beat the double rank-1
    for did, r in by_id.items():
        if did != 5:
            assert r["rrf_nano"] < top["rrf_nano"]


def test_quality_classifier_matches_python_reimplementation(spark, tmp_path):
    """Third-opinion pin: per-source (n_docs, n_pass, sum_score) must
    equal a from-scratch Python/hashlib evaluation of the same hashed
    bag-of-words linear model (bucket = md5-60bit(token) mod 1024,
    w = md5-60bit('w#'||bucket) mod 257 - 128, pass iff s*20 > dl)."""
    import hashlib

    docs = [
        (0, "alpha beta alpha", "en", "srcA", 16),
        (1, "gamma delta", "en", "srcA", 11),
        (2, "alpha gamma epsilon zeta", "en", "srcB", 24),
        (3, "the quick brown fox jumps", "en", "srcB", 25),
        (4, "beta beta beta beta", "en", "srcB", 19),
    ]
    sf = _docs_dir(spark, tmp_path, docs)

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    expected = {}
    for _, text, _, source, _ in docs:
        toks = [t for t in text.lower().split(" ") if t]
        s = sum(h60(f"w#{h60(t) % 1024}") % 257 - 128 for t in toks)
        dl = len(toks)
        n, p, ss = expected.get(source, (0, 0, 0))
        expected[source] = (n + 1, p + (1 if s * 20 > dl else 0), ss + s)

    from pandas_reporter_spark.registry import QUERIES, load_all

    load_all()
    rows = QUERIES["q_text_quality_classifier"](spark, sf).collect()
    got = {
        r["source"]: (r["n_docs"], r["n_pass"], r["sum_score"]) for r in rows
    }
    assert got == expected


# ---------------------------------------------------------------------------
# round-15 second sitting: retrieval-quality eval + in-batch collision audit
# ---------------------------------------------------------------------------


def _embed_dir(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def test_eval_ndcg_perfect_under_lossless_quantization(spark, tmp_path):
    """When int8 quantization is EXACT (integer entries, max-abs 127 →
    scale 1.0) and all vectors share one norm (permutations of a fixed
    multiset), the reconstructed ranking equals the true cosine ranking,
    so every metric is perfect: hits10 = 10, rank_of_true1 = 1,
    ndcg_r6 = 1.0."""
    import random

    from pandas_reporter_spark.operators.similarity import q_search_eval_ndcg

    base = [127] + [((i * 37) % 111) - 55 for i in range(63)]
    rng = random.Random(7)
    rows = []
    for vid in range(50):  # 20 queries + 30 corpus
        v = list(base)
        rng.shuffle(v)
        rows.append((vid, [float(x) for x in v], vid % 4))
    out = q_search_eval_ndcg(spark, _embed_dir(spark, tmp_path, rows))
    got = {r["qid"]: r for r in out.collect()}
    assert len(got) == 20
    for r in got.values():
        assert r["hits10"] == 10
        assert r["rank_of_true1"] == 1
        assert r["rr_nano"] == 1_000_000_000
        assert r["ndcg_r6"] == 1.0


def test_inbatch_collisions_find_planted_duplicate(spark, tmp_path):
    """100 gaussian vectors → 2 md5 batches; ONE planted exact-duplicate
    pair placed in the SAME batch must be the only collision; pair and
    row accounting must close exactly."""
    import hashlib
    import random

    from pandas_reporter_spark.operators.similarity import (
        q_embed_inbatch_collisions,
    )

    def batch_of(vid, nb=2):
        return (
            int(hashlib.md5(str(vid).encode()).hexdigest()[:15], 16) % nb
        )

    # find two ids in the same batch to carry the duplicate
    a = 0
    b = next(v for v in range(1, 100) if batch_of(v) == batch_of(a))
    rng = random.Random(11)
    vecs = {
        vid: [rng.gauss(0.0, 1.0) for _ in range(64)] for vid in range(100)
    }
    vecs[b] = list(vecs[a])  # exact duplicate -> cosine 1.0
    rows = [(vid, [float(x) for x in v], 0) for vid, v in vecs.items()]
    out = q_embed_inbatch_collisions(
        spark, _embed_dir(spark, tmp_path, rows)
    ).collect()
    by_batch = {r["batch"]: r for r in out}
    assert len(by_batch) == 2
    assert sum(r["n_rows"] for r in out) == 100
    for r in out:  # pair accounting closes per batch
        assert r["n_pairs"] == r["n_rows"] * (r["n_rows"] - 1) // 2
    assert sum(r["n_collisions"] for r in out) == 1
    hit = by_batch[batch_of(a)]
    assert hit["n_collisions"] == 1
    assert hit["max_cos_r6"] == 1.0
    other = by_batch[1 - batch_of(a)]
    assert other["max_cos_r6"] < 0.9


def test_semdedup_drops_higher_id_of_planted_pair(spark, tmp_path):
    """One planted near-identical pair inside a cell: the HIGHER id is
    dropped (keep-lowest-id orientation), nothing else is; a copy of the
    same vector in a DIFFERENT cell survives (cell-scoped rule)."""
    import random

    from pandas_reporter_spark.operators.similarity import q_dedup_semdedup

    rng = random.Random(5)
    rows = []
    for vid in range(40):
        rows.append(
            (vid, [float(rng.gauss(0.0, 1.0)) for _ in range(64)], vid % 2)
        )
    # vid 10 and vid 30 are in cell 0 (even ids); make 30 a near-copy
    base = rows[10][1]
    rows[30] = (30, [v + 0.001 for v in base], 0)
    # vid 31 (cell 1) gets the SAME vector: cross-cell dup must survive
    rows[31] = (31, [v + 0.001 for v in base], 1)
    out = {r["label"]: r for r in q_dedup_semdedup(spark, _embed_dir(
        spark, tmp_path, rows)).collect()}
    assert out[0]["n_dropped"] == 1
    assert out[0]["dropped_id_sum"] == 30
    assert out[0]["max_nn_cos_r6"] >= 0.99
    assert out[1]["n_dropped"] == 0


def test_eval_ndcg_kernel_equals_jvm_form(spark, tmp_path):
    """The registered two-pass Arrow-kernel plan and the one-stage JVM
    window form (eval_ndcg_jvm, the A/B equality oracle) must be
    row-identical — including on data where int8 quantization is LOSSY
    (gaussian floats), so the two ranking keys genuinely disagree and
    every metric path (union merge, in_k gate, pass-2 better-count) is
    exercised."""
    import random

    from pandas_reporter_spark.operators.similarity import (
        eval_ndcg_jvm,
        q_search_eval_ndcg,
    )

    rng = random.Random(23)
    rows = [
        (vid, [float(rng.gauss(0.0, 1.0)) for _ in range(64)], vid % 4)
        for vid in range(120)
    ]
    d = _embed_dir(spark, tmp_path, rows)
    a = sorted(map(tuple, q_search_eval_ndcg(spark, d).collect()))
    b = sorted(map(tuple, eval_ndcg_jvm(spark, d).collect()))
    assert len(a) == 20
    assert a == b
    # lossy data: at least one query's int8 ranking must actually
    # deviate, or the A/B proves nothing
    assert any(r[1] < 10 or r[2] != 1 for r in a)


# ---------------------------------------------------------------------------
# round-15 third sitting: length buckets, n-gram diversity, separation
# ---------------------------------------------------------------------------


def test_length_buckets_accounting_closes(spark, tmp_path):
    """Known token counts → known caps; per-bucket waste closes exactly
    and naive waste uses the global max."""
    from pandas_reporter_spark.operators.text import q_mix_length_buckets

    texts = {
        0: "a b c",              # 3 tokens  -> cap 16
        1: " ".join("t" * 1 for _ in range(16)),   # 16 -> cap 16
        2: " ".join(["w"] * 17),  # 17 -> cap 32
        3: " ".join(["x"] * 40),  # 40 -> cap 48 (global max)
    }
    rows = [
        (i, t, "en", "s", len(t)) for i, t in texts.items()
    ]
    out = {
        r["bucket_cap"]: r
        for r in q_mix_length_buckets(
            spark, _docs_dir(spark, tmp_path, rows)
        ).collect()
    }
    assert set(out) == {16, 32, 48}
    b16 = out[16]
    assert b16["n_docs"] == 2 and b16["sum_tokens"] == 19
    assert b16["bucket_waste"] == 2 * 16 - 19
    assert b16["naive_waste"] == 2 * 40 - 19
    assert out[48]["bucket_waste"] == 48 - 40
    assert out[48]["naive_waste"] == 0


def test_ngram_diversity_planted_repetition(spark, tmp_path):
    """A fully-repetitive source collapses to 1 distinct token and 1
    distinct trigram; an all-distinct source has full diversity."""
    from pandas_reporter_spark.operators.text import q_text_ngram_diversity

    rep = " ".join(["spam"] * 10)           # 10 tokens, 8 trigrams, all equal
    uniq = " ".join(f"w{i}" for i in range(10))  # all distinct
    rows = [
        (0, rep, "en", "rep", len(rep)),
        (1, uniq, "en", "uniq", len(uniq)),
    ]
    out = {
        r["source"]: r
        for r in q_text_ngram_diversity(
            spark, _docs_dir(spark, tmp_path, rows)
        ).collect()
    }
    assert out["rep"]["n_tokens"] == 10 and out["rep"]["n_vocab"] == 1
    assert out["rep"]["n_trigrams"] == 8
    assert out["rep"]["n_distinct_trigrams"] == 1
    assert out["rep"]["ttr_r6"] == 0.1
    assert out["rep"]["trigram_diversity_r6"] == 0.125
    assert out["uniq"]["n_vocab"] == 10
    assert out["uniq"]["n_distinct_trigrams"] == 8
    assert out["uniq"]["ttr_r6"] == 1.0
    assert out["uniq"]["trigram_diversity_r6"] == 1.0


def test_embed_separation_two_planted_clusters(spark, tmp_path):
    """Two tight, orthogonal-ish clusters: each cell's nearest other
    centroid is the other cell, within-cohesion is ~1 for the cell of
    identical vectors, and the centroid-pair cosine is low."""
    from pandas_reporter_spark.operators.similarity import (
        q_embed_separation,
    )

    base0 = [1.0 if i < 32 else 0.0 for i in range(64)]
    base1 = [0.0 if i < 32 else 1.0 for i in range(64)]
    rows = [(vid, list(base0), 0) for vid in range(10)]
    rows += [(vid, list(base1), 1) for vid in range(10, 20)]
    out = {
        r["label"]: r
        for r in q_embed_separation(
            spark, _embed_dir(spark, tmp_path, rows)
        ).collect()
    }
    assert set(out) == {0, 1}
    for lab, other in [(0, 1), (1, 0)]:
        r = out[lab]
        assert r["n_vecs"] == 10
        assert r["nn_label"] == other
        assert r["within_max_r6"] >= 0.999999
        assert r["within_nano_sum"] >= 10 * 999_999_000
        assert r["nn_cos_r6"] <= 0.000001
