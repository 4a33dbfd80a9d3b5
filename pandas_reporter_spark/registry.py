"""Query registry: the driver-verified operator inventory (SURVEY §2).

Each operator from SURVEY.md §2 registers a `(spark, sf_dir) -> DataFrame`
callable and, when SQL-expressible, the equivalent DuckDB oracle SQL.
`__spark_entry__.py` re-exports QUERIES/ORACLES verbatim.

Naming discipline (driver hashes values under sorted column names):
alias every computed column identically in the Spark plan and the SQL.

Float discipline: the driver compares order-insensitive value hashes, so
double aggregates must be bit-identical between Spark and DuckDB. Sums
of doubles are accumulation-order dependent; both engines therefore sum
exact integer units (round(x·10^s) as BIGINT — see tables.dsum) and
divide back once.

round() trap (found at sf0.1, round 8): Spark's round(double, s) goes
through BigDecimal.valueOf — the double's SHORTEST decimal string —
so a value whose shortest repr terminates in a 5 exactly at position
s+1 ("39.88175" → .8818 half-up) diverges from DuckDB's numeric
rounding of the binary value (39.88174999… → .8817). Only values that
are near-exact short decimals (cents-derived means, prices) can hit
it; p/q ratios with non-10-smooth q cannot tie. Where a rounded value
derives from decimal-quantized inputs, use floor(x·10^s + 0.5)/10^s
with the identical shape in the oracle (q_fillna_group is the
exemplar) instead of round().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register a driver-verified query; `oracle=None` -> rows-only check."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


#: Operator modules whose import registers their queries. Every name
#: listed here MUST exist — a missing module is a hard error (round 1
#: died on phantom imports; never again).
_OPERATOR_MODULES = (
    "pandas_reporter_spark.operators.census_queries",
    "pandas_reporter_spark.operators.relational",
    "pandas_reporter_spark.operators.dedup",
    "pandas_reporter_spark.operators.text",
    "pandas_reporter_spark.operators.similarity",
    "pandas_reporter_spark.operators.events",
    "pandas_reporter_spark.operators.multimodal",
    "pandas_reporter_spark.operators.scale",
    "pandas_reporter_spark.operators.sketch",
    "pandas_reporter_spark.operators.graph",
    "pandas_reporter_spark.sources.queries",
)

#: Registration order the driver sees. The driver's correctness gate
#: records a FIXED-SIZE PREFIX of queries() in registration order
#: (round 2 recorded exactly the first 50 and stopped), so the prefix
#: must spend its budget on COVERAGE: one official row per operator
#: family — census MOE algebra, every dedup/text/similarity/events/
#: multimodal family, the scale techniques, the source/sink adapters —
#: with a few relational representatives; the relational long tail
#: (all green in round 2) re-registers after the fold.
_PRIORITY = (
    # ---- ROUND-15 ROTATION. Built from tools/staleness.py with the
    # r14 vintage (04b1608) added. Audit state at build time: stale =
    # exactly q_multimodal_features (make_png gained the pixel-payload
    # parameter feeding q_dedup_phash; the feature query's closure
    # includes it); unrecorded = the round's two new operators.
    # Slot budget (50):
    # (1) the round's new operators — first records (a missing first
    #     record costs a round); two from the first sitting, two from
    #     the second;
    # (2) the one stale body (q_multimodal_features);
    # (3) the whole r10 cohort (32 rows) — burns the oldest vintage:
    #     after r15 nothing in the cumulative record is older than r11;
    # (4) remaining 15 slots to r11 rows: the two residents of the
    #     modules this round churns (similarity.py / text.py), then
    #     oldest-first alphabetical.
    # (1) first records for the round's new operators (the second
    #     sitting added the retrieval-quality eval, the in-batch
    #     collision audit, and the SemDeDup kNN-graph consumer; the
    #     third sitting added the length-bucketing audit, the n-gram
    #     diversity diagnostics, and the embedding-separation profile;
    #     first records outrank re-records, so they take the six tail
    #     r11 slots q_fillna/q_filter/q_except/q_date_funcs/
    #     q_dedup_keep_first/q_dedup_minhash)
    "q_dedup_phash",
    "q_similarity_knn_graph",
    "q_search_eval_ndcg",
    "q_embed_inbatch_collisions",
    "q_dedup_semdedup",
    "q_mix_length_buckets",
    "q_text_ngram_diversity",
    "q_embed_separation",
    # (2) stale bodies: the decoder gained the pixel payload
    #     (q_multimodal_features), and the optimization round's batch-1
    #     plan rewrites (corpus-scan fusion, BPE driver-side hybrid,
    #     DSIR window/persist rework — OPTIMIZATION_r15.md) touched
    #     five query bodies; oracle-verified at sf0.01/sf0.001 this
    #     session, official re-records here. They displace the five
    #     lowest-priority r11 fillers (q_agg_group_sum/q_agg_multi/
    #     q_agg_percentile/q_agg_skew_kurt/q_cube — unchanged bodies,
    #     r11 is no longer the oldest vintage after the cohort burn).
    "q_multimodal_features",
    "q_pipeline_dsir",
    "q_pipeline_dsir_bigram",
    "q_text_bpe_apply",
    "q_text_bpe_train",
    "q_text_overlap_matrix",
    # batch-2 plan rewrites (perplexity dictionary pre-join, CDC
    # single-evaluation fusion, curriculum window fusion; the NDCG
    # kernel change is q_search_eval_ndcg, already a first-record slot
    # above) — these displace the remaining four r11 fillers
    # (q_embed_stats/q_text_url_normalize/q_agg_approx_countd/
    # q_agg_distinct, unchanged bodies).
    "q_text_perplexity_bigram",
    "q_pipeline_curriculum",
    "q_dedup_substring",
    "q_dedup_substring_removal",
    # (3) r10 cohort burn (oldest vintage, alphabetical)
    "q_agg_global",
    "q_agg_group_ols",
    "q_agg_stats",
    "q_census_workflow",
    "q_embed_centroids",
    "q_events_interpolate",
    "q_events_scd2",
    "q_graph_pagerank",
    "q_graph_triangles",
    "q_join_asof",
    "q_multimodal_resize",
    "q_pivot",
    "q_sample",
    "q_sketch_cms",
    "q_sketch_quantile",
    "q_source_cr_bulk",
    "q_source_cr_pivot",
    "q_stream_topk",
    "q_tpch_q10",
    "q_tpch_q11",
    "q_tpch_q12",
    "q_tpch_q13",
    "q_tpch_q15",
    "q_tpch_q16",
    "q_tpch_q17",
    "q_tpch_q19",
    "q_tpch_q20",
    "q_tpch_q22",
    "q_tpch_q7",
    "q_tpch_q8",
    "q_udf_pandas",
    "q_varrep_source",
)

# Earlier rotations (r2-r6) and their slot-by-slot rationale live in
# git history (this file, commits tagged 'rotation'); each round's
# prefix is also reconstructable from CORRECTNESS_r{N}.json key order.



def load_all() -> None:
    """Import every operator module so decorators run, then order the
    registry so `_PRIORITY` is the prefix the driver records (idempotent)."""
    import importlib

    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)

    missing = [n for n in _PRIORITY if n not in QUERIES]
    if missing:  # a typo here would silently waste the correctness window
        raise RuntimeError(f"_PRIORITY names not registered: {missing}")
    ordered = list(_PRIORITY) + [n for n in QUERIES if n not in set(_PRIORITY)]
    for d in (QUERIES, ORACLES):
        tail = {n: d[n] for n in ordered if n in d}
        d.clear()
        d.update(tail)
