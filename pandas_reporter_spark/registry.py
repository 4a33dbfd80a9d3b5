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
    # ---- ROUND-9 ROTATION: retire all pre-r6 staleness in one pass. ----
    # The VERDICT r8 top item: after r8 the cumulative record holds
    # exactly 36 rows older than r6 (3 r4-official scalar packs + 33
    # r5-official rows — the verdict's prose said 31, the recomputed
    # record says 36; the record wins). 36 + 14 = 50, so this prefix is
    # fully determined: every pre-r6 row, then 14 r6 rows chosen where
    # round-9 work concentrates (TPC-H join-layout A/B on q5/q9/q2/q21
    # per the verdict, plus the LSH/dedup/text paths the occupancy-aware
    # bucket work and the partition-constant lift touch). After the r9
    # record: zero rows older than r6, and every remaining r6 row is one
    # the r9 session left untouched or re-verified locally.
    # (1) the 3 r4 survivors — oldest first.
    "q_map_funcs",
    "q_math_funcs",
    "q_null_funcs",
    # (2) all 33 r5-official rows, alphabetical (events batch family,
    # deep windows, TPC-H q4/q6/q14, band/broadcast/bloom joins,
    # merge-upsert, heavy-hitters, unpivot, profile, mix-epochs, ...).
    "q_agg_histogram",
    "q_agg_mode",
    "q_agg_stringagg",
    "q_embed_quantize",
    "q_events_anomaly",
    "q_events_funnel",
    "q_events_late",
    "q_events_resample",
    "q_events_retention",
    "q_events_sliding",
    "q_events_stream_dedup",
    "q_events_stream_session",
    "q_events_transitions",
    "q_events_tumbling",
    "q_fillna_group",
    "q_filter_quantile",
    "q_join_band",
    "q_join_bloom_pruned",
    "q_join_broadcast",
    "q_layout_sorted_scan",
    "q_merge_upsert",
    "q_mix_epochs",
    "q_profile_table",
    "q_sketch_heavy_hitters",
    "q_source_schema_merge",
    "q_text_repetition",
    "q_tpch_q14",
    "q_tpch_q4",
    "q_tpch_q6",
    "q_unpivot",
    "q_window_firstlast",
    "q_window_ntile",
    "q_window_rolling",
    # (3) 14 r6 rows: the four TPC-H joins this round's bucketed-layout
    # A/B targets, then the similarity/dedup/text queries whose code
    # paths the occupancy-aware LSH + partition-constant work touches.
    "q_tpch_q5",
    "q_tpch_q9",
    "q_tpch_q2",
    "q_tpch_q21",
    "q_similarity_ann_lsh",
    "q_similarity_ivf",
    "q_dedup_minhash",
    "q_dedup_incremental",
    "q_dedup_containment",
    "q_dedup_simhash",
    "q_text_kl_divergence",
    "q_text_langid",
    "q_text_tfidf",
    "q_pipeline_pretrain",
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
