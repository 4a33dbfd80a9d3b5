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
    # ---- ROUND-16 ROTATION. Built from tools/staleness.py with the
    # r15 vintage (70ec21e) added. Audit state at build time: stale =
    # exactly the five bodies the r15 timeout snapshot (3acf701)
    # rewrote without scheduling (the r15 verdict's item 1); no
    # unrecorded queries (optimization round, no new operators).
    # Slot budget (50):
    # (1) the five stale bodies — the minhash exact-ratio prefilter
    #     front (stales q_dedup_minhash/_capped/_containment), the
    #     spans md5-identity rewrite, and the q18 join reorder;
    # (2) bodies this optimization round rewrites (appended as they
    #     land, displacing tail r11 fillers — the staleness test
    #     enforces the bookkeeping);
    # (3) the rest burns the r11 cohort (oldest vintage,
    #     alphabetical); after r16 the oldest remaining vintage is r12
    #     plus whatever r11 rows the (2) displacements push out.
    # (1) stale bodies from the r15 snapshot commit
    "q_dedup_minhash",
    "q_dedup_minhash_capped",
    "q_dedup_containment",
    "q_dedup_spans",
    "q_tpch_q18",
    # (2) bodies rewritten this round (see OPTIMIZATION_r16.md) — each
    #     displaces a tail r11 filler:
    #     - document-stream relayout source (displaced q_union_all,
    #       q_window_lag_lead)
    "q_stream_quality_gate",
    "q_stream_sample_weighted",
    #     - CDC persist handle retirement (ADVICE r15; displaced
    #       q_topk_per_group, q_topk)
    "q_dedup_substring",
    "q_dedup_substring_removal",
    #     - overlap-matrix driver-assembly guard + distributed fallback
    #       (VERDICT r15 item 5; displaced q_str_substr)
    "q_text_overlap_matrix",
    #     - file-sink tmpfs dir retirement (displaced q_str_funcs)
    "q_stream_file_sink",
    #     - V from the 1-row vocab-stats artifact, fallback unchanged
    #       (displaced q_sort)
    "q_text_perplexity_bigram",
    # (3) r11 cohort burn (oldest vintage, alphabetical; q_dedup_minhash
    #     is r11 but already holds a stale slot above)
    "q_agg_approx_countd",
    "q_agg_distinct",
    "q_agg_group_sum",
    "q_agg_multi",
    "q_agg_percentile",
    "q_agg_skew_kurt",
    "q_cube",
    "q_date_funcs",
    "q_dedup_keep_first",
    "q_embed_stats",
    "q_except",
    "q_fillna",
    "q_filter",
    "q_filter_compound",
    "q_grouping_sets",
    "q_having",
    "q_intersect",
    "q_join_anti",
    "q_join_bucketed_atrest",
    "q_join_cross",
    "q_join_full",
    "q_join_inner",
    "q_join_left",
    "q_join_range",
    "q_join_right",
    "q_join_semi",
    "q_limit",
    "q_product_moe",
    "q_project",
    "q_project_arith",
    "q_project_margin_carry",
    "q_proportion_moe",
    "q_ratio_moe",
    "q_rollup",
    "q_rse",
    "q_scan_parquet",
    "q_sketch_hll",
    "q_text_url_normalize",
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
