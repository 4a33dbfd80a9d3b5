"""DuckDB yardstick for the bench subset (BASELINE.md methodology).

Times each oracled bench query's oracle SQL on DuckDB (32 threads,
best-of-2, same parquet inputs) and, when given a bench JSON, prints
the per-query ratio and the subset totals the judge grades:

    python tools/duck_bench.py [sf_dir] [bench.json]

Output: one JSON line {"duck": {...}, "spark": {...}, "ratio": ...,
"ratio_ex_quadratic": ...}. The two quadratic-oracle queries
(q_dedup_fuzzy, q_join_band — levenshtein/nested-loop self-joins the
engine replaces with linear equi-joins) are reported separately: their
DuckDB forms scale quadratically, so including them flatters the
engine; excluding them is the honest gate (SCALING.md "Measured
algorithmic wins").
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

QUADRATIC = {"q_dedup_fuzzy", "q_join_band"}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    bench_path = sys.argv[2] if len(sys.argv) > 2 else None

    import duckdb

    from bench import BENCH_QUERIES
    from pandas_reporter_spark import registry

    registry.load_all()

    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    names = [q for q in BENCH_QUERIES if q in registry.ORACLES]
    timings: dict[str, float] = {}
    for _pass in range(2):
        for name in names:
            t0 = time.time()
            try:
                con.execute(registry.ORACLES[name]).fetchall()
            except Exception as exc:  # noqa: BLE001 — record and move on
                print(f"duck: {name} FAILED: {exc!r}", file=sys.stderr)
                timings.setdefault(name, None)
                continue
            dt = round(time.time() - t0, 3)
            if timings.get(name) is None or dt < timings[name]:
                timings[name] = dt

    out = {"sf_dir": sf_dir, "duck": timings}
    if bench_path:
        spark = json.load(open(bench_path))
        if "parsed" in spark:
            spark = spark["parsed"]
        sq = spark["queries"]
        common = [
            n for n in names if timings.get(n) is not None and sq.get(n)
        ]
        d_tot = sum(timings[n] for n in common)
        s_tot = sum(sq[n] for n in common)
        nq = [n for n in common if n not in QUADRATIC]
        out["spark"] = {n: sq[n] for n in common}
        out["n_common"] = len(common)
        out["totals"] = {"spark": round(s_tot, 3), "duck": round(d_tot, 3)}
        out["ratio"] = round(s_tot / d_tot, 3) if d_tot else None
        out["totals_ex_quadratic"] = {
            "spark": round(sum(sq[n] for n in nq), 3),
            "duck": round(sum(timings[n] for n in nq), 3),
        }
        dq = sum(timings[n] for n in nq)
        out["ratio_ex_quadratic"] = (
            round(sum(sq[n] for n in nq) / dq, 3) if dq else None
        )
        out["worst"] = sorted(
            (
                (n, round(sq[n] - timings[n], 3), round(sq[n] / timings[n], 1))
                for n in nq
                if timings[n] > 0
            ),
            key=lambda x: -x[1],
        )[:15]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
