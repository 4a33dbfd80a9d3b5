"""Fresh-vs-primed decade rows for q_dedup_semdedup — the second
consumer of the at-rest kNN graph (docs/KNN_WINS_r15.json measured the
first). `fresh` derives the graph in-plan (the in-cell pairwise pass,
Σ n_c² — quadratic in the synthesized cell size, so it is only run at
the labels that ask for it); `primed` runs after `materialize_knn_graph`
and reads ~k rows/vec from the sidecar. DuckDB is not run here — the
oracle replays the same pairwise pass interpreted and newops_grid
carries the duck-comparable sf0.1 row.

Usage:
  python tools/semdedup_wins.py out.json label=dir:mode [...]
mode ∈ {both, primed}. Env: SPARK_GRAFT_AB_REPS (default 2).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    out_path = sys.argv[1]
    specs = []
    for a in sys.argv[2:]:
        label, rest = a.split("=", 1)
        sf_dir, mode = rest.rsplit(":", 1)
        specs.append((label, sf_dir, mode))
    reps = int(os.environ.get("SPARK_GRAFT_AB_REPS", "2"))
    os.environ.setdefault("SPARK_GRAFT_AQE", "false")

    from pandas_reporter_spark.operators import similarity as sim
    from pandas_reporter_spark.registry import QUERIES, load_all
    from pandas_reporter_spark.session import get_session
    from pandas_reporter_spark.tables import _session_key

    load_all()
    spark = get_session("semdedup_wins")
    q = QUERIES["q_dedup_semdedup"]

    res = {"reps": reps, "grid": {}}
    for label, sf_dir, mode in specs:
        cell: dict = {}

        def run():
            q(spark, sf_dir).write.format("noop").mode("overwrite").save()

        if mode == "both":
            # fresh: make sure the sidecar is NOT visible this session
            sim._KNN_ART.pop((_session_key(spark), sf_dir), None)
            run()
            best = 9e9
            for _ in range(reps):
                spark.catalog.clearCache()
                t0 = time.time()
                run()
                best = min(best, time.time() - t0)
            cell["fresh"] = round(best, 3)
        t0 = time.time()
        sim.materialize_knn_graph(spark, sf_dir)
        cell["build"] = round(time.time() - t0, 3)
        assert sim.knn_graph_at_rest(spark, sf_dir) is not None, (
            f"kNN sidecar failed to prime at {label}"
        )
        run()
        best = 9e9
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.time()
            run()
            best = min(best, time.time() - t0)
        cell["primed"] = round(best, 3)
        res["grid"][label] = cell
        print(label, json.dumps(cell), flush=True)

    with open(out_path, "w") as f:
        json.dump(res, f, indent=2)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
