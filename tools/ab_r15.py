"""In-session old-vs-new A/B for round-15 optimizations.

Host wall-clock drifts by tens of percent between sessions on this
sandbox (measured: unchanged q_tpch_q3 0.91 -> 1.23 s across two qtime
sessions minutes apart), so cross-session comparisons are meaningless.
This harness times the WORKING-TREE form of each named query against
its committed (git <ref>) form, interleaved rep-by-rep inside ONE
Spark session, and reports min-of-N for both — drift hits both arms
equally.

The old form is recovered by extracting the query function's source
from `git show <ref>:<module>` with ast, stripping decorators (so no
re-registration), and exec-ing it in the module's own namespace — the
helpers it closes over are the module's CURRENT ones, which is exactly
right for isolating the body change.

Usage: python tools/ab_r15.py [-n reps] [-r ref] <query> [query ...]
"""

from __future__ import annotations

import ast
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def old_fn(module: str, name: str, ref: str = "HEAD"):
    """The committed form of ``module.name`` as a plain callable."""
    import importlib

    mod = importlib.import_module(module)
    rel = module.replace(".", "/") + ".py"
    src = subprocess.check_output(
        ["git", "-C", REPO, "show", f"{ref}:{rel}"], text=True
    )
    tree = ast.parse(src)
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name == name:
            node.decorator_list = []
            node.name = name + "__old"
            m = ast.Module(body=[node], type_ignores=[])
            ast.fix_missing_locations(m)
            code = compile(m, f"<git:{ref}:{rel}:{name}>", "exec")
            ns = dict(mod.__dict__)
            exec(code, ns)
            return ns[name + "__old"]
    raise KeyError(f"{name} not found in {ref}:{rel}")


def main() -> None:
    args = sys.argv[1:]
    reps, ref = 5, "HEAD"
    while args and args[0] in ("-n", "-r"):
        if args[0] == "-n":
            reps = int(args[1])
        else:
            ref = args[1]
        args = args[2:]
    names = args

    # bench posture since r16: AQE on (production default); env wins for A/Bs
    import __spark_entry__ as e
    import bench
    from pandas_reporter_spark.session import get_session

    qs = e.queries()
    mod_of = {n: qs[n].__module__ for n in names}
    olds = {n: old_fn(mod_of[n], n, ref) for n in names}

    spark = get_session("ab_r15")
    bench.run(qs["q_tpch_q1"](spark, SF_DIR))  # JVM warm-up
    try:
        from pandas_reporter_spark.tables import relayout

        relayout(spark, SF_DIR)
    except Exception:
        pass
    try:
        from pandas_reporter_spark.ingest import ingest

        ingest(spark, SF_DIR)
    except Exception:
        pass

    def _ident(it):
        for pdf in it:
            yield pdf

    spark.range(0, 256, 1, 32).mapInPandas(_ident, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    warm_dir = "/root/testdata/sf0.001"
    for n in names:
        for fn in (qs[n], olds[n]):
            if os.path.isdir(warm_dir):
                try:
                    bench.run(fn(spark, warm_dir))
                except Exception:
                    pass

    best: dict[str, dict[str, float | None]] = {
        n: {"new": None, "old": None} for n in names
    }
    for rep in range(reps):
        for n in names:
            arms = (("new", qs[n]), ("old", olds[n]))
            # alternate arm order per rep: whichever arm runs first in
            # a rep pays that rep's GC/page-cache state, so a fixed
            # order biases the comparison
            for arm, fn in (arms if rep % 2 == 0 else arms[::-1]):
                spark.sparkContext.setJobDescription(f"ab:{n}:{arm}")
                t0 = time.time()
                try:
                    bench.run(fn(spark, SF_DIR))
                except Exception as exc:
                    print(f"ab: {n} {arm} FAILED: {exc!r}", file=sys.stderr)
                    continue
                dt = round(time.time() - t0, 3)
                cur = best[n][arm]
                if cur is None or dt < cur:
                    best[n][arm] = dt
    print(json.dumps(best))


if __name__ == "__main__":
    main()
