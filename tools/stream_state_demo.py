"""Watermark eviction at scale: bounded streaming-dedup state, measured.

The scale grid (docs/SCALE_STREAM_r10.json) shows availableNow
single-batch runs hold ALL keys in state (10 M rows / 2.35 GB at sf10)
— the degenerate configuration, since the watermark only advances
between micro-batches. This tool measures the PRODUCTION configuration
on the same data: events re-laid-out as time-ordered files (the shape
a real landing directory has — files arrive in event-time order), file
admission bounded per batch, a 30-minute watermark. State is then
bounded by keys-in-horizon regardless of corpus size, which is the
100 TB claim of SCALING.md §streaming, here as measurement.

Usage: python tools/stream_state_demo.py [sf_dir ...]
Writes docs/STREAM_STATE_DEMO.json and prints one summary line per sf.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: default one file per day of the synthetic 30-day span; raise via
#: env (e.g. 300 = admission-control granularity, ~2.4 h per file) to
#: pin that state tracks the WATERMARK HORIZON, not batch size
N_FILES = int(os.environ.get("SPARK_GRAFT_STREAM_FILES", "30"))
FILES_PER_TRIGGER = 1
#: comma-set of ops to run: dedup,join,stateful (default all)
OPS = set(
    os.environ.get("SPARK_GRAFT_STREAM_OPS", "dedup,join,stateful").split(",")
)


def _landing(spark, sf_dir: str) -> str:
    """Time-ordered landing files for sf_dir's events (built once per
    (sf, N_FILES)): range-partitioned by ts, ascending mtimes so the
    file source admits them in event-time order — the arrival property
    a real ingest directory has by construction."""
    from pyspark.sql import functions as F

    from pandas_reporter_spark.tables import load

    e = load(spark, sf_dir, "events")
    tag = f"{os.path.basename(os.path.normpath(sf_dir))}_{N_FILES}"
    src = f"/dev/shm/prs_stream_demo_{tag}"
    if not os.path.exists(os.path.join(src, "_SUCCESS")):
        # time-ordered landing files: range-partition by ts; output
        # part files are range-ordered, and the file stream source
        # breaks equal-mtime ties by path, so arrival order == event
        # time order — the property a real ingest has by construction
        (
            e.repartitionByRange(N_FILES, F.col("ts"))
            .sortWithinPartitions("ts")
            .write.mode("overwrite")
            .parquet(src)
        )
        # the file stream source admits files in MODIFICATION-TIME
        # order; one write job stamps near-identical mtimes, so
        # arrival order would be arbitrary and earlier days would be
        # watermark-dropped as late. Stamp ascending mtimes in range
        # order — the property real landing files have by arrival.
        parts = sorted(
            f for f in os.listdir(src)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        base_t = time.time() - 2 * len(parts)
        for i, f in enumerate(parts):
            os.utime(os.path.join(src, f), (base_t + 2 * i, base_t + 2 * i))
    return src


def run(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    import pandas_reporter_spark.operators.events as ev
    from pandas_reporter_spark.tables import load, normalize_ts

    src = _landing(spark, sf_dir)
    e = load(spark, sf_dir, "events")
    schema = spark.read.parquet(src).schema
    total = e.count()
    s = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(FILES_PER_TRIGGER))
        .option("pathGlobFilter", "*.parquet")
        .parquet(src)
    )
    dd = normalize_ts(s).withWatermark(
        "ts", "30 minutes"
    ).dropDuplicatesWithinWatermark(["event_id"])
    out = dd.groupBy().count()  # complete-mode count sink: row parity
    name = "demo" + uuid.uuid4().hex[:8]
    ckpt = f"/dev/shm/prs_ckpt_{name}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    t0 = time.time()
    try:
        q = (
            dd.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()
        ev._capture_progress(q)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        shutil.rmtree(ckpt, ignore_errors=True)
    wall = time.time() - t0
    got = spark.table(name).count()
    state = [
        op["numRowsTotal"]
        for p in ev.LAST_PROGRESS
        for op in p.get("stateOperators", [])
        if op.get("numRowsTotal") is not None
    ]
    mem = [
        op["memoryUsedBytes"]
        for p in ev.LAST_PROGRESS
        for op in p.get("stateOperators", [])
        if op.get("memoryUsedBytes") is not None
    ]
    return {
        "sf": sf_dir,
        "total_events": total,
        "rows_emitted": got,
        "batches": len(ev.LAST_PROGRESS),
        "max_state_rows": max(state) if state else None,
        "final_state_rows": state[-1] if state else None,
        "max_state_bytes": max(mem) if mem else None,
        "wall_s": round(wall, 2),
        "state_bound_ratio": (
            round(max(state) / total, 4) if state and total else None
        ),
    }


def run_join(spark, sf_dir: str) -> dict:
    """VERDICT r12 item 7: the interval view x click join under the
    PRODUCTION configuration — time-ordered landing files, bounded
    file admission, 30-minute watermarks on both sides. The join
    condition upper-bounds click.ts relative to view.ts, so the
    symmetric hash join can evict a buffered view once the click-side
    watermark passes view.ts + 30min: state must track the WATERMARK
    HORIZON (events in the last ~2 windows x arrival skew), not the
    corpus — the degenerate single-batch grid (SCALE_STREAM_r10) held
    1.02 GB at sf10 because nothing could evict inside one batch.
    Zero-loss check: emitted rows equal the batch interval self-join
    count on the same data."""
    from pyspark.sql import functions as F

    import pandas_reporter_spark.operators.events as ev
    from pandas_reporter_spark.tables import load, normalize_ts

    src = _landing(spark, sf_dir)
    e = load(spark, sf_dir, "events")
    total = e.count()
    # batch truth for the zero-loss check (same expression as the
    # registered query's oracle)
    v = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts")
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    expect = (
        v.join(
            c,
            (F.col("v_user") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("v_ts"))
            & (F.col("c_ts") <= F.col("v_ts") + F.expr("INTERVAL 30 MINUTES")),
        ).count()
    )
    schema = spark.read.parquet(src).schema
    s = normalize_ts(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(FILES_PER_TRIGGER))
        .option("pathGlobFilter", "*.parquet")
        .parquet(src)
    )
    views = (
        s.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "30 minutes")
    )
    clicks = (
        s.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "30 minutes")
    )
    joined = views.join(
        clicks,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("v_ts"))
        & (F.col("c_ts") <= F.col("v_ts") + F.expr("INTERVAL 30 MINUTES")),
    )
    name = "demoj" + uuid.uuid4().hex[:8]
    ckpt = f"/dev/shm/prs_ckpt_{name}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    t0 = time.time()
    try:
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()
        ev._capture_progress(q)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        shutil.rmtree(ckpt, ignore_errors=True)
    wall = time.time() - t0
    got = spark.table(name).count()
    spark.catalog.dropTempView(name)
    state = [
        op["numRowsTotal"]
        for p in ev.LAST_PROGRESS
        for op in p.get("stateOperators", [])
        if op.get("numRowsTotal") is not None
    ]
    mem = [
        op["memoryUsedBytes"]
        for p in ev.LAST_PROGRESS
        for op in p.get("stateOperators", [])
        if op.get("memoryUsedBytes") is not None
    ]
    return {
        "op": "interval_join",
        "sf": sf_dir,
        "total_events": total,
        "rows_expected": expect,
        "rows_emitted": got,
        "zero_loss": got == expect,
        "batches": len(ev.LAST_PROGRESS),
        "max_state_rows": max(state) if state else None,
        "final_state_rows": state[-1] if state else None,
        "max_state_bytes": max(mem) if mem else None,
        "wall_s": round(wall, 2),
        "state_bound_ratio": (
            round(max(state) / total, 4) if state and total else None
        ),
        "n_files": N_FILES,
    }


def run_stateful(spark, sf_dir: str) -> dict:
    """VERDICT r14 item 3: the custom GroupState accumulator
    (q_events_stateful's shape — map-side combine, then per-user
    (count, cents) held in GroupState) under the PRODUCTION
    configuration: time-ordered landing files, bounded admission,
    update-mode emission across many micro-batches. The state bound
    here is structural, not watermark-driven: GroupState holds ONE row
    per distinct key regardless of event count, so the ratio pins
    state ∝ #users (not corpus) and the zero-loss check compares the
    final per-user totals against the batch groupBy in exact integer
    cents (order-independent across any batch admission schedule)."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    import pandas_reporter_spark.operators.events as ev
    from pandas_reporter_spark.tables import load, normalize_ts

    src = _landing(spark, sf_dir)
    e = load(spark, sf_dir, "events")
    total = e.count()
    expect = {
        r["user_id"]: (r["n"], r["cents"])
        for r in e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.floor(F.col("value") * 100.0 + 0.5).cast("long")
            ).alias("cents"),
        )
        .collect()
    }
    schema = spark.read.parquet(src).schema
    s = normalize_ts(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(FILES_PER_TRIGGER))
        .option("pathGlobFilter", "*.parquet")
        .parquet(src)
    )

    def partial(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            cents = np.floor(
                pdf["value"].to_numpy() * 100.0 + 0.5
            ).astype("int64")
            yield (
                pd.DataFrame(
                    {"user_id": pdf["user_id"], "n": 1, "cents": cents}
                )
                .groupby("user_id", as_index=False)
                .sum()
            )

    def upd(key, pdfs, state):
        import pandas as pd

        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += int(pdf["n"].sum())
            cents += int(pdf["cents"].sum())
        state.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n": [n], "cents": [cents]}
        )

    out = (
        s.select("user_id", "value")
        .mapInPandas(partial, "user_id long, n long, cents long")
        .groupBy("user_id")
        .applyInPandasWithState(
            upd,
            outputStructType="user_id long, n long, cents long",
            stateStructType="n long, cents long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    name = "demos" + uuid.uuid4().hex[:8]
    ckpt = f"/dev/shm/prs_ckpt_{name}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    t0 = time.time()
    try:
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()
        ev._capture_progress(q)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        shutil.rmtree(ckpt, ignore_errors=True)
    wall = time.time() - t0
    # update mode re-emits a key's running totals each batch it appears
    # in; the FINAL row per key (max n) is the answer
    got = {
        r["user_id"]: (r["n"], r["cents"])
        for r in spark.table(name)
        .groupBy("user_id")
        .agg(
            F.max("n").alias("n"),
            F.max_by("cents", "n").alias("cents"),
        )
        .collect()
    }
    spark.catalog.dropTempView(name)
    state = [
        op["numRowsTotal"]
        for p in ev.LAST_PROGRESS
        for op in p.get("stateOperators", [])
        if op.get("numRowsTotal") is not None
    ]
    mem = [
        op["memoryUsedBytes"]
        for p in ev.LAST_PROGRESS
        for op in p.get("stateOperators", [])
        if op.get("memoryUsedBytes") is not None
    ]
    return {
        "op": "stateful",
        "sf": sf_dir,
        "total_events": total,
        "n_users": len(expect),
        "zero_loss": got == expect,
        "batches": len(ev.LAST_PROGRESS),
        "max_state_rows": max(state) if state else None,
        "final_state_rows": state[-1] if state else None,
        "max_state_bytes": max(mem) if mem else None,
        "wall_s": round(wall, 2),
        "state_bound_ratio": (
            round(max(state) / total, 4) if state and total else None
        ),
        "n_files": N_FILES,
    }


def main():
    from pandas_reporter_spark.session import get_session

    sfs = sys.argv[1:] or ["/dev/shm/prs_sf1", "/dev/shm/prs_sf10"]
    spark = get_session("stream_state_demo")
    rows = []
    for sf in sfs:
        if "dedup" in OPS:
            r = run(spark, sf)
            rows.append(r)
            print(json.dumps(r), flush=True)
        if "join" in OPS:
            rj = run_join(spark, sf)
            rows.append(rj)
            print(json.dumps(rj), flush=True)
        if "stateful" in OPS:
            rs = run_stateful(spark, sf)
            rows.append(rs)
            print(json.dumps(rs), flush=True)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs",
        "STREAM_STATE_DEMO.json",
    )
    # MERGE with standing rows (a partial re-run must not drop the
    # other SFs'/ops' records); (sf, op, n_files) keys this run
    # refreshes are replaced
    try:
        with open(out) as f:
            old = json.load(f)
    except Exception:
        old = []
    key = lambda r: (r.get("sf"), r.get("op", "dedup"), r.get("n_files"))
    fresh = {key(r) for r in rows}
    rows = [r for r in old if key(r) not in fresh] + rows
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
