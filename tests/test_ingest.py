"""The at-rest ingest contract (VERDICT r13 item 4).

Coverage: every materialize_* function anywhere in the engine must be
registered in ingest.MATERIALIZERS (or listed in _NON_INGEST with a
reason) — a sidecar that exists but never primes is dead weight, and
one that primes outside the contract re-opens the eleven-idiom drift
this module closed. Behavior: ingest() builds everything on a tiny
snapshot and the consumers actually see their artifacts.
"""

from __future__ import annotations

import importlib
import inspect
import pkgutil

import pandas_reporter_spark.operators as ops_pkg
from pandas_reporter_spark import ingest as ing


def _engine_materializers():
    found = {}
    mods = [
        importlib.import_module(f"{ops_pkg.__name__}.{m.name}")
        for m in pkgutil.iter_modules(ops_pkg.__path__)
    ]
    mods.append(importlib.import_module("pandas_reporter_spark.sources.queries"))
    for mod in mods:
        for name, fn in inspect.getmembers(mod, inspect.isfunction):
            if name.startswith("materialize_") and fn.__module__ == mod.__name__:
                found[f"{mod.__name__}.{name}"] = fn
    return found


def test_every_materializer_is_in_the_contract():
    registered = set()
    for build, _ in ing.MATERIALIZERS.values():
        # _m closures carry (modname, fn) in their cell contents
        cells = {
            k: v.cell_contents
            for k, v in zip(build.__code__.co_freevars, build.__closure__)
        }
        registered.add(f"{cells['modname']}.{cells['fn']}")
    missing = [
        qual
        for qual in _engine_materializers()
        if qual not in registered
        and qual.rsplit(".", 1)[1] not in ing._NON_INGEST
    ]
    assert not missing, (
        f"materializers outside the ingest contract (register in "
        f"MATERIALIZERS or document in _NON_INGEST): {missing}"
    )


def test_ingest_builds_and_primes_consumers(spark, tmp_path_factory):
    # a PRIVATE copy of the snapshot: priming the canonical sf0.001
    # path would flip other tests' plan-shape pins (artifact-primed
    # plans legitimately drop the tokenize explode) for the rest of
    # the shared session
    import shutil

    sf = str(tmp_path_factory.mktemp("ingest_sf"))
    shutil.rmtree(sf)
    shutil.copytree("/root/testdata/sf0.001", sf)
    report = ing.ingest(spark, sf)
    assert set(report) == set(ing.MATERIALIZERS)
    failed = [n for n, r in report.items() if not r["ok"]]
    assert not failed, failed
    # ok means "didn't raise"; primed means "the consumer will actually
    # read the sidecar" (ADVICE r14) — on a clean build both hold
    unprimed = [n for n, r in report.items() if not r["primed"]]
    assert not unprimed, unprimed
    # spot-check three consumer-visible artifacts
    from pandas_reporter_spark.operators.similarity import srp_codes_at_rest
    from pandas_reporter_spark.operators.text import bpe_merges, docq_scores

    assert bpe_merges(spark, sf) is not None
    assert docq_scores(spark, sf) is not None
    assert srp_codes_at_rest(spark, sf, 256) is not None
    # idempotent: second call is a fast no-op for already-cached keys
    report2 = ing.ingest(spark, sf)
    assert all(r["ok"] for r in report2.values())


def test_torn_artifact_is_rejected_not_cached(spark, tmp_path_factory):
    """The r14 validate-before-cache guard (ADVICE r13): a torn
    artifact — fewer rows than the source table, as a concurrent
    mode('overwrite') can expose — must be rejected (consumer stays on
    its inline plan) and a subsequent rebuild must prime normally."""
    import os
    import shutil

    from pandas_reporter_spark.operators import similarity as S
    from pandas_reporter_spark.operators import text as T

    sf = str(tmp_path_factory.mktemp("torn_sf"))
    shutil.rmtree(sf)
    shutil.copytree("/root/testdata/sf0.001", sf)
    base = str(tmp_path_factory.mktemp("torn_base"))

    tag = int(os.path.getmtime(os.path.join(sf, "documents.parquet")))
    torn = os.path.join(
        base, f"prs_docq_{os.path.basename(os.path.normpath(sf))}_{tag}"
    )
    # a torn docq: half the docs, but structurally valid parquet with
    # a _SUCCESS marker — indistinguishable from complete without the
    # count check
    T._docq_rel(spark, sf).limit(250).write.mode("overwrite").parquet(torn)
    assert os.path.exists(os.path.join(torn, "_SUCCESS"))
    T.materialize_docq(spark, sf, base=base)
    assert T.docq_scores(spark, sf) is None, "torn docq was cached"
    # the ingest report's primed probe sees through the clean return
    # (ADVICE r14: ok=True alone would claim the sidecar is live)
    assert ing._primed(spark, sf, "docq") is False

    # same for the SRP codes
    etag = int(os.path.getmtime(os.path.join(sf, "embeddings.parquet")))
    storn = os.path.join(
        base, f"prs_srp256_{os.path.basename(os.path.normpath(sf))}_{etag}"
    )
    from pandas_reporter_spark.tables import load

    S.srp_codes(load(spark, sf, "embeddings").limit(100), 256).write.mode(
        "overwrite"
    ).parquet(storn)
    S.materialize_srp_codes(spark, sf, base=base)
    assert S.srp_codes_at_rest(spark, sf, 256) is None, "torn codes cached"

    # rebuild from scratch -> both prime
    shutil.rmtree(torn)
    shutil.rmtree(storn)
    T.materialize_docq(spark, sf, base=base)
    S.materialize_srp_codes(spark, sf, base=base)
    assert T.docq_scores(spark, sf) is not None
    assert S.srp_codes_at_rest(spark, sf, 256) is not None
    assert ing._primed(spark, sf, "docq") is True
    assert ing._primed(spark, sf, "srp_codes") is True
