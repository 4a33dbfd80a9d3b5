"""Executable pins for docs/WALKTHROUGH.md — the engine's analog of the
reference's executed `Pandas Reporter Examples.ipynb` (each section
number below matches a walkthrough section; the doc's printed constants
are asserted here so the two cannot drift)."""

from __future__ import annotations

import json
import math
import os

import pytest
from pyspark.sql import functions as F

from pandas_reporter_spark.sources.crjson import get_cr_dataframe
from pandas_reporter_spark.sources.url import CensusReporterURL

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "pandas_reporter_spark",
    "sources",
    "fixtures",
    "cr_b99001.json",
)


@pytest.fixture(scope="module")
def cf(spark, tmp_path_factory):
    cache_dir = tmp_path_factory.mktemp("wt_cache")
    u = CensusReporterURL("censusreporter:B99001/140/05000US06073")
    path = cache_dir / u.cache_key
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(json.load(open(FIXTURE))))
    return get_cr_dataframe(
        spark,
        "B99001",
        "140",
        "05000US06073",
        cache_dir=str(cache_dir),
        fetcher=lambda url: (_ for _ in ()).throw(
            AssertionError("walkthrough must be offline")
        ),
    )


def test_s1_load_shape_and_release(cf):
    assert cf.shape == (3, 14)
    assert cf.release["id"] == "acs2015_5yr"


def test_s2_column_views(cf):
    assert cf.ct_columns.columns[:4] == [
        "geoid",
        "name",
        "B99001001 Total",
        "Margins for B99001001 Total",
    ]
    assert cf.coded_columns.columns[2] == "B99001001"


def test_s3_index_by_code_and_suffix(cf):
    assert cf["B99001001"].sum() == 60.0
    assert cf["001"].sum() == 60.0


def test_s4_sum_m_combined_group(cf):
    est, m = cf.sum_m("B99001003", "B99001004", "B99001006")
    rows = (
        cf.with_measure("young", est, m)
        .df.select("geoid", "young", "young_m90")
        .orderBy("geoid")
        .collect()
    )
    assert [r.young for r in rows] == [130.0, 260.0, 390.0]
    for k, r in zip((1, 2, 3), rows):
        assert round(r.young_m90, 4) == round(math.sqrt(61) * k, 4)


def test_s5_ratio_and_rse_constants(cf):
    est, m = cf.ratio("B99001005", "B99001002")
    rows = (
        cf.with_measure("fm", est, m)
        .add_rse("fm")
        .df.select("fm", "fm_m90", "fm_rse")
        .collect()
    )
    for r in rows:  # constant across tracts by construction
        assert r.fm == 2.5
        assert round(r.fm_m90, 6) == 0.353553
        assert round(r.fm_rse, 3) == 8.597


def test_s6_group_sum_rss(cf):
    grouped = cf._wrap(
        cf.df.withColumn("tract", F.substring("geoid", 13, 4))
    ).group_sum("tract")
    got = {
        r.tract: r
        for r in grouped.df.select(
            "tract", "B99001001_sum", "B99001001_m90_sum_rs"
        ).collect()
    }
    assert got["0002"].B99001001_sum == 50.0
    assert round(got["0002"].B99001001_m90_sum_rs, 4) == 3.6056
    assert got["0001"].B99001001_sum == 10.0


def test_s7_citation(cf):
    from pandas_reporter_spark.sources.citation import make_citation_dict

    class _Term:
        url = "censusreporter:B99001/140/05000US06073"
        name = "B99001_walkthrough"
        description = "Synthetic Age by Sex"

    c = make_citation_dict(_Term())
    assert c["publisher"] == "CensusReporter.org"
