"""Text-operator pins not covered by the driver's oracle gate.

The driver corpus has a 10-token floor, so the short-document edge —
where Spark's sequence(1, 0) yields a DESCENDING [1, 0] and element_at
would throw — only gets exercised here.
"""

from __future__ import annotations

import os

import pytest

from pandas_reporter_spark.registry import QUERIES, load_all

load_all()


@pytest.fixture(scope="module")
def short_doc_sf(spark, tmp_path_factory):
    """A documents table whose docs are SHORTER than every shingle k."""
    sf = str(tmp_path_factory.mktemp("shortdocs"))
    rows = [
        (0, "alpha beta", "en", "web", 10),          # 2 tokens < k=3
        (1, "one", "en", "web", 3),                  # 1 token
        (2, "a b c d", "en", "web", 7),              # 4 tokens < k=5
        (3, "the quick brown fox jumps over dogs", "en", "web", 35),
        (30, "the quick brown fox jumps over dogs", "en", "web", 35),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
    return sf


def test_fingerprint_survives_short_docs(spark, short_doc_sf):
    out = {r.doc_id: r for r in QUERIES["q_text_fingerprint"](spark, short_doc_sf).collect()}
    assert len(out) == 5
    # short docs: no shingles -> NULL min-shingle, doc hash still present
    assert out[0].min_shingle_md5 is None
    assert out[1].min_shingle_md5 is None
    assert out[0].doc_md5 is not None
    # long doc still fingerprints
    assert out[3].min_shingle_md5 is not None


def test_decontaminate_survives_short_docs(spark, short_doc_sf):
    rows = {r.doc_id: r.n_shared for r in
            QUERIES["q_text_decontaminate"](spark, short_doc_sf).collect()}
    # doc 30 duplicates benchmark doc 3 (7 tokens -> 3 5-gram shingles)
    assert rows == {30: 3}
