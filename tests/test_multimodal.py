"""Multimodal plumbing pins: stub contract, schema, batch shape."""

from __future__ import annotations

import pytest

from pandas_reporter_spark.operators.multimodal import (
    decode_image,
    fake_decode_features,
    with_media,
)


def test_decode_stub_is_clearly_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_fake_decode_is_deterministic():
    assert fake_decode_features(b"abc") == (3, 97, 294)
    assert fake_decode_features(b"") == (0, -1, 0)


def test_with_media_schema(spark):
    df = spark.createDataFrame(
        [{"doc_id": 1, "text": "hello", "lang": "en", "source": "s", "n_chars": 5}]
    )
    m = with_media(df)
    dt = dict(m.dtypes)
    assert dt["media"] == "binary"
    assert dt["meta"].startswith("struct<mime:string,width:int,height:int")
    row = m.collect()[0]
    assert bytes(row["media"]) == b"hello"
    assert row["meta"]["n_frames"] == 2


def test_mapinpandas_batch_shape(spark):
    """The feature extractor's n_batch_rows must equal the Arrow batch
    size — i.e. the decoder really sees batches, not rows."""
    from pandas_reporter_spark.operators.multimodal import media_features

    out = media_features(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert len(rows) == 500
    assert all(r["n_batch_rows"] > 1 for r in rows)
