"""Multimodal plumbing: real-decoder stubs raise cleanly; the fake
path's schema and fan-out are exercised by the registry parity test
(tests/test_oracle_parity.py) — here we pin the stub contract and the
batch-shape invariants that parity alone wouldn't catch.
"""

from __future__ import annotations

import pytest

from transitdata_omm_cancellation_source_spark.operators import multimodal as mm

from conftest import SF_ORACLE


def test_real_decoders_are_gated_stubs():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        mm.resize_image(b"\x89PNG", 32, 32)


def test_asset_table_binary_schema(spark):
    from transitdata_omm_cancellation_source_spark.catalog import load_tables

    docs = load_tables(spark, SF_ORACLE, ["documents"])["documents"]
    assets = mm.asset_frame(docs)
    dtypes = dict(assets.dtypes)
    assert dtypes["payload"] == "binary"
    assert dtypes["media_type"] == "string"
    assert dtypes["meta"].startswith("struct<width:int,height:int,n_frames:int")
    # every asset keeps a decodable payload row
    assert assets.count() == docs.count()


def test_frame_sample_fanout_bounds(spark):
    from transitdata_omm_cancellation_source_spark.catalog import load_tables
    from transitdata_omm_cancellation_source_spark.plans.queries import REGISTRY

    frames = REGISTRY["mm_frame_sample"].build(spark, SF_ORACLE)
    docs = load_tables(spark, SF_ORACLE, ["documents"])["documents"]
    n_videos = docs.filter("doc_id % 3 = 2").count()
    n_frames = frames.count()
    # each video emits >= 1 and <= ceil(240/30) sampled frames
    assert n_videos <= n_frames <= n_videos * 8
