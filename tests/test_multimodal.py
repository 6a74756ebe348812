"""Multimodal container codecs and Spark plumbing.

The encode→decode round trip and header-field parity with the DuckDB
oracle are exercised by the registry parity test
(tests/test_oracle_parity.py); here we pin the codec byte layouts,
the error contract on malformed payloads, and the batch-shape
invariants that parity alone wouldn't catch.
"""

from __future__ import annotations

import struct

import pytest

from transitdata_omm_cancellation_source_spark.operators import multimodal as mm

from conftest import SF_ORACLE


def test_bmp_round_trip():
    data = bytes(range(40))
    p = mm.encode_bmp(data, 8, 5)
    assert p[:2] == b"BM"
    assert len(p) == mm.BMP_OVERHEAD + len(data)
    info = mm.decode_asset(p)
    assert info["kind"] == "image"
    assert (info["width"], info["height"]) == (8, 5)
    assert info["data"] == data
    assert mm.decode_image(p) == (8, 5, data)


def test_wav_round_trip_and_odd_padding():
    for n in (6, 7):  # even and odd data sections
        data = b"\x01\x02\x03\x04\x05\x06\x07"[:n]
        p = mm.encode_wav(data, 22050)
        assert p[:4] == b"RIFF" and p[8:12] == b"WAVE"
        # RIFF size field covers everything after the 8-byte RIFF header
        assert struct.unpack_from("<I", p, 4)[0] == len(p) - 8
        assert len(p) == mm.WAV_OVERHEAD + n + (n & 1)
        info = mm.decode_asset(p)
        assert info["kind"] == "audio"
        assert info["sample_rate"] == 22050
        assert info["data"] == data  # pad byte not leaked into data


def test_avi_round_trip_header_offsets():
    data = b"xyz"  # odd -> padded
    p = mm.encode_avi(data, 240, 320, 200)
    assert p[:4] == b"RIFF" and p[8:12] == b"AVI "
    assert len(p) == mm.AVI_OVERHEAD + len(data) + 1
    # real AVIMAINHEADER offsets inside the avih chunk
    avih = p[20 : 20 + 56]
    assert struct.unpack_from("<I", avih, 16)[0] == 240  # dwTotalFrames
    assert struct.unpack_from("<I", avih, 32)[0] == 320  # dwWidth
    assert struct.unpack_from("<I", avih, 36)[0] == 200  # dwHeight
    info = mm.decode_asset(p)
    assert (info["n_frames"], info["width"], info["height"]) == (240, 320, 200)
    assert info["data"] == data


def test_decode_rejects_malformed_payloads():
    with pytest.raises(ValueError):
        mm.decode_asset(b"\x89PNG\r\n\x1a\n")  # unknown magic
    with pytest.raises(ValueError):
        mm.decode_asset(b"BM\x00\x00")  # truncated BMP header
    with pytest.raises(ValueError):
        mm.decode_image(mm.encode_wav(b"abc", 8000))  # wrong kind
    # short fmt chunk: declared size 4 < the 16-byte PCM header
    with pytest.raises(ValueError):
        mm.decode_asset(
            b"RIFF" + struct.pack("<I", 16) + b"WAVE"
            + b"fmt " + struct.pack("<I", 4) + b"\x01\x00\x01\x00"
        )
    # chunk size field runs past the payload end: must raise, not
    # silently clamp to a short data section
    with pytest.raises(ValueError):
        mm.decode_asset(
            b"RIFF" + struct.pack("<I", 100) + b"WAVE"
            + b"data" + struct.pack("<I", 1000) + b"abc"
        )
    # avih chunk shorter than AVIMAINHEADER
    with pytest.raises(ValueError):
        mm.decode_asset(
            b"RIFF" + struct.pack("<I", 20) + b"AVI "
            + b"avih" + struct.pack("<I", 8) + b"\x00" * 8
        )


def test_resize_image_nearest_neighbor():
    if mm._HAS_PIL:  # pragma: no cover - container has no PIL
        pytest.skip("PIL branch delegates to the codec")
    px = bytes(range(16))  # 4x4 gradient
    p = mm.encode_bmp(px, 4, 4)
    out = mm.decode_asset(mm.resize_image(p, 2, 2))
    assert (out["width"], out["height"]) == (2, 2)
    assert out["data"] == bytes([0, 2, 8, 10])  # top-left of each 2x2 block
    # inconsistent pixel buffer (fake text-backed asset) is refused
    with pytest.raises(ValueError):
        mm.resize_image(mm.encode_bmp(b"abc", 4, 4), 2, 2)


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


def test_every_payload_decodes(spark):
    from transitdata_omm_cancellation_source_spark.catalog import load_tables

    docs = load_tables(spark, SF_ORACLE, ["documents"])["documents"]
    sample = mm.asset_frame(docs).select("media_type", "payload").limit(60).collect()
    kinds = set()
    for row in sample:
        info = mm.decode_asset(row.payload)
        kinds.add(info["kind"])
        assert info["kind"] == row.media_type
    assert kinds == {"image", "audio", "video"}


def test_frame_sample_fanout_bounds(spark):
    from transitdata_omm_cancellation_source_spark.catalog import load_tables
    from transitdata_omm_cancellation_source_spark.plans.queries import REGISTRY

    frames = REGISTRY["mm_frame_sample"].build(spark, SF_ORACLE)
    docs = load_tables(spark, SF_ORACLE, ["documents"])["documents"]
    n_videos = docs.filter("doc_id % 3 = 2").count()
    n_frames = frames.count()
    # each video emits >= 1 and <= ceil(240/30) sampled frames
    assert n_videos <= n_frames <= n_videos * 8
