"""North-star multimodal asset pipeline: opaque binary columns + typed
metadata, processed with Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the *real* decoders
(`decode_image`, `resize_image`) are import-gated stubs that raise
``NotImplementedError`` — but everything Spark-side is real and
oracle-verified: the binary column, the metadata struct, the
``mapInPandas`` UDF signatures, the iterator-of-Arrow-batches shape,
and the explode-style fan-out of frame sampling.

Payloads are deterministic fake media derived from ``documents``
(ascii-normalized text bytes), so a DuckDB oracle can recompute every
"decoded" feature character-wise — the parity check therefore
verifies the Python-side byte math, batch handling and schema, not
just row counts.

Scale notes: feature extraction is a stateless per-row map — zero
shuffle, embarrassingly parallel per parquet split; Arrow batch size
(``spark.sql.execution.arrow.maxRecordsPerBatch``) bounds peak memory
per task, the knob that matters when payloads are MBs not KBs.  Frame
sampling multiplies rows (fan-out ~n_frames/stride) — at 100 TB you
repartition *after* the fan-out, not before, to keep input splits
file-aligned.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..functions.text import HASH_MOD
from ..plans.queries import QuerySpec, register

FRAME_STRIDE = 30

try:  # pragma: no cover - codec libs absent in this container
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def decode_image(payload: bytes) -> "object":
    """Real image decode — requires an image codec library."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decode requires PIL/pillow, not present in this build; "
            "the deterministic fake path (mm_decode_features) exercises the "
            "same Spark plumbing"
        )
    raise NotImplementedError("unreachable in this build")


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Real image resize — requires an image codec library."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image resize requires PIL/pillow, not present in this build"
        )
    raise NotImplementedError("unreachable in this build")


# --- asset table: binary payload + typed metadata ---------------------------

_CLEAN_S = "regexp_replace(lower(text), '[^a-z0-9 ]', '')"
_CLEAN_D = "regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')"


def asset_frame(docs: DataFrame) -> DataFrame:
    """documents -> multimodal asset table.

    payload: ascii bytes (deterministic fake media); meta: typed struct
    whose fields stand in for codec-extracted headers.
    """
    clean = F.expr(_CLEAN_S)
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.encode(clean, "UTF-8").alias("payload"),
        F.struct(
            (F.col("n_chars") % 1920 + 16).cast("int").alias("width"),
            (F.col("n_chars") % 1080 + 16).cast("int").alias("height"),
            (F.col("n_chars") % 240 + 1).cast("int").alias("n_frames"),
            F.lit(16000).alias("sample_rate"),
        ).alias("meta"),
    )


_ASSET_CTE = f"""
    assets AS (
        SELECT doc_id AS asset_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS media_type,
               {_CLEAN_D} AS clean,
               CAST(n_chars % 1920 + 16 AS INTEGER) AS width,
               CAST(n_chars % 1080 + 16 AS INTEGER) AS height,
               CAST(n_chars % 240 + 1 AS INTEGER) AS n_frames
        FROM documents
    )
"""


def _q(name: str, survey_ref: str, oracle: str | None):
    def deco(fn):
        def build(spark: SparkSession, sf_dir: str) -> DataFrame:
            tables = load_tables(spark, sf_dir)
            return fn(spark, tables)

        register(name, QuerySpec(build=build, oracle=oracle, survey_ref=survey_ref))
        return fn

    return deco


@_q(
    "mm_asset_table",
    "north-star: multimodal ingest — binary payload + typed metadata struct",
    f"""
    WITH {_ASSET_CTE}
    SELECT asset_id, media_type, length(clean) AS n_bytes,
           width, height, n_frames
    FROM assets
    """,
)
def _mm_assets(spark, t):
    return asset_frame(t["documents"]).select(
        "asset_id",
        "media_type",
        F.octet_length("payload").alias("n_bytes"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.n_frames").alias("n_frames"),
    )


# --- feature extraction via mapInPandas -------------------------------------

_FEATURES_SCHEMA = (
    "asset_id long, media_type string, n_bytes int, mean_byte double, max_byte int"
)


def _decode_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched fake decode: per-payload byte statistics.

    numpy work stands in for a codec; the byte math is replicated
    character-wise by the DuckDB oracle, so parity proves the batch
    plumbing end-to-end.
    """
    import numpy as np

    for pdf in batches:
        arrs = [np.frombuffer(p, dtype=np.uint8) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "asset_id": pdf["asset_id"],
                "media_type": pdf["media_type"],
                "n_bytes": [a.size for a in arrs],
                "mean_byte": [
                    round(float(a.mean()), 6) if a.size else 0.0 for a in arrs
                ],
                "max_byte": [int(a.max()) if a.size else 0 for a in arrs],
            }
        )


@_q(
    "mm_decode_features",
    "north-star: mapInPandas feature extraction over binary payloads",
    f"""
    WITH {_ASSET_CTE},
    bytes AS (
        SELECT asset_id, media_type, length(clean) AS n_bytes,
               list_transform(string_split(clean, ''), x -> ascii(x)) AS bs
        FROM assets WHERE length(clean) > 0
    )
    SELECT asset_id, media_type, CAST(n_bytes AS INTEGER) AS n_bytes,
           round(CAST(list_reduce(list_prepend(0, bs), (a, x) -> a + x) AS DOUBLE)
                 / n_bytes, 6) AS mean_byte,
           CAST(list_reduce(list_prepend(0, bs), (a, x) -> greatest(a, x)) AS INTEGER)
               AS max_byte
    FROM bytes
    """,
)
def _mm_features(spark, t):
    assets = asset_frame(t["documents"]).filter(F.octet_length("payload") > 0)
    return assets.select("asset_id", "media_type", "payload").mapInPandas(
        _decode_features, _FEATURES_SCHEMA
    )


# --- frame sampling via mapInPandas (row fan-out) ---------------------------

_FRAMES_SCHEMA = "asset_id long, frame_idx int, byte_offset long, frame_key long"


def _sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Every FRAME_STRIDE-th frame of each video asset: one output row
    per sampled frame (demonstrates 1->N fan-out inside mapInPandas)."""
    for pdf in batches:
        out: dict[str, list] = {k: [] for k in ("asset_id", "frame_idx", "byte_offset", "frame_key")}
        for aid, nf, w, h in zip(
            pdf["asset_id"], pdf["n_frames"], pdf["width"], pdf["height"]
        ):
            frame_size = int(w) * int(h)
            for idx in range(0, int(nf), FRAME_STRIDE):
                out["asset_id"].append(aid)
                out["frame_idx"].append(idx)
                out["byte_offset"].append(idx * frame_size)
                out["frame_key"].append((int(aid) * 1000003 + idx) % HASH_MOD)
        yield pd.DataFrame(out)


@_q(
    "mm_frame_sample",
    "north-star: video frame sampling (mapInPandas 1->N fan-out)",
    f"""
    WITH {_ASSET_CTE}
    SELECT asset_id, CAST(frame_idx AS INTEGER) AS frame_idx,
           CAST(frame_idx * width * height AS BIGINT) AS byte_offset,
           (asset_id * 1000003 + frame_idx) % {HASH_MOD} AS frame_key
    FROM (SELECT asset_id, width, height,
                 unnest(range(0, n_frames, {FRAME_STRIDE})) AS frame_idx
          FROM assets WHERE media_type = 'video')
    """,
)
def _mm_frames(spark, t):
    vids = (
        asset_frame(t["documents"])
        .filter(F.col("media_type") == "video")
        .select(
            "asset_id",
            F.col("meta.n_frames").alias("n_frames"),
            F.col("meta.width").alias("width"),
            F.col("meta.height").alias("height"),
        )
    )
    return vids.mapInPandas(_sample_frames, _FRAMES_SCHEMA)
