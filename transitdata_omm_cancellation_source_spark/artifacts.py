"""Disk-persisted trained artifacts: train-once / serve-many.

The engine's two trained artifacts — the corpus-scaled IVF coarse
quantizer (``similarity.ivf_quantizer``) and the PQ codebook
(``pq._shared_codebook``) — are bounded local relations (≤ 2^IVF_MAX_BITS
and M x K = 128 rows at ANY corpus size).  Through r11 they lived only
in session-memory dicts keyed by ``caching.artifact_cache_key``, so a
fresh session RETRAINED them: the r11 fourth-decade table shows
``knn_pq_refine`` at 17.7x (vs its sibling's 11.0x) only because it ran
first in its session and paid the codebook+quantizer training its
siblings amortized.  At production scale the shape is train-once /
serve-many — a 100 TB corpus trains its quantizer once and every later
session (and every executor fleet) loads it.

This module adds the disk layer UNDER the session-memory dicts:

- key: ``artifact_disk_key`` — sha256 over (format version, artifact
  name, the source frame's input-file (uri, size, mtime_ns)
  fingerprints, its schema, and a fingerprint of the TRAINER'S SOURCE
  — ``inspect.getsource(train)``).  Deliberately NOT the plan's
  ``semanticHash``: that hash bakes in session confs (measured — the
  engine session and a plain session hash the same parquet scan
  differently), so a plan-keyed disk key would never hit across
  sessions.  The trainer fingerprint (r13, closing the r12 verdict's
  silent-staleness risk) means an edit to a trainer's body is a cache
  MISS by construction — a forgotten ``_FORMAT_VERSION`` bump can no
  longer serve a stale quantizer to oracle-certified consumers.
  Residual contract: the fingerprint sees the trainer's own source,
  not the bodies of helpers it calls — a semantic change hidden
  entirely inside a helper still needs the version bump (in practice
  trainer edits and helper edits travel together; the helper names
  and call shapes ARE in the fingerprinted text).
- layout: ``<artifact root>/<name>/<digest>/`` parquet, written to a
  temp dir and atomically renamed (a concurrent trainer loses the
  rename and discards its copy — both trained the same content).  The
  root defaults to ``graft_artifacts`` under the session warehouse dir
  and is overridable via ``spark.graft.artifacts.dir``.
- serving: rows are loaded, sorted by the artifact's natural key (so
  the relation is byte-stable regardless of scan order), and re-created
  as a LOCAL RELATION — consumers' plans still start from a literal
  bounded-row broadcast, exactly as the session-memory path always
  served them (the plan-shape tests' contract).

Bit-identity: parquet round-trips int64/double/array columns exactly,
and ``tests/test_artifacts_disk.py`` proves a separate cold
SparkSession loads the identical rows WITHOUT its trainer ever running.
"""

from __future__ import annotations

import hashlib
import os
from typing import Callable, Sequence
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession

ARTIFACT_DIR_CONF = "spark.graft.artifacts.dir"

#: bump to invalidate every on-disk artifact after a format or
#: training-semantics change.
_FORMAT_VERSION = "v1"


def _stable_code_repr(code) -> str:
    """Session-stable rendering of a code object: repr() of a code
    object (or of co_consts containing one) embeds a memory address,
    which would change the digest every process — exactly wrong for a
    cross-session cache key — so nested code objects are rendered
    recursively by their own stable fields."""
    consts = tuple(
        _stable_code_repr(c) if hasattr(c, "co_code") else repr(c)
        for c in code.co_consts
    )
    return repr((code.co_names, code.co_varnames, consts, code.co_code))


def _trainer_fingerprint(train) -> str:
    """Digest of the trainer's own source text, so a training-recipe
    edit is a cache miss by construction (module docstring).  Source
    is the right grain: it survives re-imports and new sessions
    (bytecode ids don't) and changes exactly when a human edits the
    recipe.  Falls back to the code object's stable fields when
    source isn't retrievable (frozen/REPL trainers)."""
    import inspect

    try:
        text = inspect.getsource(train)
    except (OSError, TypeError):
        text = _stable_code_repr(train.__code__)
    return hashlib.sha256(text.encode()).hexdigest()[:16]


def artifact_disk_key(name: str, source_df: DataFrame, train=None) -> str:
    """Cross-session content digest for artifacts trained from
    ``source_df`` by ``train`` (module docstring — includes what the
    trainer fingerprint can and cannot see)."""
    from .caching import input_fingerprints

    payload = repr(
        (
            _FORMAT_VERSION,
            name,
            input_fingerprints(source_df),
            source_df.schema.simpleString(),
            _trainer_fingerprint(train) if train is not None else "",
        )
    )
    return hashlib.sha256(payload.encode()).hexdigest()[:32]


def warehouse_local_path(spark: SparkSession) -> str:
    """The warehouse dir as a plain local path — the resolution policy
    shared by the artifact root and pagerank's parquet scratch dir
    (one place to fix if a non-file scheme ever needs handling)."""
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir"))
    return wh.path if wh.scheme in ("file", "") and wh.path else "spark-warehouse"


def _artifact_root(spark: SparkSession) -> str:
    configured = spark.conf.get(ARTIFACT_DIR_CONF, "")
    if configured:
        return configured
    return os.path.join(warehouse_local_path(spark), "graft_artifacts")


def load_or_train(
    spark: SparkSession,
    name: str,
    source_df: DataFrame,
    schema,
    train: Callable[[], DataFrame],
    key_cols: Sequence[str],
) -> DataFrame:
    """The artifact serving path: disk hit loads, miss trains + writes.

    ``train()`` returns the (bounded-row) training plan; its collect
    runs ONLY on a disk miss.  Returns a local relation over rows
    sorted by ``key_cols`` — deterministic independent of scan or
    aggregation output order on either path.
    """
    path = os.path.join(
        _artifact_root(spark), name, artifact_disk_key(name, source_df, train)
    )
    rows = _read_rows(spark, path)
    trained = rows is None
    if trained:
        rows = train().collect()
    rows = sorted(rows, key=lambda r: tuple(r[c] for c in key_cols))
    out = spark.createDataFrame(rows, schema)
    if trained:
        _write_rows(out, path)
    return out


def _read_rows(spark: SparkSession, path: str):
    if not os.path.isfile(os.path.join(path, "_SUCCESS")):
        return None
    return spark.read.parquet(path).collect()


def _write_rows(local_df: DataFrame, path: str) -> None:
    """Atomic publish: write to a sibling temp dir, rename into place.

    os.rename is atomic on one filesystem; a loser whose rename finds
    the path already published discards its copy — both sessions
    trained from identical bytes (the key guarantees it), so either
    copy serves.
    """
    import shutil
    import uuid

    parent = os.path.dirname(path)
    os.makedirs(parent, exist_ok=True)
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    # coalesce(1): bounded artifacts (≤ 4096 rows) want one part file.
    local_df.coalesce(1).write.mode("overwrite").parquet(tmp)
    try:
        os.rename(tmp, path)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
        if not os.path.isfile(os.path.join(path, "_SUCCESS")):
            raise
