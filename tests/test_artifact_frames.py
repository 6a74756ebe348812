"""Lifecycle of the dedup family's shared session-artifact frames:
one built DataFrame object per (corpus, artifact) until
release_tracked, which must clear BOTH the persisted data and the
handed-out objects (a dangling object would silently lose its cache
and recompute per consumer)."""

from __future__ import annotations

from transitdata_omm_cancellation_source_spark.caching import release_tracked
from transitdata_omm_cancellation_source_spark.operators.dedup_fuzzy import (
    _band_candidates,
    _minhash_shingles,
    _word_hash_frame,
)

from conftest import SF_SMOKE


def _tables(spark):
    return {
        "documents": spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    }


def test_family_frames_are_shared_objects(spark):
    t = _tables(spark)
    release_tracked()
    whf1, whf2 = _word_hash_frame(t), _word_hash_frame(t)
    assert whf1 is whf2
    sh1, sh2 = _minhash_shingles(t), _minhash_shingles(t)
    assert sh1 is sh2
    cand1, cand2 = _band_candidates(t), _band_candidates(t)
    assert cand1 is cand2
    assert whf1.storageLevel.useMemory or whf1.storageLevel.useDisk


def test_release_tracked_clears_frame_artifacts(spark):
    t = _tables(spark)
    release_tracked()
    before = _band_candidates(t)
    n = before.count()
    release_tracked()
    after = _band_candidates(t)
    assert after is not before  # stale unpersisted object NOT served
    assert after.count() == n  # rebuild is value-identical


def test_distinct_corpora_get_distinct_artifacts(spark):
    release_tracked()
    t = _tables(spark)
    a = _word_hash_frame(t)
    docs2 = t["documents"].limit(5).cache()
    b = _word_hash_frame({"documents": docs2})
    assert a is not b
    # caching one corpus' frame must not evict the other's
    assert _word_hash_frame(t) is a
    assert _word_hash_frame({"documents": docs2}) is b
    docs2.unpersist()
    release_tracked()
