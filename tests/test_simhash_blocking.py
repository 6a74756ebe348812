"""Pins the corpus-tiered SimHash block-choice blocking
(``dedup_fuzzy._simhash_blocking``): exact recall for hamming <= 3 at
every tier, tier selection from the corpus count, and the packed-key
equality contract the Spark join relies on.

Reference for the design: Manku/Jain/Sarma, WWW'07 "Detecting
Near-Duplicates for Web Crawling" (block-permutation tables).
"""

from __future__ import annotations

import random

from transitdata_omm_cancellation_source_spark.operators.dedup_fuzzy import (
    _HAMMING_MAX,
    _simhash_blocking,
)


def _block_val(x: int, off: int, w: int) -> int:
    return (x >> off) & ((1 << w) - 1)


def _packed_key(x: int, kept) -> int:
    # mirrors the Spark-side shiftleft(shiftright(sh64, off) & mask, 16*pos)
    k = 0
    for pos, (off, w) in enumerate(kept):
        k += _block_val(x, off, w) << (16 * pos)
    return k


def test_tier_selection_tracks_corpus_count():
    # smallest b in 4..7 whose kept-key width covers log2(N)
    assert len(_simhash_blocking(10_000)) == 4  # b=4, C(4,3)
    assert len(_simhash_blocking(1 << 15)) == 4  # boundary: 2^15 keys
    assert len(_simhash_blocking((1 << 15) + 1)) == 10  # b=5
    assert len(_simhash_blocking(1 << 24)) == 10  # boundary: 2^24 keys
    assert len(_simhash_blocking((1 << 24) + 1)) == 20  # b=6
    assert len(_simhash_blocking(1 << 31)) == 20  # boundary: 2^31 keys
    assert len(_simhash_blocking((1 << 31) + 1)) == 35  # b=7 (open tier)
    assert len(_simhash_blocking(10**12)) == 35


def test_blocks_partition_62_bits_and_pack_into_16():
    for n in (1, 10**5, 10**8, 10**12):
        tables = _simhash_blocking(n)
        for kept in tables:
            # widths fit the 16-bit packing slots and offsets are in-range
            assert len(kept) <= 4
            for off, w in kept:
                assert 0 < w <= 16
                assert 0 <= off and off + w <= 62


def test_exact_recall_at_every_tier():
    rng = random.Random(7)
    for n in (10_000, 100_000, 10**8, 10**10):
        tables = _simhash_blocking(n)
        for _ in range(500):
            x = rng.getrandbits(62)
            y = x
            for b in rng.sample(range(62), rng.randint(0, _HAMMING_MAX)):
                y ^= 1 << b
            # some table must agree on ALL kept blocks (pigeonhole), and
            # the packed join key must collide exactly there
            assert any(
                _packed_key(x, kept) == _packed_key(y, kept)
                for kept in tables
            ), (n, x, y)


def test_packed_key_equality_iff_blocks_equal():
    # widths <= 16 means the 16-bit packing is injective per slot: a
    # key collision implies every kept block matches (no carry bleed)
    rng = random.Random(11)
    tables = _simhash_blocking(10**8)
    for _ in range(2000):
        x, y = rng.getrandbits(62), rng.getrandbits(62)
        for kept in tables:
            same_key = _packed_key(x, kept) == _packed_key(y, kept)
            same_blocks = all(
                _block_val(x, o, w) == _block_val(y, o, w) for o, w in kept
            )
            assert same_key == same_blocks
