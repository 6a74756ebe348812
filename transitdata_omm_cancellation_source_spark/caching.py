"""Tracked persist: session-lifetime cache bookkeeping for the
operator families that persist shared subtrees.

Several builders persist intermediates whose lifetime necessarily
extends past build() — cross-query shared subtrees (sorted shingle
sets, verified near-dup pairs) and per-round frames consumed lazily by
the next loop iteration (Lloyd assignments).  Those frames cannot be
unpersisted inside the builder (their cache fills only when the caller
materializes the query), so without bookkeeping a long-lived session
accumulates them until LRU eviction.  ``persist_tracked`` records every
such frame; ``release_tracked`` is the explicit cleanup hook for
workload boundaries (bench.py calls it between passes; a long-lived
service should call it whenever a query's results have been fully
consumed).

DataFrame.persist() already defaults to a spill-to-disk storage level,
so the pressure-risk is eviction-triggered recompute, not OOM — the
hook turns "rely on LRU" into a deterministic release point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    """persist() + record the frame for a later bulk release."""
    _TRACKED.append(df.persist())
    return df


def release_tracked() -> int:
    """Unpersist every tracked frame (idempotent); returns the count."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped: nothing to free
            pass
    return n
