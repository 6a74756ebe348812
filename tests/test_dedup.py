"""A2 dedup unit tests — ports of the reference's 6 JUnit cases.

Reference: OmmCancellationHandlerTest.java:15-87 (fixture builder
``mockCancellation`` L90-103: route "7575", direction 1, date
"20180101", time "11:22:00").  Same inputs, same expected survivors,
executed through the Spark window implementation.
"""

from __future__ import annotations

import time

from pyspark.sql import Row

from transitdata_omm_cancellation_source_spark.operators.dedup import priority_argmax

NOW_MS = int(time.time() * 1000)


def mock_cancellation(spark_rows: list, dvj_id: str, status: str, ts: int | None = None):
    """Fixture row — OmmCancellationHandlerTest.java:90-103."""
    spark_rows.append(
        Row(
            dvj_id=dvj_id,
            deviation_case_id=1,
            status=status,
            ts_epoch_ms=ts if ts is not None else NOW_MS,
            dc_last_modified=len(spark_rows),  # encounter order
            route_id="7575",
            direction_id=1,
            start_date="20180101",
            start_time="11:22:00",
        )
    )


def run(spark, rows):
    if not rows:
        schema = (
            "dvj_id string, deviation_case_id long, status string, "
            "ts_epoch_ms long, dc_last_modified long, route_id string, "
            "direction_id int, start_date string, start_time string"
        )
        df = spark.createDataFrame([], schema)
    else:
        df = spark.createDataFrame(rows)
    out = priority_argmax(
        df, ["dvj_id", "deviation_case_id"], "status", "dc_last_modified", "ts_epoch_ms"
    )
    return out.collect()


def test_empty_list(spark):
    # L16-19: empty input -> empty output
    assert run(spark, []) == []


def test_single_canceled_kept(spark):
    # L22-27
    rows: list = []
    mock_cancellation(rows, "1234", "CANCELED")
    out = run(spark, rows)
    assert len(out) == 1 and out[0].status == "CANCELED"


def test_single_running_kept(spark):
    # L30-35
    rows: list = []
    mock_cancellation(rows, "1234", "RUNNING")
    out = run(spark, rows)
    assert len(out) == 1 and out[0].status == "RUNNING"


def test_canceled_beats_running(spark):
    # L38-47: same dvjId + devCaseId, CANCELED must win regardless of order
    rows: list = []
    mock_cancellation(rows, "1234", "RUNNING", NOW_MS + 1000)
    mock_cancellation(rows, "1234", "CANCELED", NOW_MS)
    out = run(spark, rows)
    assert len(out) == 1 and out[0].status == "CANCELED"


def test_multiple_running_one_survivor(spark):
    # L50-59: among RUNNING keep max timestamp
    rows: list = []
    mock_cancellation(rows, "1234", "RUNNING", NOW_MS - 2000)
    mock_cancellation(rows, "1234", "RUNNING", NOW_MS)
    mock_cancellation(rows, "1234", "RUNNING", NOW_MS - 1000)
    out = run(spark, rows)
    assert len(out) == 1
    assert out[0].status == "RUNNING" and out[0].ts_epoch_ms == NOW_MS


def test_distinct_dvj_ids_dont_interfere(spark):
    # L62-87: mixed statuses across distinct dvjIds
    rows: list = []
    mock_cancellation(rows, "1", "CANCELED")
    mock_cancellation(rows, "1", "RUNNING")
    mock_cancellation(rows, "2", "RUNNING", NOW_MS - 5000)
    mock_cancellation(rows, "2", "RUNNING", NOW_MS - 1000)
    mock_cancellation(rows, "3", "CANCELED")
    out = {r.dvj_id: r for r in run(spark, rows)}
    assert len(out) == 3
    assert out["1"].status == "CANCELED"
    assert out["2"].status == "RUNNING" and out["2"].ts_epoch_ms == NOW_MS - 1000
    assert out["3"].status == "CANCELED"


def test_first_encountered_canceled_wins(spark):
    # filterDuplicates keeps activeCancellations.get(0) — the first in
    # encounter order (OmmCancellationHandler.java:190-193) even when a
    # later CANCELED has a newer timestamp.
    rows: list = []
    mock_cancellation(rows, "9", "CANCELED", NOW_MS - 1000)
    mock_cancellation(rows, "9", "CANCELED", NOW_MS)
    out = run(spark, rows)
    assert len(out) == 1 and out[0].ts_epoch_ms == NOW_MS - 1000


def test_canceled_tie_on_encounter_order_is_deterministic(spark):
    """Two CANCELED rows with EQUAL dc_last_modified: the appended
    ts_epoch_ms sort key must pick the same survivor on every engine
    and partitioning (round-1 latent nondeterminism).  Both the Spark
    window and the DuckDB oracle rule break the tie toward the lower
    timestamp."""
    import duckdb
    from pyspark.sql import Row

    rows = [
        Row(dvj_id="9", deviation_case_id=1, status="CANCELED",
            ts_epoch_ms=NOW_MS, dc_last_modified=7, route_id="a",
            direction_id=1, start_date="20180101", start_time="11:22:00"),
        Row(dvj_id="9", deviation_case_id=1, status="CANCELED",
            ts_epoch_ms=NOW_MS - 1000, dc_last_modified=7, route_id="b",
            direction_id=1, start_date="20180101", start_time="11:22:00"),
    ]
    for ordering in (rows, rows[::-1]):
        df = spark.createDataFrame(ordering)
        out = priority_argmax(
            df, ["dvj_id", "deviation_case_id"], "status",
            "dc_last_modified", "ts_epoch_ms",
        ).collect()
        assert len(out) == 1 and out[0].ts_epoch_ms == NOW_MS - 1000
        assert out[0].route_id == "b"
    # the oracle's ORDER BY (plans/cancellation.py) picks identically
    con = duckdb.connect()
    got = con.execute(f"""
        WITH decoded(dvj_id, deviation_case_id, status, ts_epoch_ms,
                     dc_last_modified, route_id) AS (
            VALUES ('9', 1, 'CANCELED', {NOW_MS}, 7, 'a'),
                   ('9', 1, 'CANCELED', {NOW_MS - 1000}, 7, 'b')
        )
        SELECT route_id FROM (
            SELECT *, row_number() OVER (
                PARTITION BY dvj_id, deviation_case_id
                ORDER BY CASE WHEN status = 'CANCELED' THEN 0 ELSE 1 END ASC,
                         CASE WHEN status = 'CANCELED' THEN 0.0
                              ELSE -CAST(ts_epoch_ms AS DOUBLE) END ASC,
                         dc_last_modified ASC,
                         ts_epoch_ms ASC) AS rn
            FROM decoded) WHERE rn = 1
    """).fetchall()
    con.close()
    assert got == [("b",)]


# --- connected-components label propagation ----------------------------------


def test_long_chain_converges_within_round_cap(spark):
    """A 60-node duplicate chain (diameter 59, 3x the 20-round cap)
    must fully converge: pointer doubling makes propagation O(log d),
    so plain neighbor-min (which would need 59 rounds) is insufficient
    and would leave the chain tail partially labeled."""
    from transitdata_omm_cancellation_source_spark.operators.dedup_fuzzy import (
        propagate_min_labels,
    )

    n = 60
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    got = {r.node: r.label for r in propagate_min_labels(pairs).collect()}
    assert got == {i: 0 for i in range(n)}


def test_two_components_and_singleton_self_pair(spark):
    from transitdata_omm_cancellation_source_spark.operators.dedup_fuzzy import (
        propagate_min_labels,
    )

    pairs = spark.createDataFrame(
        [(5, 3), (3, 9), (20, 21), (40, 40)], "doc_a long, doc_b long"
    )
    got = {r.node: r.label for r in propagate_min_labels(pairs).collect()}
    assert got == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20, 40: 40}


def test_delta_batch_equals_full_minhash_restricted(spark):
    """The incremental path's contract: batch pairs == the full-corpus
    minhash pair set restricted to pairs touching the batch.  Both
    sides computed in-engine on the smoke tables; the sf0.01 DuckDB
    oracle certifies the same identity against a from-scratch
    recompute."""
    from transitdata_omm_cancellation_source_spark.caching import (
        release_tracked,
    )
    from transitdata_omm_cancellation_source_spark.operators.dedup_fuzzy import (
        _DELTA_MOD,
        _DELTA_REM,
        _delta_batch,
        _minhash_lsh,
    )
    from transitdata_omm_cancellation_source_spark.catalog import load_tables

    t = load_tables(spark, "/root/testdata/sf0.001")
    try:
        full = {
            (r.doc_a, r.doc_b, r.jaccard)
            for r in _minhash_lsh(spark, t).collect()
        }
        expected = {
            (a, b, j)
            for a, b, j in full
            if a % _DELTA_MOD == _DELTA_REM or b % _DELTA_MOD == _DELTA_REM
        }
        got = {
            (r.doc_a, r.doc_b, r.jaccard)
            for r in _delta_batch(spark, t).collect()
        }
        assert got == expected
        assert expected  # non-vacuous: the batch has near-dup partners
        assert got != full  # restriction is real (some pairs excluded)
    finally:
        release_tracked()


def test_delta_embedding_equals_full_cosine_restricted(spark):
    """Embedding-leg incremental contract: batch pairs == the full
    blocked cosine pair set restricted to pairs touching the batch,
    and the scan only reads blocks the batch touches."""
    from transitdata_omm_cancellation_source_spark.caching import (
        release_tracked,
    )
    from transitdata_omm_cancellation_source_spark.operators.dedup_fuzzy import (
        _EDELTA_MOD,
        _EDELTA_REM,
        _delta_embedding,
        _embedding_neardup,
    )
    from transitdata_omm_cancellation_source_spark.catalog import load_tables

    t = load_tables(spark, "/root/testdata/sf0.001")
    try:
        full = {
            (r.vec_a, r.vec_b, r.cosine)
            for r in _embedding_neardup(spark, t).collect()
        }
        expected = {
            (a, b, c)
            for a, b, c in full
            if a % _EDELTA_MOD == _EDELTA_REM or b % _EDELTA_MOD == _EDELTA_REM
        }
        got = {
            (r.vec_a, r.vec_b, r.cosine)
            for r in _delta_embedding(spark, t).collect()
        }
        assert got == expected
        assert expected  # non-vacuous
        assert got != full  # the restriction excludes corpus-only pairs
    finally:
        release_tracked()


def test_stream_incremental_emission_semantics(spark):
    """Streaming dedup contract: the union over micro-batches equals
    the full minhash pair set; each pair is emitted EXACTLY ONCE, in
    the batch that completes it (max of its sides' batches); both the
    batch-internal and the cross-batch (state-probe) paths fire."""
    from transitdata_omm_cancellation_source_spark.caching import (
        release_tracked,
    )
    from transitdata_omm_cancellation_source_spark.operators.dedup_fuzzy import (
        _minhash_lsh,
        _stream_incremental,
    )
    from transitdata_omm_cancellation_source_spark.catalog import load_tables

    t = load_tables(spark, "/root/testdata/sf0.001")
    try:
        batch = lambda d: 1 if d % 3 <= 1 else 2  # noqa: E731
        full = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in _minhash_lsh(spark, t).collect()
        }
        got = [
            (r.doc_a, r.doc_b, r.jaccard, r.batch)
            for r in _stream_incremental(spark, t).collect()
        ]
        assert len(got) == len(full)  # exactly once
        for a, b, j, bt in got:
            assert full[(a, b)] == j
            assert bt == max(batch(a), batch(b))
        batches = {bt for _, _, _, bt in got}
        assert batches == {1, 2}  # internal AND boundary-crossing pairs
        # the cross-batch path specifically (not just batch-2 internal)
        assert any(
            batch(a) != batch(b) for a, b, _, bt in got if bt == 2
        )
    finally:
        release_tracked()
