"""Edge semantics for the Q13-pattern outer-join histogram and the kNN
label-vote classifier: the zero-order bucket (the outer-join trap) and
the deterministic vote tie-break.
"""

from __future__ import annotations

from datetime import datetime

from transitdata_omm_cancellation_source_spark.operators.analytics import (
    _order_count_distribution,
)
from transitdata_omm_cancellation_source_spark.operators.similarity import (
    _knn_label_vote,
)


def test_q13_keeps_zero_order_customers(spark):
    # cust 1: two counted orders; cust 2: only an URGENT order (join
    # predicate removes it — but the customer must SURVIVE the left
    # join into bucket 0); cust 3: no orders at all.
    customer = spark.createDataFrame(
        [(i, f"c{i}", 0, 0.0, "SEG") for i in (1, 2, 3)],
        "c_custkey long, c_name string, c_nationkey int,"
        " c_acctbal double, c_mktsegment string",
    )
    d = datetime(2024, 1, 1)
    orders = spark.createDataFrame(
        [
            (10, 1, "O", 1.0, d, "5-LOW"),
            (11, 1, "O", 1.0, d, "2-HIGH"),
            (12, 2, "O", 1.0, d, "1-URGENT"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    out = _order_count_distribution(
        spark, {"customer": customer, "orders": orders}
    ).collect()
    assert [(r.c_count, r.custdist) for r in out] == [(0, 2), (2, 1)]


def test_label_vote_tiebreak_prefers_smaller_label(spark):
    # Query vec_id 0 against 5 neighbors (all within top-k): labels
    # [1, 1, 2, 2, 3] -> a 2-2 vote tie between labels 1 and 2; the
    # (votes DESC, label ASC) tie-break must predict 1, and the
    # query's own label (2) then mismatches.
    rows = [
        (0, [1.0, 0.0], 2),
        (1, [0.9, 0.1], 1),
        (2, [0.8, 0.2], 1),
        (3, [0.7, 0.3], 2),
        (4, [0.6, 0.4], 2),
        (5, [0.5, 0.5], 3),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = _knn_label_vote(spark, {"embeddings": emb}).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.query_id, r.predicted_label, r.votes, r.query_label) == (0, 1, 2, 2)
    assert r.label_match is False


def test_upsert_merge_resolves_all_three_fates(spark):
    from transitdata_omm_cancellation_source_spark.operators.analytics import (
        _upsert_merge,
    )

    d = datetime(2024, 1, 1)
    orders = spark.createDataFrame(
        [
            (10, 1, "O", 100.0, d, "5-LOW"),   # % 10 == 0 -> update + insert
            (11, 1, "O", 50.0, d, "5-LOW"),    # % 10 == 1 -> delete
            (12, 1, "O", 70.0, d, "5-LOW"),    # untouched -> kept
            (20, 2, "O", 200.0, d, "5-LOW"),   # update + insert
            (21, 2, "O", 30.0, d, "5-LOW"),    # delete
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    out = {r.merge_action: r for r in _upsert_merge(spark, {"orders": orders}).collect()}
    assert set(out) == {"updated", "inserted", "kept"}  # deletes VANISH
    u, i, k = out["updated"], out["inserted"], out["kept"]
    assert (u.n_rows, u.total_value, u.min_key, u.max_key) == (2, 330.0, 10, 20)
    assert (i.n_rows, i.total_value) == (2, 150.0)
    shift = 21 + 1  # max base key + 1, derived from the data
    assert i.min_key == 10 + shift and i.max_key == 20 + shift
    assert (k.n_rows, k.total_value, k.min_key, k.max_key) == (1, 70.0, 12, 12)


def test_cube_two_level_matches_direct_cube_with_null_keys(spark):
    """r15: lineitem_cube_revenue pre-aggregates by the two keys
    before the CUBE (guide §2.3 — expand the tiny partial, not every
    fact row).  Pin the rewrite against Spark's direct single-level
    cube on a frame WITH a real NULL key, the case the testdata never
    exercises: a natural NULL must survive level 1 as its own group
    and keep GROUPING() = 0, distinct from the rolled-up rows."""
    from pyspark.sql import functions as F

    from transitdata_omm_cancellation_source_spark.operators.analytics import (
        _cube,
        _dec,
    )

    li = spark.createDataFrame(
        [
            ("A", "F", 10.0, 0.1),
            ("A", "O", 20.0, 0.0),
            (None, "F", 40.0, 0.25),
            (None, None, 80.0, 0.5),
            ("B", "F", 160.0, 0.0),
        ],
        "l_returnflag string, l_linestatus string,"
        " l_extendedprice double, l_discount double",
    )
    got = sorted(map(tuple, _cube(spark, {"lineitem": li}).collect()))
    revenue = F.sum(
        _dec("l_extendedprice")
        * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))
    )
    direct = (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.count(F.lit(1)).alias("n_items"),
            F.round(revenue.cast("double"), 2).alias("revenue"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "g_flag",
            "g_status",
            "n_items",
            "revenue",
        )
    )
    want = sorted(map(tuple, direct.collect()))
    assert got == want
    # non-vacuous: the natural-NULL group and its rolled-up twin both
    # exist and differ only in the grouping markers
    null_rows = [r for r in got if r[0] == "ALL" and r[1] == "F"]
    assert {(r[2], r[3]) for r in null_rows} == {(0, 0), (1, 0)}
