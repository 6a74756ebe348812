"""AQE skew-join contract: a pathologically hot join key must be split
at runtime (AQEShuffleRead ``skew=true``) instead of serializing the
whole stage behind one straggler task — the safety net under every
shuffle join in this engine when a key's volume defies the static
salting the salted-join path applies by hand.

Thresholds are lowered to make local[32]-sized data exhibit the
behavior; they are runtime confs, restored after the test.
"""

from __future__ import annotations

from pyspark.sql import functions as F

_CONFS = {
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force the SMJ path
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
}


def test_hot_key_join_is_split_by_aqe(spark):
    saved = {}
    for k, v in _CONFS.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        # one hot key carrying ~99.5% of rows + 1000 cold keys
        left = spark.range(0, 201000).select(
            F.when(F.col("id") < 200000, F.lit(0))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.concat(F.lit("x" * 120), F.col("id").cast("string")).alias(
                "payload"
            ),
        )
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), F.lit("dim").alias("d")
        )
        j = left.join(right, "k").select(
            F.sum(F.length("payload")).alias("s")
        )
        result = j.collect()[0].s
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan  # the hot partition was split

        # every left row matches exactly one dim row, so the joined sum
        # must equal the plain scan's sum — the split changed the
        # schedule, not the answer
        expected = left.select(F.sum(F.length("payload")).alias("s")).collect()[0].s
        assert result == expected
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
