"""Local replica of the driver's correctness gate: every registry entry
with an oracle must hash-match DuckDB on the testdata (sf0.001 here;
the driver re-runs at sf0.01).
"""

from __future__ import annotations

import pytest

from transitdata_omm_cancellation_source_spark.plans.queries import REGISTRY
from transitdata_omm_cancellation_source_spark.testing import assert_oracle_parity

from conftest import SF_ORACLE


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, name):
    spec = REGISTRY[name]
    df = spec.build(spark, SF_ORACLE)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only check, like the driver's
    else:
        assert_oracle_parity(df, spec.oracle, SF_ORACLE)
