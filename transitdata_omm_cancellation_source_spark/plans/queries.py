"""Query registry — the driver-facing catalog of implemented operators.

Every operator from SURVEY.md §2 (and each north-star extension) gets a
named entry: a Spark builder ``(spark, sf_dir) -> DataFrame`` plus,
where SQL-expressible, a DuckDB oracle string over the same parquet
tables.  ``__spark_entry__.py`` re-exports this registry to the
driver's correctness harness.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_tables
from .cancellation import (
    QueryParams,
    cancellation_oracle_sql,
    cancellation_pipeline,
)


@dataclass(frozen=True)
class QuerySpec:
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => non-SQL-expressible, rows-only check
    survey_ref: str = ""  # SURVEY.md §2 operator ids this query covers


def _flagship(mode: str) -> Callable[[SparkSession, str], DataFrame]:
    def build(spark: SparkSession, sf_dir: str) -> DataFrame:
        load_tables(spark, sf_dir)
        return cancellation_pipeline(spark, QueryParams(mode=mode))

    return build


REGISTRY: dict[str, QuerySpec] = {
    "cancellation_pipeline_now": QuerySpec(
        build=_flagship("NOW"),
        oracle=cancellation_oracle_sql(QueryParams(mode="NOW")),
        survey_ref="E1: J1-J10,F1-F2,F4-F7,P1-P13,S4-S5,A2",
    ),
    "cancellation_pipeline_past": QuerySpec(
        build=_flagship("PAST"),
        oracle=cancellation_oracle_sql(QueryParams(mode="PAST")),
        survey_ref="E2/F3: incremental change capture",
    ),
}


def register(name: str, spec: QuerySpec) -> None:
    REGISTRY[name] = spec


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.build for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in REGISTRY.items()
        if spec.oracle is not None
    }


# Populate the registry.  These imports run after the symbols above are
# defined (they import back from this module), so the cycle is benign.
from . import lifecycle_queries  # noqa: E402,F401
from . import operator_queries  # noqa: E402,F401
from ..operators import analytics  # noqa: E402,F401
from ..operators import dedup_fuzzy  # noqa: E402,F401
from ..operators import multimodal  # noqa: E402,F401
from ..operators import similarity  # noqa: E402,F401
from ..operators import textops  # noqa: E402,F401

# pipeline_prep composes textops' language-ID oracle, so it must import
# after textops.
from ..operators import pipeline_prep  # noqa: E402,F401
from ..operators import timeseries  # noqa: E402,F401

# quantize reuses similarity's QUERY_MOD/TOP_K and the Lloyd oracle
# composes embedding_label_centroid's, so both import after similarity.
from ..operators import quantize  # noqa: E402,F401
