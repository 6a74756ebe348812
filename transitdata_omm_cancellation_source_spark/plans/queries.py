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
    """One registry entry.

    ``build`` returns the query's result DataFrame.  Most builders are
    pure plan constructors (no Spark jobs until the caller acts), but a
    few are CONTRACTUALLY EAGER — they run bounded driver actions at
    build time where the algorithm itself needs data-dependent
    decisions before the final plan exists: ``dedup_ngram_jaccard``
    (total-shingle-mass agg + capped hot-shingle collect),
    ``knn_bruteforce_cosine`` (query-sample count for the broadcast
    gate), ``dedup_cluster_canonical`` / ``kmeans_lloyd_centroids``
    (one convergence count per iteration round).  Plan-only consumers
    (EXPLAIN tooling, plan-shape tests) should expect those builders to
    submit jobs; everything else stays lazy.
    """

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


def registered_query(name: str, survey_ref: str, oracle: str | None):
    """Decorator: register ``fn(spark, tables) -> DataFrame`` under name.

    The shared registration shim every operator module aliases as
    ``_q``: wraps a table-level builder in a ``(spark, sf_dir)`` loader
    so the registry callable matches the driver contract.
    """

    def deco(fn):
        def build(spark: SparkSession, sf_dir: str) -> DataFrame:
            from ..catalog import load_tables  # deferred: catalog-free import

            tables = load_tables(spark, sf_dir)
            return fn(spark, tables)

        register(name, QuerySpec(build=build, oracle=oracle, survey_ref=survey_ref))
        return fn

    return deco


def _ordered_names() -> list[str]:
    """Registry names in certification-window order.

    Computed at ACCESS time, not import time: the operator modules and
    this module import each other, so a consumer that imports an
    operator module first (e.g. a unit test) runs the registrations
    after the import-time reorder.  Deriving the order here makes the
    driver-facing ``queries()`` / ``oracle_sql()`` sequence independent
    of which module happened to be imported first.
    """
    pri = [n for n in _PRIORITY if n in REGISTRY]
    seen = set(pri)
    return pri + [n for n in REGISTRY if n not in seen]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: REGISTRY[name].build for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
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
from ..operators import behavior  # noqa: E402,F401
from ..operators import pipeline_prep  # noqa: E402,F401
from ..operators import retrieval  # noqa: E402,F401
from ..operators import sampling  # noqa: E402,F401
from ..operators import timeseries  # noqa: E402,F401

# quantize reuses similarity's QUERY_MOD/TOP_K and the Lloyd oracle
# composes embedding_label_centroid's, so both import after similarity;
# pq reuses the same constants plus the hyperplane bucket primitives.
from ..operators import pq  # noqa: E402,F401
from ..operators import quantize  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Certification-window ordering.
#
# The driver's correctness harness verifies the FIRST 50 registry entries in
# registration order, so with more than 50 entries some rotate out each
# round.  ``CERT_WINDOW`` is that driver-side window size; a unit test
# (tests/test_registry_window.py) pins ``len(_PRIORITY) == CERT_WINDOW``
# exactly and that every listed name resolves, so an over-length list can
# never silently push an entry past the window edge (r3/r4 had 51 names and
# ``o1_global_sort`` — #51 — missed certification two rounds running) and a
# deleted name can't silently hand its slot to an arbitrary entry.
#
# Round-5 rotation policy: flagships first, then the 32 entries with no
# CORRECTNESS_r04 row, worst staleness first — ``corpus_prep_pipeline``
# (one lifetime green, r3), ``o1_global_sort`` (green r1+r2 only), the
# r3-green lifecycle/dedup/knn/textops/tpch families, and the two
# rows-only sketch paths (rows-recorded r3 only).  The remaining 16 slots
# go to the r4-certified queries with the fewest lifetime green rows: the
# six queries new in r4 (one green each) and ten of the twice-green r2/r3
# families.  Every entry left outside the window is r4-green, so after r5
# no oracle-backed query is more than one round stale and every one has
# ≥2 lifetime green rows.
# Names absent from the list keep their original relative order after the
# prioritized ones; listed-but-unregistered names are ignored, so this
# stays correct as queries are added or renamed.
# ---------------------------------------------------------------------------
CERT_WINDOW = 50

_PRIORITY: tuple[str, ...] = (
    # flagships — always certified
    "cancellation_pipeline_now",
    "cancellation_pipeline_past",
    # stale set: no r4 row; worst-first
    "corpus_prep_pipeline",
    "o1_global_sort",
    "a3_stateful_two_cycle_poll",
    "e3_protobuf_roundtrip",
    "s6_keyed_message_encode",
    "mm_asset_table",
    "mm_decode_features",
    "mm_frame_sample",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_edit_distance",
    "dedup_cluster_canonical",
    "knn_bruteforce_cosine",
    "knn_lsh_hyperplane",
    "knn_ivf_label",
    "embedding_label_centroid",
    "text_token_stats",
    "text_quality_score",
    "text_language_id",
    "text_fingerprint",
    "events_json_props_extract",
    "events_tumbling_window",
    "events_session_window",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_region_revenue",
    "window_running_customer_total",
    # rows-only sketch paths — rows recorded r3 only, refresh
    "events_value_quantiles_sketch",
    "events_distinct_users_sketch",
    # new in r5 — never driver-verified
    "events_scd2_user_status",
    "events_funnel_conversion",
    "embedding_standardize",
    "events_retention_cohorts",
    "lineitem_basket_pairs",
    "embedding_pq_codes",
    "knn_pq_adc",
    # r4-certified with a single lifetime green (new in r4)
    "text_tfidf_topk",
    "text_bm25_search",
    "docs_keyword_search",
    "corpus_mixture_sample",
    "corpus_stratified_split",
    "events_hopping_window",
    # twice-green (r2+r4) fill to the window edge
    "events_segment_enrich_salted",
    "orders_above_2x_customer_avg",
    "promo_revenue_share_monthly",
    # everything not listed is r4-green with >= 2 lifetime green rows
    # (micro-probes, corpus-prep ops, int8/knn, events navigation
    # family, r2-green analytics, and the three twice-green fillers
    # displaced by the r5-new queries) and follows in original
    # registration order, sitting out this round.
)


# No import-time reorder of REGISTRY itself: under the operator-module
# import cycle, registrations can land after this module body runs, so
# an import-time mutation is unreliable by construction.  The ordering
# has ONE source of truth — ``_ordered_names()`` — applied at access
# time by ``queries()`` / ``oracle_sql()``; consumers that need the
# driver-facing order must go through those accessors, never iterate
# the raw dict.
