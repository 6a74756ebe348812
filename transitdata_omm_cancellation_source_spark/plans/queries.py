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
from ..operators import retrieval  # noqa: E402,F401
from ..operators import sampling  # noqa: E402,F401
from ..operators import timeseries  # noqa: E402,F401

# quantize reuses similarity's QUERY_MOD/TOP_K and the Lloyd oracle
# composes embedding_label_centroid's, so both import after similarity.
from ..operators import quantize  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Certification-window ordering.
#
# The driver's correctness harness verifies the FIRST 50 registry entries in
# registration order, so with more than 50 entries some rotate out each
# round.  Round-4 rotation policy: flagships first, then every query with
# ZERO driver-certified rows (the 6 new retrieval/sampling/hopping queries
# and the 6 analytics added in r3 after the window was fixed), then the
# r3-first-timers (certified exactly once, in CORRECTNESS_r03), then the
# 17 §2 micro-probes (green in r1 AND r2, rotating back in after sitting
# out r3).  The entries left past the window are all ≥2-round green
# (dedup/mm/knn/tpch families: r2+r3) or pinned by dedicated unit tests
# (sketch paths; corpus_prep_pipeline is a composition of in-window ops).
# Names absent from the list keep their original relative order after the
# prioritized ones; listed-but-unregistered names are ignored, so this
# stays correct as queries are added or renamed.
# ---------------------------------------------------------------------------
_PRIORITY: tuple[str, ...] = (
    # flagships — always certified
    "cancellation_pipeline_now",
    "cancellation_pipeline_past",
    # new in r4 — never driver-verified
    "text_tfidf_topk",
    "text_bm25_search",
    "docs_keyword_search",
    "corpus_mixture_sample",
    "corpus_stratified_split",
    "events_hopping_window",
    # added in r3 past the window — never driver-verified
    "region_nation_rollup",
    "lineitem_cube_revenue",
    "orders_pivot_status_by_priority",
    "events_segment_enrich_salted",
    "orders_above_2x_customer_avg",
    "promo_revenue_share_monthly",
    # certified exactly once (first row in CORRECTNESS_r03)
    "knn_ivf_kmeans",
    "knn_lsh_multiprobe",
    "kmeans_lloyd_centroids",
    "corpus_hash_split",
    "corpus_ngram_topk",
    "corpus_decontaminate",
    "text_pii_redact",
    "corpus_token_chunks",
    "corpus_pack_sequences",
    "events_asof_latest_order",
    "events_value_quantiles",
    "events_top_users_per_type",
    "events_attribution_range_join",
    "events_gapfill_daily",
    "events_lag_lead_stats",
    "embedding_int8_quantize",
    "knn_int8_cosine",
    # r2-green analytics sat out r3 — rotate back in
    "customers_without_recent_orders",
    "large_order_customers",
    "distinct_users_per_event_type",
    # §2 micro-probes (green r1+r2) rotate back in after sitting out r3
    "s1_scan_projection_pushdown",
    "s2_parameterized_query",
    "s5_malformed_row_skip",
    "p2_p4_id_and_day_formatting",
    "p3_direction_from_gid",
    "p5_start_time_over_24h",
    "p9_status_derivation",
    "p11_local_to_utc_epoch_ms",
    "f1_f4_f5_literal_and_isin",
    "f2_null_aware_disjunction",
    "f3_incremental_capture",
    "j1_left_outer_join",
    "j4_left_then_inner_interaction",
    "j8_j10_broadcast_star_join",
    "a2_priority_argmax_dedup",
    "a3_snapshot_diff_counts",
    "o1_global_sort",
    # everything not listed (r2+r3-green dedup/mm/knn/textops/tpch families,
    # the rows-only sketch paths, corpus_prep_pipeline) follows in original
    # registration order and sits out this round.
)


def _reorder_registry() -> None:
    ordered = {n: REGISTRY[n] for n in _PRIORITY if n in REGISTRY}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder_registry()
