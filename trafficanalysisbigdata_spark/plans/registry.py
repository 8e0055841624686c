"""Named-query registry — the contract surface consumed by __spark_entry__.py.

Each entry pairs a Spark implementation (DataFrame API or spark.sql) with an
ANSI-SQL oracle string that DuckDB runs on the same parquet tables. The driver
compares row-count + schema + order-insensitive value hash, so:

* every computed column is aliased identically on both sides;
* floating aggregates are either computed over DECIMAL(18,6) casts (exact,
  order-independent — double sums are not) or rounded on both sides;
* top-k queries carry deterministic tie-breaker keys.

Queries registered without an oracle (``oracle=None``) are non-SQL-expressible
(ML fits, LSH, streaming) and get the driver's weaker rows-only check.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..io import register_views
from ..session import prep

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, "QuerySpec"] = {}

# Modules that register queries on import (kept lazy so importing the package
# root stays cheap).
_QUERY_MODULES = (
    "queries_core",
    "queries_ingest",
    "queries_sources",
    "queries_topk",
    "queries_functions",
    "queries_joins",
    "queries_windows",
    "queries_wide",
    "queries_setops",
    "queries_sql",
    "queries_text",
    "queries_olap",
    "queries_pipeline",
    "queries_geo",
    "queries_multimodal",
    "queries_dedup",
    "queries_similarity",
    "queries_streaming",
    "queries_ml",
)


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = ()
    doc: str = ""
    # tables the query reads; registered as temp views before running
    tables: tuple[str, ...] = field(default_factory=tuple)

    def run(self, spark: SparkSession, sf_dir: str) -> DataFrame:
        prep(spark)
        if self.tables:
            register_views(spark, sf_dir, *self.tables)
        return self.fn(spark, sf_dir)


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    tables: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a DataFrame-API query implementation."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tags, doc=fn.__doc__ or "", tables=tables
        )
        return fn

    return deco


def register_sql(
    name: str,
    sql: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    tables: tuple[str, ...] = (),
    doc: str = "",
) -> None:
    """Register a query whose Spark side is ``spark.sql(sql)``.

    When ``oracle`` is omitted the same ANSI string is used for DuckDB — the
    strongest possible guarantee the two sides agree on semantics.
    """

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        return spark.sql(sql)

    if name in REGISTRY:
        raise ValueError(f"duplicate query name {name!r}")
    REGISTRY[name] = QuerySpec(
        name=name,
        fn=fn,
        oracle=sql if oracle is None else oracle,
        tags=tags,
        doc=doc,
        tables=tables,
    )


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (idempotent) and return the registry."""
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(f"{__package__}.{mod}")
        except ModuleNotFoundError as e:
            # allow partially-built registries while the engine grows
            if mod not in str(e):
                raise
    return REGISTRY


# The driver's correctness harness samples the FIRST 50 entries of
# ``queries()`` in iteration order, so ordering is a coverage decision, not
# cosmetics. This explicit window holds the 43 oracle-bearing queries that
# had never been driver-sampled through round 5 (windows tail, set/sql,
# text, OLAP, dedup, pipeline, similarity, geo, multimodal, streaming — the
# whole LLM-pipeline surface, previously green only in the local DuckDB
# mirror), plus a14b (oracle-bearing as of round 6), dd2 (never sampled)
# and the round-6 additions dd7/sim7/pipe8/olap6/olap7.
# Rotation policy: entries that have earned a driver-green row in a past
# CORRECTNESS_r{N} rotate out in favor of never-sampled oracle-bearing
# queries (round 6 rotated out dd1/dd3/dd4/sim1/sim2, all green in r1).
# Still-unsampled oracle-bearing queries after this round's window — the
# round-7 rotation pool: st7, st8, st9, s14, s15, s16, s17, ops2, pipe7,
# olap8, a16, sql3, sql4, f21, sim8, dd8, w9, plus the pre-window tail
# (a1-a15, p4-p9, s2-s12, f*, j*, t*, w1-w5, ing1) that went green in
# r1-r5. All are continuously exact-checked by the local mirror
# (tests/test_oracle_parity.py) regardless of window membership.
# Everything else follows in registration order; the no-oracle queries
# (ml1–ml8, sim5, sim6) sort last so the window is 100% oracle-checkable.
_DRIVER_WINDOW = (
    "w6_daily_distribution_ranks",
    "w7_range_frame_weekly",
    "w8_forward_fill",
    "set1_cohort_algebra",
    "sql1_pricing_summary",
    "sql2_exists_big_spenders",
    "tx6_tfidf_top_terms",
    "tx7_token_entropy_by_lang",
    "tx8_bpe_token_budget",
    "tx9_boilerplate_share",
    "tx10_bigram_logprob",
    "tx11_repetition_filter",
    "olap1_rollup_region_nation",
    "olap2_cube_flag_status",
    "olap3_grouping_sets",
    "olap4_approx_vs_exact_distinct",
    "olap5_share_of_total",
    "ops1_join_key_skew_profile",
    "dd5_semantic_centroid_dedup",
    "dd6_dedup_components",
    "pipe1_pretrain_funnel",
    "pipe2_training_mix",
    "pipe3_multisignal_dedup",
    "pipe4_hash_sample",
    "pipe5_decontaminate",
    "pipe6_sequence_pack",
    "sim3_ann_topk_lsh",
    "sim4_lsh_neardup_pairs",
    "f18_reproject_epsg2263",
    "mm1_media_dedup",
    "mm2_media_stats_by_modality",
    "mm3_media_features",
    "mm4_frame_sample",
    "mm5_resize_summary",
    "mm6_audio_window_energy",
    "mm7_stratified_media_sample",
    "mm8_perceptual_neardup",
    "st1_tumbling_hourly",
    "st2_sliding_2h_windows",
    "st3_session_windows",
    "st4_first_event_per_key",
    "st5_purchase_view_attribution",
    "st6_stream_static_enrich",
    "a14b_hll_estimate_audit",
    "dd2_minhash_lsh",
    "dd7_duplicate_spans",
    "sim7_int8_quantized_topk",
    "pipe8_shard_manifest",
    "olap6_funnel_conversion",
    "olap7_scd2_intervals",
)


def _ordered() -> dict[str, QuerySpec]:
    """Registry in driver-facing order: the explicit 50-slot window first,
    then remaining oracle-bearing queries in registration order, no-oracle
    queries last."""
    specs = load_all()
    window = {n: i for i, n in enumerate(_DRIVER_WINDOW)}
    pos = {n: i for i, n in enumerate(specs)}

    def key(name: str) -> tuple[int, int, int]:
        in_window = window.get(name, len(window))
        has_oracle = 0 if specs[name].oracle else 1
        return (in_window, has_oracle, pos[name])

    return {name: specs[name] for name in sorted(specs, key=key)}


def queries() -> dict[str, QueryFn]:
    return {name: spec.run for name, spec in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in _ordered().items() if spec.oracle}
