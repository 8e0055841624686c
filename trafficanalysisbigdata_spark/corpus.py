"""User-facing facade for the training-data surface: one object = one
document corpus (+ optional embedding table) and the LLM-pipeline catalog
over it — the switch-over API for a data-curation team, sibling to
``api.TrafficAnalytics`` for the reference's analytics workflow.

Every method delegates to the same registered, oracle-checked queries the
driver verifies (via a pinned temp-view binding), so the facade adds zero
logic and inherits the full correctness trail. All results are lazy
DataFrames; callers decide what to materialize.

    cp = CorpusPipeline.from_parquet(spark, "/lake/sf0.01")
    cp.exact_dedup().show()       # dd1: hash-groupBy summary
    cp.near_dups().show()         # dd2: MinHash-LSH + verify
    cp.span_dedup().show()        # dd7: duplicated 5-gram spans per doc
    cp.ingest_gate().show()       # dd8: new-batch-vs-corpus report
    cp.decontaminate().show()     # pipe5: train/eval overlap
    cp.training_mix().show()      # pipe7: temperature-resampled mix
    cp.shard_manifest().show()    # pipe8: per-shard token budgets
    cp.pack_sequences().show()    # pipe6: 2048-token packing audit
    cp.funnel().show()            # pipe1: end-to-end corpus funnel
    cp.ann_topk(cp.embeddings.limit(10))   # exact top-k retrieval
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .session import prep


class CorpusPipeline:
    """One instance = one (documents, embeddings) pair + the registered
    LLM-pipeline queries over it."""

    def __init__(self, documents: DataFrame, embeddings: DataFrame | None = None):
        self.documents = documents
        self.embeddings = embeddings
        self._spark: SparkSession = documents.sparkSession
        prep(self._spark)

    @classmethod
    def from_parquet(cls, spark: SparkSession, lake_dir: str) -> "CorpusPipeline":
        """documents.parquet (+ embeddings.parquet if present) from a lake
        directory — the fixture layout and any layout like it."""
        import os

        from .io import load_table

        docs = load_table(spark, lake_dir, "documents")
        emb = None
        if os.path.exists(os.path.join(lake_dir, "embeddings.parquet")):
            emb = load_table(spark, lake_dir, "embeddings")
        return cls(docs, emb)

    # -- plumbing ----------------------------------------------------------

    def _run(self, qname: str) -> DataFrame:
        """Bind this corpus as the registry's view set and run a registered
        query — the facade's only mechanism, so every method below carries
        the same oracle trail as the driver's checks."""
        from .plans.registry import load_all

        self.documents.createOrReplaceTempView("documents")
        if self.embeddings is not None:
            self.embeddings.createOrReplaceTempView("embeddings")
        return load_all()[qname].fn(self._spark, "")

    # -- dedup family ------------------------------------------------------

    def exact_dedup(self) -> DataFrame:
        return self._run("dd1_exact_dedup")

    def near_dups(self) -> DataFrame:
        return self._run("dd2_minhash_lsh")

    def simhash_groups(self) -> DataFrame:
        return self._run("dd3_simhash_groups")

    def jaccard_pairs(self) -> DataFrame:
        return self._run("dd4_ngram_jaccard")

    def dedup_components(self) -> DataFrame:
        return self._run("dd6_dedup_components")

    def span_dedup(self) -> DataFrame:
        return self._run("dd7_duplicate_spans")

    def ingest_gate(self) -> DataFrame:
        return self._run("dd8_incremental_dedup")

    # -- quality / text ----------------------------------------------------

    def quality_by_source(self) -> DataFrame:
        return self._run("tx2_quality_by_source")

    def repetition_filter(self) -> DataFrame:
        return self._run("tx11_repetition_filter")

    def boilerplate_share(self) -> DataFrame:
        return self._run("tx9_boilerplate_share")

    # -- pipeline composites -----------------------------------------------

    def funnel(self) -> DataFrame:
        return self._run("pipe1_pretrain_funnel")

    def decontaminate(self) -> DataFrame:
        return self._run("pipe5_decontaminate")

    def pack_sequences(self) -> DataFrame:
        return self._run("pipe6_sequence_pack")

    def training_mix(self) -> DataFrame:
        return self._run("pipe7_temperature_resample")

    def shard_manifest(self) -> DataFrame:
        return self._run("pipe8_shard_manifest")

    # -- similarity (requires embeddings) ----------------------------------

    def _need_embeddings(self) -> DataFrame:
        if self.embeddings is None:
            raise ValueError("this CorpusPipeline was built without embeddings")
        return self.embeddings

    def ann_topk(self, probes: DataFrame, k: int = 5) -> DataFrame:
        """Exact cosine top-k (brute force — the small-probe-set path)."""
        from .operators.similarity import brute_force_topk

        return brute_force_topk(self._need_embeddings(), probes, k=k)

    def ann_topk_quantized(self, probes: DataFrame, k: int = 5) -> DataFrame:
        """int8-quantized retrieval (sim7's 4x-less-IO path)."""
        from .operators.similarity import quantized_topk

        return quantized_topk(self._need_embeddings(), probes, k=k)

    def ann_topk_reranked(
        self, probes: DataFrame, k: int = 5, shortlist_factor: int = 4
    ) -> DataFrame:
        """Two-stage serving retrieval: int8 shortlist -> exact rerank
        (sim9 — the production pattern for a quantized store)."""
        from .operators.similarity import two_stage_rerank_topk

        return two_stage_rerank_topk(
            self._need_embeddings(), probes, k=k, shortlist_factor=shortlist_factor
        )

    def semantic_dedup(self, n_centroids: int = 8, threshold: float = 0.30) -> DataFrame:
        from .operators.similarity import centroid_semantic_dedup

        return centroid_semantic_dedup(
            self._need_embeddings(), n_centroids=n_centroids, threshold=threshold
        )

    def minhash_calibration(self) -> DataFrame:
        """Per-agreement-bucket error profile of the MinHash estimator over
        the banded candidate pairs (dd9) — run this before trusting a
        threshold on the ESTIMATE to delete data."""
        return self._run("dd9_minhash_calibration")

    def frame_dedup(self) -> DataFrame:
        """Cross-asset duplicated-frame report for video content (mm9)."""
        return self._run("mm9_frame_dedup")

    def scene_changes(self) -> DataFrame:
        """Per-video shot segmentation by frame-delta energy (mm10)."""
        return self._run("mm10_scene_changes")

    def zipf_profile(self) -> DataFrame:
        """Per-language Zipf-slope corpus fingerprint (tx12)."""
        return self._run("tx12_zipf_slope")


__all__ = ["CorpusPipeline"]
