"""Similarity-search queries over ``embeddings`` (array<float>, dim 64).

The LSH queries (sim3/sim4) are fully oracle-checked: hyperplanes are
md5-derived constants (see ``operators/similarity.plane_component``), so the
DuckDB oracle re-derives the identical planes relationally — a rare property
for an LSH implementation, and the strongest correctness guarantee we can
give an approximate index.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import (
    brute_force_topk,
    centroid_semantic_dedup,
    ivf_topk,
    lsh_neardup_pairs,
    lsh_topk,
    threshold_pairs,
)
from .registry import register

# LSH defaults shared by the Spark queries and their oracle SQL. 16 tables x
# 4 planes targets the fixtures' loose neighbors (top-5 cosine ~0.26-0.49);
# measured recall vs exact top-5 is 0.96 (deterministic — planes are hashes).
_L, _P, _DIM = 16, 4, 64

# Relational re-derivation of the md5 hyperplanes + per-table sign buckets.
# DuckDB parses '0x…'-prefixed strings as hex in a BIGINT cast, matching
# Python's int(md5_hex[:8], 16) exactly; 4294967296 = 16^8.
_SIGS_CTE = f"""
    dims AS (SELECT UNNEST(range({_DIM})) AS i),
    tp AS (SELECT t.t, p.p
           FROM (SELECT UNNEST(range({_L})) AS t) t,
                (SELECT UNNEST(range({_P})) AS p) p),
    planes AS (
      SELECT tp.t, tp.p, d.i,
             (('0x' || substr(md5('table' || tp.t || '|plane' || tp.p || '|dim' || d.i), 1, 8))::BIGINT
                / 4294967296.0 - 0.5) AS w
      FROM tp, dims d),
    elems AS (SELECT vec_id, d.i, CAST(embedding[d.i + 1] AS DOUBLE) AS x
              FROM embeddings, dims d),
    dots AS (SELECT e.vec_id, pl.t, pl.p, SUM(e.x * pl.w) AS dot
             FROM elems e JOIN planes pl ON pl.i = e.i
             GROUP BY 1, 2, 3),
    sigs AS (SELECT vec_id, t,
                    CAST(SUM(CASE WHEN dot >= 0 THEN (1 << p) ELSE 0 END) AS INT) AS bucket
             FROM dots GROUP BY 1, 2)
"""


@register(
    "sim1_ann_topk_bruteforce",
    oracle="""
    WITH probes AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS query_vec FROM embeddings WHERE vec_id < 10
    ), scored AS (
      SELECT p.query_id, e.vec_id AS neighbor_id,
             ROUND(list_cosine_similarity(p.query_vec, CAST(e.embedding AS DOUBLE[])), 6) AS cos
      FROM embeddings e CROSS JOIN probes p
      WHERE e.vec_id <> p.query_id
    )
    SELECT query_id, neighbor_id, cos FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, neighbor_id) AS rn
      FROM scored
    ) t WHERE rn <= 5
    """,
    tags=("similarity", "ann"),
    tables=("embeddings",),
)
def sim1_ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for 10 probe vectors: probes broadcast over the
    corpus scan (no corpus shuffle), ranking on rounded cosine for stability.
    The dot product is a Catalyst zip_with/aggregate lambda — JVM-side."""
    emb = spark.table("embeddings")
    probes = emb.filter(F.col("vec_id") < 10)
    return brute_force_topk(emb, probes, k=5)


@register(
    "sim2_embedding_neardup_pairs",
    oracle="""
    SELECT a.vec_id AS id1, b.vec_id AS id2,
           ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS cos
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) >= 0.3
    """,
    tags=("similarity", "dedup", "embedding"),
    tables=("embeddings",),
)
def sim2_embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, exact all-pairs form. O(n²) — kept as
    the small-n correctness baseline; sim4 is the LSH-banded scale path."""
    return threshold_pairs(spark.table("embeddings"), threshold=0.3)


@register(
    "sim3_ann_topk_lsh",
    oracle=f"""
    WITH {_SIGS_CTE},
    cand AS (
      SELECT DISTINCT p.vec_id AS query_id, c.vec_id AS neighbor_id
      FROM sigs c JOIN sigs p ON c.t = p.t AND c.bucket = p.bucket
      WHERE p.vec_id < 10 AND c.vec_id <> p.vec_id),
    scored AS (
      SELECT cand.query_id, cand.neighbor_id,
             ROUND(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                          CAST(n.embedding AS DOUBLE[])), 6) AS cos
      FROM cand
      JOIN embeddings q ON q.vec_id = cand.query_id
      JOIN embeddings n ON n.vec_id = cand.neighbor_id)
    SELECT query_id, neighbor_id, cos FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, neighbor_id) AS rn
      FROM scored
    ) t WHERE rn <= 5
    """,
    tags=("similarity", "ann", "lsh"),
    tables=("embeddings",),
)
def sim3_ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table random-hyperplane LSH top-5 (16 tables × 4 planes,
    OR-amplified): probes only score candidates sharing a bucket in ≥1 table.
    Candidate generation is an equi-join on (table, bucket) — the shape that
    survives a 100 TB corpus where the brute-force cross join cannot.
    Measured recall vs sim1 on the fixtures: 0.96 (asserted in
    tests/test_similarity.py)."""
    emb = spark.table("embeddings")
    probes = emb.filter(F.col("vec_id") < 10)
    return lsh_topk(emb, probes, k=5, n_tables=_L, n_planes=_P, dim=_DIM)


@register(
    "sim4_lsh_neardup_pairs",
    oracle=f"""
    WITH {_SIGS_CTE},
    cand AS (
      SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
      FROM sigs a JOIN sigs b ON a.t = b.t AND a.bucket = b.bucket
      WHERE a.vec_id < b.vec_id)
    SELECT cand.id1, cand.id2,
           ROUND(list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
                                        CAST(y.embedding AS DOUBLE[])), 6) AS cos
    FROM cand
    JOIN embeddings x ON x.vec_id = cand.id1
    JOIN embeddings y ON y.vec_id = cand.id2
    WHERE ROUND(list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
                                       CAST(y.embedding AS DOUBLE[])), 6) >= 0.3
    """,
    tags=("similarity", "dedup", "embedding", "lsh"),
    tables=("embeddings",),
)
def sim4_lsh_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs, LSH-banded scale path: candidates = pairs
    colliding in any of the 16 hash tables (equi-join on (table, bucket)),
    then exact cosine ≥ 0.3. Linear-ish in corpus size per bucket family —
    replaces sim2's O(n²) cross join beyond small n.

    n_planes is PINNED to the oracle's band layout (P=4) here: the static
    SQL above hard-codes 4-plane signatures, and letting the adaptive rule
    (operators/similarity.adaptive_n_planes) pick P at runtime would
    silently flip the shipped plan to P>=5 — and break parity — the moment
    a fixture exceeds the rule's 4096-vector floor. The adaptive default
    stays for rehearsal/production callers; the 10× scale rehearsal, where
    the rule reaches P=8, measures the same operator without an override.
    tests/test_similarity.py additionally asserts every fixture corpus
    still derives P=4, so the pin and the rule cannot drift apart
    unnoticed.

    Past the single-pass frontier (prenormed vectors over the 512 MB
    broadcast budget, ~958k rows at 64-d — where the round-11 1M rehearsal
    measured single-pass to DNF three ways) the operator AUTO-ROUTES
    through ``lsh_neardup_pairs_staged``: bounded per-group materialization,
    set-identical output (pinned in tests). Fixture corpora stay far under
    the frontier, so driver parity always exercises the single-pass plan."""
    return lsh_neardup_pairs(
        spark.table("embeddings"), threshold=0.3, n_tables=_L, n_planes=_P, dim=_DIM
    )


@register(
    "sim5_ann_topk_ivf",
    oracle=None,  # k-means quantizer isn't SQL-expressible; recall vs sim1
    # is asserted in tests/test_similarity.py
    tags=("similarity", "ann", "ivf"),
    tables=("embeddings",),
)
def sim5_ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5: k-means coarse quantizer (16 lists), probes
    score only their 6 nearest lists. The cluster-structured alternative to
    sim3's LSH — candidate fetch is an equi-join on cluster id."""
    emb = spark.table("embeddings")
    probes = emb.filter(F.col("vec_id") < 10)
    return ivf_topk(emb, probes, k=5, n_clusters=16, n_probe=6)


@register(
    "sim6_ivf_indexed_topk",
    oracle=None,  # shares sim5's non-SQL k-means fit; parity with the
    # unindexed path and partition pruning are asserted in tests
    tags=("similarity", "ann", "ivf", "index"),
    tables=("embeddings",),
)
def sim6_ivf_indexed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sim5 against a PERSISTED index: the k-means fit runs once into
    ``build_ivf_index`` (assignments parquet partitioned by cluster id +
    centroids), and the query reads the index — no fit stage, and the scan
    touches only probed ``cl=`` partitions. Index builds lazily per sf_dir
    (keyed by path hash) the first time the query runs; reruns are pure
    queries, which is the production IVF lifecycle."""
    import hashlib
    import os
    import tempfile

    from ..operators.similarity import build_ivf_index, ivf_topk_indexed

    emb = spark.table("embeddings")
    # Key the cache on the SOURCE DATA, not just its path: a regenerated
    # fixture at the same path must not serve a stale index. mtime+size of
    # the parquet file is a cheap content fingerprint.
    src = os.path.join(sf_dir, "embeddings.parquet")
    try:
        st = os.stat(src)
        stamp = f"{st.st_mtime_ns}:{st.st_size}"
    except OSError:
        stamp = "nostat"
    key = hashlib.md5(f"{sf_dir}|{stamp}".encode()).hexdigest()[:12]
    index_dir = os.path.join(tempfile.gettempdir(), f"spark_graft_ivf_{key}")
    # Gate on the LAST-written artifact: build_ivf_index writes assignments
    # then centroids, so a crash between the two leaves assignments/_SUCCESS
    # present but no centroids — gating on centroids/_SUCCESS (and keeping
    # the assignments check for belt-and-braces) means a torn build is
    # simply rebuilt instead of poisoning every later run.
    complete = os.path.exists(
        os.path.join(index_dir, "centroids", "_SUCCESS")
    ) and os.path.exists(os.path.join(index_dir, "assignments", "_SUCCESS"))
    if not complete:
        build_ivf_index(emb, index_dir, n_clusters=16)
    probes = emb.filter(F.col("vec_id") < 10)
    return ivf_topk_indexed(spark, index_dir, probes, k=5, n_probe=6)


@register(
    "dd5_semantic_centroid_dedup",
    oracle="""
    WITH cent AS (
      SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS center
      FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 64),
    cells AS (
      SELECT vid, cid, vec FROM (
        SELECT e.vec_id AS vid, c.cid, CAST(e.embedding AS DOUBLE[]) AS vec,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY ROUND(list_cosine_similarity(
                            CAST(e.embedding AS DOUBLE[]), c.center), 6) DESC,
                          c.cid) AS rn
        FROM embeddings e CROSS JOIN cent c) t
      WHERE rn = 1),
    pairs AS (
      SELECT a.cid, b.vid AS id2
      FROM cells a JOIN cells b ON a.cid = b.cid AND a.vid < b.vid
      WHERE ROUND(list_cosine_similarity(a.vec, b.vec), 6) >= 0.30),
    dupes AS (SELECT cid, COUNT(DISTINCT id2) AS nd FROM pairs GROUP BY cid),
    sizes AS (SELECT cid, COUNT(*) AS n_assigned FROM cells GROUP BY cid)
    SELECT s.cid, s.n_assigned,
           s.n_assigned - COALESCE(d.nd, 0) AS n_survivors,
           COALESCE(d.nd, 0) AS n_dupes
    FROM sizes s LEFT JOIN dupes d ON d.cid = s.cid
    ORDER BY s.cid
    """,
    tags=("similarity", "dedup", "embedding", "ivf"),
    tables=("embeddings",),
)
def dd5_semantic_centroid_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine semantic dedup, IVF-blocked: a deterministic
    hash-sampled coarse quantizer (64 centroids) partitions the corpus; a
    doc survives iff no smaller-id doc in its cell is a near-dup
    (cos >= 0.30) — min-id retention (NOT transitive-greedy; see
    operators/similarity.centroid_semantic_dedup). The quantizer doubles as
    the blocking key, the cluster-structured sibling of sim4's LSH banding.

    The k dial, measured: total cost = assignment (n·k broadcast cosines) +
    pair verification (≈ n²/k), minimized at k ∝ √n. Raising k 8 → 64 on the
    2k-vector fixture cut pair volume 8× yet left wall time flat (6.7 →
    6.5-7.0s) — the fixture sits at the crossover (√2000 ≈ 45). At 100×
    corpus, pair volume dominates and k must grow ~√n (k ≈ 450 at 200k
    vectors), keeping both terms ~n^1.5 — far below the n² of all-pairs.
    Fully SQL-expressible (unlike k-means IVF), so the oracle checks
    quantizer, assignment, and collapse end to end."""
    return centroid_semantic_dedup(
        spark.table("embeddings"), n_centroids=64, threshold=0.30
    )


@register(
    "dd5b_two_level_semantic_dedup",
    oracle="""
    WITH cent AS (
      SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS center
      FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 64),
    sup AS (
      SELECT cid AS sid, center AS sctr
      FROM cent ORDER BY md5(CAST(cid AS VARCHAR)), cid LIMIT 8),
    c2s AS (
      SELECT cid, sid, center FROM (
        SELECT c.cid, s.sid, c.center,
               ROW_NUMBER() OVER (PARTITION BY c.cid
                 ORDER BY ROUND(list_cosine_similarity(c.center, s.sctr), 6)
                          DESC, s.sid) AS rn
        FROM cent c CROSS JOIN sup s) t
      WHERE rn = 1),
    v2s AS (
      SELECT vid, sid, vec FROM (
        SELECT e.vec_id AS vid, s.sid, CAST(e.embedding AS DOUBLE[]) AS vec,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY ROUND(list_cosine_similarity(
                            CAST(e.embedding AS DOUBLE[]), s.sctr), 6)
                          DESC, s.sid) AS rn
        FROM embeddings e CROSS JOIN sup s) t
      WHERE rn = 1),
    cells AS (
      SELECT vid, cid, vec FROM (
        SELECT v.vid, c.cid, v.vec,
               ROW_NUMBER() OVER (PARTITION BY v.vid
                 ORDER BY ROUND(list_cosine_similarity(v.vec, c.center), 6)
                          DESC, c.cid) AS rn
        FROM v2s v JOIN c2s c ON v.sid = c.sid) t
      WHERE rn = 1),
    pairs AS (
      SELECT a.cid, b.vid AS id2
      FROM cells a JOIN cells b ON a.cid = b.cid AND a.vid < b.vid
      WHERE ROUND(list_cosine_similarity(a.vec, b.vec), 6) >= 0.30),
    dupes AS (SELECT cid, COUNT(DISTINCT id2) AS nd FROM pairs GROUP BY cid),
    sizes AS (SELECT cid, COUNT(*) AS n_assigned FROM cells GROUP BY cid)
    SELECT s.cid, s.n_assigned,
           s.n_assigned - COALESCE(d.nd, 0) AS n_survivors,
           COALESCE(d.nd, 0) AS n_dupes
    FROM sizes s LEFT JOIN dupes d ON d.cid = s.cid
    ORDER BY s.cid
    """,
    tags=("similarity", "dedup", "embedding", "ivf", "two-level"),
    tables=("embeddings",),
)
def dd5b_two_level_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dd5 through the PRODUCTION two-level quantizer assignment
    (``operators/similarity.two_level_assign``): ~√k super-centroids are
    hash-sampled FROM the centroid sample, every vector routes to its
    nearest super, then argmax-scores only the centroids in that
    super-cell — ~2·n·√k cosines instead of the flat path's n·k, the fix
    for the round-8-measured wall where 500k×1000 flat assignment did not
    complete (BENCH_LOCAL.md). ``centroid_semantic_dedup`` switches to
    this path automatically at k >= 200 (n ≈ 10⁵ under k ≈ n/500); this
    query pins ``assignment="two_level"`` at fixture scale (k=64, s=8) so
    the DuckDB oracle value-checks every stage of the production path —
    super pick, centroid→super routing, two-hop vector assignment, min-id
    collapse — not just the flat twin dd5 mirrors."""
    return centroid_semantic_dedup(
        spark.table("embeddings"),
        n_centroids=64,
        threshold=0.30,
        assignment="two_level",
    )


@register(
    "sim7_int8_quantized_topk",
    oracle="""
    WITH qe AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
               x -> coalesce(CAST(floor(x * (127.0 / nullif(
                      list_max(list_transform(CAST(embedding AS DOUBLE[]),
                                              y -> abs(y))), 0)) + 0.5) AS INT), 0)) AS qv
      FROM embeddings
    ), qn AS (
      SELECT vec_id, qv,
             CAST(list_dot_product(CAST(qv AS DOUBLE[]),
                                   CAST(qv AS DOUBLE[])) AS BIGINT) AS nn
      FROM qe
    ), scored AS (
      SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST(list_dot_product(CAST(p.qv AS DOUBLE[]),
                                   CAST(c.qv AS DOUBLE[])) AS BIGINT) AS qdot,
             p.nn AS q_nn, c.nn AS c_nn
      FROM qn c CROSS JOIN qn p
      WHERE p.vec_id < 10 AND c.vec_id <> p.vec_id
        AND p.nn > 0 AND c.nn > 0
    )
    SELECT query_id, neighbor_id, qdot, qcos FROM (
      SELECT query_id, neighbor_id, qdot,
             ROUND(qdot / sqrt(CAST(q_nn * c_nn AS DOUBLE)), 6) AS qcos,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY ROUND(qdot / sqrt(CAST(q_nn * c_nn AS DOUBLE)), 6) DESC,
                                         neighbor_id) AS rn
      FROM scored
    ) t WHERE rn <= 5
    """,
    tags=("similarity", "ann", "quantization"),
    tables=("embeddings",),
)
def sim7_int8_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 retrieval over int8-quantized embeddings — the compression dial
    a 100 TB embedding store turns first (4x less IO than float32; scalar
    quantization is the standard first tier before IVF/PQ). Ranking is the
    quantized-vector cosine — a ratio of EXACT integer dots (qdot and the
    two self-dots), so unusually for an ANN-family query it is
    value-oracle-checked with no float-reassociation risk (two
    correctly-rounded IEEE ops over exact integers + the round-to-6 idiom).
    Quantized-vs-exact recall is range-asserted in tests/test_similarity.py
    (0.98 at sf0.001; ranking by the raw scaled dot instead measured 0.68 —
    see the operator docstring).

    Plan shape = sim1: probes broadcast over one corpus scan, integer
    zip_with/aggregate fold JVM-side, per-probe top-5 via row_number —
    TakeOrderedAndProject-style, no corpus shuffle at any width."""
    from ..operators.similarity import quantized_topk

    emb = spark.table("embeddings")
    return quantized_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


@register(
    "sim8_hash_ivf_indexed_topk",
    oracle="""
    WITH cent AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1
                  AS INT) AS cl,
             CAST(embedding AS DOUBLE[]) AS center
      FROM embeddings
      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
      LIMIT 16
    ), assign AS (
      SELECT e.vec_id, c.cl,
             ROW_NUMBER() OVER (
               PARTITION BY e.vec_id
               ORDER BY ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                     c.center), 6) DESC,
                        c.cl) AS rn
      FROM embeddings e CROSS JOIN cent c
    ), cells AS (
      SELECT vec_id, cl FROM assign WHERE rn = 1
    ), short AS (
      SELECT p.vec_id AS query_id, c.cl,
             ROW_NUMBER() OVER (
               PARTITION BY p.vec_id
               ORDER BY ROUND(list_cosine_similarity(CAST(p.embedding AS DOUBLE[]),
                                                     c.center), 6) DESC,
                        c.cl) AS srn
      FROM embeddings p CROSS JOIN cent c
      WHERE p.vec_id < 10
    ), cand AS (
      SELECT s.query_id, m.vec_id AS neighbor_id
      FROM short s JOIN cells m ON m.cl = s.cl
      WHERE s.srn <= 4 AND m.vec_id <> s.query_id
    ), scored AS (
      SELECT cand.query_id, cand.neighbor_id,
             ROUND(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                          CAST(n.embedding AS DOUBLE[])), 6) AS cos
      FROM cand
      JOIN embeddings q ON q.vec_id = cand.query_id
      JOIN embeddings n ON n.vec_id = cand.neighbor_id
    )
    SELECT query_id, neighbor_id, cos FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, neighbor_id) AS rn
      FROM scored
    ) t WHERE rn <= 5
    """,
    tags=("similarity", "ann", "ivf", "index", "deterministic"),
    tables=("embeddings",),
)
def sim8_hash_ivf_indexed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PERSISTED-IVF lifecycle, fully value-oracle-checked: build once
    (hash-sampled deterministic quantizer — dd5's trick — into the same
    partitioned-by-cl layout as sim6), then query with a rounded-cosine
    centroid shortlist + exact re-rank inside probed cells only. sim6 keeps
    the k-means quantizer (tighter cells, no SQL twin — rows-only check);
    sim8 trades cell tightness for end-to-end auditability, so the
    index-build, the cell membership, the shortlist AND the final ranking
    are all pinned bit-for-bit by the DuckDB oracle. Cache keyed on source
    mtime+size; gated on the last-written artifact (centroids/_SUCCESS) so
    a torn build rebuilds instead of poisoning later runs."""
    import hashlib
    import os
    import tempfile

    from ..operators.similarity import build_hash_ivf_index, hash_ivf_topk_indexed

    emb = spark.table("embeddings")
    src = os.path.join(sf_dir, "embeddings.parquet")
    try:
        st = os.stat(src)
        stamp = f"{st.st_mtime_ns}:{st.st_size}"
    except OSError:
        stamp = "nostat"
    key = hashlib.md5(f"hashivf|{sf_dir}|{stamp}".encode()).hexdigest()[:12]
    index_dir = os.path.join(tempfile.gettempdir(), f"spark_graft_hivf_{key}")
    complete = os.path.exists(
        os.path.join(index_dir, "centroids", "_SUCCESS")
    ) and os.path.exists(os.path.join(index_dir, "assignments", "_SUCCESS"))
    if not complete:
        build_hash_ivf_index(emb, index_dir, n_clusters=16)
    probes = emb.filter(F.col("vec_id") < 10)
    return hash_ivf_topk_indexed(spark, index_dir, probes, k=5, n_probe=4)


@register(
    "sim9_two_stage_rerank",
    oracle="""
    WITH qe AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
               x -> coalesce(CAST(floor(x * (127.0 / nullif(
                      list_max(list_transform(CAST(embedding AS DOUBLE[]),
                                              y -> abs(y))), 0)) + 0.5) AS INT), 0)) AS qv
      FROM embeddings
    ), qn AS (
      SELECT vec_id, qv,
             CAST(list_dot_product(CAST(qv AS DOUBLE[]),
                                   CAST(qv AS DOUBLE[])) AS BIGINT) AS nn
      FROM qe
    ), stage1 AS (
      SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(CAST(list_dot_product(CAST(p.qv AS DOUBLE[]),
                                         CAST(c.qv AS DOUBLE[])) AS BIGINT)
                   / sqrt(CAST(p.nn * c.nn AS DOUBLE)), 6) AS qcos
      FROM qn c CROSS JOIN qn p
      WHERE p.vec_id < 10 AND c.vec_id <> p.vec_id
        AND p.nn > 0 AND c.nn > 0
    ), short AS (
      SELECT query_id, neighbor_id, qcos FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY qcos DESC, neighbor_id) AS rn
        FROM stage1
      ) t WHERE rn <= 20
    )
    SELECT query_id, neighbor_id, cos, qcos FROM (
      SELECT s.query_id, s.neighbor_id,
             ROUND(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                          CAST(n.embedding AS DOUBLE[])), 6) AS cos,
             s.qcos,
             ROW_NUMBER() OVER (
               PARTITION BY s.query_id
               ORDER BY ROUND(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                                     CAST(n.embedding AS DOUBLE[])), 6) DESC,
                        s.neighbor_id) AS rn
      FROM short s
      JOIN embeddings q ON q.vec_id = s.query_id
      JOIN embeddings n ON n.vec_id = s.neighbor_id
    ) t WHERE rn <= 5
    """,
    tags=("similarity", "ann", "quantization", "rerank"),
    tables=("embeddings",),
)
def sim9_two_stage_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval, the production ANN serving pattern: an int8
    quantized stage (sim7's exact-integer scoring, 4x fewer scan bytes)
    builds a 20-candidate shortlist per probe, then exact float cosine
    reranks the shortlist to a final top-5. Both stages deterministic, so
    the FULL pipeline — quantize, shortlist, rerank — is value-checked
    against the oracle, shortlist boundary effects included.

    Plan shape: stage 1 = one corpus scan with broadcast probes (sim1's
    shape over int8 arrays); stage 2 joins the corpus scan to the BROADCAST
    shortlist (probes x 20 rows), so full-precision vectors are touched at
    shortlist selectivity only — the scan-bytes story that makes
    quantized-first retrieval the 100 TB default."""
    from ..operators.similarity import two_stage_rerank_topk

    emb = spark.table("embeddings")
    return two_stage_rerank_topk(
        emb, emb.filter(F.col("vec_id") < 10), k=5, shortlist_factor=4
    )


_MMR_N = 20  # shortlist depth feeding the greedy selection
_MMR_K = 8  # diversified results returned per probe
_MMR_NPROBE = 3  # probe vectors (vec_id < 3)


@register(
    "sim10_mmr_diversified_topk",
    oracle=f"""
    WITH RECURSIVE scored0 AS (
      SELECT p.vec_id AS query_id, c.vec_id AS id,
             ROUND(list_cosine_similarity(CAST(p.embedding AS DOUBLE[]),
                                          CAST(c.embedding AS DOUBLE[])), 6)
               AS cos
      FROM embeddings c
      CROSS JOIN (SELECT vec_id, embedding FROM embeddings
                  WHERE vec_id < {_MMR_NPROBE}) p
      WHERE c.vec_id <> p.vec_id
    ), cand AS (
      SELECT query_id, id, CAST(ROUND(cos * 1e6) AS BIGINT) AS rel_i FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos DESC, id) AS rn
        FROM scored0) t
      WHERE rn <= {_MMR_N}
    ), cv AS (
      SELECT c.query_id, c.id, e.embedding FROM cand c
      JOIN embeddings e ON e.vec_id = c.id
    ), sims AS (
      SELECT a.query_id, a.id AS a, b.id AS b,
             CAST(ROUND(ROUND(list_cosine_similarity(
                                CAST(a.embedding AS DOUBLE[]),
                                CAST(b.embedding AS DOUBLE[])), 6)
                        * 1e6) AS BIGINT) AS sim_i
      FROM cv a JOIN cv b ON a.query_id = b.query_id AND a.id <> b.id
    ), sel AS (
      SELECT query_id, 1 AS mmr_rank, id AS doc_id, rel_i,
             7 * rel_i AS mmr_i, [id] AS picked
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY rel_i DESC, id) AS rn
            FROM cand) t WHERE rn = 1
      UNION ALL
      SELECT sel.query_id, sel.mmr_rank + 1, nxt.id, nxt.rel_i, nxt.mmr_i,
             list_append(sel.picked, nxt.id)
      FROM sel, LATERAL (
        SELECT c.id, c.rel_i,
               7 * c.rel_i - 3 * (SELECT MAX(s.sim_i) FROM sims s
                                  WHERE s.query_id = sel.query_id
                                    AND s.a = c.id
                                    AND list_contains(sel.picked, s.b))
                 AS mmr_i
        FROM cand c
        WHERE c.query_id = sel.query_id
          AND NOT list_contains(sel.picked, c.id)
        ORDER BY mmr_i DESC, c.id LIMIT 1) nxt
      WHERE sel.mmr_rank < {_MMR_K}
    )
    SELECT query_id, mmr_rank, doc_id,
           CAST(rel_i AS DOUBLE) / 1e6 AS rel,
           CAST(mmr_i AS DOUBLE) / 1e7 AS mmr
    FROM sel ORDER BY query_id, mmr_rank
    """,
    tags=("similarity", "ann", "diversity", "serving", "applyInPandas"),
    tables=("embeddings",),
)
def sim10_mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified top-8 for 3 probes (λ = 0.7 as the integer pair
    7/3, shortlist 20): the serving-side diversity re-ranker — tx19's RRF
    fuses rankings across retrieval legs, MMR de-duplicates WITHIN a slate
    so four near-copies of the best hit don't fill it. The greedy argmax
    chain is inherently sequential, so it runs as one Arrow-batched
    ``applyInPandas`` group per probe over exact BIGINT micro-unit scores
    (the oracle replays the same integer greedy as a recursive CTE with a
    LATERAL per-step argmax — both engines agree to the last bit,
    including id tie-breaks). Everything distributed stays JVM-side:
    probe-broadcast corpus scan for the shortlist, broadcast-shortlist
    vector fetch, broadcast pairwise self-join bounded at shortlist² rows
    per probe (plan-guarded: no cartesian, no sort-merge join; the one
    Python group's state is ≤ 400 int64s regardless of corpus size)."""
    from ..operators.similarity import mmr_topk

    emb = spark.table("embeddings")
    probes = emb.filter(F.col("vec_id") < _MMR_NPROBE)
    return mmr_topk(emb, probes, k=_MMR_K, shortlist=_MMR_N).orderBy(
        "query_id", "mmr_rank"
    )


# --- sim5x/sim6x: the k-means IVF stages, driver-VALUE-checked ---------------
# The mlx5/mlx6 persist pattern applied to the similarity index: the KMeans
# FIT itself has no ANSI twin (the reason sim5/sim6 are rows-only), but the
# fitted index IS a parquet artifact, and everything downstream of it —
# cell membership, the distance shortlist, the in-cell cosine re-rank —
# is deterministic and SQL-expressible. Persist the index ONCE under a
# STATIC path (stamp-cached on the source parquet), then register the
# consuming stages whose oracles read the SAME artifact. Only the raw fit
# remains range-gated (tests/test_similarity.py recall bars).
_KIVF_DIR = os.path.join(tempfile.gettempdir(), "spark_graft_kivf")


def _ensure_kivf_index(spark: SparkSession, sf_dir: str) -> None:
    """Stamp-cached build of the PRODUCTION k-means index
    (``build_ivf_index``: seed-pinned fit + partitioned-by-cl assignments +
    centroids) at the static oracle-readable path. Gated on the
    last-written artifact (centroids/_SUCCESS) plus a source stamp so a
    torn build or a regenerated fixture rebuilds instead of serving stale
    cells — the sim6/mlx5 gating rules combined."""
    import os

    from ..operators.similarity import build_ivf_index
    from .queries_mlx import _source_stamp

    stamp = "kivf|" + _source_stamp(sf_dir, "embeddings")
    stamp_path = os.path.join(_KIVF_DIR, "_STAMP")
    complete = os.path.exists(
        os.path.join(_KIVF_DIR, "centroids", "_SUCCESS")
    ) and os.path.exists(os.path.join(_KIVF_DIR, "assignments", "_SUCCESS"))
    if complete and os.path.exists(stamp_path):
        try:
            with open(stamp_path) as f:
                if f.read() == stamp:
                    return
        except OSError:
            pass
    build_ivf_index(spark.table("embeddings"), _KIVF_DIR, n_clusters=16)
    with open(stamp_path, "w") as f:
        f.write(stamp)


@register(
    "sim5x_kmeans_cell_profile",
    oracle=f"""
    SELECT CAST(cl AS INT) AS cl,
           COUNT(*) AS n_assigned,
           CAST(SUM(neighbor_id) AS BIGINT) AS id_sum,
           ROUND(CAST(SUM(CAST(cn AS DECIMAL(18,6))) AS DOUBLE), 6) AS cn_sum
    FROM read_parquet('{_KIVF_DIR}/assignments/*/*.parquet',
                      hive_partitioning = 1)
    GROUP BY cl ORDER BY cl
    """,
    tags=("similarity", "ivf", "kmeans", "persisted", "mlx-pattern"),
    tables=("embeddings",),
)
def sim5x_kmeans_cell_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The k-means assignment ARTIFACT, driver-value-checked: the fitted
    index persists once (seed-pinned KMeans, production ``build_ivf_index``
    layout), and BOTH engines profile the same assignments parquet —
    per-cell row count, exact id checksum, and a decimal-exact norm sum. A
    drift in cell membership, a torn partition write, or a norm
    recomputation bug desyncs the hash; only the fit's internal math stays
    range-gated. Scale posture: one partial/final agg over the partitioned
    index — the same layout a 100 TB corpus queries through DPP (sim6)."""
    _ensure_kivf_index(spark, sf_dir)
    a = spark.read.parquet(f"{_KIVF_DIR}/assignments")
    return (
        a.groupBy(F.col("cl").cast("int").alias("cl"))
        .agg(
            F.count(F.lit(1)).alias("n_assigned"),
            F.sum("neighbor_id").alias("id_sum"),
            F.round(
                F.sum(F.col("cn").cast("decimal(18,6)")).cast("double"), 6
            ).alias("cn_sum"),
        )
        .orderBy("cl")
    )


@register(
    "sim6x_kmeans_query_stage",
    oracle=f"""
    WITH cent AS (
      SELECT CAST(cl AS INT) AS cl, center
      FROM read_parquet('{_KIVF_DIR}/centroids/*.parquet')
    ), cells AS (
      SELECT neighbor_id, CAST(vec AS DOUBLE[]) AS vec, CAST(cl AS INT) AS cl
      FROM read_parquet('{_KIVF_DIR}/assignments/*/*.parquet',
                        hive_partitioning = 1)
    ), short AS (
      SELECT query_id, cl FROM (
        SELECT p.vec_id AS query_id, c.cl,
               ROW_NUMBER() OVER (
                 PARTITION BY p.vec_id
                 ORDER BY ROUND(list_sum(list_transform(range(0, 64),
                            i -> (CAST(p.embedding[i + 1] AS DOUBLE) - c.center[i + 1])
                               * (CAST(p.embedding[i + 1] AS DOUBLE) - c.center[i + 1]))),
                          6) ASC, c.cl) AS srn
        FROM embeddings p CROSS JOIN cent c
        WHERE p.vec_id < 10) t
      WHERE srn <= 6
    ), scored AS (
      SELECT s.query_id, m.neighbor_id,
             ROUND(list_cosine_similarity(CAST(p.embedding AS DOUBLE[]), m.vec), 6)
               AS cos
      FROM short s
      JOIN cells m ON m.cl = s.cl AND m.neighbor_id <> s.query_id
      JOIN embeddings p ON p.vec_id = s.query_id
    )
    SELECT query_id, neighbor_id, cos FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, neighbor_id) AS rn
      FROM scored
    ) t WHERE rn <= 5
    """,
    tags=("similarity", "ivf", "kmeans", "persisted", "mlx-pattern"),
    tables=("embeddings",),
)
def sim6x_kmeans_query_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sim6's QUERY stage over the persisted k-means index,
    driver-value-checked end to end: given the fitted centroids + cell
    assignments (the artifact sim5x pins), the distance shortlist
    (round-6 squared L2, cl tie-break — `_ivf_query`'s production
    ordering), the probed-cells-only candidate join, and the cosine top-5
    are all re-derived relationally by the oracle from the SAME artifact.
    Together with sim5x this closes the last two rows-only non-ML registry
    entries down to the KMeans fit itself (range-gated recall in
    tests/test_similarity.py). The Spark side is the exact production read
    path (``ivf_topk_indexed``), dynamic-partition-pruned on cl."""
    from ..operators.similarity import ivf_topk_indexed

    _ensure_kivf_index(spark, sf_dir)
    probes = spark.table("embeddings").filter(F.col("vec_id") < 10)
    return ivf_topk_indexed(spark, _KIVF_DIR, probes, k=5, n_probe=6)
