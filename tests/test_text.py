"""Text-analysis semantics on planted corpora (the fixture-independent
checks; oracle parity for the tx family lives in test_oracle_parity.py)."""

from __future__ import annotations


def test_heaps_beta_separates_saturating_from_growing_vocab(spark):
    """tx17's fitness signal on planted corpora: a template source that
    recycles the same 10 tokens saturates (beta near 0), a source whose
    every doc introduces new vocabulary keeps growing (beta near 1), and
    the first-seen decomposition's totals must equal the true per-source
    distinct-token counts."""
    from trafficanalysisbigdata_spark.plans.registry import load_all

    rows = []
    for d in range(12):
        rows.append(
            (d, "saturated", " ".join(f"t{i % 10:02d}" for i in range(d, d + 20)))
        )
    for d in range(12, 24):
        rows.append((d, "growing", " ".join(f"g{d:02d}x{i:02d}" for i in range(20))))
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    docs.createOrReplaceTempView("documents")
    try:
        out = {
            r.source: r
            for r in load_all()["tx17_heaps_vocab_growth"].fn(spark, "").collect()
        }
    finally:
        spark.catalog.dropTempView("documents")
    assert out["saturated"].n_vocab == 10
    assert out["growing"].n_vocab == 12 * 20
    assert out["saturated"].heaps_beta < 0.1
    assert out["growing"].heaps_beta > 0.9
    assert out["saturated"].n_tokens == 12 * 20 and out["growing"].n_tokens == 12 * 20
