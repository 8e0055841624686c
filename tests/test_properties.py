"""Property-based tests (hypothesis): invariants that hold for ALL inputs,
complementing the fixture-pinned oracle suite. Each example runs Spark jobs,
so example counts are small and deadlines disabled — the value is the input
diversity (adversarial graphs and token distributions the fixtures never
produce), not volume.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


class _UnionFind:
    def __init__(self):
        self.parent = {}

    def find(self, x):
        self.parent.setdefault(x, x)
        while self.parent[x] != x:
            self.parent[x] = self.parent[self.parent[x]]
            x = self.parent[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[max(ra, rb)] = min(ra, rb)


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_connected_components_equals_union_find(spark, edges):
    """For ANY graph, the distributed label propagation must produce exactly
    the partition a sequential union-find produces (component = min id)."""
    from trafficanalysisbigdata_spark.operators.components import (
        connected_components,
    )

    uf = _UnionFind()
    for a, b in edges:
        uf.union(a, b)
    # union-find roots are not guaranteed minimal per component; normalize
    groups: dict = {}
    for a, b in edges:
        for v in (a, b):
            groups.setdefault(uf.find(v), set()).add(v)
    want = {v: min(g) for g in groups.values() for v in g}

    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "doc1 long, doc2 long"
    )
    got = {r.v: r.component for r in connected_components(df).collect()}
    assert got == want


@given(
    token_counts=st.lists(st.integers(0, 40), min_size=1, max_size=30),
    seq_len=st.integers(4, 64),
)
@settings(**_SETTINGS)
def test_pack_sequences_invariants(spark, token_counts, seq_len):
    """For ANY corpus: token mass is conserved, per-shard offsets are a
    gapless cumulative sum in doc_id order, sequence ids are consistent with
    offsets, and straddle flags match the boundary arithmetic."""
    from trafficanalysisbigdata_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * k) if k else "") for i, k in enumerate(token_counts)],
        "doc_id long, text string",
    )
    rows = pack_sequences(docs, seq_len=seq_len, n_shards=4).collect()
    # whitespace split of "" yields [''] → 1 token; mirror that here
    expect_tokens = sum(max(k, 1) for k in token_counts)
    assert sum(r.n_tokens for r in rows) == expect_tokens

    by_shard: dict = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r.doc_id)
        off = 0
        for r in shard_rows:
            assert r.start_off == off
            assert r.seq_id == r.start_off // seq_len
            assert r.end_seq == (r.start_off + r.n_tokens - 1) // seq_len
            assert r.straddles == int(r.end_seq > r.seq_id)
            off += r.n_tokens
