"""Candidate-filter losslessness for the n-gram Jaccard join.

The prefix filter and the PPJoin positional filter
(operators/dedup.py) prune candidate pairs using proven bounds; a
wrong bound silently DROPS true near-dup pairs while every other
check still passes (the oracle at sf0.01 exercises one corpus shape
only).  These tests compare the filtered pipeline against brute-force
all-pairs Jaccard on adversarial corpora: heavy shared vocabulary,
skewed doc lengths, exact duplicates, and threshold-boundary pairs.
"""

from __future__ import annotations

import itertools

import pytest

from chronicle_sniffer_spark.operators.dedup import ngram_jaccard_pairs

N = 3


def _grams(text: str) -> set[str]:
    w = text.split(" ")
    if len(w) <= N - 1:
        return {" ".join(w[0:N])}
    return {" ".join(w[i : i + N]) for i in range(len(w) - N + 1)}


def _brute_force(rows: list[tuple[int, str]], threshold: float) -> set[tuple[int, int, float]]:
    out = set()
    for (ida, ta), (idb, tb) in itertools.combinations(sorted(rows), 2):
        ga, gb = _grams(ta), _grams(tb)
        j = round(len(ga & gb) / len(ga | gb), 6)
        if j >= threshold:
            out.add((ida, idb, j))
    return out


def _corpus_shared_vocab() -> list[tuple[int, str]]:
    # 26-word vocabulary, 40-word docs: near-worst case for an
    # inverted index (every gram is frequent)
    vocab = [chr(ord("a") + i) for i in range(26)]
    rows = []
    for d in range(60):
        words = [vocab[(d * 7 + i * (1 + d % 3)) % 26] for i in range(40)]
        rows.append((d, " ".join(words)))
    # exact duplicate + one-word edit (boundary-ish pair)
    rows.append((100, rows[0][1]))
    rows.append((101, rows[0][1].replace(" ", " z ", 1)))
    return rows


def _corpus_skewed_lengths() -> list[tuple[int, str]]:
    rows = []
    for d in range(30):
        length = 5 + 10 * (d % 7)  # 5..65 words
        words = [f"w{(d + i) % 9}" for i in range(length)]
        rows.append((d, " ".join(words)))
    return rows


@pytest.mark.parametrize("threshold", [0.3, 0.5, 0.8])
@pytest.mark.parametrize("corpus", [_corpus_shared_vocab, _corpus_skewed_lengths])
def test_filtered_join_equals_brute_force(spark, corpus, threshold):
    rows = corpus()
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in ngram_jaccard_pairs(docs, n=N, threshold=threshold, max_df=10**6).collect()
    }
    assert got == _brute_force(rows, threshold)


def test_max_df_cap_only_reduces_recall(spark):
    # the df cap is a skew guard: it may drop pairs but must never
    # invent or mis-score one
    rows = _corpus_shared_vocab()
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    capped = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in ngram_jaccard_pairs(docs, n=N, threshold=0.5, max_df=3).collect()
    }
    assert capped <= _brute_force(rows, 0.5)


def test_connected_components_known_graphs(spark):
    from chronicle_sniffer_spark.operators.dedup import connected_components

    # chain 1-2-3-4 (diameter 3: needs multiple rounds), clique {10,11,12},
    # pair {20,21}; singletons never appear in pairs, so never in output
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "doc_a long, doc_b long",
    )
    got = {(r.node, r.label) for r in connected_components(pairs).collect()}
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10), (12, 10),
        (20, 20), (21, 20),
    }


def test_connected_components_raises_when_iter_capped(spark):
    import pytest as _pytest

    from chronicle_sniffer_spark.operators.dedup import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "doc_a long, doc_b long"
    )
    with _pytest.raises(RuntimeError, match="not converged"):
        connected_components(chain, max_iter=2)


def test_connected_components_long_chain_uses_star_switch(spark):
    """A 120-node chain has diameter 119: pure min-label propagation
    would need ~119 rounds, far past max_iter=30 — so a correct
    result proves the large-star/small-star switch engaged and
    converged logarithmically."""
    from chronicle_sniffer_spark.operators.dedup import connected_components

    n = 120
    chain = spark.createDataFrame(
        [(i + 1, i) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    got = {(r.node, r.label) for r in connected_components(chain, max_iter=30).collect()}
    assert got == {(i, 0) for i in range(n)}


def test_star_components_match_union_find_on_random_graphs(spark):
    """Property check: _star_components labels == a driver-side
    union-find on seeded random graphs (mix of chains, cliques,
    stars, isolated edges)."""
    import random

    from pyspark.sql import functions as F

    from chronicle_sniffer_spark.operators.dedup import _star_components

    rng = random.Random(7)
    for trial in range(3):
        nodes = list(range(60))
        edges = set()
        for _ in range(70):
            a, b = rng.sample(nodes, 2)
            edges.add((max(a, b), min(a, b)))
        parent = {v: v for v in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            parent[find(a)] = find(b)
        touched = {v for e in edges for v in e}
        want = {}
        for v in touched:
            root = find(v)
            want.setdefault(root, []).append(v)
        expected = {
            (v, min(members)) for members in want.values() for v in members
        }
        e_df = spark.createDataFrame(sorted(edges), "u long, v long")
        got = {(r.node, r.label) for r in _star_components(e_df).collect()}
        assert got == expected, f"trial {trial}"


# ---------------------------------------------------------------------------
# embedding near-dup: corpus-derived threshold margin
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf_dir", [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
])
def test_embedding_threshold_robust_at_every_sf(spark, sf_dir):
    """The corpus-derived c-sigma cutoff must be non-vacuous (both
    sides populated) and selective (<0.1% of pairs) at every shipped
    scale factor — the properties the old 0.45 literal lost as the
    noise ceiling rose with SF (max sim 0.48 → 0.51 → 0.60)."""
    from pyspark.sql import functions as F

    from chronicle_sniffer_spark.operators.similarity import (
        cosine_sims,
        robust_sigma_threshold,
    )
    from chronicle_sniffer_spark.tables import load_table

    sims = cosine_sims(load_table(spark, sf_dir, "embeddings")).cache()
    try:
        thr = robust_sigma_threshold(sims).first()["thr"]
        # the derivation tracks the (stable) noise distribution, not SF
        assert 0.3 < thr < 0.6, f"{sf_dir}: threshold {thr} outside sane band"
        n_above = sims.filter(F.col("sim") >= thr).count()
        n_total = sims.count()
        assert n_above > 0, f"{sf_dir}: vacuous threshold (no pairs above)"
        assert n_above < n_total * 0.001, f"{sf_dir}: {n_above}/{n_total} above — not selective"
    finally:
        sims.unpersist()
