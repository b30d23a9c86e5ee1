"""Property tests (hypothesis): the set-similarity join operators'
exactness and candidate-losslessness bounds on RANDOM corpora — the
fixed-fixture tests in test_round8.py/test_dedup_filters.py pin known
cases; these hunt for corpus shapes that break the prefix-filter
bounds (the proofs in operators/dedup.py docstrings).

One Spark action per hypothesis example is expensive, so examples are
few but each is a full end-to-end check against a python brute force.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

N = 3  # gram size, matches the catalog constant

# small vocabulary forces heavy gram collisions — the adversarial
# regime for prefix filters; doc lengths straddle the gram boundary
words = st.sampled_from([f"w{i}" for i in range(12)])
doc = st.lists(words, min_size=1, max_size=12).map(" ".join)
corpus = st.lists(doc, min_size=2, max_size=10)


def _gram_sets(texts: list[str]) -> dict[int, frozenset]:
    out = {}
    for i, t in enumerate(texts):
        ws = t.split(" ")
        out[i] = frozenset(
            " ".join(ws[j : j + N]) for j in range(max(len(ws) - N + 1, 1))
        )
    return out


def _df(gsets: dict[int, frozenset]) -> dict[str, int]:
    df: dict[str, int] = {}
    for gs in gsets.values():
        for g in gs:
            df[g] = df.get(g, 0) + 1
    return df


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=corpus)
def test_jaccard_pairs_match_bruteforce_on_random_corpora(spark, texts):
    """With the cap disabled (max_df_pct=100), ngram_jaccard_pairs
    must equal the brute-force pair set exactly: the prefix +
    positional filters may only prune BELOW-threshold pairs."""
    from chronicle_sniffer_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, n=N, threshold=0.5, max_df_pct=100).collect()
    }
    gsets = _gram_sets(texts)
    expect = {}
    ids = sorted(gsets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(gsets[a] & gsets[b])
            if not inter:
                continue
            j = round(inter / (len(gsets[a]) + len(gsets[b]) - inter), 6)
            if j >= 0.5:
                expect[(a, b)] = j
    assert got == expect


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=corpus)
def test_containment_pairs_match_bruteforce_on_random_corpora(spark, texts):
    """Same exactness property for the asymmetric containment join,
    including its index-side-only prefix filter."""
    from chronicle_sniffer_spark.operators.dedup import containment_pairs

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b): r.containment
        for r in containment_pairs(docs, n=N, threshold=0.8, max_df_pct=100).collect()
    }
    gsets = _gram_sets(texts)
    expect = {}
    ids = sorted(gsets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(gsets[a] & gsets[b])
            if not inter:
                continue
            c = round(inter / min(len(gsets[a]), len(gsets[b])), 6)
            if c >= 0.8:
                expect[(a, b)] = c
    assert got == expect


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=corpus)
def test_containment_pairs_capped_regime_subset_and_exact_scores(spark, texts):
    """With an aggressive df cap ACTIVE, the prefix index may lose
    candidates (the audited recall budget) but must never invent or
    mis-score a pair: got ⊆ brute-force, every reported score exact.
    This exercises the exact capped-common credit path (stage 2 of
    the positional bound, operators/dedup.py:containment_pairs) —
    on this 12-word vocabulary most grams blow through the cap, so
    the credit joins are live, not vacuous."""
    from chronicle_sniffer_spark.operators.dedup import containment_pairs

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b): r.containment
        for r in containment_pairs(docs, n=N, threshold=0.8, max_df=2).collect()
    }
    gsets = _gram_sets(texts)
    expect = {}
    ids = sorted(gsets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(gsets[a] & gsets[b])
            if not inter:
                continue
            c = round(inter / min(len(gsets[a]), len(gsets[b])), 6)
            if c >= 0.8:
                expect[(a, b)] = c
    assert set(got) <= set(expect)
    for pair, score in got.items():
        assert score == expect[pair]


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=corpus)
def test_connected_components_match_union_find_on_random_graphs(spark, texts):
    """CC over the (uncapped) jaccard pair graph equals a python
    union-find over the same pairs — min label per component, every
    incident node labeled."""
    from chronicle_sniffer_spark.operators.dedup import (
        connected_components,
        ngram_jaccard_pairs,
    )

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    pairs_df = ngram_jaccard_pairs(docs, n=N, threshold=0.5, max_df_pct=100)
    pairs = [(r.doc_a, r.doc_b) for r in pairs_df.collect()]
    got = {
        r.node: r.label for r in connected_components(pairs_df).collect()
    }
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {}
    for a, b in pairs:
        for n_ in (a, b):
            expect[n_] = find(n_)
    assert got == expect


# the fuzzy join's title alphabet: short words over few letters makes
# near-threshold edit distances (the adversarial regime for the char
# count filter and the positional q-gram bound) common
_fuzzy_word = st.text(alphabet="abc", min_size=1, max_size=5)
_fuzzy_doc = st.lists(_fuzzy_word, min_size=3, max_size=6).map(" ".join)
_fuzzy_corpus = st.lists(_fuzzy_doc, min_size=2, max_size=12)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_fuzzy_corpus)
def test_fuzzy_join_matches_bruteforce_on_random_corpora(spark, texts):
    """l2_fuzzy_title_join's filter stack (length band, char count
    filter, positional q-gram bound via the Arrow UDF, banded
    threshold levenshtein) must reproduce the brute-force within-block
    pair set EXACTLY — every filter claims to be lossless."""
    import os
    import tempfile

    from chronicle_sniffer_spark.plans.coverage5 import (
        FUZZY_LEV_MAX,
        l2_fuzzy_title_join,
    )

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    titles = {}
    for i, t in enumerate(texts):
        ws = t.split(" ")
        titles[i] = (" ".join(ws[:3]), ws[0])
    want = {}
    for i in titles:
        for j in titles:
            if i < j and titles[i][1] == titles[j][1]:
                d = lev(titles[i][0], titles[j][0])
                if d <= FUZZY_LEV_MAX:
                    want[(i, j)] = d

    # the entry reads documents.parquet from a directory — stage one
    with tempfile.TemporaryDirectory(prefix="css_fuzzy_prop_") as tmp:
        docs = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        docs.write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
        got = {
            (r.doc_a, r.doc_b): r.dist
            for r in l2_fuzzy_title_join(spark, tmp).collect()
        }
    assert got == want
