"""Round-10 operator tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chronicle_sniffer_spark.plans.round10 import (
    BPE_MERGES,
    BPE_PASSES,
    l4_bpe_encode,
)
from chronicle_sniffer_spark.tables import load_table

SF = "/root/testdata/sf0.01"

_RANK = {m: i for i, m in enumerate(BPE_MERGES)}


def _true_bpe(word: str) -> list[str]:
    """Canonical BPE encode: repeatedly merge ALL occurrences of the
    lowest-ranked pair present, left-to-right non-overlapping."""
    toks = list(word)
    while True:
        best = None
        for i in range(len(toks) - 1):
            r = _RANK.get((toks[i], toks[i + 1]))
            if r is not None and (best is None or r < best):
                best = r
        if best is None:
            return toks
        a, b = BPE_MERGES[best]
        out, i = [], 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out


def _chain(word: str, passes: int = BPE_PASSES) -> list[str]:
    """The operator's replace-chain semantics, in Python (str.replace
    is the same non-overlapping left-to-right scan as Spark's and
    DuckDB's replace)."""
    s = " " + "".join(c + " " for c in word)
    for a, b in BPE_MERGES:
        for _ in range(passes):
            s = s.replace(f" {a} {b} ", f" {a}{b} ")
    return s.split()


def _corpus_words(spark) -> set[str]:
    rows = (
        load_table(spark, SF, "documents")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .distinct()
        .collect()
    )
    return {r.w for r in rows if r.w}


def test_bpe_chain_equals_canonical_encoder_on_corpus(spark):
    """The rank-ordered replace chain must reproduce the canonical
    lowest-rank-first BPE encoder for every corpus word, and
    BPE_PASSES passes must reach each merge's fixpoint (doubling the
    passes changes nothing)."""
    words = _corpus_words(spark)
    assert words, "empty corpus"
    for w in sorted(words):
        assert _chain(w) == _true_bpe(w), w
        assert _chain(w) == _chain(w, BPE_PASSES * 2), f"fixpoint short: {w}"


@pytest.mark.parametrize(
    "word",
    [
        "ererererer",  # run of a merged pair
        "ininin",
        "aaaaaaaa",  # run with no matching merge
        "hashhashhash",  # multi-level merges back to back
        "x",  # single char
        "er",  # exactly one merge
        "rrrooowww",
    ],
)
def test_bpe_chain_equals_canonical_on_adversarial_runs(word):
    assert _chain(word) == _true_bpe(word)
    assert _chain(word) == _chain(word, BPE_PASSES * 2)


def test_bpe_encode_counts_match_python_reference(spark):
    """End-to-end: the Spark entry's per-doc token counts equal the
    Python reference encoder applied per word."""
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, SF, "documents").select("doc_id", "text").collect()
    }
    got = {r.doc_id: r.n_bpe_tokens for r in l4_bpe_encode(spark, SF).collect()}
    for doc_id, text in docs.items():
        want = sum(len(_true_bpe(w)) for w in text.split(" ") if w)
        assert got[doc_id] == want, doc_id


def test_g9_round_is_broadcast_and_exchange_free(spark):
    """The round-12 g9 contract: with the size-gated broadcast hint in
    effect and a dst-partitioned edge cache, one LPA round plans as a
    broadcast-hash join with ZERO shuffle exchanges — the (dst,lbl)
    count and the per-dst argmax both reuse the cache's partitioning
    (the a10b-style plan assert the round-11 verdict asked for)."""
    from chronicle_sniffer_spark.plans.round10 import _lpa_edges, _lpa_round

    from tests.conftest import SF_SMOKE

    und = _lpa_edges(spark, SF_SMOKE).cache()
    labels = (
        und.select(F.col("dst").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("lbl"))
        .localCheckpoint(eager=True)
    )
    r = _lpa_round(und, F.broadcast(labels))
    rows = r.collect()  # finalize the adaptive plan
    assert rows, "a round must relabel every node"
    plan = r._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    # the only shuffle anywhere in the printout may be the edge
    # cache's own explicit REPARTITION_BY_COL (its definition is
    # echoed inside the InMemoryRelation); the round itself must add
    # NO requirement-driven exchange
    assert "ENSURE_REQUIREMENTS" not in plan, plan
    und.unpersist()
