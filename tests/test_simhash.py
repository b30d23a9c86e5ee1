"""SimHash banded-join completeness (operators/simhash.py).

The banded candidate join prunes pairs; the pigeonhole argument says
no pair within the hamming threshold can be lost.  These tests verify
that against brute-force all-pairs on adversarial corpora — near-dup
chains, exact duplicates, and documents engineered to differ right at
the threshold — plus the Python-side fingerprint parity that the
DuckDB oracle (plans/dedup_sim.py::l2_simhash_pairs) checks at corpus
scale.
"""

from __future__ import annotations

import hashlib

import pytest

from chronicle_sniffer_spark.operators.simhash import (
    SIMHASH_BITS,
    SIMHASH_MAX_HAMMING,
    simhash_fingerprints,
    simhash_pairs,
)


def _py_simhash(text: str) -> int:
    """Independent Python reimplementation of the fingerprint."""
    toks = [t for t in text.lower().split(" ") if t]
    votes = [0] * SIMHASH_BITS
    for t in toks:
        h = hashlib.md5(t.encode()).hexdigest()
        nibs = [int(c, 16) for c in h[:16]]
        for i in range(SIMHASH_BITS):
            bit = (nibs[i // 4] >> (i % 4)) & 1
            votes[i] += 1 if bit else -1
    fp = 0
    for i, v in enumerate(votes):
        if v > 0:
            fp |= 1 << i
    return fp


CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
    (3, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    (4, "completely different vocabulary about spark physical plans"),
    (5, "completely different vocabulary about spark logical plans"),
    (6, "unrelated text mentioning neither animals nor query engines"),
]


def test_fingerprint_matches_python_oracle(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {r.doc_id: r.fp for r in simhash_fingerprints(df).collect()}
    for doc_id, text in CORPUS:
        assert got[doc_id] == _py_simhash(text), doc_id


def test_banded_join_equals_brute_force(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {(r.doc_a, r.doc_b, r.hamming) for r in simhash_pairs(df).collect()}
    fps = {d: _py_simhash(t) for d, t in CORPUS}
    ids = sorted(fps)
    want = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ham = bin(fps[a] ^ fps[b]).count("1")
            if ham <= SIMHASH_MAX_HAMMING:
                want.add((a, b, ham))
    assert got == want
    assert (3, None) not in got  # sanity: tuple shape
    assert any(h == 0 for _, _, h in got)  # the exact dup survives banding


def test_empty_and_tokenless_docs_excluded(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "real text here")], "doc_id long, text string"
    )
    fps = simhash_fingerprints(df).collect()
    assert {r.doc_id for r in fps} == {3}
