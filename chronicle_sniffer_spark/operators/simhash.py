"""SimHash near-duplicate detection (the L2 dedup family's third
fingerprint, next to MinHash/LSH and n-gram Jaccard).

Charikar's scheme over word tokens: every token hashes to 64 bits;
each fingerprint bit is the sign of the per-bit +1/-1 vote sum across
the document's tokens; documents whose fingerprints differ in at most
``SIMHASH_MAX_HAMMING`` bits are near-duplicates.

Scale shape (100 TB): fingerprints are pure per-row column
expressions — no shuffle, no UDF.  The pair search is a banded
equi-join, never all-pairs: a fingerprint splits into
``SIMHASH_BANDS`` contiguous bit bands, and by pigeonhole a pair
within hamming distance ``SIMHASH_MAX_HAMMING`` (< SIMHASH_BANDS)
must agree exactly on at least one band, so band equality is a
complete candidate generator.  Every shuffle key is a (band, value)
pair or a doc id — document bodies never shuffle.

Token hashing uses md5 deliberately: Spark and DuckDB produce
byte-identical md5 hex, which makes the fingerprint — and therefore
the whole operator — oracle-checkable bit-for-bit.  For production
throughput swap the nibble extraction for ``xxhash64`` (same plan
shape, ~4× cheaper per token, no cross-engine oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SIMHASH_BITS = 63  # bit 63 stays 0 so the BIGINT fingerprint is sign-free
SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = 16
SIMHASH_MAX_HAMMING = 3  # must stay < SIMHASH_BANDS for the pigeonhole guarantee

# 63-bit token hash from the first 16 hex nibbles of md5(token):
# nibble j contributes bits 4j..4j+3 (hex digit 0 is LEAST significant
# by construction), bit 63 masked off so BIGINT arithmetic stays
# sign-free.  md5 runs ONCE per token (materialized column); everything
# downstream is integer bit math inside whole-stage codegen.
_TOKV = " + ".join(
    f"shiftleft(CAST(instr('0123456789abcdef', substr(h, {j + 1}, 1)) - 1 AS BIGINT), {4 * j})"
    for j in range(16)
)


def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, text) -> (doc_id, fp BIGINT).  Token-less documents are
    excluded (no tokens -> no votes -> no meaningful fingerprint; the
    all-pairs oracle drops them the same way).

    Plan shape: explode to (doc_id, token), one md5 + one 16-term
    nibble fold per token, 63 ±1 vote columns summed by a single
    partial-aggregated groupBy(doc_id), then one 63-term sign fold to
    the fingerprint.  Everything stays in whole-stage codegen — the
    earlier formulation (nested aggregate/transform lambdas over the
    token list) fell out of codegen into interpreted eval and
    recomputed md5 once per nibble, which measured ~700 s CPU on one
    partition at sf0.1; this shape runs the same corpus in seconds and
    parallelizes by document."""
    from chronicle_sniffer_spark.tables import spread

    # spread BEFORE the explode: the per-token md5 fold below is
    # map-side (partial agg), so with a single-row-group source it
    # would otherwise run on one core (round-6 sf1 soak: 9.4 s
    # single-task; no-op on a properly-split 100 TB source)
    docs = spread(docs)
    # row-level filter after the explode, not an array filter lambda:
    # higher-order functions are CodegenFallback and would knock the
    # fan-out operator out of whole-stage codegen
    tokens = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("t")
    ).filter(F.col("t") != "")
    tokv = tokens.withColumn("h", F.md5("t")).withColumn(
        "tokv", F.expr(f"({_TOKV}) & {(1 << SIMHASH_BITS) - 1}")
    )
    votes = [
        F.sum(F.expr(f"IF(((tokv >> {i}) & 1) = 1, 1, -1)")).alias(f"s{i}")
        for i in range(SIMHASH_BITS)
    ]
    summed = tokv.groupBy("doc_id").agg(*votes)
    fp = " + ".join(f"IF(s{i} > 0, shiftleft(1L, {i}), 0L)" for i in range(SIMHASH_BITS))
    return summed.select("doc_id", F.expr(fp).alias("fp"))


def simhash_pairs(docs: DataFrame, max_hamming: int = SIMHASH_MAX_HAMMING) -> DataFrame:
    """Near-duplicate pairs (doc_a < doc_b, hamming <= max_hamming)
    via the banded candidate join."""
    assert max_hamming < SIMHASH_BANDS, "pigeonhole completeness needs hamming < bands"
    mask = (1 << SIMHASH_BAND_BITS) - 1
    # materialize the fingerprints ONCE (call-scoped eager checkpoint):
    # the self-join below consumes this frame on BOTH sides, and one
    # side feeds a BroadcastExchange, so without the checkpoint the
    # whole explode+md5+63-vote subtree executes twice per run (AQE's
    # exchange reuse cannot dedupe a broadcast side)
    fps = simhash_fingerprints(docs).localCheckpoint(eager=True)
    # literal array of per-band structs (band count is a constant):
    # lambda-free, so the fan-out Generate stays in whole-stage codegen
    band_structs = ", ".join(
        f"struct({k} AS band, shiftright(fp, {k * SIMHASH_BAND_BITS}) & {mask} AS val)"
        for k in range(SIMHASH_BANDS)
    )
    bands = fps.select(
        "doc_id",
        "fp",
        F.explode(F.expr(f"array({band_structs})")).alias("b"),
    ).select("doc_id", "fp", "b.band", "b.val")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.fp").alias("fp_a"),
            F.col("b.fp").alias("fp_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.expr("CAST(bit_count(fp_a ^ fp_b) AS INT)"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
