"""Round-10 catalog additions.

- **L4 full BPE encode**: apply a TRAINED merge list to tokenize text
  — the actual tokenize-for-training step every LLM pipeline runs
  (the trainer's single merge step already exists as
  `l4_bpe_merge_step`; this closes the loop by encoding with the
  learned vocabulary).  The merge list is a broadcast-sized model
  artifact baked in as literals; encoding is a pure string-replace
  chain that stays in whole-stage codegen on both engines.

Reference scope note: the reference engine (processor/
json2udm_cloud.py) has no tokenizer; these entries extend the
declared LLM-data-pipeline surface (SURVEY.md §2B L-rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from chronicle_sniffer_spark.plans.catalog import query
from chronicle_sniffer_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# L4: full BPE encode with a trained merge list
# ---------------------------------------------------------------------------

# Merge list trained offline on the sf0.01 documents corpus with the
# standard BPE rule (most frequent adjacent token pair per step, ties
# to the lexicographically smallest pair; word-frequency weighted —
# the same pair-count rule as `l4_bpe_merge_step`).  A tokenizer is
# trained once and applied everywhere, so the list is a constant model
# artifact, exactly like a broadcast ML model.  Regenerate with the
# snippet in the docstring below if the corpus generator changes.
BPE_MERGES: list[tuple[str, str]] = [
    ("e", "r"),
    ("i", "n"),
    ("o", "w"),
    ("o", "r"),
    ("s", "t"),
    ("m", "er"),
    ("a", "t"),
    ("l", "u"),
    ("a", "r"),
    ("p", "ar"),
    ("j", "o"),
    ("jo", "in"),
    ("a", "s"),
    ("as", "h"),
    ("h", "ash"),
    ("r", "ow"),
]

# passes per merge: one non-overlapping replace() pass can miss
# adjacent re-formed occurrences inside token runs (' a a a a ' →
# ' aa a a ' after one pass); each extra pass at least halves the
# remainder, and the parity test asserts 4 passes reach the fixpoint
# for every corpus word (plus adversarial runs)
BPE_PASSES = 4


def _bpe_oracle() -> str:
    enc = "' ' || regexp_replace(text, '(.)', '\\1 ', 'g')"
    for a, b in BPE_MERGES:
        for _ in range(BPE_PASSES):
            enc = f"replace({enc}, ' {a} {b} ', ' {a}{b} ')"
    return f"""
    SELECT doc_id,
           CAST(len(regexp_split_to_array(trim({enc}), ' +')) AS INTEGER)
             AS n_bpe_tokens,
           md5(regexp_replace(trim({enc}), ' +', ' ', 'g')) AS enc_md5
    FROM documents
    """


@query("l4_bpe_encode", section="L4", oracle=_bpe_oracle())
def l4_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full BPE ENCODE: tokenize every document with a trained merge
    list (`BPE_MERGES`) — the step that turns raw text into the token
    stream an LLM trains on, closing the loop the trainer-side
    `l4_bpe_merge_step` opened.

    Semantics (identical on both engines, proven by the hard oracle
    and tests/test_round10.py's reference-encoder parity): the text is
    exploded to one token per character with single-space separators
    and a leading space (every original space char doubles the gap, so
    merges can never cross a word boundary); each merge (a, b) → ab
    then applies as {p} non-overlapping left-to-right
    ``replace(' a b ', ' ab ')`` passes, in training-rank order, which
    the parity test proves equals the canonical lowest-rank-first BPE
    encoder with per-merge fixpoint on every corpus word.  The output
    is the per-doc token count plus an md5 over the full encoded
    stream, so the oracle hash-checks the exact tokenization, not just
    its length.

    Spark shapes: the merge chain is {m}×{p} nested ``replace`` calls
    — pure JVM string ops inside whole-stage codegen, zero UDFs, zero
    shuffles beyond the scan (a narrow map the optimizer can fuse with
    any downstream pipeline).  At 100 TB the merge list for a real
    32k-vocab tokenizer would move from literals to a broadcast join
    against a pair table feeding a Pandas-UDF encoder (the vectorized
    path `ml14` uses); the literal chain is the right shape for the
    boundable vocabulary here and keeps the whole operator
    oracle-checkable.

    Train-list provenance (regenerate if the corpus generator
    changes): standard weighted BPE over the sf0.01 word histogram —
    per step, count adjacent token pairs weighted by word frequency,
    merge the most frequent pair (ties → lexicographically smallest),
    16 steps."""
    enc: Column = F.concat(
        F.lit(" "), F.regexp_replace(F.col("text"), "(.)", "$1 ")
    )
    for a, b in BPE_MERGES:
        for _ in range(BPE_PASSES):
            enc = F.replace(enc, F.lit(f" {a} {b} "), F.lit(f" {a}{b} "))
    enc_trim = F.trim(enc)
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(enc_trim, " +")).cast("int").alias("n_bpe_tokens"),
        F.md5(F.regexp_replace(enc_trim, " +", " ").cast("binary")).alias("enc_md5"),
    )


l4_bpe_encode.__doc__ = l4_bpe_encode.__doc__.format(
    m=len(BPE_MERGES), p=BPE_PASSES
)
