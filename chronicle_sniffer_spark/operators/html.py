"""HTML/markup → text extraction (SURVEY.md §2B L4) — the first
stage of a crawl-based training-data pipeline, upstream of the
quality gates that already exist (l4_c4_quality_filter,
l7_template_dedup, l4_pii_scrub all assume extracted text).

Design: every step is a pure column expression (regexp_replace /
regexp_extract_all / split / replace chains) restricted to the
Java-regex ∩ RE2 common subset — no lookaround, no backreferences,
non-greedy ``.*?`` only — so the identical semantics run on Spark
(whole-stage codegen, no Python in the path) AND in the DuckDB
oracle.  This is the deterministic 80/20 crawl-cleanup pass
(boilerplate/nav removal by link density, tag stripping, entity
decoding), NOT an HTML5 spec parser: quoted ``>`` inside attribute
values, comments, and CDATA are out of scope.  A full spec-compliant
parse belongs in an Arrow-edge ``mapInPandas`` stage with an html
parser library, gated on import — the block pipeline here is the
schema- and shuffle-identical scale path.

Scale shape (100 TB): the whole extraction is a narrow per-row map
(regex work linear in page bytes) followed by one posexplode whose
fan-out is the block count (~10× rows, ~1× bytes) and one
doc_id-keyed aggregate — a single shuffle, partial-aggregated
map-side.  Nothing is collected; thresholds are integer literals.

Reference tie-in: the reference engine is packet-side and has no
markup stage (processor/json2udm_cloud.py); this extends the declared
LLM-pipeline surface (SURVEY.md §2B L4, BASELINE.json north star).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# block-level elements whose CLOSE tag ends a text block; the split
# regex is shared verbatim with the DuckDB oracle
BLOCK_CLOSE_RE = "</(nav|h1|h2|h3|p|div|li|footer|header|article|section|td)>"

# entity decode order matters: &amp; LAST so "&amp;lt;" decodes to the
# literal "&lt;" (not twice to "<") — the standard single-pass rule
ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)

_ANCHOR_RE = "(?s)<a[^>]*>(.*?)</a>"


def extract_title(html: Column) -> Column:
    """Entity-decoded, whitespace-normalized <title> content
    ('' when absent)."""
    return normalize_ws(
        decode_entities(F.regexp_extract(html, "(?s)<title>(.*?)</title>", 1))
    )


def extract_body(html: Column) -> Column:
    """Content between <body…> and </body>; the whole document when
    no body element exists (fragment input).  Presence is tested with
    rlike, not ''-equality — an EMPTY <body></body> legitimately
    extracts to ''.  (?s) makes . cross newlines (real pages are
    multi-line; the flag is in the Java∩RE2 common subset)."""
    return F.when(
        html.rlike("(?s)<body[^>]*>.*</body>"),
        F.regexp_extract(html, "(?s)<body[^>]*>(.*)</body>", 1),
    ).otherwise(html)


def strip_invisible(col: Column) -> Column:
    """Remove <script>/<style> elements INCLUDING their content —
    tag-stripping alone would leak code into extracted text.  Two
    passes (one per element) because RE2 has no backreferences to
    pair open/close tags in one alternation."""
    out = F.regexp_replace(col, "(?s)<script[^>]*>.*?</script>", " ")
    return F.regexp_replace(out, "(?s)<style[^>]*>.*?</style>", " ")


def strip_tags(col: Column) -> Column:
    """Replace every remaining tag with a space (space, not '', so
    'a</p><p>b' keeps a word boundary)."""
    return F.regexp_replace(col, "<[^>]*>", " ")


def decode_entities(col: Column) -> Column:
    for ent, ch in ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def normalize_ws(col: Column) -> Column:
    # explicit class, NOT \s: Java's \s includes \x0B where RE2's does
    # not, and real crawl pages carry \r (CRLF) and \t that the earlier
    # '[\n ]+' let through into text_len / link-density (round-11
    # advisor finding) — the explicit chars are the Java∩RE2 subset
    return F.trim(F.regexp_replace(col, "[ \t\n\r\f]+", " "))


def block_text(block: Column) -> Column:
    """Visible text of one block: strip tags, decode entities,
    normalize whitespace (tag-strip FIRST, so a decoded '&lt;draft&gt;'
    survives as literal text — entities are content, not markup)."""
    return normalize_ws(decode_entities(strip_tags(block)))


def anchor_text_len(block: Column) -> Column:
    """Total characters of anchor (link) text in the block — the
    numerator of link density."""
    return F.length(F.array_join(F.regexp_extract_all(block, F.lit(_ANCHOR_RE), 1), ""))


def html_blocks(docs: DataFrame, html_col: str = "html", max_density_pct: int = 40) -> DataFrame:
    """Per-block extraction audit: (doc_id, pos, text, text_len,
    anchor_len, kept) for every non-empty block.

    ``kept`` is the boilerplate judgment: a block survives when its
    link density anchor_len/text_len ≤ max_density_pct% — evaluated in
    INTEGER math (100·anchor_len ≤ pct·text_len) so no float boundary
    can flip across engines.  Nav bars, related-links boxes, and
    footers are link-dense and drop; prose keeps.
    """
    clean = strip_invisible(extract_body(F.col(html_col)))
    exploded = docs.select(
        "doc_id",
        F.posexplode(F.split(clean, BLOCK_CLOSE_RE)).alias("pos", "block"),
    )
    txt = block_text(F.col("block"))
    a_len = anchor_text_len(F.col("block"))
    return (
        exploded.select(
            "doc_id",
            "pos",
            txt.alias("text"),
            F.length(txt).cast("int").alias("text_len"),
            a_len.cast("int").alias("anchor_len"),
        )
        .filter(F.col("text_len") > 0)
        .withColumn(
            "kept",
            (100 * F.col("anchor_len")) <= (max_density_pct * F.col("text_len")),
        )
    )


def html_extract(docs: DataFrame, html_col: str = "html", max_density_pct: int = 40) -> DataFrame:
    """Document-level extraction: title + visible text of the kept
    blocks (in original block order), with kept/dropped counts.

    One doc_id shuffle; block order is restored with the
    sort_array(collect_list(struct(pos, text))) idiom (codegen-side
    GetArrayStructFields, no lambda)."""
    blocks = html_blocks(docs, html_col, max_density_pct)
    titles = docs.select(
        "doc_id", extract_title(F.col(html_col)).alias("title")
    )
    agg = blocks.groupBy("doc_id").agg(
        F.array_join(
            F.sort_array(
                F.collect_list(F.when(F.col("kept"), F.struct("pos", "text")))
            ).getField("text"),
            " ",
        ).alias("text"),
        F.sum(F.col("kept").cast("int")).cast("int").alias("n_kept"),
        F.sum((~F.col("kept")).cast("int")).cast("int").alias("n_dropped"),
    )
    return titles.join(agg, "doc_id", "left").select(
        "doc_id",
        "title",
        F.coalesce("text", F.lit("")).alias("text"),
        F.coalesce("n_kept", F.lit(0)).cast("int").alias("n_kept"),
        F.coalesce("n_dropped", F.lit(0)).cast("int").alias("n_dropped"),
    )
