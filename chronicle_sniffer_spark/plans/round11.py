"""Round-11 catalog additions.

- **L4 HTML → text extraction** (`l4_html_extract`,
  `l4_html_blocks`): the missing FIRST stage of the crawl pipeline —
  everything downstream already exists (l4_c4_quality_filter,
  l7_template_dedup, l4_pii_scrub).  Pure-expression tag stripping,
  <script>/<style> content removal, entity decoding, and
  boilerplate/navigation removal by per-block link density, all in
  the Java-regex ∩ RE2 common subset so the identical semantics run
  in Spark codegen AND the DuckDB oracle.  The fixture is synthetic
  HTML built deterministically from the documents table by ONE
  expression string shared verbatim between both engines.

Reference scope note: the reference engine (processor/
json2udm_cloud.py) is packet-side and has no markup stage; these
extend the declared LLM-pipeline surface (SURVEY.md §2B L4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chronicle_sniffer_spark.operators.html import (
    BLOCK_CLOSE_RE,
    html_blocks,
    html_extract,
)
from chronicle_sniffer_spark.plans.catalog import query
from chronicle_sniffer_spark.tables import load_table, spread

_t = load_table


def _pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic page table: spread() BEFORE the html construction so
    the per-row regex work never inherits the single-file scan's one
    task (the recurring sf1 soak trap, BASELINE.md round-10 notes)."""
    return spread(_t(spark, sf_dir, "documents").select("doc_id", "lang", "text")).select(
        "doc_id", F.expr(HTML_PAGE_SQL).alias("html")
    )

# ---------------------------------------------------------------------------
# L4: HTML → text extraction
# ---------------------------------------------------------------------------

# Deterministic page construction, shared VERBATIM between the Spark
# plan (F.expr) and the DuckDB oracle so the fixture cannot drift.
# Layout exercises every extraction rule: a <style> and TWO <script>
# elements (one inside <body>) whose content must not leak; a
# link-only <nav>; an <h1> with entities that must survive as text
# ("&lt;draft&gt;" is content, not markup); the document text as a
# paragraph; a summary paragraph that gains an inline <a> on every
# 5th doc (low-density → anchor text is KEPT); a link-dense related
# box and footer (dropped).  Word-salad corpus text contains no '<',
# so the construction is unambiguous.
HTML_PAGE_SQL = (
    "'<html><head><title>Doc ' || CAST(doc_id AS STRING) || ' &amp; notes ["
    "' || lang || ']</title>'"
    " || '<style>p { color: #222; }</style>'"
    " || '<script>var t = \"x-' || CAST(doc_id AS STRING) || '\"; if (1 &lt; 2) { track(); }</script>'"
    " || '</head><body>'"
    " || '<nav><a href=\"/\">Home</a> <a href=\"/archive\">Archive</a> <a href=\"/contact\">Contact</a></nav>'"
    " || '<h1>Doc ' || CAST(doc_id AS STRING) || ' &lt;draft&gt;</h1>'"
    " || '<script>inline(\"s\", 3 &gt; 2);</script>'"
    " || '<p>' || text || '</p>'"
    " || '<p>Summary: ' || substr(text, 1, 80) ||"
    " CASE WHEN doc_id % 5 = 0"
    "      THEN ' see <a href=\"/doc/' || CAST(doc_id AS STRING) || '\">related doc '"
    "           || CAST(doc_id AS STRING) || '</a>'"
    "      ELSE '' END || '</p>'"
    " || '<div><a href=\"/t/1\">one</a> <a href=\"/t/2\">two</a> <a href=\"/t/3\">three</a> more</div>'"
    " || '<footer><a href=\"/tos\">Terms</a> <a href=\"/privacy\">Privacy</a> &amp;copy 2026</footer>'"
    " || '</body></html>'"
)

_DENSITY_PCT = 40

# the oracle mirrors operators/html.py step for step; DuckDB
# regexp_replace needs the explicit 'g' flag (Spark is global by
# default), and '' '' escapes one quote inside a SQL literal
_DECODE = (
    "replace(replace(replace(replace(replace(replace({x},"
    " '&lt;', '<'), '&gt;', '>'), '&quot;', '\"'), '&#39;', ''''),"
    " '&nbsp;', ' '), '&amp;', '&')"
)


def _block_cte() -> str:
    strip_tags = "regexp_replace(block, '<[^>]*>', ' ', 'g')"
    txt = (
        "trim(regexp_replace("
        + _DECODE.format(x=strip_tags)
        + ", ' +', ' ', 'g'))"
    )
    return f"""
    WITH pages AS (
      SELECT doc_id, {HTML_PAGE_SQL} AS html FROM documents
    ),
    clean AS (
      SELECT doc_id,
             {_DECODE.format(x="regexp_extract(html, '<title>(.*?)</title>', 1)")} AS title,
             regexp_replace(regexp_replace(
               CASE WHEN regexp_matches(html, '<body[^>]*>.*</body>')
                    THEN regexp_extract(html, '<body[^>]*>(.*)</body>', 1)
                    ELSE html END,
               '<script[^>]*>.*?</script>', ' ', 'g'),
               '<style[^>]*>.*?</style>', ' ', 'g') AS body
      FROM pages
    ),
    split_parts AS (
      SELECT doc_id, title,
             string_split_regex(body, '{BLOCK_CLOSE_RE}') AS parts
      FROM clean
    ),
    blocks AS (
      SELECT doc_id, title,
             unnest(generate_series(0, len(parts) - 1)) AS pos,
             unnest(parts) AS block
      FROM split_parts
    ),
    scored AS (
      SELECT doc_id, title, pos,
             {txt} AS text,
             CAST(length({txt}) AS INTEGER) AS text_len,
             CAST(coalesce(length(array_to_string(
               regexp_extract_all(block, '<a[^>]*>(.*?)</a>', 1), '')), 0) AS INTEGER)
               AS anchor_len
      FROM blocks
    ),
    nonempty AS (
      SELECT *, (100 * anchor_len) <= ({_DENSITY_PCT} * text_len) AS kept
      FROM scored WHERE text_len > 0
    )
    """


@query(
    "l4_html_blocks",
    section="L4",
    oracle=_block_cte()
    + """
    SELECT doc_id, pos, text, text_len, anchor_len, kept
    FROM nonempty
    """,
)
def l4_html_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-block extraction audit for the HTML → text stage: every
    non-empty block of the synthetic page with its visible text, text
    length, anchor-text length, and the link-density boilerplate
    verdict (kept ⇔ 100·anchor_len ≤ 40·text_len, integer math).  The
    audit row set is what a crawl-cleanup run inspects before
    trusting the extraction: nav/related/footer blocks must read
    kept=false, heading and prose kept=true.

    Scale shape: narrow per-row regex map + one posexplode; no
    shuffle at all (the audit is row-parallel end to end)."""
    return html_blocks(_pages(spark, sf_dir), max_density_pct=_DENSITY_PCT)


@query(
    "l4_html_extract",
    section="L4",
    oracle=_block_cte()
    + """
    , agg AS (
      SELECT doc_id,
             string_agg(CASE WHEN kept THEN text END, ' ' ORDER BY pos) AS text,
             CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS INTEGER) AS n_kept,
             CAST(sum(CASE WHEN kept THEN 0 ELSE 1 END) AS INTEGER) AS n_dropped
      FROM nonempty GROUP BY doc_id
    )
    SELECT c.doc_id, c.title,
           coalesce(a.text, '') AS text,
           coalesce(a.n_kept, 0) AS n_kept,
           coalesce(a.n_dropped, 0) AS n_dropped
    FROM clean c LEFT JOIN agg a ON a.doc_id = c.doc_id
    """,
)
def l4_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML/markup → training text: strip <script>/<style> content,
    segment into blocks at block-element close tags, drop link-dense
    boilerplate (nav bars, related-links boxes, footers), strip tags,
    decode entities, and reassemble the surviving blocks in document
    order with the entity-decoded <title>.

    The pipeline is operators/html.py — every step a codegen column
    expression in the Java-regex ∩ RE2 common subset, so this oracle
    runs the IDENTICAL semantics (and the page fixture is one
    expression string shared verbatim).  Every 5th document plants an
    inline link inside prose to pin the keep-side behavior (anchor
    TEXT survives when the block is low-density); nav/related/footer
    pin the drop side (n_dropped ≥ 3 on every row)."""
    return html_extract(_pages(spark, sf_dir), max_density_pct=_DENSITY_PCT)
