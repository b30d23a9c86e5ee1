"""Markdown → text extraction (SURVEY.md §2B L4) — the sibling of
operators/html.py for the second-most-common crawl/document format in
training corpora (READMEs, docs sites, forum exports).

Same design contract as the HTML stage: every step is a pure column
expression in the Java-regex ∩ RE2 common subset (the one divergence —
capture-group replacement syntax, Spark ``$1`` vs DuckDB ``\\1`` — is
confined to the oracle, which re-states the replacement in its own
dialect), counts use the replace-length arithmetic idiom instead of
regex counting (engine count semantics diverge on overlap), and the
whole extraction is a narrow per-row map: no shuffle, no UDF, full
whole-stage codegen.

Handled: fenced code blocks (content REMOVED — code is not prose),
ATX headings (# ...; first one is the title, markers stripped),
links [text](url) → text, inline code `x` → x, emphasis markers
* and _, blockquote (>) and bullet (-) line prefixes, whitespace
normalization.  Not a CommonMark parser: setext headings, nested
emphasis edge cases, reference-style links, and literal #/*/_ inside
prose are out of scope (stated limitation; the fixture corpus is
word-salad with none of those).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

FENCE_RE = "```[^`]*```"
HEADING_TITLE_RE = "(^|\n)#+ *([^\n]*)"
LINK_RE = "\\[([^\\]]*)\\]\\(([^)]*)\\)"


def count_by_replace(col: Column, token: str) -> Column:
    """Occurrences of a literal token via length arithmetic — the
    engine-portable count idiom (regex counting diverges on
    overlap/non-greedy semantics across engines)."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(token), F.lit(""))))
        / len(token)
    ).cast("int")


def md_counts(md: Column) -> dict[str, Column]:
    """(n_code_blocks, n_headings, n_links) BEFORE any stripping.
    Fence count halves with floor(), never a float→int CAST: an odd
    fence-token count (unterminated fence) would make the quotient .5,
    and CAST(double AS INT) truncates on Spark but ROUNDS on DuckDB."""
    nl_md = F.concat(F.lit("\n"), md)
    return {
        "n_code_blocks": F.floor(count_by_replace(md, "```") / 2).cast("int"),
        "n_headings": count_by_replace(nl_md, "\n#"),
        "n_links": count_by_replace(md, "]("),
    }


def md_title(md: Column) -> Column:
    """Text of the first ATX heading ('' when none)."""
    return F.trim(F.regexp_extract(md, HEADING_TITLE_RE, 2))


def md_text(md: Column) -> Column:
    """Prose extraction: drop fenced code content, unwrap links to
    their anchor text, strip inline-code/emphasis/heading markers and
    blockquote/bullet prefixes, normalize whitespace."""
    s = F.regexp_replace(md, FENCE_RE, " ")
    s = F.regexp_replace(s, LINK_RE, "$1")
    for tok in ("`", "*", "_", "#"):
        s = F.replace(s, F.lit(tok), F.lit(""))
    for prefix in ("\n> ", "\n- "):
        s = F.replace(s, F.lit(prefix), F.lit("\n"))
    # same explicit Java∩RE2 whitespace class as html.normalize_ws
    s = F.regexp_replace(s, "[ \t\n\r\f]+", " ")
    return F.trim(s)
