"""HTML → text extraction (operators/html.py): per-block semantics
against an independent Python reference implementation, fixed
adversarial fixtures, and hypothesis over random block compositions.

The reference extractor below is written from the RULES (strip
script/style content, split at block close tags, tag-strip → entity
decode → whitespace-normalize, link-density keep test in integer
math), not from the Spark code — so a shared misreading of a regex
can't self-confirm.
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from chronicle_sniffer_spark.operators.html import html_blocks, html_extract

BLOCK_TAGS = (
    "nav", "h1", "h2", "h3", "p", "div", "li",
    "footer", "header", "article", "section", "td",
)
_ENTS = [
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
    ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"),
]


def _ref_decode(s: str) -> str:
    for ent, ch in _ENTS:
        s = s.replace(ent, ch)
    return s


def _ref_block_text(block: str) -> str:
    s = re.sub(r"<[^>]*>", " ", block)
    s = _ref_decode(s)
    return re.sub(r"[ \t\n\r\f]+", " ", s).strip()


def _ref_extract(html: str, max_density_pct: int = 40):
    """Reference: list of (pos, text, text_len, anchor_len, kept) for
    non-empty blocks, plus (title, joined_kept_text)."""
    title = re.sub(
        r"[ \t\n\r\f]+",
        " ",
        _ref_decode(
            (re.search(r"<title>(.*?)</title>", html, re.S) or [None, ""])[1]
        ),
    ).strip()
    m = re.search(r"<body[^>]*>(.*)</body>", html, re.S)
    body = m.group(1) if m else html
    body = re.sub(r"<script[^>]*>.*?</script>", " ", body, flags=re.S)
    body = re.sub(r"<style[^>]*>.*?</style>", " ", body, flags=re.S)
    rows = []
    for pos, block in enumerate(re.split("</(?:%s)>" % "|".join(BLOCK_TAGS), body)):
        text = _ref_block_text(block)
        if not text:
            continue
        a_len = len("".join(re.findall(r"<a[^>]*>(.*?)</a>", block, re.S)))
        kept = 100 * a_len <= max_density_pct * len(text)
        rows.append((pos, text, len(text), a_len, kept))
    joined = " ".join(t for _, t, _, _, k in rows if k)
    return title, joined, rows


def _run(spark, pages):
    docs = spark.createDataFrame(pages, "doc_id long, html string")
    blocks = {
        (r.doc_id, r.pos): (r.text, r.text_len, r.anchor_len, r.kept)
        for r in html_blocks(docs).collect()
    }
    full = {
        r.doc_id: (r.title, r.text, r.n_kept, r.n_dropped)
        for r in html_extract(docs).collect()
    }
    return blocks, full


def test_fixed_page_blocks(spark):
    html = (
        '<html><head><title>T &amp; t</title><style>p{}</style></head><body>'
        '<nav><a href="/">Home</a> <a href="/b">Blog</a></nav>'
        "<h1>Hello &lt;world&gt;</h1>"
        '<script>var x = "</p>ignored? no - script removed first";</script>'
        "<p>plain prose with several words here</p>"
        '<p>prose with one <a href="/x">inline link</a> kept whole</p>'
        '<div><a href="/1">a</a><a href="/2">b</a></div>'
        "</body></html>"
    )
    # NOTE: the script CONTENT contains '</p>' — script removal must
    # run before block splitting or the split would shear the page
    blocks, full = _run(spark, [(1, html)])
    title, joined, rows = _ref_extract(html)
    assert full[1][0] == "T & t" == title
    got_rows = sorted(
        (pos, v[0], v[1], v[2], v[3]) for (_, pos), v in blocks.items()
    )
    assert got_rows == rows
    assert full[1][1] == joined
    # semantic pins, independent of the reference impl:
    texts = {v[0]: v[3] for v in blocks.values()}
    assert texts["Home Blog"] is False          # nav dropped
    assert texts["Hello <world>"] is True       # entities survive as text
    assert texts["prose with one inline link kept whole"] is True
    assert texts["a b"] is False                # link-only div dropped
    assert "ignored" not in full[1][1]


def test_multiline_page_script_content_does_not_leak(spark):
    """Real pages are multi-line: (?s) regexes must strip script/style
    CONTENT across newlines and body extraction must not fall back to
    the whole document (the round-11 review finding)."""
    html = (
        "<html>\n<head>\n<title>Multi\nline</title>\n"
        "<style>\np { x: 1; }\n</style>\n</head>\n<body>\n"
        "<script>\nvar secret = 1;\n</script>\n"
        "<p>line one\nline two</p>\n"
        '<nav><a href="/">Home</a>\n<a href="/b">B</a></nav>\n'
        "</body>\n</html>"
    )
    blocks, full = _run(spark, [(1, html)])
    title, joined, rows = _ref_extract(html)
    assert full[1][0] == "Multi line" == title
    assert "secret" not in full[1][1] and "x: 1" not in full[1][1]
    assert "head" not in full[1][1].lower()  # body fallback did not fire
    assert full[1][1] == joined == "line one line two"
    got_rows = sorted(
        (pos, v[0], v[1], v[2], v[3]) for (_, pos), v in blocks.items()
    )
    assert got_rows == rows


def test_fragment_without_body_and_empty_doc(spark):
    blocks, full = _run(
        spark,
        [(1, "<p>no body element</p><nav><a href='/x'>X</a></nav>"),
         (2, "<div>   </div>"), (3, "")],
    )
    assert full[1][1] == "no body element"
    assert full[1][2] == 1 and full[1][3] == 1
    # whitespace-only and empty docs: zero blocks either way, doc kept
    assert full[2] == ("", "", 0, 0)
    assert full[3] == ("", "", 0, 0)


# hypothesis: random compositions of content / link / mixed blocks,
# random tags, optional script/style noise, entities in content
words = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "&amp;", "&lt;x&gt;", "d&#39;o"]),
    min_size=0,
    max_size=6,
)
tag = st.sampled_from(BLOCK_TAGS)


@st.composite
def block(draw):
    t = draw(tag)
    body_words = draw(words)
    n_links = draw(st.integers(0, 3))
    parts = [" ".join(body_words)]
    for i in range(n_links):
        parts.append(f'<a href="/l{i}">link {i} text</a>')
    inner = " ".join(parts)
    noise = draw(st.sampled_from(["", "<script>var j = 1;</script>", "<style>.c{}</style>"]))
    return f"<{t}>{noise}{inner}</{t}>"


pages_strategy = st.lists(block(), min_size=0, max_size=6).map(
    lambda bs: "<html><head><title>t &lt;1&gt;</title></head><body>"
    + "".join(bs)
    + "</body></html>"
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(htmls=st.lists(pages_strategy, min_size=1, max_size=4))
def test_random_pages_match_reference(spark, htmls):
    pages = list(enumerate(htmls))
    blocks, full = _run(spark, pages)
    for doc_id, html in pages:
        title, joined, rows = _ref_extract(html)
        got_rows = sorted(
            (pos, v[0], v[1], v[2], v[3])
            for (d, pos), v in blocks.items()
            if d == doc_id
        )
        assert got_rows == rows, html
        n_kept = sum(1 for r in rows if r[4])
        assert full[doc_id] == (title, joined, n_kept, len(rows) - n_kept), html


def test_crlf_and_tab_pages_collapse_to_single_spaces(spark):
    """CRLF line endings and tab indentation — the shape real crawl
    pages actually have — must collapse in normalize_ws exactly like
    plain spaces, so text_len and the link-density verdict cannot be
    inflated by invisible characters (round-11 advisor finding: the
    earlier '[\\n ]+' class let \\r and \\t through)."""
    crlf_page = (
        "<html><head><title>\tT\r\n1</title></head><body>"
        "<p>line one\r\nline two\tand\tthree</p>"
        "<nav>\r\n\t<a href='/x'>x</a>\r\n</nav>"
        "</body></html>"
    )
    blocks, full = _run(spark, [(1, crlf_page)])
    title, joined, rows = _ref_extract(crlf_page)
    assert title == "T 1"
    assert full[1][0] == title
    assert full[1][1] == joined == "line one line two and three"
    got_rows = sorted(
        (pos, v[0], v[1], v[2], v[3]) for (d, pos), v in blocks.items() if d == 1
    )
    assert got_rows == rows
    # the nav block is pure anchor: its text_len counts NO stray \r\t,
    # so density math sees 100*1 > pct*1 and drops it
    assert full[1][3] == 1
