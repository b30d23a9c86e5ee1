"""Round-12 additions: WARC crawl-container source (sources/warc.py).

The format invariants are tested against Python's own gzip/zlib (an
independent implementation of the member framing) plus hand-built
records — not against the reader's own code paths.
"""

from __future__ import annotations

import gzip
import os

import pytest
from pyspark.sql import functions as F

from chronicle_sniffer_spark.sources.warc import (
    read_warc,
    warc_member,
    write_warc,
)
from chronicle_sniffer_spark.tables import load_table

SF_SMOKE = "/root/testdata/sf0.001"


def test_member_is_standalone_gzip_and_spec_shaped():
    """Each record is ONE complete gzip member whose decompressed form
    follows the WARC framing: version line, headers, blank line, an
    HTTP response content block of exactly Content-Length bytes, and
    the record terminator."""
    raw = gzip.decompress(warc_member(7, "<html>x</html>"))
    assert raw.startswith(b"WARC/1.0\r\n")
    head, _, rest = raw.partition(b"\r\n\r\n")
    hdr = dict(
        ln.split(b": ", 1) for ln in head.split(b"\r\n")[1:] if b": " in ln
    )
    assert hdr[b"WARC-Type"] == b"response"
    assert hdr[b"WARC-Target-URI"] == b"https://example.org/doc/7"
    clen = int(hdr[b"Content-Length"])
    content, term = rest[:clen], rest[clen:]
    assert term == b"\r\n\r\n"
    assert content.startswith(b"HTTP/1.1 200 OK\r\n")
    assert content.endswith(b"<html>x</html>")
    # deterministic: gzip mtime pinned, same input -> same bytes
    assert warc_member(7, "<html>x</html>") == gzip.compress(
        raw, mtime=0
    ) == warc_member(7, "<html>x</html>")


def test_roundtrip_through_container(spark, tmp_path):
    """write_warc → read_warc round-trips every doc: ids, URIs,
    payload bytes, member counts per file agree with the source
    table."""
    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", F.concat(F.lit("<p>"), "text", F.lit("</p>")).alias("html")
    )
    out = str(tmp_path / "crawl")
    files = write_warc(docs, out, n_files=4)
    assert len(files) == 4 and all(f.endswith(".warc.gz") for f in files)
    recs = read_warc(spark, out)
    got = {
        int(r.target_uri.rsplit("/", 1)[1]): bytes(r.payload).decode()
        for r in recs.collect()
    }
    want = {r.doc_id: r.html for r in docs.collect()}
    assert got == want
    meta = recs.select("warc_type", "http_status").distinct().collect()
    assert [(r.warc_type, r.http_status) for r in meta] == [("response", 200)]
    # member indexes are contiguous per file from zero
    per_file = (
        recs.groupBy("file")
        .agg(F.count("*").alias("n"), F.min("member_idx").alias("lo"),
             F.max("member_idx").alias("hi"))
        .collect()
    )
    assert all(r.lo == 0 and r.hi == r.n - 1 for r in per_file)
    assert sum(r.n for r in per_file) == len(want)


def test_corrupt_member_raises_loudly(spark, tmp_path):
    """A truncated/garbled member must raise, not silently drop
    records — a crawl pipeline has to account for every record."""
    out = str(tmp_path / "crawl")
    os.makedirs(out)
    good = warc_member(1, "<p>ok</p>")
    with open(os.path.join(out, "part-00000.warc.gz"), "wb") as f:
        f.write(good + b"\x1f\x8b\x00garbage-not-a-member")
    with pytest.raises(Exception, match="(?i)corrupt|error|invalid"):
        read_warc(spark, out).collect()


def test_write_is_deterministic_across_runs(spark, tmp_path):
    """Two independent writes of the same table produce byte-identical
    container files (sorted members, pinned gzip mtime) — retries and
    speculative tasks can never fork the fixture."""
    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", F.substring("text", 1, 50).alias("html")
    )
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    fa, fb = write_warc(docs, a, n_files=2), write_warc(docs, b, n_files=2)
    for pa, pb in zip(fa, fb):
        with open(pa, "rb") as f1, open(pb, "rb") as f2:
            assert f1.read() == f2.read(), (pa, pb)
