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


def test_compaction_preserves_data_and_collapses_dirs(spark, tmp_path):
    """compact_table: same rows before/after, one live commit dir
    after, time travel to the pre-compaction version intact, crash
    before the flip leaves readers on the old snapshot, and prune()
    reclaims the dead epoch dirs afterwards."""
    import os

    from pyspark.sql import functions as F

    from chronicle_sniffer_spark.streaming import manifest as mf
    from chronicle_sniffer_spark.streaming.incremental import (
        _read_table,
        compact_table,
        merge_batch,
    )

    table = str(tmp_path / "t")
    ev = load_table(spark, SF_SMOKE, "events")
    # later epochs touch only a few users (→ few buckets), so live
    # bucket paths really spread across multiple commit dirs
    merge_batch(spark, table, ev.filter(F.col("event_id") % 3 == 0), 0)
    merge_batch(spark, table, ev.filter(F.col("user_id") < 5), 1)
    merge_batch(spark, table, ev.filter(F.col("user_id").between(5, 9)), 2)
    rows = lambda df: sorted(  # noqa: E731
        (r.user_id, r.n_events, str(r.total_value)) for r in df.collect()
    )
    before = rows(_read_table(spark, table))
    v_before = mf.latest_version(table)
    dirs_before = len({e["path"] for e in mf.read_manifest(table)["buckets"].values()})
    assert dirs_before > 1, "fixture built only one commit dir — nothing to compact"

    # crash injection: the staged rewrite is invisible
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="injected crash"):
        compact_table(spark, table, fail_before_commit=True)
    assert mf.latest_version(table) == v_before
    assert rows(_read_table(spark, table)) == before

    v_new = compact_table(spark, table)
    assert v_new == v_before + 1
    after_m = mf.read_manifest(table)
    assert len({e["path"] for e in after_m["buckets"].values()}) == 1
    assert rows(_read_table(spark, table)) == before
    # time travel: the pre-compaction version still reads identically
    assert rows(_read_table(spark, table, version=v_before)) == before
    # prune to the compacted tail: dead epoch dirs reclaimed, data intact
    removed = mf.prune(table, keep_last=1)
    assert any(r.startswith("data/commit=") for r in removed)
    assert rows(_read_table(spark, table)) == before
    live = {e["path"] for e in mf.read_manifest(table)["buckets"].values()}
    assert all(os.path.isdir(os.path.join(table, p)) for p in live)
