"""Round-14 additions: advisor fixes (charset decode hardening,
thread-local replacement counts, centroid-cache eviction)."""

from __future__ import annotations

import threading


def test_decode_payload_nontext_codec_falls_back_to_utf8():
    """A declared charset that resolves to a BYTE-TRANSFORM codec
    (base64, hex, rot13, zlib — all accepted by parse_charset's token
    regex) must be absorbed like an unknown name, not crash the scan
    task with LookupError('not a text encoding')."""
    from chronicle_sniffer_spark.sources.warc import decode_payload, parse_charset

    payload = "résumé".encode("utf-8")
    for cs in ("base64", "hex", "rot13", "zlib", "uu", "bz2"):
        assert parse_charset(f"text/html; charset={cs}") == cs
        text, n_err = decode_payload(payload, cs)
        assert text == "résumé"  # utf-8 fallback decodes cleanly
        assert n_err == 0
    # and a genuinely undecodable payload under the fallback still
    # counts its damage
    text, n_err = decode_payload(b"caf\xe9", "base64")
    assert text == "caf�"
    assert n_err == 1


def test_decode_payload_counts_are_thread_safe():
    """The registered error handler is process-wide; counts must be
    attributed per-thread, not through a shared global (round-13
    advisor finding).  Each thread decodes a payload with a DIFFERENT
    known damage count many times — any cross-thread bleed shows up
    as a wrong count."""
    from chronicle_sniffer_spark.sources.warc import decode_payload

    payloads = {
        1: (b"a\xff" * 1, 1),
        2: (b"b\xff" * 2, 2),
        5: (b"c\xff" * 5, 5),
        9: (b"d\xff" * 9, 9),
    }
    errors: list[str] = []

    def worker(k: int) -> None:
        data, want = payloads[k]
        for _ in range(300):
            _, n = decode_payload(data, "utf-8")
            if n != want:
                errors.append(f"thread {k}: got {n}, want {want}")
                return

    threads = [threading.Thread(target=worker, args=(k,)) for k in payloads]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors


def test_centroid_cache_evicts_superseded_versions(spark, tmp_path):
    """Rebuild/upsert bumps the manifest version; the per-snapshot
    centroid cache must not retain one collected list per superseded
    version for the same (app, index) (round-13 advisor finding)."""
    from chronicle_sniffer_spark.operators import ivf
    from chronicle_sniffer_spark.streaming import manifest as mf

    emb = spark.createDataFrame(
        [(i, [float(i % 7), float((i * 3) % 5)]) for i in range(60)],
        "vec_id bigint, embedding array<double>",
    )
    index_dir = str(tmp_path / "idx")
    ivf.ivf_index_write(emb, index_dir, n_centroids=4, n_iter=3)
    m1 = mf.read_manifest(index_dir)
    ivf._cached_centroids(spark, index_dir, m1)
    delta = spark.createDataFrame(
        [(100, [9.0, 9.0])], "vec_id bigint, embedding array<double>"
    )
    ivf.ivf_index_upsert(spark, index_dir, delta)
    m2 = mf.read_manifest(index_dir)
    assert m2["version"] > m1["version"]
    ivf._cached_centroids(spark, index_dir, m2)
    keys = [
        k
        for k in ivf._CENTROID_CACHE
        if k[0] == spark.sparkContext.applicationId and k[1] == index_dir
    ]
    assert keys == [
        (spark.sparkContext.applicationId, index_dir, m2["version"])
    ]
