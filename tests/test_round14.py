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


def test_g13_verify_broadcast_is_gated_on_expansion_size(spark, monkeypatch):
    """The verify expansion's broadcast hint must be conditional on
    its EXACT row count (Σ deg(s1) over survivors): above the bound —
    here forced to 0, the 'hub supplier survived' case — the plan
    takes a shuffle-hash join instead of an unconditional broadcast
    (which bypasses Spark's size checks and would OOM on a power-law
    hub), and the emitted top-k is unchanged."""
    import chronicle_sniffer_spark.plans.round12 as r12

    sf = "/root/testdata/sf0.001"
    df_default = r12.g13_common_neighbors(spark, sf)
    plan_default = df_default._jdf.queryExecution().executedPlan().toString()
    want = [tuple(r) for r in df_default.collect()]
    assert "ShuffledHashJoin" not in plan_default

    monkeypatch.setattr(r12, "G13_BCAST_VERIFY_ROWS", 0)
    df_fb = r12.g13_common_neighbors(spark, sf)
    plan_fb = df_fb._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan_fb
    assert plan_fb.count("BroadcastHashJoin") == plan_default.count(
        "BroadcastHashJoin"
    ) - 1
    assert [tuple(r) for r in df_fb.collect()] == want


def test_lang_id_accuracy_beats_majority_prior(spark):
    """With the per-language vocabulary injection the classifier must
    carry real signal: accuracy strictly above the majority-class
    prior (the shared-vocabulary fixture pinned it AT the prior by
    construction — round-13 verdict #5).  On this fixture the margin
    is wide (measured 1.0 at sf0.001); the assert keeps slack for
    fixture regeneration."""
    from collections import Counter

    from chronicle_sniffer_spark.plans.round13 import l4_lang_id_trigram

    rows = l4_lang_id_trigram(spark, "/root/testdata/sf0.001").collect()
    total = sum(r.n_docs for r in rows)
    diag = sum(r.n_docs for r in rows if r.true_lang == r.pred_lang)
    truth = Counter()
    for r in rows:
        truth[r.true_lang] += r.n_docs
    prior = max(truth.values()) / total
    assert diag / total > prior
    assert diag / total >= 0.9


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
