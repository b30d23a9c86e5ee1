"""pcap decode (S4/R9): synthesized classic-pcap bytes → tshark-shaped
rows → UDM projection end-to-end.  Covers eth/ip/ipv6/arp/tcp/udp/icmp,
DNS query+answer, HTTP request, TLS ClientHello SNI, and a truncated
trailing record."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from chronicle_sniffer_spark.sources.pcap import decode_pcap_bytes, read_pcap
from chronicle_sniffer_spark.sources.pcap_synth import example_packets, pcap_bytes
from chronicle_sniffer_spark.udm import project_udm


def test_decode_pcap_bytes_layers():
    pkts = list(decode_pcap_bytes(pcap_bytes(example_packets())))
    assert len(pkts) == 7
    layers = [p["_source"]["layers"] for p in pkts]
    assert layers[0]["http"]["http.host"] == "www.test.it"
    assert layers[0]["http"]["http.request.full_uri"] == "http://www.test.it/index.html"
    assert layers[0]["http"]["http.user_agent"] == "curl/8.0"
    assert layers[0]["tcp"]["tcp.dstport"] == "80"
    assert layers[0]["frame"]["frame.time_utc"] == "Jun 10, 2025 13:14:15.123456"
    q = layers[1]["dns"]["Queries"]
    assert list(q.values())[0]["dns.qry.name"] == "example.com"
    assert layers[1]["dns"]["dns.flags_tree"]["dns.flags.response"] == "0"
    a = layers[2]["dns"]["Answers"]
    assert list(a.values())[0]["dns.resp.ttl"] == "300"
    assert layers[2]["dns"]["dns.flags_tree"]["dns.flags.response"] == "1"
    tls = layers[3]["tls"]["tls.record"]
    assert tls["tls.record.version"] == "0x0301"
    assert tls["tls.handshake"]["tls.handshake.version"] == "0x0303"
    assert tls["tls.handshake"]["tls.handshake.extensions_server_name"] == "secure.example.org"
    assert layers[4]["icmp"]["icmp.type"] == "8"
    assert layers[5]["arp"]["arp.src.proto_ipv4"] == "10.0.0.1"
    assert layers[5]["arp"]["arp.opcode"] == "1"
    assert layers[6]["ip"]["ip.ttl"] == "64"
    assert layers[6]["tcp"]["tcp.flags"] == "0x00000002"


def test_truncated_trailing_record_stops_cleanly():
    raw = pcap_bytes(example_packets())
    assert len(list(decode_pcap_bytes(raw[:-10]))) == 6  # last record dropped
    assert list(decode_pcap_bytes(b"\x00" * 30)) == []  # bad magic
    assert list(decode_pcap_bytes(raw[:20])) == []  # short header


def test_pcap_to_udm_end_to_end(spark):
    d = tempfile.mkdtemp(prefix="css_pcap_")
    with open(os.path.join(d, "capture_1.pcap"), "wb") as f:
        f.write(pcap_bytes(example_packets()))
    raw = read_pcap(spark, d)
    udm = project_udm(raw, processing_time="2025-01-01T00:00:00.000000Z")
    rows = udm.select(
        F.col("event.metadata.event_type").alias("et"),
        F.col("event.principal.port").alias("pport"),
        F.col("event.metadata.event_timestamp").alias("ts"),
    ).collect()
    assert len(rows) == 7  # one in, one out
    types = [r.et for r in rows]
    assert types == [
        "NETWORK_HTTP",
        "NETWORK_DNS",
        "NETWORK_DNS",
        "NETWORK_SSL",
        "NETWORK_ICMP",
        "NETWORK_ARP",
        "NETWORK_CONNECTION",
    ]
    assert rows[0].pport == 49152
    # [:26] truncation parity with the reference (json2udm_cloud.py:31):
    # a 2-digit day leaves room for only 4 fraction digits
    assert rows[0].ts == "2025-06-10T13:14:15.123400Z"


def test_tshark_fidelity_mode(spark):
    """S4 fidelity path (processor_app.py:150-155): same pcap through a
    real tshark subprocess must classify identically to the native
    decoder.  Skips where the container ships no tshark."""
    import pytest

    from chronicle_sniffer_spark.sources.pcap import read_pcap_tshark, tshark_available

    if not tshark_available():
        pytest.skip("tshark not installed in this container")
    d = tempfile.mkdtemp(prefix="css_pcap_tshark_")
    with open(os.path.join(d, "capture_1.pcap"), "wb") as f:
        f.write(pcap_bytes(example_packets()))
    udm = project_udm(
        read_pcap_tshark(spark, d), processing_time="2025-01-01T00:00:00.000000Z"
    )
    rows = udm.select(F.col("event.metadata.event_type").alias("et")).collect()
    assert len(rows) == 7
    assert rows[0].et in ("NETWORK_HTTP", "NETWORK_CONNECTION")


def test_python_datasource_partitioned_deterministic(spark):
    """The custom synth_packets Python Data Source reads
    partition-parallel (one task per declared input partition) and is
    deterministic across reads; row formulas match the closed-form
    oracle in s10_python_datasource."""
    import pyspark.sql.functions as F

    from chronicle_sniffer_spark.sources.packet_source import register

    register(spark)
    df = spark.read.format("synth_packets").option("n", 1000).option("parts", 4).load()
    assert df.count() == 1000
    pids = df.select(F.spark_partition_id().alias("p")).distinct().count()
    assert pids == 4
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, df.collect()))
    row0 = df.filter("pkt_id = 77").collect()[0]
    assert (row0.proto, row0.dst_port, row0.length) == ("udp", 1024 + 77, 64 + 77 * 31 % 1400)
