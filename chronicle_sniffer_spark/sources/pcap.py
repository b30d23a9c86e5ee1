"""pcap ingest (SURVEY §2B S4; ref R9 — the reference's only genuinely
custom operator, `processor_app.py:150-155` shells out to
``tshark -r file -T json``).

Spark has no pcap datasource, so this module implements the decode as:

    spark.read.format("binaryFile")        # one row per capture file
      → mapInPandas(decode)                # pure-Python packet walk,
                                           #   Arrow-batched, per-file
      → parse_json(packet_json) AS _source # tshark-shaped VARIANT
      → project_udm(...)                   # the existing UDM pipeline

The decoder emits, per packet, a JSON object shaped exactly like one
element of ``tshark -T json`` output for the protocol subset the
reference reads (SURVEY §1.3): eth / ip / ipv6 / arp / tcp / udp /
icmp, DNS queries+answers, HTTP request/response headers, TLS
ClientHello SNI.  Anything it can't parse becomes a packet with only a
``frame`` layer (→ ``NETWORK_CONNECTION``), and a truncated/corrupt
trailing record yields a row whose JSON still parses — one-in-one-out
is preserved (SURVEY §2C.1).

Scale shape: ``binaryFile`` gives one task per capture file, matching
the reference's unit of work (rotated ≤10 MB pcaps); decode is a
narrow Arrow-batched map with no shuffle, and the emitted JSON-lines
feed a splittable downstream.  tshark-subprocess fidelity mode stays
possible by swapping ``decode_pcap_bytes`` for an ``rdd.pipe`` step.
"""

from __future__ import annotations

import json
import struct
from datetime import datetime, timezone
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PCAP_MAGIC_MICRO = (0xA1B2C3D4, 0xD4C3B2A1)
PCAP_MAGIC_NANO = (0xA1B23C4D, 0x4D3CB2A1)

ETH_IPV4, ETH_IPV6, ETH_ARP = 0x0800, 0x86DD, 0x0806

DECODED_DDL = "packet_json string, source_file string"


def _mac(b: bytes) -> str:
    return ":".join(f"{x:02x}" for x in b)


def _ip4(b: bytes) -> str:
    return ".".join(str(x) for x in b)


def _ip6(b: bytes) -> str:
    import ipaddress

    return str(ipaddress.IPv6Address(b))


def _ts_tshark(sec: int, frac: int, nano: bool) -> str:
    """tshark frame.time_utc shape: 'Jun 10, 2025 13:14:15.123456'."""
    micros = frac // 1000 if nano else frac
    dt = datetime.fromtimestamp(sec, tz=timezone.utc)
    # %-d (no zero pad) matches tshark; strftime portability via lstrip
    day = str(dt.day)
    return f"{dt.strftime('%b')} {day}, {dt.strftime('%Y %H:%M:%S')}.{micros:06d}"


def _dns_name(payload: bytes, off: int, depth: int = 0) -> tuple[str, int]:
    """Parse a (possibly compressed) DNS name; returns (name, next_off)."""
    labels = []
    while off < len(payload):
        n = payload[off]
        if n == 0:
            off += 1
            break
        if n & 0xC0 == 0xC0:  # compression pointer
            if depth > 5 or off + 1 >= len(payload):
                break
            ptr = ((n & 0x3F) << 8) | payload[off + 1]
            tail, _ = _dns_name(payload, ptr, depth + 1)
            labels.append(tail)
            off += 2
            return ".".join(labels), off
        off += 1
        labels.append(payload[off : off + n].decode("ascii", "replace"))
        off += n
    return ".".join(labels), off


_DNS_TYPES = {1: "A", 2: "NS", 5: "CNAME", 6: "SOA", 12: "PTR", 15: "MX", 16: "TXT", 28: "AAAA"}


def _parse_dns(payload: bytes) -> dict | None:
    if len(payload) < 12:
        return None
    _txid, flags, qd, an, _ns, _ar = struct.unpack("!HHHHHH", payload[:12])
    is_response = (flags >> 15) & 1
    layer: dict = {"dns.flags_tree": {"dns.flags.response": str(is_response)}}
    off = 12
    queries = {}
    for i in range(min(qd, 16)):
        name, off = _dns_name(payload, off)
        if off + 4 > len(payload):
            break
        qtype, _qclass = struct.unpack("!HH", payload[off : off + 4])
        off += 4
        queries[f"{name}: type {_DNS_TYPES.get(qtype, str(qtype))}"] = {
            "dns.qry.name": name,
            "dns.qry.type": str(qtype),
        }
    if queries:
        layer["Queries"] = queries
    answers = {}
    for i in range(min(an, 32)):
        name, off = _dns_name(payload, off)
        if off + 10 > len(payload):
            break
        rtype, _rclass, ttl, rdlen = struct.unpack("!HHIH", payload[off : off + 10])
        off += 10 + rdlen
        answers[f"{name}: type {_DNS_TYPES.get(rtype, str(rtype))} #{i}"] = {
            "dns.resp.ttl": str(ttl)
        }
    if answers:
        layer["Answers"] = answers
    return layer


def _parse_http(payload: bytes) -> dict | None:
    try:
        text = payload.decode("latin-1")
    except Exception:
        return None
    head = text.split("\r\n\r\n", 1)[0]
    lines = head.split("\r\n")
    first = lines[0].split(" ")
    layer: dict = {}
    methods = ("GET", "POST", "PUT", "DELETE", "HEAD", "OPTIONS", "PATCH")
    if first[0] in methods and len(first) >= 3:
        layer["http.request.method"] = first[0]
        uri = first[1]
        headers = {
            k.lower(): v for k, v, *_ in (ln.split(": ", 1) + [""] for ln in lines[1:] if ": " in ln)
        }
        host = headers.get("host", "")
        if host:
            layer["http.host"] = host
            layer["http.request.full_uri"] = f"http://{host}{uri}"
        if "user-agent" in headers:
            layer["http.user_agent"] = headers["user-agent"]
    elif first[0].startswith("HTTP/") and len(first) >= 2:
        layer["http.response.code"] = first[1]
        body = text.split("\r\n\r\n", 1)
        if len(body) == 2 and body[1]:
            layer["http.file_data"] = body[1][:1000]
    return layer or None


def _parse_tls(payload: bytes) -> dict | None:
    """TLS record header + ClientHello SNI walk (the only TLS fields
    the reference reads, json2udm_cloud.py:226-253)."""
    if len(payload) < 5 or payload[0] not in (0x14, 0x15, 0x16, 0x17):
        return None
    rec_ver = f"0x{payload[1]:02x}{payload[2]:02x}"
    record: dict = {"tls.record.version": rec_ver}
    if payload[0] == 0x16 and len(payload) >= 9 and payload[5] in (0x01, 0x02):
        hs: dict = {}
        if len(payload) >= 11:
            hs["tls.handshake.version"] = f"0x{payload[9]:02x}{payload[10]:02x}"
        sni = _client_hello_sni(payload[5:])
        if sni:
            hs["tls.handshake.extensions_server_name"] = sni
        if hs:
            record["tls.handshake"] = hs
    return {"tls.record": record}


def _client_hello_sni(hs: bytes) -> str | None:
    try:
        if hs[0] != 0x01:
            return None
        off = 4 + 2 + 32  # type+len, version, random
        sid_len = hs[off]
        off += 1 + sid_len
        cs_len = struct.unpack("!H", hs[off : off + 2])[0]
        off += 2 + cs_len
        cm_len = hs[off]
        off += 1 + cm_len
        ext_total = struct.unpack("!H", hs[off : off + 2])[0]
        off += 2
        end = off + ext_total
        while off + 4 <= min(end, len(hs)):
            etype, elen = struct.unpack("!HH", hs[off : off + 4])
            off += 4
            if etype == 0 and off + 9 <= len(hs):  # server_name
                name_len = struct.unpack("!H", hs[off + 3 : off + 5])[0]
                return hs[off + 5 : off + 5 + name_len].decode("ascii", "replace")
            off += elen
        return None
    except (IndexError, struct.error):
        return None


def _decode_packet(data: bytes, ts: str, num: int) -> dict:
    """One captured frame → tshark-shaped layers dict."""
    protocols = ["eth"]
    layers: dict = {}
    if len(data) < 14:
        return {
            "frame": {
                "frame.number": str(num),
                "frame.time_utc": ts,
                "frame.protocols": "eth:malformed",
            }
        }
    layers["eth"] = {"eth.src": _mac(data[6:12]), "eth.dst": _mac(data[0:6])}
    ethertype = struct.unpack("!H", data[12:14])[0]
    p = data[14:]
    proto = None  # L4 protocol number
    payload = b""
    sport = dport = None

    if ethertype == ETH_ARP and len(p) >= 28:
        protocols.append("arp")
        opcode = struct.unpack("!H", p[6:8])[0]
        layers["arp"] = {
            "arp.opcode": str(opcode),
            "arp.src.hw_mac": _mac(p[8:14]),
            "arp.src.proto_ipv4": _ip4(p[14:18]),
            "arp.dst.hw_mac": _mac(p[18:24]),
            "arp.dst.proto_ipv4": _ip4(p[24:28]),
        }
    elif ethertype == ETH_IPV4 and len(p) >= 20:
        protocols.append("ip")
        ihl = (p[0] & 0x0F) * 4
        layers["ip"] = {"ip.src": _ip4(p[12:16]), "ip.dst": _ip4(p[16:20]), "ip.ttl": str(p[8])}
        proto = p[9]
        payload = p[ihl:]
    elif ethertype == ETH_IPV6 and len(p) >= 40:
        protocols.append("ipv6")
        layers["ipv6"] = {"ipv6.src": _ip6(p[8:24]), "ipv6.dst": _ip6(p[24:40])}
        proto = p[6]
        payload = p[40:]

    app = b""
    if proto == 6 and len(payload) >= 20:  # TCP
        protocols.append("tcp")
        sport, dport = struct.unpack("!HH", payload[:4])
        doff = (payload[12] >> 4) * 4
        flags = struct.unpack("!H", payload[12:14])[0] & 0x0FFF
        layers["tcp"] = {
            "tcp.srcport": str(sport),
            "tcp.dstport": str(dport),
            "tcp.flags": f"0x{flags:08x}",
        }
        app = payload[doff:]
    elif proto == 17 and len(payload) >= 8:  # UDP
        protocols.append("udp")
        sport, dport = struct.unpack("!HH", payload[:4])
        layers["udp"] = {"udp.srcport": str(sport), "udp.dstport": str(dport)}
        app = payload[8:]
    elif proto in (1, 58) and len(payload) >= 4:  # ICMP / ICMPv6
        protocols.append("icmp")
        layers["icmp"] = {"icmp.type": str(payload[0]), "icmp.code": str(payload[1])}

    if app:
        if 53 in (sport, dport):
            dns = _parse_dns(app)
            if dns:
                protocols.append("dns")
                layers["dns"] = dns
        elif 443 in (sport, dport):
            tls = _parse_tls(app)
            if tls:
                protocols.append("tls")
                layers["tls"] = tls
        else:
            http = _parse_http(app)
            if http:
                protocols.append("http")
                layers["http"] = http

    layers = {
        "frame": {
            "frame.number": str(num),
            "frame.time_utc": ts,
            "frame.protocols": ":".join(protocols),
        },
        **layers,
    }
    return layers


def decode_pcap_bytes(content: bytes) -> Iterator[dict]:
    """Walk a classic-pcap byte string; yields tshark-shaped packets.

    Truncated trailing records stop the walk cleanly (partial rotated
    files must not error — ref retries them next cycle,
    sniffer_entrypoint.sh:199-204).
    """
    if len(content) < 24:
        return
    magic = struct.unpack("<I", content[:4])[0]
    if magic in (PCAP_MAGIC_MICRO[0], PCAP_MAGIC_NANO[0]):
        endian = "<"
    elif struct.unpack(">I", content[:4])[0] in (PCAP_MAGIC_MICRO[0], PCAP_MAGIC_NANO[0]):
        endian = ">"
        magic = struct.unpack(">I", content[:4])[0]
    else:
        return
    nano = magic == PCAP_MAGIC_NANO[0]
    off, num = 24, 0
    while off + 16 <= len(content):
        sec, frac, caplen, _wirelen = struct.unpack(endian + "IIII", content[off : off + 16])
        off += 16
        if off + caplen > len(content):
            return  # truncated trailing record
        num += 1
        yield {
            "_source": {
                "layers": _decode_packet(
                    content[off : off + caplen], _ts_tshark(sec, frac, nano), num
                )
            }
        }
        off += caplen


def read_pcap(spark: SparkSession, path: str) -> DataFrame:
    """S4: pcap files → one row per packet, same columns as
    :func:`chronicle_sniffer_spark.sources.json_source.read_tshark_json`
    (``_source`` VARIANT, ``_corrupt_record``, ``source_file``), so
    ``project_udm`` runs unchanged on live captures."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_json, out_file = [], []
            for path_, content in zip(pdf["path"], pdf["content"]):
                for pkt in decode_pcap_bytes(bytes(content)):
                    out_json.append(json.dumps(pkt["_source"], separators=(",", ":")))
                    out_file.append(path_)
            yield pd.DataFrame({"packet_json": out_json, "source_file": out_file})

    decoded = files.select("path", "content").mapInPandas(decode, DECODED_DDL)
    return _shape_decoded(decoded)


def _shape_decoded(decoded: DataFrame) -> DataFrame:
    """packet_json rows → the json_source column contract."""
    return decoded.select(
        F.parse_json(F.col("packet_json")).alias("_source"),
        F.lit(None).cast("string").alias("_corrupt_record"),
        "source_file",
    )


def tshark_available() -> bool:
    import shutil as _sh

    return _sh.which("tshark") is not None


def read_pcap_tshark(spark: SparkSession, path: str) -> DataFrame:
    """S4 fidelity mode: decode via a ``tshark -r <file> -T json``
    subprocess per capture file — byte-for-byte the reference's decode
    (processor_app.py:150-155), covering every protocol tshark knows
    rather than the native decoder's subset.

    Same plan shape as :func:`read_pcap` (binaryFile → Arrow-batched
    map, one task per rotated capture, no shuffle); the map writes the
    file bytes to executor-local tmp and streams tshark's JSON array
    back.  Raises RuntimeError where tshark is absent — callers pick
    the native decoder via :func:`tshark_available`.
    """
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import subprocess
        import tempfile

        for pdf in batches:
            out_json, out_file = [], []
            for path_, content in zip(pdf["path"], pdf["content"]):
                with tempfile.NamedTemporaryFile(suffix=".pcap") as tmp:
                    tmp.write(bytes(content))
                    tmp.flush()
                    proc = subprocess.run(
                        ["tshark", "-r", tmp.name, "-T", "json"],
                        capture_output=True,
                        check=False,
                    )
                if proc.returncode != 0:
                    raise RuntimeError(
                        f"tshark failed on {path_}: {proc.stderr[:500]!r}"
                    )
                for pkt in json.loads(proc.stdout or b"[]"):
                    # keep only the reference's unit: the _source object
                    src = pkt.get("_source", pkt)
                    out_json.append(json.dumps(src, separators=(",", ":")))
                    out_file.append(path_)
            yield pd.DataFrame({"packet_json": out_json, "source_file": out_file})

    return _shape_decoded(files.select("path", "content").mapInPandas(decode, DECODED_DDL))
