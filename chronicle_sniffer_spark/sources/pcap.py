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

Both capture containers decode natively: classic pcap
(micro/nano, either endianness) and pcapng (SHB/IDB/EPB/SPB with
per-interface if_tsresol — the format the reference's sniffer actually
rotates, sniffer_entrypoint.sh:159-164).  A file matching neither
magic quarantines as ONE error row rather than silently producing
zero packets.

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
PCAPNG_SHB = b"\x0a\x0d\x0d\x0a"  # Section Header Block type (palindromic)
PCAPNG_BOM = 0x1A2B3C4D  # byte-order magic inside the SHB

ETH_IPV4, ETH_IPV6, ETH_ARP = 0x0800, 0x86DD, 0x0806

DECODED_DDL = "packet_json string, source_file string, decode_error string"


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
        # tshark spells the dispatch step out: "eth:ethertype:arp"
        protocols.extend(["ethertype", "arp"])
        opcode = struct.unpack("!H", p[6:8])[0]
        layers["arp"] = {
            "arp.opcode": str(opcode),
            "arp.src.hw_mac": _mac(p[8:14]),
            "arp.src.proto_ipv4": _ip4(p[14:18]),
            "arp.dst.hw_mac": _mac(p[18:24]),
            "arp.dst.proto_ipv4": _ip4(p[24:28]),
        }
    elif ethertype == ETH_IPV4 and len(p) >= 20:
        protocols.extend(["ethertype", "ip"])
        ihl = (p[0] & 0x0F) * 4
        layers["ip"] = {"ip.src": _ip4(p[12:16]), "ip.dst": _ip4(p[16:20]), "ip.ttl": str(p[8])}
        proto = p[9]
        payload = p[ihl:]
    elif ethertype == ETH_IPV6 and len(p) >= 40:
        protocols.extend(["ethertype", "ipv6"])
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


def _idb_tsresol(body: bytes, endian: str) -> tuple[int, bool]:
    """Interface Description Block → (exponent, is_power_of_2) timestamp
    resolution.  Default per the pcapng spec is 10^-6 (microseconds);
    the if_tsresol option (code 9) overrides: MSB clear = negative
    power of 10, MSB set = negative power of 2."""
    exp, pow2 = 6, False
    off = 8  # LinkType(2) + Reserved(2) + SnapLen(4)
    while off + 4 <= len(body):
        code, olen = struct.unpack(endian + "HH", body[off : off + 4])
        off += 4
        if code == 0:  # opt_endofopt
            break
        if code == 9 and olen == 1 and off < len(body):
            raw = body[off]
            exp, pow2 = raw & 0x7F, bool(raw & 0x80)
        off += (olen + 3) & ~3  # options pad to 32-bit boundaries
    return exp, pow2


def _pcapng_ts(ticks: int, res: tuple[int, bool]) -> tuple[int, int]:
    """(ticks since epoch, (exp, pow2)) → (seconds, nanoseconds)."""
    exp, pow2 = res
    denom = (1 << exp) if pow2 else 10**exp
    sec, rem = divmod(ticks, denom)
    return sec, rem * 1_000_000_000 // denom


def decode_pcapng_bytes(content: bytes) -> Iterator[dict]:
    """Walk a pcapng byte string; yields tshark-shaped packets.

    Handles the block grammar of the pcapng spec
    (draft-tuexen-opsawg-pcapng): SHB (0x0A0D0D0A, byte-order magic
    fixes section endianness, resets the interface list), IDB
    (per-interface if_tsresol), EPB (64-bit tick timestamp in the
    owning interface's resolution) and SPB (no timestamp → epoch).
    Unknown block types (NRB, ISB, custom) are skipped by Block Total
    Length — forward-compatible, exactly how tshark treats them.
    Truncated or length-corrupt trailing blocks stop the walk cleanly
    (partial rotated files must not error — ref retries them next
    cycle, sniffer_entrypoint.sh:199-204).  The reference's sniffer
    ships ``.pcapng`` by name (sniffer_entrypoint.sh:159-164) and
    modern tshark ring buffers write pcapng by default, so this is the
    container a real deployment replays.
    """
    n = len(content)
    off, num = 0, 0
    endian: str | None = None
    ifaces: list[tuple[int, bool]] = []
    while off + 12 <= n:
        if content[off : off + 4] == PCAPNG_SHB:
            bom = content[off + 8 : off + 12]
            if bom == struct.pack("<I", PCAPNG_BOM):
                endian = "<"
            elif bom == struct.pack(">I", PCAPNG_BOM):
                endian = ">"
            else:
                return  # corrupt SHB
            ifaces = []  # interface IDs are section-scoped
        if endian is None:
            return  # first block must be an SHB
        btype, blen = struct.unpack(endian + "II", content[off : off + 8])
        if blen < 12 or blen % 4 or off + blen > n:
            return  # truncated trailing block
        body = content[off + 8 : off + blen - 4]
        if btype == 0x00000001:  # IDB
            if len(body) >= 8:
                ifaces.append(_idb_tsresol(body, endian))
        elif btype == 0x00000006 and len(body) >= 20:  # EPB
            iface, ts_hi, ts_lo, caplen, _wire = struct.unpack(
                endian + "IIIII", body[:20]
            )
            data = body[20 : 20 + caplen]
            if len(data) == caplen:
                res = ifaces[iface] if iface < len(ifaces) else (6, False)
                sec, nanos = _pcapng_ts((ts_hi << 32) | ts_lo, res)
                num += 1
                yield {
                    "_source": {
                        "layers": _decode_packet(data, _ts_tshark(sec, nanos, True), num)
                    }
                }
        elif btype == 0x00000003 and len(body) >= 4:  # SPB
            (wire,) = struct.unpack(endian + "I", body[:4])
            data = body[4 : 4 + min(wire, len(body) - 4)]
            num += 1
            yield {
                "_source": {
                    "layers": _decode_packet(data, _ts_tshark(0, 0, True), num)
                }
            }
        off += blen


def sniff_capture_kind(content: bytes) -> str:
    """'pcap' | 'pcapng' | 'unknown' from the leading magic."""
    if len(content) >= 4 and content[:4] == PCAPNG_SHB:
        return "pcapng"
    if len(content) >= 4:
        m_le = struct.unpack("<I", content[:4])[0]
        m_be = struct.unpack(">I", content[:4])[0]
        known = PCAP_MAGIC_MICRO + PCAP_MAGIC_NANO
        if m_le in known or m_be in known:
            return "pcap"
    return "unknown"


def decode_capture_bytes(content: bytes) -> Iterator[dict]:
    """Magic-sniffing dispatcher over both capture containers."""
    kind = sniff_capture_kind(content)
    if kind == "pcapng":
        yield from decode_pcapng_bytes(content)
    elif kind == "pcap":
        yield from decode_pcap_bytes(content)
    # 'unknown' yields nothing here — read_pcap emits the file-level
    # quarantine row (the decoder itself stays a pure packet iterator)


def read_pcap(spark: SparkSession, path: str) -> DataFrame:
    """S4: capture files (classic pcap AND pcapng) → one row per
    packet, same columns as
    :func:`chronicle_sniffer_spark.sources.json_source.read_tshark_json`
    (``_source`` VARIANT, ``_corrupt_record``, ``source_file``), so
    ``project_udm`` runs unchanged on live captures.

    A file whose magic matches NEITHER container emits exactly one
    quarantine row (``_source`` NULL, ``_corrupt_record`` carrying the
    reason) instead of silently vanishing: one-in-one-out at file
    granularity, the batch analogue of the reference 500-ing an
    unreadable file into retry/DLQ (processor_app.py:184-190)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_json, out_file, out_err = [], [], []
            for path_, content in zip(pdf["path"], pdf["content"]):
                raw = bytes(content)
                if sniff_capture_kind(raw) == "unknown":
                    magic = raw[:4].hex() if len(raw) >= 4 else raw.hex()
                    out_json.append(None)
                    out_file.append(path_)
                    out_err.append(
                        f"undecodable capture file: unknown magic 0x{magic or '(empty)'}"
                    )
                    continue
                for pkt in decode_capture_bytes(raw):
                    out_json.append(json.dumps(pkt["_source"], separators=(",", ":")))
                    out_file.append(path_)
                    out_err.append(None)
            yield pd.DataFrame(
                {"packet_json": out_json, "source_file": out_file, "decode_error": out_err}
            )

    decoded = files.select("path", "content").mapInPandas(decode, DECODED_DDL)
    return _shape_decoded(decoded)


def _shape_decoded(decoded: DataFrame) -> DataFrame:
    """packet_json rows → the json_source column contract.  A NULL
    packet_json with a decode_error becomes the corrupt-record shape
    the UDM error chain already quarantines (udm.py corrupt_elem)."""
    return decoded.select(
        F.parse_json(F.col("packet_json")).alias("_source"),
        F.col("decode_error").alias("_corrupt_record"),
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
            yield pd.DataFrame(
                {
                    "packet_json": out_json,
                    "source_file": out_file,
                    "decode_error": [None] * len(out_json),
                }
            )

    return _shape_decoded(files.select("path", "content").mapInPandas(decode, DECODED_DDL))
