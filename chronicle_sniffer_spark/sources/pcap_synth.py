"""Deterministic synthetic pcap builder (test/smoke scaffolding for
S4/R9 — the reference's own binary test captures are missing blobs,
.MISSING_LARGE_BLOBS:1-3, so fixtures are synthesized from the field
accesses the decoder must serve)."""

from __future__ import annotations

import struct

TS = (1749561255, 123456)  # Jun 10, 2025 13:14:15.123456 UTC


def eth(src="aa:bb:cc:dd:ee:01", dst="aa:bb:cc:dd:ee:02", ethertype=0x0800) -> bytes:
    mac = lambda s: bytes(int(x, 16) for x in s.split(":"))  # noqa: E731
    return mac(dst) + mac(src) + struct.pack("!H", ethertype)


def ipv4(src="10.0.0.1", dst="10.0.0.2", proto=6, payload=b"", ttl=64) -> bytes:
    ip = lambda s: bytes(int(x) for x in s.split("."))  # noqa: E731
    total = 20 + len(payload)
    return (
        struct.pack("!BBHHHBBH", 0x45, 0, total, 1, 0, ttl, proto, 0) + ip(src) + ip(dst) + payload
    )


def tcp(sport, dport, payload=b"", flags=0x018) -> bytes:
    return struct.pack("!HHIIBBHHH", sport, dport, 1, 1, 5 << 4, flags & 0xFF, 8192, 0, 0) + payload


def udp(sport, dport, payload=b"") -> bytes:
    return struct.pack("!HHHH", sport, dport, 8 + len(payload), 0) + payload


def dns_query(name="example.com", qtype=1) -> bytes:
    q = b"".join(bytes([len(p)]) + p.encode() for p in name.split(".")) + b"\x00"
    return struct.pack("!HHHHHH", 0x1234, 0x0100, 1, 0, 0, 0) + q + struct.pack("!HH", qtype, 1)


def dns_response(name="example.com", ttl=300) -> bytes:
    q = b"".join(bytes([len(p)]) + p.encode() for p in name.split(".")) + b"\x00"
    ans = b"\xc0\x0c" + struct.pack("!HHIH", 1, 1, ttl, 4) + bytes([93, 184, 216, 34])
    return struct.pack("!HHHHHH", 0x1234, 0x8180, 1, 1, 0, 0) + q + struct.pack("!HH", 1, 1) + ans


def client_hello(sni="secure.example.org") -> bytes:
    sni_b = sni.encode()
    ext_body = struct.pack("!HBH", len(sni_b) + 3, 0, len(sni_b)) + sni_b
    ext = struct.pack("!HH", 0, len(ext_body)) + ext_body
    exts = struct.pack("!H", len(ext)) + ext
    body = (
        struct.pack("!H", 0x0303)
        + b"\x00" * 32
        + b"\x00"
        + struct.pack("!H", 2)
        + b"\x00\x2f"
        + b"\x01\x00"
        + exts
    )
    hs = b"\x01" + struct.pack("!I", len(body))[1:] + body
    return b"\x16\x03\x01" + struct.pack("!H", len(hs)) + hs


def example_packets() -> list[bytes]:
    """Seven frames covering every classifier branch (SURVEY §2C.2)."""
    http_payload = (
        b"GET /index.html HTTP/1.1\r\nHost: www.test.it\r\nUser-Agent: curl/8.0\r\n\r\n"
    )
    return [
        eth() + ipv4(proto=6, payload=tcp(49152, 80, http_payload)),
        eth() + ipv4(proto=17, payload=udp(49153, 53, dns_query())),
        eth() + ipv4(proto=17, payload=udp(53, 49153, dns_response())),
        eth() + ipv4(proto=6, payload=tcp(49154, 443, client_hello())),
        eth() + ipv4(proto=1, payload=struct.pack("!BBHHH", 8, 0, 0, 1, 1)),
        eth(ethertype=0x0806)
        + struct.pack("!HHBBH", 1, 0x0800, 6, 4, 1)
        + bytes(int(x, 16) for x in "aa:bb:cc:dd:ee:01".split(":"))
        + bytes([10, 0, 0, 1])
        + b"\x00" * 6
        + bytes([10, 0, 0, 2]),
        eth() + ipv4(proto=6, payload=tcp(49155, 9999, flags=0x002)),  # SYN, no app layer
    ]


def pcap_bytes(packets: list[bytes], snaplen: int = 65535) -> bytes:
    out = struct.pack("<IHHiIII", 0xA1B2C3D4, 2, 4, 0, 0, snaplen, 1)
    for i, pkt in enumerate(packets):
        out += struct.pack("<IIII", TS[0], TS[1] + i, len(pkt), len(pkt)) + pkt
    return out


def _png_block(btype: int, body: bytes, endian: str = "<") -> bytes:
    padded = body + b"\x00" * ((-len(body)) % 4)
    blen = 12 + len(padded)
    return (
        struct.pack(endian + "II", btype, blen)
        + padded
        + struct.pack(endian + "I", blen)
    )


def pcapng_bytes(
    packets: list[bytes],
    tsresol: int = 6,
    snaplen: int = 65535,
    endian: str = "<",
    trailing_spb: bytes | None = None,
) -> bytes:
    """Deterministic pcapng (SHB + IDB + one EPB per frame) carrying
    the SAME frames and timestamps as :func:`pcap_bytes`, so the two
    container decodes must produce identical packet rows.  ``tsresol``
    is a negative power of 10 (6 = the spec default microseconds; any
    other value is written as an explicit if_tsresol option).
    ``trailing_spb`` appends one Simple Packet Block (no timestamp)."""
    shb_body = struct.pack(endian + "IHHq", 0x1A2B3C4D, 1, 0, -1)
    out = _png_block(0x0A0D0D0A, shb_body, endian)
    idb_body = struct.pack(endian + "HHI", 1, 0, snaplen)  # EN10MB
    if tsresol != 6:
        idb_body += (
            struct.pack(endian + "HH", 9, 1)
            + bytes([tsresol])
            + b"\x00" * 3
            + struct.pack(endian + "HH", 0, 0)
        )
    out += _png_block(0x00000001, idb_body, endian)
    denom = 10**tsresol
    for i, pkt in enumerate(packets):
        ticks = TS[0] * denom + (TS[1] + i) * denom // 10**6
        body = (
            struct.pack(
                endian + "IIIII",
                0,
                (ticks >> 32) & 0xFFFFFFFF,
                ticks & 0xFFFFFFFF,
                len(pkt),
                len(pkt),
            )
            + pkt
        )
        out += _png_block(0x00000006, body, endian)
    if trailing_spb is not None:
        out += _png_block(
            0x00000003,
            struct.pack(endian + "I", len(trailing_spb)) + trailing_spb,
            endian,
        )
    return out
