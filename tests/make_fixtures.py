"""Generate the tshark-shaped JSON fixture matrix (FIXTURES.md §2).

Deterministic — run once, commit the outputs:
    python tests/make_fixtures.py
"""

from __future__ import annotations

import json
import os

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")

TS = "Jun 10, 2025 13:14:15.123456"


def frame(num: str, protocols: str, ts: str = TS) -> dict:
    return {"frame.number": num, "frame.time_utc": ts, "frame.protocols": protocols}


def pkt(layers: dict) -> dict:
    return {"_source": {"layers": layers}}


FIXTURES: dict[str, object] = {
    "tcp_http.json": [
        pkt(
            {
                "frame": frame("1", "eth:ethertype:ip:tcp:http"),
                "eth": {"eth.src": "aa:bb:cc:dd:ee:01", "eth.dst": "aa:bb:cc:dd:ee:02"},
                "ip": {"ip.src": "10.0.0.1", "ip.dst": "93.184.216.34", "ip.ttl": "64"},
                "tcp": {"tcp.srcport": "51234", "tcp.dstport": "80", "tcp.flags": "0x0018"},
                "http": {
                    "http.host": "example.com",
                    "http.request.method": "GET",
                    "http.request.full_uri": "http://example.com/index.html",
                    "http.user_agent": "curl/8.0",
                },
            }
        ),
        pkt(
            {
                "frame": frame("2", "eth:ethertype:ip:tcp:http", "Jun 10, 2025 13:14:15.223456"),
                "eth": {"eth.src": "aa:bb:cc:dd:ee:02", "eth.dst": "aa:bb:cc:dd:ee:01"},
                "ip": {"ip.src": "93.184.216.34", "ip.dst": "10.0.0.1", "ip.ttl": "57"},
                "tcp": {"tcp.srcport": "80", "tcp.dstport": "51234", "tcp.flags": "0x0018"},
                "http": {
                    "http.response.code": "200",
                    "http.file_data": "<html>hello</html>",
                },
            }
        ),
    ],
    "udp_dns_query.json": [
        pkt(
            {
                "frame": frame("1", "eth:ethertype:ip:udp:dns"),
                "eth": {"eth.src": "aa:bb:cc:dd:ee:01", "eth.dst": "aa:bb:cc:dd:ee:02"},
                "ip": {"ip.src": "10.0.0.1", "ip.dst": "8.8.8.8", "ip.ttl": "64"},
                "udp": {"udp.srcport": "53124", "udp.dstport": "53"},
                "dns": {
                    "Queries": {
                        "example.com: type A, class IN": {
                            "dns.qry.name": "example.com",
                            "dns.qry.type": "1",
                        },
                        # type-less query — §2C.6 index-guarded zip
                        "other.org: class IN": {"dns.qry.name": "other.org"},
                    },
                    "dns.flags_tree": {"dns.flags.response": "0"},
                },
            }
        )
    ],
    "udp_dns_response.json": [
        pkt(
            {
                "frame": frame("1", "eth:ethertype:ip:udp:dns"),
                "ip": {"ip.src": "8.8.8.8", "ip.dst": "10.0.0.1", "ip.ttl": "120"},
                "udp": {"udp.srcport": "53", "udp.dstport": "53124"},
                "dns": {
                    "Queries": {
                        "example.com: type A, class IN": {
                            "dns.qry.name": "example.com",
                            "dns.qry.type": "1",
                        }
                    },
                    "Answers": {
                        "example.com: type A": {"dns.resp.ttl": "300"},
                        "example.com: type A (2)": {"dns.resp.ttl": "60"},
                    },
                    "dns.flags_tree": {"dns.flags.response": "1"},
                },
            }
        )
    ],
    "tcp_tls_sni.json": [
        pkt(
            {
                "frame": frame("1", "eth:ethertype:ip:tcp:tls"),
                "ip": {"ip.src": "10.0.0.1", "ip.dst": "142.250.74.36", "ip.ttl": "64"},
                "tcp": {"tcp.srcport": "44321", "tcp.dstport": "443", "tcp.flags": "0x0018"},
                "tls": {
                    "tls.record": {
                        "tls.record.version": "0x0301",
                        "tls.handshake": {
                            "tls.handshake.version": "0x0303",
                            "tls.handshake.extensions_server_name": "www.google.com",
                        },
                    }
                },
            }
        )
    ],
    "tcp_tls_record_list.json": [
        pkt(
            {
                "frame": frame("1", "eth:ethertype:ip:tcp:tls"),
                "ip": {"ip.src": "10.0.0.2", "ip.dst": "151.101.1.140", "ip.ttl": "64"},
                "tcp": {"tcp.srcport": "44400", "tcp.dstport": "443", "tcp.flags": "0x0018"},
                "tls": {
                    # list form — only the FIRST record is analyzed (§2C.7)
                    "tls.record": [
                        {"tls.record.version": "0x0303"},
                        {
                            "tls.record.version": "0x0304",
                            "tls.handshake": {"tls.handshake.version": "0x0304"},
                        },
                    ]
                },
            }
        )
    ],
    "tcp_dns_and_tls.json": [
        pkt(
            {
                # both DNS and TLS present → last-writer-wins ⇒ NETWORK_SSL (§2C.2)
                "frame": frame("1", "eth:ethertype:ip:tcp:dns:tls"),
                "ip": {"ip.src": "10.0.0.3", "ip.dst": "1.1.1.1", "ip.ttl": "64"},
                "tcp": {"tcp.srcport": "45000", "tcp.dstport": "853", "tcp.flags": "0x0018"},
                "dns": {
                    "Queries": {
                        "secure.example: type AAAA": {
                            "dns.qry.name": "secure.example",
                            "dns.qry.type": "28",
                        }
                    }
                },
                "tls": {"tls.record": {"tls.record.version": "0x0303"}},
            }
        )
    ],
    "icmp_ping.json": [
        pkt(
            {
                "frame": frame("1", "eth:ethertype:ip:icmp"),
                "eth": {"eth.src": "aa:bb:cc:dd:ee:01", "eth.dst": "aa:bb:cc:dd:ee:02"},
                "ip": {"ip.src": "10.0.0.1", "ip.dst": "10.0.0.254", "ip.ttl": "64"},
                "icmp": {"icmp.type": "8", "icmp.code": "0"},
            }
        )
    ],
    "arp_request.json": [
        pkt(
            {
                # eth MACs present but ARP overwrites principal/target (§2C.5)
                "frame": frame("1", "eth:ethertype:arp"),
                "eth": {"eth.src": "aa:bb:cc:dd:ee:01", "eth.dst": "ff:ff:ff:ff:ff:ff"},
                "arp": {
                    "arp.opcode": "1",
                    "arp.src.hw_mac": "aa:bb:cc:dd:ee:99",
                    "arp.src.proto_ipv4": "10.0.0.1",
                    "arp.dst.hw_mac": "00:00:00:00:00:00",
                    "arp.dst.proto_ipv4": "10.0.0.254",
                },
            }
        )
    ],
    "ipv6_tcp.json": [
        pkt(
            {
                "frame": frame("1", "eth:ethertype:ipv6:tcp"),
                "eth": {"eth.src": "aa:bb:cc:dd:ee:01", "eth.dst": "aa:bb:cc:dd:ee:02"},
                "ipv6": {"ipv6.src": "2001:db8::1", "ipv6.dst": "2001:db8::2"},
                "tcp": {"tcp.srcport": "50000", "tcp.dstport": "443", "tcp.flags": "0x0002"},
            }
        )
    ],
    "no_layers.json": [
        {"_source": {}},
        {"_source": {"layers": {}}},
    ],
    "bad_timestamp.json": [
        pkt(
            {
                "frame": frame(
                    "1", "eth:ethertype:ip:tcp",
                    "Jun 10, 2025 13:14:15 Central European Summer Time",
                ),
                "ip": {"ip.src": "10.0.0.1", "ip.dst": "10.0.0.2", "ip.ttl": "64"},
                "tcp": {"tcp.srcport": "1024", "tcp.dstport": "80"},
            }
        ),
        pkt(
            {
                "frame": frame("2", "eth:ethertype:ip:tcp", "Jun 10, 2025 13:14:16 UTC"),
                "ip": {"ip.src": "10.0.0.1", "ip.dst": "10.0.0.2", "ip.ttl": "64"},
                "tcp": {"tcp.srcport": "1025", "tcp.dstport": "80"},
            }
        ),
        pkt(
            {
                "frame": frame("3", "eth:ethertype:ip:tcp", "not a timestamp at all"),
                "ip": {"ip.src": "10.0.0.1", "ip.dst": "10.0.0.2", "ip.ttl": "64"},
                "tcp": {"tcp.srcport": "1026", "tcp.dstport": "80"},
            }
        ),
        pkt(
            {
                "frame": {"frame.number": "4", "frame.protocols": "eth:ethertype:ip:tcp"},
                "ip": {"ip.src": "10.0.0.1", "ip.dst": "10.0.0.2"},
                "tcp": {"tcp.srcport": "1027", "tcp.dstport": "80"},
            }
        ),
    ],
    "mixed_error_packet.json": [
        pkt(
            {
                "frame": frame("1", "eth:ethertype:ip:tcp"),
                "ip": {"ip.src": "10.0.0.1", "ip.dst": "10.0.0.2", "ip.ttl": "64"},
                "tcp": {"tcp.srcport": "2000", "tcp.dstport": "80", "tcp.flags": "0x0010"},
            }
        ),
        # int() failure on the source port → ValueError quarantine
        pkt(
            {
                "frame": frame("2", "eth:ethertype:ip:tcp"),
                "ip": {"ip.src": "10.0.0.1", "ip.dst": "10.0.0.2", "ip.ttl": "64"},
                "tcp": {"tcp.srcport": "not_a_number", "tcp.dstport": "80"},
            }
        ),
        # non-dict layer → AttributeError quarantine
        pkt(
            {
                "frame": frame("3", "eth:ethertype:ip:tcp"),
                "ip": {"ip.src": "10.0.0.1", "ip.dst": "10.0.0.2", "ip.ttl": "64"},
                "tcp": {"tcp.srcport": "2002", "tcp.dstport": "80"},
                "http": "oops-not-a-dict",
            }
        ),
        # oversized packet → snippet truncation at 1000 chars
        pkt(
            {
                "frame": frame("4", "eth:ethertype:ip:udp:dns"),
                "ip": {"ip.src": "10.0.0.1", "ip.dst": "10.0.0.2", "ip.ttl": "64"},
                "udp": {"udp.srcport": "5353", "udp.dstport": "53"},
                "dns": {
                    "Queries": {
                        f"q{i}": {"dns.qry.name": f"host-{i:04d}.example.com", "dns.qry.type": "1"}
                        for i in range(30)
                    },
                    "Answers": {"a0": {"dns.resp.ttl": "badttl"}},
                },
            }
        ),
    ],
    "synflood.json": [
        pkt(
            {
                "frame": frame(
                    str(i + 1),
                    "eth:ethertype:ip:tcp",
                    f"Jun 10, 2025 13:14:{15 + i // 10:02d}.{100000 + i * 1000:06d}",
                ),
                "eth": {"eth.src": "aa:bb:cc:dd:ee:01", "eth.dst": "aa:bb:cc:dd:ee:02"},
                "ip": {"ip.src": f"10.0.{i % 8}.{i % 251}", "ip.dst": "10.0.0.80", "ip.ttl": "64"},
                "tcp": {
                    "tcp.srcport": str(20000 + i * 7),
                    "tcp.dstport": "80",
                    "tcp.flags": "0x0002",
                },
            }
        )
        for i in range(50)
    ],
}


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for name, packets in FIXTURES.items():
        with open(os.path.join(OUT, name), "w") as f:
            json.dump(packets, f, indent=2)
    # deliberately invalid JSON: whole-file quarantine path
    with open(os.path.join(OUT, "corrupt_root.json"), "w") as f:
        f.write('{"not": "an array", "and": [unclosed')
    print(f"wrote {len(FIXTURES) + 1} fixtures to {OUT}")


if __name__ == "__main__":
    main()
