"""Reference-semantics oracle for the UDM projection golden tests.

An independent, from-scratch implementation of the engine's UDM spec
(documented in chronicle_sniffer_spark/udm.py, derived from the
behavior of the reference's json2udm_cloud.py).  Used ONLY by tests to
generate expected outputs with an injected deterministic processing
time (SURVEY §2C.4).

Spec deviations from the reference, shared with the engine:
- frame numbers and SNI are read directly (the reference's dot-path
  walker can never traverse tshark's dotted keys, so it silently
  yields defaults; we implement the documented intent),
- error snippets are canonical minified sorted-key JSON.
"""

from __future__ import annotations

import json
from datetime import datetime, timezone

PRODUCT = "Wireshark TShark"
VENDOR = "Wireshark"


def _iso(dt: datetime) -> str:
    return dt.replace(tzinfo=timezone.utc).isoformat(timespec="microseconds").replace(
        "+00:00", "Z"
    )


def parse_event_time(ts: str | None, processing_time: str) -> str:
    """26-char-truncated primary parse, tz-suffix-stripped fallback,
    injected processing time as last resort."""
    if not ts:
        return processing_time
    try:
        return _iso(datetime.strptime(ts[:26], "%b %d, %Y %H:%M:%S.%f"))
    except ValueError:
        pass
    try:
        cleaned = ts.split(" UTC")[0].split(" Central European Summer Time")[0].strip()
        return _iso(datetime.strptime(cleaned, "%b %d, %Y %H:%M:%S"))
    except ValueError:
        return processing_time


def _snippet(pkt) -> str:
    s = json.dumps(pkt, separators=(",", ":"), sort_keys=True)
    return s[:1000] + "..." if len(s) > 1000 else s


def _drop_none(d: dict) -> dict:
    return {k: v for k, v in d.items() if v is not None}


def _section_values(section, key):
    """All values of `key` across a tshark dict-of-dicts section."""
    if not isinstance(section, dict):
        return []
    return [
        inner[key]
        for inner in section.values()
        if isinstance(inner, dict) and inner.get(key) is not None
    ]


def packet_to_udm(pkt, processing_time: str) -> dict:
    """One packet dict → one UDM event dict. Never raises, never drops."""
    try:
        source = pkt.get("_source", {})
        layers = source.get("layers", {})
        frame = layers.get("frame", {}) if layers else {}
        frame_num = (
            frame.get("frame.number") if isinstance(frame, dict) else None
        )
        if not layers:
            return {
                "event": {
                    "metadata": {
                        "event_timestamp": processing_time,
                        "product_name": f"{PRODUCT} (Malformed)",
                        "vendor_name": VENDOR,
                        "event_type": "NETWORK_EVENT_UNKNOWN",
                        "description": (
                            "Malformed packet data. Frame: "
                            + (frame_num if frame_num is not None else "N/A")
                        ),
                    }
                }
            }

        get_layer = layers.get  # raises AttributeError if layers is a non-dict
        frame = get_layer("frame", {})
        ip4, ip6 = get_layer("ip", {}), get_layer("ipv6", {})
        eth, tcp, udp = get_layer("eth", {}), get_layer("tcp", {}), get_layer("udp", {})
        icmp, arp = get_layer("icmp", {}), get_layer("arp", {})
        http, dns, tls = get_layer("http", {}), get_layer("dns", {}), get_layer("tls", {})

        event_ts = parse_event_time(frame.get("frame.time_utc"), processing_time)

        principal: dict = {}
        target: dict = {}
        network: dict = {}
        about: list = []
        additional: dict = {}
        app: dict = {}
        etype = "NETWORK_CONNECTION"

        if ip4:
            principal["ip"], target["ip"] = ip4.get("ip.src"), ip4.get("ip.dst")
            network["ip_protocol_version"] = 4
            if ip4.get("ip.ttl") is not None:
                additional["ip_ttl"] = str(ip4.get("ip.ttl"))
        elif ip6:
            principal["ip"], target["ip"] = ip6.get("ipv6.src"), ip6.get("ipv6.dst")
            network["ip_protocol_version"] = 6

        if eth:
            principal["mac"], target["mac"] = eth.get("eth.src"), eth.get("eth.dst")

        if tcp:
            network["transport_protocol"] = "TCP"
            for side, field in ((principal, "tcp.srcport"), (target, "tcp.dstport")):
                if tcp.get(field) is not None:
                    side["port"] = int(tcp.get(field))
            if tcp.get("tcp.flags") is not None:
                network["tcp_flags"] = tcp.get("tcp.flags")
        elif udp:
            network["transport_protocol"] = "UDP"
            for side, field in ((principal, "udp.srcport"), (target, "udp.dstport")):
                if udp.get(field) is not None:
                    side["port"] = int(udp.get(field))
        elif icmp:
            network["transport_protocol"] = "ICMP"
            etype = "NETWORK_ICMP"
            for k, field in (("icmp_type", "icmp.type"), ("icmp_code", "icmp.code")):
                if icmp.get(field) is not None:
                    network[k] = str(icmp.get(field))
        elif arp:
            etype = "NETWORK_ARP"
            additional["arp_operation"] = arp.get("arp.opcode")
            principal["mac"] = arp.get("arp.src.hw_mac")
            principal["ip"] = arp.get("arp.src.proto_ipv4")
            target["mac"] = arp.get("arp.dst.hw_mac")
            target["ip"] = arp.get("arp.dst.proto_ipv4")

        if http:
            etype = "NETWORK_HTTP"
            info: dict = {}
            if http.get("http.host"):
                info["host"] = http.get("http.host")
                about.append({"hostname": info["host"]})
            if http.get("http.file_data"):
                info["file_data"] = http.get("http.file_data")
            if http.get("http.request.method"):
                info["method"] = http.get("http.request.method")
            if http.get("http.request.full_uri"):
                info["url"] = http.get("http.request.full_uri")
                about.append({"url": info["url"]})
            if http.get("http.user_agent"):
                info["user_agent"] = http.get("http.user_agent")
            if http.get("http.response.code"):
                info["status_code"] = int(http.get("http.response.code"))
            if info:
                app["http"] = info

        if dns:
            etype = "NETWORK_DNS"
            info = {}
            names = _section_values(dns.get("Queries"), "dns.qry.name")
            types = _section_values(dns.get("Queries"), "dns.qry.type")
            if names:
                info["queries"] = [
                    {"name": n, **({"type": types[i]} if i < len(types) else {})}
                    for i, n in enumerate(names)
                ]
                about.extend({"hostname": n} for n in names)
            ttls = _section_values(dns.get("Answers"), "dns.resp.ttl")
            if ttls:
                info["answer_ttls"] = [int(t) for t in ttls]
            flags = dns.get("dns.flags_tree", {})
            if flags.get("dns.flags.response") is not None:
                info["is_response"] = flags.get("dns.flags.response") == "1"
            if info:
                app["dns"] = info

        if tls:
            etype = "NETWORK_SSL"
            info = {}
            rec = tls.get("tls.record")
            if isinstance(rec, list):
                rec = rec[0] if rec else None
            if isinstance(rec, dict):
                if rec.get("tls.record.version"):
                    info["record_version_protocol"] = rec.get("tls.record.version")
                hs = rec.get("tls.handshake", {})
                if hs.get("tls.handshake.version"):
                    info["handshake_protocol_version"] = hs.get("tls.handshake.version")
                sni = hs.get("tls.handshake.extensions_server_name")
                if sni:
                    info["server_name_indication"] = sni
                    about.append({"hostname": sni})
            if info:
                app["tls"] = info

        fn = frame.get("frame.number")
        payload: dict = {
            "metadata": {
                "event_timestamp": event_ts,
                "product_name": PRODUCT,
                "vendor_name": VENDOR,
                "event_type": etype,
                "description": (
                    f"Packet capture. Protocols: {frame.get('frame.protocols', 'N/A')}."
                    f" Frame No: {fn if fn is not None else 'N/A'}"
                ),
            }
        }
        for key, section in (("principal", principal), ("target", target)):
            cleaned = _drop_none(section)
            if cleaned:
                payload[key] = cleaned
        if network.get("ip_protocol_version") is None:
            network.pop("ip_protocol_version", None)
        cleaned_net = _drop_none(network)
        if cleaned_net:
            payload["network"] = cleaned_net
        kept_about = [a for a in about if a and any(a.values())]
        if kept_about:
            payload["about"] = kept_about
        if app:
            payload.setdefault("network", {})["application_protocol_data"] = app
        cleaned_add = _drop_none(additional)
        if cleaned_add:
            payload["additional"] = cleaned_add
        return {"event": payload}

    except Exception as exc:  # noqa: BLE001 — quarantine, never drop
        try:
            frame_num = pkt["_source"]["layers"]["frame"]["frame.number"]
            if not isinstance(frame_num, str):
                frame_num = None
        except Exception:  # noqa: BLE001
            frame_num = None
        return {
            "event": {
                "metadata": {
                    "event_timestamp": processing_time,
                    "product_name": f"{PRODUCT} (PacketProcessingError)",
                    "vendor_name": VENDOR,
                    "event_type": "NETWORK_EVENT_ERROR",
                    "description": (
                        "Error during UDM conversion for packet. Frame No: "
                        f"{frame_num if frame_num is not None else 'N/A (error state)'}."
                        f" Error: {exc}"
                    ),
                },
                "additional": {
                    "processing_error_message": str(exc),
                    "original_packet_data_snippet": _snippet(pkt),
                },
            }
        }


def file_to_udm(packets: list, processing_time: str) -> list[dict]:
    return [packet_to_udm(p, processing_time) for p in packets]
