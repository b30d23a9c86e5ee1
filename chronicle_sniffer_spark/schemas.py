"""Schemas: tshark raw ingest + canonical UDM output.

The tshark JSON layer names contain literal dots ("frame.time_utc"),
and several layers are polymorphic (tls.record is dict OR list;
SURVEY §2C.7), so the raw read schema keeps ``_source`` as a Spark 4
VARIANT and the projection extracts typed sub-structs per layer with
``try_variant_get``.  That preserves schema-on-read permissiveness
(unknown sibling fields cost nothing) while every downstream access is
typed — the Spark-idiomatic answer to the reference's
``get_nested_value`` dict walking (json2udm_cloud.py:48-72).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Raw packet read schema: one row per element of tshark's root JSON
# array (json2udm_cloud.py:334).  _corrupt_record captures elements
# that don't parse (quarantine path, SURVEY §2C.1).
RAW_PACKET_SCHEMA = T.StructType(
    [
        T.StructField("_source", T.VariantType(), True),
        T.StructField("_corrupt_record", T.StringType(), True),
    ]
)

# Typed extraction DDLs per layer — exactly the fields the reference
# reads (json2udm_cloud.py:113-253).  Unknown siblings stay in the
# variant, untyped and unread.
LAYER_DDL: dict[str, str] = {
    "frame": "struct<`frame.number` string, `frame.time_utc` string, `frame.protocols` string>",
    "ip": "struct<`ip.src` string, `ip.dst` string, `ip.ttl` string>",
    "ipv6": "struct<`ipv6.src` string, `ipv6.dst` string>",
    "eth": "struct<`eth.src` string, `eth.dst` string>",
    "tcp": "struct<`tcp.srcport` string, `tcp.dstport` string, `tcp.flags` string>",
    "udp": "struct<`udp.srcport` string, `udp.dstport` string>",
    "icmp": "struct<`icmp.type` string, `icmp.code` string>",
    "arp": (
        "struct<`arp.opcode` string, `arp.src.hw_mac` string, `arp.src.proto_ipv4` string,"
        " `arp.dst.hw_mac` string, `arp.dst.proto_ipv4` string>"
    ),
    "http": (
        "struct<`http.host` string, `http.file_data` string, `http.request.method` string,"
        " `http.request.full_uri` string, `http.user_agent` string, `http.response.code` string>"
    ),
}

# DNS sections are dict-of-dicts (json2udm_cloud.py:74-88) → maps.
DNS_QUERIES_DDL = "map<string, struct<`dns.qry.name` string, `dns.qry.type` string>>"
DNS_ANSWERS_DDL = "map<string, struct<`dns.resp.ttl` string>>"

# Canonical UDM event schema (SURVEY §1.3; json2udm_cloud.py:256-294).
# event_timestamp is the serialized ISO-8601 string inside the UDM
# payload; the engine additionally exposes a typed `event_ts`
# TimestampType column on the projected DataFrame.
UDM_ABOUT_ITEM = T.StructType(
    [
        T.StructField("hostname", T.StringType(), True),
        T.StructField("url", T.StringType(), True),
    ]
)

UDM_EVENT_SCHEMA = T.StructType(
    [
        T.StructField(
            "metadata",
            T.StructType(
                [
                    T.StructField("event_timestamp", T.StringType(), False),
                    T.StructField("product_name", T.StringType(), False),
                    T.StructField("vendor_name", T.StringType(), False),
                    T.StructField("event_type", T.StringType(), False),
                    T.StructField("description", T.StringType(), False),
                ]
            ),
            False,
        ),
        T.StructField(
            "principal",
            T.StructType(
                [
                    T.StructField("ip", T.StringType(), True),
                    T.StructField("mac", T.StringType(), True),
                    T.StructField("port", T.IntegerType(), True),
                ]
            ),
            True,
        ),
        T.StructField(
            "target",
            T.StructType(
                [
                    T.StructField("ip", T.StringType(), True),
                    T.StructField("mac", T.StringType(), True),
                    T.StructField("port", T.IntegerType(), True),
                ]
            ),
            True,
        ),
        T.StructField(
            "network",
            T.StructType(
                [
                    T.StructField("ip_protocol_version", T.IntegerType(), True),
                    T.StructField("transport_protocol", T.StringType(), True),
                    T.StructField("tcp_flags", T.StringType(), True),
                    T.StructField("icmp_type", T.StringType(), True),
                    T.StructField("icmp_code", T.StringType(), True),
                    T.StructField(
                        "application_protocol_data",
                        T.StructType(
                            [
                                T.StructField(
                                    "http",
                                    T.StructType(
                                        [
                                            T.StructField("host", T.StringType(), True),
                                            T.StructField("file_data", T.StringType(), True),
                                            T.StructField("method", T.StringType(), True),
                                            T.StructField("url", T.StringType(), True),
                                            T.StructField("user_agent", T.StringType(), True),
                                            T.StructField("status_code", T.IntegerType(), True),
                                        ]
                                    ),
                                    True,
                                ),
                                T.StructField(
                                    "dns",
                                    T.StructType(
                                        [
                                            T.StructField(
                                                "queries",
                                                T.ArrayType(
                                                    T.StructType(
                                                        [
                                                            T.StructField(
                                                                "name", T.StringType(), True
                                                            ),
                                                            T.StructField(
                                                                "type", T.StringType(), True
                                                            ),
                                                        ]
                                                    )
                                                ),
                                                True,
                                            ),
                                            T.StructField(
                                                "answer_ttls",
                                                T.ArrayType(T.IntegerType()),
                                                True,
                                            ),
                                            T.StructField("is_response", T.BooleanType(), True),
                                        ]
                                    ),
                                    True,
                                ),
                                T.StructField(
                                    "tls",
                                    T.StructType(
                                        [
                                            T.StructField(
                                                "record_version_protocol", T.StringType(), True
                                            ),
                                            T.StructField(
                                                "handshake_protocol_version",
                                                T.StringType(),
                                                True,
                                            ),
                                            T.StructField(
                                                "server_name_indication", T.StringType(), True
                                            ),
                                        ]
                                    ),
                                    True,
                                ),
                            ]
                        ),
                        True,
                    ),
                ]
            ),
            True,
        ),
        T.StructField("about", T.ArrayType(UDM_ABOUT_ITEM), True),
        T.StructField("additional", T.MapType(T.StringType(), T.StringType()), True),
    ]
)
