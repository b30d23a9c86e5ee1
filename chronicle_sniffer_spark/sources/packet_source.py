"""Custom Spark Python Data Source (S-series extensibility): a
deterministic synthetic packet generator, `format("synth_packets")`.

Demonstrates the Spark 4 `pyspark.sql.datasource` connector API — the
sanctioned way to plug a new source into the engine (the alternative
the pcap decoder predates).  The source is partition-parallel: the row
range splits into ``parts`` input partitions, each generated
independently on an executor, so the connector scales exactly like a
file scan (no driver materialization).

Generation is a pure function of ``pkt_id``, which makes every
downstream computation closed-form — the catalog query
``s10_python_datasource`` aggregates the generated corpus and a DuckDB
oracle recomputes the same aggregates from ``range(n)`` arithmetic,
hash-checking the connector end-to-end (partitioning bugs, off-by-one
range splits, or type drift all break the match).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


def _row(i: int):
    proto = ("tcp", "udp", "icmp", "dns")[i % 4]
    src_ip = f"10.{(i >> 16) % 256}.{(i >> 8) % 256}.{i % 256}"
    dst_port = 1024 + i % 100
    length = 64 + (i * 31) % 1400
    return (i, proto, src_ip, dst_port, length)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SynthPacketsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 10_000))
        self.parts = int(options.get("parts", 8))

    def partitions(self):
        step = -(-self.n // self.parts)  # ceil
        return [
            _RangePartition(lo, min(lo + step, self.n)) for lo in range(0, self.n, step)
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield _row(i)


class SynthPacketsDataSource(DataSource):
    """``spark.read.format("synth_packets").option("n", N).load()``"""

    @classmethod
    def name(cls) -> str:
        return "synth_packets"

    def schema(self) -> str:
        return "pkt_id bigint, proto string, src_ip string, dst_port int, length int"

    def reader(self, schema):
        return SynthPacketsReader(self.options)

    def simpleStreamReader(self, schema):
        return SynthPacketsStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration (re-registering replaces the prior one)."""
    spark.dataSource.register(SynthPacketsDataSource)


class SynthPacketsStreamReader(SimpleDataSourceStreamReader):
    """Streaming form: each micro-batch emits the next ``batch_size``
    packet ids.  Offsets are plain dicts ({"next": i}) checkpointed by
    the engine — restart resumes exactly where the last commit left
    off, giving the connector end-to-end exactly-once with the default
    file-sink/foreachBatch machinery (S5/S6-class source, custom
    implementation)."""

    def __init__(self, options):
        self.batch_size = int(options.get("batch_size", 1000))
        self.max_rows = int(options.get("n", 10_000))

    def initialOffset(self):
        return {"next": 0}

    def read(self, start: dict):
        lo = int(start["next"])
        hi = min(lo + self.batch_size, self.max_rows)
        return iter([_row(i) for i in range(lo, hi)]), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([_row(i) for i in range(int(start["next"]), int(end["next"]))])
