"""Source/sink + pipeline-shaped catalog entries (SURVEY.md §2B S-series).

The UDM projection entries are appended here once sources/udm land;
streaming (T-series) entries are registered without oracles (the
driver records rows-only checks for non-SQL-expressible ops).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chronicle_sniffer_spark.plans.catalog import query
from chronicle_sniffer_spark.tables import load_table


@query(
    "s1_parquet_count",
    section="S1",
    oracle="SELECT count(*) AS n FROM lineitem",
)
def s1_parquet_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet scan smoke: count(*) is metadata-only (no column read)."""
    return load_table(spark, sf_dir, "lineitem").agg(F.count("*").alias("n"))


@query(
    "s3_csv_roundtrip",
    section="S3",
    oracle="SELECT r_regionkey, r_name FROM region",
)
def s3_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink → CSV scan (declared schema, no inference) round-trips
    the region dim byte-exact."""
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    out = os.path.join(tempfile.gettempdir(), "css_s3_csv_roundtrip")
    r.write.mode("overwrite").option("header", True).csv(out)
    return spark.read.schema("r_regionkey int, r_name string").option("header", True).csv(out)
