"""UDF/UDAF/UDTF surface demos (SURVEY §2B U3-U6).

Each exists to prove the extension surface works and matches native
semantics — production operators prefer built-in expressions.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


# ---- U3: grouped-map (applyInPandas) ---------------------------------------

USER_STATS_SCHEMA = "user_id long, n_events long, total_value double, max_value double"


def _user_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [pdf["user_id"].iloc[0]],
            "n_events": [len(pdf)],
            "total_value": [round(float(pdf["value"].sum()), 2)],
            "max_value": [float(pdf["value"].max())],
        }
    )


def user_stats_grouped_map(events: DataFrame) -> DataFrame:
    """U3: per-group pandas DataFrame in/out (the ref's per-file
    aggregation R23 as a grouped map)."""
    return events.groupBy("user_id").applyInPandas(_user_stats, USER_STATS_SCHEMA)


# ---- U4: UDAF via pandas GROUPED_AGG ---------------------------------------


@F.pandas_udf(T.DoubleType())
def weighted_avg(value: pd.Series, weight: pd.Series) -> float:
    """U4: weighted average as an Arrow grouped-agg UDAF."""
    wsum = float(weight.sum())
    return float((value * weight).sum() / wsum) if wsum else float("nan")


# ---- U5: UDTF (one row → many) ---------------------------------------------


class SplitWords:
    """U5: Python UDTF — explode a text into (pos, word) rows."""

    def eval(self, doc_id: int, text: str):  # noqa: D102
        for pos, word in enumerate(text.split(" ")):
            yield doc_id, pos, word


def register_udtf(spark: SparkSession) -> None:
    from pyspark.sql.functions import udtf

    split_words = udtf(SplitWords, returnType="doc_id bigint, pos int, word string")
    spark.udtf.register("split_words", split_words)


class SplitFixed:
    """U12: polymorphic UDTF — output schema (w0..w{n-1}) is computed
    at plan time by ``analyze()`` from the constant third argument."""

    @staticmethod
    def analyze(doc_id, text, n):  # noqa: D102
        from pyspark.sql.udtf import AnalyzeResult

        if n.value is None or not isinstance(n.value, int) or n.value < 1:
            raise ValueError("split_fixed: n must be a constant positive integer")
        schema = T.StructType().add("doc_id", T.LongType())
        for i in range(n.value):
            schema = schema.add(f"w{i}", T.StringType())
        return AnalyzeResult(schema=schema)

    def eval(self, doc_id: int, text: str, n: int):  # noqa: D102
        toks = (text or "").split(" ")
        yield (doc_id,) + tuple(toks[i] if i < len(toks) else None for i in range(n))


def register_polymorphic_udtf(spark: SparkSession) -> None:
    from pyspark.sql.functions import udtf

    # no returnType: the schema comes from SplitFixed.analyze at plan time
    spark.udtf.register("split_fixed", udtf(SplitFixed))


class SummarizeLang:
    """U13: UDTF over a TABLE argument — eval() sees every row of one
    PARTITION BY group; terminate() emits the group's summary row."""

    def __init__(self):
        self.lang = None
        self.n = 0
        self.chars = 0

    def eval(self, row):  # noqa: D102 - one call per row of the partition
        self.lang = row["lang"]
        self.n += 1
        self.chars += row["n_chars"]

    def terminate(self):  # noqa: D102 - once per partition
        if self.n:
            yield self.lang, self.n, self.chars


def register_table_arg_udtf(spark: SparkSession) -> None:
    from pyspark.sql.functions import udtf

    spark.udtf.register(
        "summarize_lang",
        udtf(SummarizeLang, returnType="lang string, n_docs bigint, sum_chars bigint"),
    )


# ---- U6: SQL registration ---------------------------------------------------


def register_sql_udfs(spark: SparkSession) -> None:
    """U6: make Python functions callable from SQL text."""
    spark.udf.register(
        "py_rev_upper", lambda s: s[::-1].upper() if s is not None else None, T.StringType()
    )


# ---- mapInPandas example (per-partition custom operator) --------------------


def zscore_partitions(df: DataFrame, col: str) -> DataFrame:
    """Per-partition z-score via mapInPandas — the pattern custom
    operators use when built-ins can't express the semantics."""
    schema = df.schema.add("zscore", T.DoubleType())

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            std = pdf[col].std()
            z = (pdf[col] - pdf[col].mean()) / std if std and std > 0 else pdf[col] * 0.0
            yield pdf.assign(zscore=z)

    return df.mapInPandas(op, schema)


def register_arrow_udtf(spark: SparkSession) -> None:
    """U16: arrow_udtf — per-RecordBatch vectorized word histogram
    (map-side partial aggregation in Python via pyarrow kernels)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from pyspark.sql.functions import arrow_udtf

    @arrow_udtf(returnType="word string, n bigint")
    class WordHist:
        def eval(self, batch):  # noqa: D102 - one call per Arrow batch
            tbl = pa.Table.from_batches([batch])
            words = pc.list_flatten(pc.split_pattern(tbl.column("text"), " "))
            vc = pc.value_counts(words)
            yield pa.table(
                {
                    "word": vc.field("values"),
                    "n": pc.cast(vc.field("counts"), pa.int64()),
                }
            )

    spark.udtf.register("word_hist", WordHist)
