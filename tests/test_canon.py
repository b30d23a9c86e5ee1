"""The shared canonicalizer must see through fetch-path differences.

The r6 ml2b red and the r7 a4b red were both caused by the SAME logical
value reaching two canonicalizers through different fetch machinery:
``cursor.fetchall()`` hands back raw ``decimal.Decimal`` / ``datetime``
objects while ``rel.df()`` (pandas) coerces DECIMAL->float64 and
TIMESTAMP->pd.Timestamp first.  These tests run one synthetic row —
covering every type either engine emits — through BOTH fetch shapes of
the same DuckDB query and assert the canonical forms are identical,
then pin the individual normalization rules.
"""

from __future__ import annotations

import datetime
import decimal

import duckdb
import numpy as np
import pandas as pd

from chronicle_sniffer_spark.canon import canon_rows, canon_value

_SQL = """
SELECT
  CAST(48.0 AS DECIMAL(3,1))      AS dec_integral,
  CAST(2.5  AS DECIMAL(10,4))     AS dec_frac,
  CAST(48   AS BIGINT)            AS big_integral,
  CAST(48.0 AS DOUBLE)            AS dbl_integral,
  CAST(0.1  AS DOUBLE)            AS dbl_frac,
  CAST(count(*) AS HUGEINT)       AS huge_one,
  'hello'                         AS s,
  TRUE                            AS b,
  TIMESTAMP '2026-01-02 03:04:05' AS ts,
  DATE '2026-01-02'               AS d,
  CAST(NULL AS DOUBLE)            AS nothing,
  [1, 2, 3]                       AS arr
"""


def _both_paths():
    con = duckdb.connect()
    cur = con.execute(_SQL)
    cols_fa = [d[0] for d in cur.description]
    rows_fa = cur.fetchall()
    pdf = con.sql(_SQL).df()
    cols_pd = list(pdf.columns)
    rows_pd = list(map(tuple, pdf.itertuples(index=False, name=None)))
    con.close()
    return (cols_fa, rows_fa), (cols_pd, rows_pd)


def test_fetchall_and_pandas_paths_canonicalize_identically():
    (cols_fa, rows_fa), (cols_pd, rows_pd) = _both_paths()
    assert canon_rows(cols_fa, rows_fa) == canon_rows(cols_pd, rows_pd)


def test_decimal_rules():
    # integral DECIMAL == integral double == int — the a4b red
    assert canon_value(decimal.Decimal("48.0")) == "48"
    assert canon_value(48.0) == "48"
    assert canon_value(48) == "48"
    assert canon_value(np.int64(48)) == "48"
    # fractional DECIMAL routes through float
    assert canon_value(decimal.Decimal("2.5")) == canon_value(2.5)
    assert canon_value(decimal.Decimal("NaN")) == "NULL"


def test_float_rules():
    assert canon_value(0.1) == repr(0.1)  # shortest round-trip
    # NaN == NULL: pandas coerces SQL NULL to NaN in float64 columns,
    # so the pandas-mediated driver hash cannot tell them apart — the
    # fetchall path adopts the same equivalence
    assert canon_value(float("nan")) == "NULL"
    assert canon_value(float("inf")) == "Infinity"
    assert canon_value(float("-inf")) == "-Infinity"
    assert canon_value(np.float64(3.25)) == canon_value(3.25)
    # the r6 ml2b class: a 1e-6 drift must NOT canonicalize equal
    assert canon_value(1.000001) != canon_value(1.000002)


def test_bool_is_not_an_int():
    assert canon_value(True) == "True"
    assert canon_value(np.bool_(True)) == "True"
    assert canon_value(1) == "1"
    assert canon_value(True) != canon_value(1)


def test_temporal_and_null_rules():
    ts = datetime.datetime(2026, 1, 2, 3, 4, 5)
    assert canon_value(ts) == canon_value(pd.Timestamp(ts))
    assert canon_value(datetime.date(2026, 1, 2)) == "2026-01-02"
    # DATE via pandas arrives as a midnight Timestamp; via fetchall as
    # datetime.date — all three canonicalize identically
    assert canon_value(pd.Timestamp("2026-01-02")) == "2026-01-02"
    assert canon_value(datetime.datetime(2026, 1, 2)) == "2026-01-02"
    assert canon_value(None) == "NULL"
    assert canon_value(pd.NaT) == "NULL"


def test_containers_recurse():
    assert canon_value([1, 2.0, None]) == "[1,2,NULL]"
    assert canon_value(np.array([1.5, 2.5])) == canon_value([1.5, 2.5])


def test_canon_rows_sorts_columns_and_rows():
    got = canon_rows(["b", "a"], [(2, "x"), (1, "y")])
    # columns reordered to (a, b); rows sorted on the reordered tuples
    assert got == sorted([("x", "2"), ("y", "1")])


def test_harnesses_share_the_canonicalizer():
    """Structural guard: both local harnesses must import THE shared
    implementation, not carry a private copy."""
    import tests.test_catalog as tc
    import tools.check_correctness as cc

    assert tc._canon is canon_rows
    assert cc.canon_rows is canon_rows


def test_large_integral_magnitudes_agree_across_arrival_types():
    """>=1e15 used to split by arrival type: int printed full digits
    while the SAME value as float/Decimal fell through to repr(float)
    ('1e+15') — the exact fetch-path divergence the module absorbs."""
    assert canon_value(10**15) == "1000000000000000"
    assert canon_value(1e15) == "1000000000000000"
    assert canon_value(decimal.Decimal(10**15)) == "1000000000000000"
    # integral Decimal NOT exactly double-representable: compared at
    # double precision, rendered the way the float path renders that
    # same double (so a DuckDB exact-DECIMAL sum still matches a Spark
    # double sum that differs only below double precision)
    d = decimal.Decimal(10**16 + 1)
    assert canon_value(d) == canon_value(float(d)) == "10000000000000000"
    # beyond double range: full digits (nothing double-typed collides)
    assert canon_value(decimal.Decimal(10**400)) == str(10**400)
