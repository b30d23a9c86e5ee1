"""THE result canonicalizer — one definition of "equal" for every
local correctness harness.

Two rounds in a row shipped a red caused by three canonicalizers
disagreeing: the driver's value hash, ``tools/check_correctness.py``
(pandas-mediated fetch — DuckDB DECIMAL coerces to float64 before the
canonicalizer ever sees it) and ``tests/test_catalog.py`` (fetchall-
mediated — sees raw ``decimal.Decimal`` / ``datetime`` objects).  The
r6 ml2b red was a mismatch the pandas path masked; the r7 a4b red was
a numerically-equal value the fetchall path stringified differently.

This module is fetch-path agnostic: it routes every numeric-ish type
(float, numpy scalar, ``decimal.Decimal``, bool/np.bool_) and every
temporal type (``datetime``, ``date``, ``pd.Timestamp``, ``NaT``)
through ONE normalization, so the same logical row canonicalizes
identically whether it arrived via ``cursor.fetchall()`` or
``rel.df().itertuples()``.  Both ``tools/check_correctness.py`` and
``tests/test_catalog.py`` import from here; ``tests/test_canon.py``
feeds one synthetic row through both fetch shapes and asserts the
outputs are byte-identical.

Rules:
- integral floats/Decimals print as ints ("48", not "48.0") so BIGINT
  vs DOUBLE vs DECIMAL(3,1) representations of the same value agree —
  at ANY magnitude (an integral Decimal that is not exactly
  double-representable is first rounded to double, so it still equals
  the float-path rendering of the same double);
- non-integral floats use shortest-round-trip ``repr`` (full
  precision — 2-dp rounding masked the r6 ml2b 1e-6 mismatch);
- non-integral Decimals normalize through float (engines that return
  DECIMAL for a computed edge are compared at double precision, which
  is what the Spark side computed anyway);
- bools stringify before the int check ("True", never "1");
- NaN canonicalizes as "NULL": pandas coerces SQL NULL to NaN in
  float64 columns, so a pandas-mediated harness (the driver's hash,
  ``tools/check_correctness.py``) cannot distinguish them — the
  fetchall path must adopt the same equivalence or the two paths
  disagree on every nullable double column;
- temporal values become ISO-8601 strings; a tz-naive midnight
  timestamp prints date-only, because pandas coerces DATE columns to
  midnight Timestamps while fetchall keeps ``datetime.date``;
  NaT/None become "NULL";
- arrays/lists/tuples/ndarrays canonicalize element-wise.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math

try:  # numpy/pandas are always present in this environment, but the
    import numpy as _np  # canonicalizer stays importable without them
    import pandas as _pd
except ImportError:  # pragma: no cover
    _np = None
    _pd = None


def canon_value(v) -> str:
    """Canonicalize one result cell to its comparison string."""
    # --- null-ish -----------------------------------------------------
    if v is None:
        return "NULL"
    if _pd is not None and v is _pd.NaT:
        return "NULL"
    # --- containers ---------------------------------------------------
    if isinstance(v, (list, tuple)) or (
        _np is not None and isinstance(v, _np.ndarray)
    ):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    # --- bools BEFORE ints (bool is an int subclass) ------------------
    if _np is not None and isinstance(v, _np.bool_):
        v = bool(v)
    if isinstance(v, bool):
        return str(v)
    # --- numpy scalars -> python --------------------------------------
    if _np is not None and isinstance(v, _np.integer):
        return str(int(v))
    if _np is not None and isinstance(v, _np.floating):
        v = float(v)
    # --- Decimal: the r7 a4b divergence -------------------------------
    if isinstance(v, decimal.Decimal):
        if v.is_nan():
            return "NULL"  # pandas-path parity; see module docstring
        if v.is_infinite():
            # must precede the integral branch: Inf == Inf.to_integral_value()
            # holds, and int(Decimal('Infinity')) raises OverflowError — print
            # the same token the float path uses so Decimal/float arrivals of
            # an infinite value agree
            return "Infinity" if v > 0 else "-Infinity"
        if v == v.to_integral_value():
            fv = float(v)
            if math.isinf(fv) or decimal.Decimal(fv) == v:
                # exactly double-representable (or beyond double range,
                # where no double-computing engine can collide): print
                # full digits so BIGINT/DOUBLE/DECIMAL arrivals of the
                # same value agree at ANY magnitude (>=1e15 used to
                # fall through to repr(float) -> '1e+15' while the int
                # path printed digits — the exact fetch-path divergence
                # this module exists to absorb)
                return str(int(v))
            # integral but NOT exactly double-representable (e.g.
            # 10**16+1): compare at double precision — printed in the
            # same integral form the float path uses for that double
            return str(int(fv))
        return repr(float(v))
    # --- floats -------------------------------------------------------
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"  # pandas coerces SQL NULL -> NaN; see docstring
        if math.isinf(v):
            return "Infinity" if v > 0 else "-Infinity"
        if v == int(v):
            # integral doubles print the same whether the engine
            # returned int64, float64, or DECIMAL (HUGEINT->float64
            # drift, DECIMAL(3,1) literal typing); int(v) is the
            # float's exact value, so this holds at any magnitude
            return str(int(v))
        # FULL shortest-round-trip precision, matching the driver's
        # value-hash strictness
        return repr(v)
    # --- temporal -----------------------------------------------------
    if _pd is not None and isinstance(v, _pd.Timestamp):
        if v.tz is None and (v - v.normalize()).value == 0:
            return v.date().isoformat()  # DATE coerced to midnight Timestamp
        return v.isoformat()
    if isinstance(v, _dt.datetime):
        if v.tzinfo is None and (v.hour, v.minute, v.second, v.microsecond) == (
            0, 0, 0, 0,
        ):
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    return str(v)


def canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    """Column-order-independent, row-order-independent canonical form:
    columns sorted by name, every cell through :func:`canon_value`,
    rows sorted."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_value(r[i]) for i in order) for r in rows]
    out.sort()
    return out
