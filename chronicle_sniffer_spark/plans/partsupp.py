"""TPC-H Q2/Q9/Q11/Q16/Q20 over a DERIVED partsupp.

The testdata ships no ``partsupp`` table (FIXTURES.md §1), which kept
these five queries out of rounds 1-3.  Both engines now derive the
same partsupp deterministically from ``part`` × 4 synthetic suppliers
per part (supplier count read from the data, not hard-coded), so every
blocked plan shape — min-cost correlated subquery (Q2), profit
decomposition over a 6-way join (Q9), HAVING against a global-sum
scalar (Q11), NOT-IN + count-distinct grouping (Q16), and the
double-nested IN/correlated-agg cascade (Q20) — gets a real
driver-checkable entry.

Derivation (identical SQL-visible arithmetic in Spark and DuckDB):

- ``ps_suppkey  = (p_partkey*7 + k*13) % S``  for k ∈ 0..3 — distinct
  per part whenever ``13*d % S != 0`` for d ∈ {1,2,3}, i.e. for every
  S outside {1, 2, 3, 13, 26, 39}.  All shipped SFs use S ∈
  {10, 100, 1000}; :func:`derived_partsupp` rejects the degenerate
  counts once at materialization so a PK-violating partsupp can never
  be built silently.
- ``ps_availqty = 100 + (p_partkey*4 + k) % 9901``
- ``ps_supplycost`` = exact DECIMAL(18,4) cents×0.01 (multiplication,
  not division, so neither engine's decimal-division scale rules can
  introduce drift; see the verify-skill money-math gotcha).

Scale shape: partsupp is 4×|part| — built with a broadcast 1-row
supplier count and an explode, no shuffle; at 100 TB the same
derivation would run as a projection over the part scan.  Queries keep
the canonical TPC-H join orders and let AQE/broadcast pick physical
strategies; adapted predicates use the reduced schema's columns
(acctbal-deficit instead of comment LIKE, name-prefix instead of
colors) while preserving each query's plan shape.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from chronicle_sniffer_spark.plans.catalog import O_DISC_PRICE, disc_price_dec, query
from chronicle_sniffer_spark.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# DuckDB CTE text, prepended to every oracle below.
PARTSUPP_CTE = """
    partsupp AS (
      SELECT p_partkey AS ps_partkey,
             (p_partkey * 7 + k.k * 13) % s.cnt AS ps_suppkey,
             CAST(100 + (p_partkey * 4 + k.k) % 9901 AS INTEGER) AS ps_availqty,
             CAST(CAST(100 + (p_partkey * 31
                              + ((p_partkey * 7 + k.k * 13) % s.cnt) * 17) % 90000
                       AS DECIMAL(18,2)) * CAST(0.01 AS DECIMAL(3,2))
                  AS DECIMAL(18,4)) AS ps_supplycost
      FROM part, (SELECT unnest([0, 1, 2, 3]) AS k) k,
           (SELECT count(*) AS cnt FROM supplier) s
    )
"""


# ps_suppkey stride 13 over k ∈ 0..3 collides iff S divides 13, 26 or
# 39 (module docstring) — reject those supplier counts outright.
_DEGENERATE_SUPPLIER_COUNTS = frozenset({1, 2, 3, 13, 26, 39})

# (applicationId, abspath(sf_dir)) -> cached partsupp DataFrame, so the
# five Q-shapes share ONE materialization per session instead of
# re-running the explode per query (free at sf0.1, measurable at sf1+).
_PS_CACHE: dict[tuple[str, str], DataFrame] = {}


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark side of the shared derivation (module docstring).

    Materialized once per (session, sf_dir): the supplier count is a
    bounded 1-row collect used both for the degeneracy guard and as a
    literal in the suppkey arithmetic, and the resulting 4×|part|
    DataFrame is cached so Q2/Q9/Q11/Q16/Q20 reuse one build.
    """
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir))
    cached = _PS_CACHE.get(key)
    if cached is not None:
        return cached
    n_sup = _t(spark, sf_dir, "supplier").count()
    if n_sup in _DEGENERATE_SUPPLIER_COUNTS:
        raise ValueError(
            f"supplier count {n_sup} makes the stride-13 ps_suppkey derivation "
            "collide (duplicate (ps_partkey, ps_suppkey) rows); regenerate the "
            "testdata with >= 4 suppliers and S not in {1,2,3,13,26,39}"
        )
    part = _t(spark, sf_dir, "part").select("p_partkey")
    base = part.select(
        F.col("p_partkey").alias("ps_partkey"),
        F.explode(F.expr("sequence(0, 3)")).alias("k"),
    ).select(
        "ps_partkey",
        ((F.col("ps_partkey") * 7 + F.col("k") * 13) % F.lit(n_sup)).alias("ps_suppkey"),
        (F.lit(100) + (F.col("ps_partkey") * 4 + F.col("k")) % 9901)
        .cast("int")
        .alias("ps_availqty"),
    )
    cents = F.lit(100) + (F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 17) % 90000
    df = base.withColumn(
        "ps_supplycost",
        (cents.cast("decimal(18,2)") * F.lit("0.01").cast("decimal(3,2)")).cast("decimal(18,4)"),
    ).cache()
    _PS_CACHE[key] = df
    return df


@query(
    "sq4_q2_min_cost_supplier",
    section="SQ",
    oracle=f"""
    WITH {PARTSUPP_CTE}
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_type,
           CAST(ps.ps_supplycost AS DOUBLE) AS ps_supplycost
    FROM part p, partsupp ps, supplier s, nation n, region r
    WHERE p.p_partkey = ps.ps_partkey AND s.s_suppkey = ps.ps_suppkey
      AND p.p_size BETWEEN 10 AND 20 AND p.p_type = 'ECONOMY'
      AND s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
      AND r.r_name IN ('ASIA', 'EUROPE')
      AND ps.ps_supplycost = (
        SELECT min(ps2.ps_supplycost)
        FROM partsupp ps2, supplier s2, nation n2, region r2
        WHERE ps2.ps_partkey = p.p_partkey AND s2.s_suppkey = ps2.ps_suppkey
          AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
          AND r2.r_name IN ('ASIA', 'EUROPE'))
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT 100
    """,
)
def sq4_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated scalar-min subquery over the same
    filtered join tree — the classic 'cheapest qualified supplier per
    part' decorrelation (Catalyst rewrites it to an aggregate + join;
    region/nation broadcast)."""
    ps = derived_partsupp(spark, sf_dir)
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    p = _t(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "ECONOMY")
    )
    qualified = (
        ps.join(s, ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    min_cost = qualified.groupBy(F.col("ps_partkey").alias("mk")).agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    return (
        qualified.join(p, F.col("ps_partkey") == p.p_partkey)
        .join(
            min_cost,
            (F.col("ps_partkey") == F.col("mk"))
            & (F.col("ps_supplycost") == F.col("min_cost")),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            F.col("ps_supplycost").cast("double").alias("ps_supplycost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "j2g_q9_product_profit",
    section="J2",
    oracle=f"""
    WITH {PARTSUPP_CTE}
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           CAST(SUM(CAST({O_DISC_PRICE} AS DECIMAL(18,6))
                    - CAST(ps_supplycost * CAST(l_quantity AS DECIMAL(18,2))
                           AS DECIMAL(18,6))) AS DOUBLE) AS sum_profit
    FROM part, supplier, lineitem, partsupp, orders, nation
    WHERE s_suppkey = l_suppkey AND ps_suppkey = l_suppkey
      AND ps_partkey = l_partkey AND p_partkey = l_partkey
      AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
      AND p_name LIKE '%red%'
    GROUP BY n_name, year(o_orderdate)
    ORDER BY nation, o_year DESC
    """,
)
def j2g_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: 6-way join with a two-column join to partsupp
    and per-nation/year profit decomposition.  Money stays exact
    decimal until the final double cast (both engines subtract the
    same DECIMAL(18,6) values)."""
    ps = derived_partsupp(spark, sf_dir)
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    cost = (
        F.col("ps_supplycost") * F.col("l_quantity").cast("decimal(18,2)")
    ).cast("decimal(18,6)")
    amount = disc_price_dec().cast("decimal(18,6)") - cost
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(ps, (li.l_suppkey == ps.ps_suppkey) & (li.l_partkey == ps.ps_partkey))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"), amount.alias("amount"))
        .groupBy("nation", "o_year")
        .agg(F.sum("amount").cast("double").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@query(
    "a9c_q11_important_stock",
    section="A9",
    oracle=f"""
    WITH {PARTSUPP_CTE}
    SELECT ps_partkey, CAST(SUM(ps_supplycost * ps_availqty) AS DOUBLE) AS value
    FROM partsupp, supplier, nation
    WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
      AND n_name = 'NATION_2'
    GROUP BY ps_partkey
    HAVING CAST(SUM(ps_supplycost * ps_availqty) AS DOUBLE) > (
      SELECT CAST(SUM(ps_supplycost * ps_availqty) AS DOUBLE) * 0.001
      FROM partsupp, supplier, nation
      WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
        AND n_name = 'NATION_2')
    ORDER BY value DESC, ps_partkey
    """,
)
def a9c_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: grouped HAVING against a global-sum scalar —
    the whole-table aggregate broadcasts back as a 1-row crossJoin
    (no collect; the decimal products keep both engines exact)."""
    ps = derived_partsupp(spark, sf_dir)
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    joined = (
        ps.join(s, ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("ps_partkey", (F.col("ps_supplycost") * F.col("ps_availqty")).alias("v"))
    )
    per_part = joined.groupBy("ps_partkey").agg(F.sum("v").cast("double").alias("value"))
    total = joined.agg((F.sum("v").cast("double") * F.lit(0.001)).alias("cutoff"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("cutoff"))
        .select("ps_partkey", "value")
        .orderBy(F.col("value").desc(), "ps_partkey")
    )


@query(
    "a2b_q16_supplier_part_types",
    section="A2",
    oracle=f"""
    WITH {PARTSUPP_CTE}
    SELECT p_brand, p_type, p_size, CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM partsupp, part
    WHERE p_partkey = ps_partkey
      AND p_brand <> 'Brand#1' AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def a2b_q16_supplier_part_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: NOT IN anti-join (deficit suppliers stand in
    for the comment-complaints filter the reduced schema lacks) +
    count(DISTINCT) over a three-column grouping."""
    ps = derived_partsupp(spark, sf_dir)
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & ~F.col("p_type").like("PROMO%")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        ps.join(F.broadcast(bad), ps.ps_suppkey == bad.s_suppkey, "left_anti")
        .join(p, F.col("ps_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "j4c_q20_excess_stock",
    section="J4",
    oracle=f"""
    WITH {PARTSUPP_CTE}
    SELECT s_name, s_acctbal
    FROM supplier, nation
    WHERE s_suppkey IN (
        SELECT ps_suppkey FROM partsupp
        WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
          AND ps_availqty > (
            SELECT 0.5 * SUM(l_quantity) FROM lineitem
            WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
              AND l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'))
      AND s_nationkey = n_nationkey AND n_name = 'NATION_1'
    ORDER BY s_name
    """,
)
def j4c_q20_excess_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: IN → IN → correlated scalar aggregate with a
    TWO-key correlation (l_partkey = ps_partkey AND l_suppkey =
    ps_suppkey).  Expressed as the decorrelated form both optimizers
    produce: shipped-quantity agg per (part, supp), left join,
    NULL-safe availqty comparison (no shipments → NULL sum → row
    filtered, matching SQL semantics), then a semi join into
    supplier."""
    ps = derived_partsupp(spark, sf_dir)
    small = _t(spark, sf_dir, "part").filter(F.col("p_name").like("small%")).select("p_partkey")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        (F.lit(0.5) * F.sum("l_quantity")).alias("half_qty")
    )
    excess = (
        ps.join(F.broadcast(small), ps.ps_partkey == small.p_partkey, "left_semi")
        .join(
            shipped,
            (F.col("ps_partkey") == shipped.l_partkey)
            & (F.col("ps_suppkey") == shipped.l_suppkey),
            "inner",
        )
        .filter(F.col("ps_availqty") > F.col("half_qty"))
        .select("ps_suppkey")
        .distinct()
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    return (
        s.join(excess, s.s_suppkey == excess.ps_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@query(
    "w1d_q2_rank_form",
    section="W1",
    oracle=f"""
    WITH {PARTSUPP_CTE},
    ranked AS (
      SELECT ps_partkey, ps_suppkey, CAST(ps_supplycost AS DOUBLE) AS cost,
             rank() OVER (PARTITION BY ps_partkey ORDER BY ps_supplycost, ps_suppkey) AS rnk
      FROM partsupp
    )
    SELECT ps_partkey, ps_suppkey, cost
    FROM ranked WHERE rnk = 1 AND ps_partkey < 100
    ORDER BY ps_partkey
    """,
)
def w1d_q2_rank_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2's min-cost semantics in the window-rank form a warehouse
    user actually writes (rank-1-per-partition) — checks the derived
    partsupp itself row-by-row on a bounded slice."""
    ps = derived_partsupp(spark, sf_dir)
    w = Window.partitionBy("ps_partkey").orderBy("ps_supplycost", "ps_suppkey")
    return (
        ps.withColumn("rnk", F.rank().over(w))
        .filter((F.col("rnk") == 1) & (F.col("ps_partkey") < 100))
        .select(
            "ps_partkey", "ps_suppkey", F.col("ps_supplycost").cast("double").alias("cost")
        )
        .orderBy("ps_partkey")
    )
