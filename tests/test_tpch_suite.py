"""Adapted-TPC-H suite completion (r6): DuckDB oracles for the
remaining query shapes (q2, q4, q7, q8, q9, q11, q12, q13, q15, q16,
q17, q20, q21, q22).

The generated schema has no partsupp / l_commitdate / l_receiptdate /
l_shipmode / o_comment / c_phone / p_container, so each query keeps its
DEFINING plan shape (EXISTS / NOT-EXISTS decorrelation, scalar
subqueries, correlated AVG, distinct-count + anti-join, min-per-group
+ rejoin) with documented stand-ins — see the q_tpch_* docstrings in
__spark_entry__.py.  All double sums are scaled-long on both sides, so
comparisons are EXACT (==), not tolerance-based.
"""
import importlib.util
from pathlib import Path

import duckdb
import pytest

_TABLES = ("region", "nation", "customer", "supplier", "part",
           "orders", "lineitem")


def _entry():
    root = Path(__file__).resolve().parent.parent
    spec = importlib.util.spec_from_file_location(
        "entry_tpch", root / "__spark_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def _duck(sf_dir):
    con = duckdb.connect()
    for t in _TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{sf_dir}/{t}.parquet'")
    return con


#: scaled-long exact sum (the _scaled_sum mirror)
def _ss(expr, scale):
    return (f"SUM(CAST(ROUND(({expr}) * {scale}) AS BIGINT)) / {scale}.0")


_REV = "l_extendedprice * (1 - l_discount)"

ORACLES = {
    "tpch_q2": f"""
        WITH pc AS (
          SELECT l_partkey, l_suppkey,
                 MIN(round(l_extendedprice / l_quantity, 6)) AS unit_cost
          FROM lineitem GROUP BY 1, 2),
        eur AS (
          SELECT s_suppkey, s_acctbal, s_name, n_name
          FROM supplier JOIN nation ON s_nationkey = n_nationkey
                        JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'EUROPE'),
        j AS (
          SELECT p.p_partkey, p.p_name, e.s_acctbal, e.s_name, e.n_name,
                 pc.unit_cost
          FROM pc JOIN part p ON pc.l_partkey = p.p_partkey
                  JOIN eur e ON pc.l_suppkey = e.s_suppkey
          WHERE p.p_size <= 15 AND p.p_type = 'SMALL'),
        mn AS (SELECT p_partkey AS pk, MIN(unit_cost) AS min_cost
               FROM j GROUP BY 1)
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
        FROM j JOIN mn ON j.p_partkey = mn.pk
                      AND j.unit_cost = mn.min_cost""",
    "tpch_q4": """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
        GROUP BY o_orderpriority""",
    "tpch_q7": f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               {_ss(_REV, 10_000)} AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND l_shipdate <= TIMESTAMP '1996-12-31 00:00:00'
          AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
            OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
        GROUP BY 1, 2, 3""",
    "tpch_q8": f"""
        SELECT year(o_orderdate) AS o_year,
               round(({_ss(f"CASE WHEN n1.n_name = 'NATION_3' "
                           f"THEN {_REV} ELSE 0.0 END", 10_000)})
                   / ({_ss(_REV, 10_000)}), 6) AS mkt_share
        FROM lineitem
          JOIN part ON l_partkey = p_partkey
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          JOIN region ON n2.n_regionkey = r_regionkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
        WHERE p_type = 'STANDARD' AND r_name = 'EUROPE'
          AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate <= TIMESTAMP '1996-12-31 00:00:00'
        GROUP BY 1""",
    "tpch_q9": f"""
        SELECT n_name AS nation, year(o_orderdate) AS o_year,
               {_ss(_REV, 10_000)} AS sum_profit
        FROM lineitem JOIN part ON l_partkey = p_partkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN orders ON l_orderkey = o_orderkey
        WHERE p_name LIKE '%red%'
        GROUP BY 1, 2""",
    "tpch_q11": f"""
        WITH eur AS (SELECT s_suppkey FROM supplier
                     JOIN nation ON s_nationkey = n_nationkey
                     JOIN region ON n_regionkey = r_regionkey
                     WHERE r_name = 'EUROPE'),
        je AS (SELECT l_partkey, l_extendedprice
               FROM lineitem JOIN eur ON l_suppkey = s_suppkey),
        per AS (SELECT l_partkey,
                       {_ss('l_extendedprice', 100)} AS part_value
                FROM je GROUP BY 1),
        tot AS (SELECT {_ss('l_extendedprice', 100)} AS t,
                       COUNT(DISTINCT l_partkey) AS np FROM je)
        SELECT l_partkey, part_value FROM per, tot
        WHERE part_value > 1.6 * t / np""",
    "tpch_q12": """
        SELECT l_returnflag,
          SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 1 ELSE 0 END) AS high_line_count,
          SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 0 ELSE 1 END) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate > o_orderdate + INTERVAL 30 DAY
        GROUP BY 1""",
    "tpch_q13": """
        WITH cc AS (
          SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT JOIN
            (SELECT * FROM orders WHERE o_orderpriority <> '5-LOW') o
            ON c_custkey = o_custkey
          GROUP BY 1)
        SELECT c_count, COUNT(*) AS custdist FROM cc GROUP BY 1""",
    "tpch_q15": f"""
        WITH rev AS (
          SELECT l_suppkey, {_ss(_REV, 10_000)} AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
          GROUP BY 1),
        mx AS (SELECT MAX(total_revenue) AS m FROM rev)
        SELECT s_suppkey, s_name, total_revenue
        FROM rev CROSS JOIN mx
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = m""",
    "tpch_q16": """
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
          AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22, 25)
          AND l_suppkey NOT IN
              (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY 1, 2, 3""",
    "tpch_q17": f"""
        WITH j AS (SELECT l_partkey, l_quantity, l_extendedprice
                   FROM lineitem JOIN part ON l_partkey = p_partkey
                   WHERE p_brand = 'Brand#13' AND p_size <= 10),
        a AS (SELECT l_partkey AS pk,
                     ({_ss('l_quantity', 1)}) / COUNT(*) AS avg_qty
              FROM j GROUP BY 1)
        SELECT round(({_ss('l_extendedprice', 100)}) / 7.0, 6)
               AS avg_yearly
        FROM j JOIN a ON l_partkey = pk
        WHERE l_quantity < 0.2 * avg_qty""",
    "tpch_q20": f"""
        WITH red AS (SELECT p_partkey FROM part
                     WHERE p_name LIKE 'red%'),
        qty AS (SELECT l_suppkey, {_ss('l_quantity', 1)} AS q
                FROM lineitem JOIN red ON l_partkey = p_partkey
                WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
                GROUP BY l_suppkey, l_partkey),
        big AS (SELECT DISTINCT l_suppkey FROM qty WHERE q > 40)
        SELECT s_name, n_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
                      JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
          AND s_suppkey IN (SELECT l_suppkey FROM big)""",
    "tpch_q21": """
        WITH g AS (
          SELECT l_orderkey,
                 COUNT(DISTINCT l_suppkey) AS nsupp,
                 COUNT(DISTINCT CASE WHEN l_shipdate >
                       o_orderdate + INTERVAL 30 DAY
                       THEN l_suppkey END) AS nlate,
                 MAX(CASE WHEN l_shipdate >
                     o_orderdate + INTERVAL 30 DAY
                     THEN l_suppkey END) AS late_supp
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE o_orderstatus = 'F'
          GROUP BY 1)
        SELECT s_name, COUNT(*) AS numwait
        FROM g JOIN supplier ON late_supp = s_suppkey
        WHERE nlate = 1 AND nsupp > 1
        GROUP BY 1""",
    "tpch_q22": f"""
        WITH cf AS (SELECT c_custkey, c_acctbal,
                           c_nationkey % 10 AS cntrycode
                    FROM customer
                    WHERE c_nationkey % 10 IN (1, 3, 5, 7, 9)),
        avg_bal AS (SELECT ({_ss('c_acctbal', 100)}) / COUNT(*) AS a
                    FROM cf WHERE c_acctbal > 0),
        rich AS (SELECT * FROM cf CROSS JOIN avg_bal
                 WHERE c_acctbal > a),
        noord AS (SELECT * FROM rich
                  WHERE c_custkey NOT IN
                    (SELECT o_custkey FROM orders
                     WHERE o_custkey IS NOT NULL
                       AND o_orderdate >=
                           TIMESTAMP '2000-01-01 00:00:00'))
        SELECT cntrycode, COUNT(*) AS numcust,
               {_ss('c_acctbal', 100)} AS totacctbal
        FROM noord GROUP BY 1""",
}


@pytest.fixture(scope="module")
def entry():
    return _entry()


@pytest.mark.parametrize("qname", sorted(ORACLES))
def test_tpch_suite_matches_duckdb(spark, sf_dir, entry, qname):
    got = entry.bench_extras()[qname](spark, sf_dir)
    cols = got.columns
    got_rows = sorted(tuple(r) for r in got.collect())
    con = _duck(sf_dir)
    res = con.execute(ORACLES[qname])
    assert [d[0] for d in res.description] == cols, (
        f"{qname}: column names differ: {[d[0] for d in res.description]} "
        f"vs {cols}")
    want_rows = sorted(tuple(r) for r in res.fetchall())
    assert got_rows == want_rows, (
        f"{qname}: {len(got_rows)} vs {len(want_rows)} rows; "
        f"first diff: "
        f"{next((a, b) for a, b in zip(got_rows, want_rows) if a != b) if got_rows and want_rows else (got_rows[:2], want_rows[:2])}")
    assert len(got_rows) > 0, f"{qname}: empty result is a vacuous test"
