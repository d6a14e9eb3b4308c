"""Relational query battery over the driver testdata (TESTDATA.md).

Covers the SURVEY §2 operator inventory as concrete oracle-checked
queries: scans, projections/filters (P1-P8), joins incl. semi/anti/full
(J1-J3), aggregations (A1-A6), windows/sorts/limits/set ops
(WF1/O1/U1), scalar functions (F1-F6), merge algebra (W3/W4 as a
readable query), and the recon pipeline (X6/X7).

Determinism rules (the oracle hash-compares values):
- money/continuous SUMs go through DECIMAL(30,6) (exact and
  order-independent; see ``dsum``) and come back as double — never
  ``round()`` a double sum: Spark rounds half-up, DuckDB half-even,
  and real data hits exact-half boundaries ~0.5% of the time per group;
- averages are one deterministic division of the exact sum (``davg``);
- single IEEE multiplies/subtracts of raw values are bit-deterministic
  and stay unrounded;
- exact-threshold comparisons (x > group average) are done in decimal
  (bal * n > sum), never against a float average;
- every LIMIT query has a total order with a unique tie-breaker;
- aggregate aliases match the oracle SQL exactly;
- computed integer columns are BIGINT on both sides (DuckDB's
  SUM/COUNT/length promote differently than Spark).

Scale notes are attached per query: what shuffles, what broadcasts,
what would change at 1000 executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from x_spark.operators.merge import merge_frames
from x_spark.operators.recon import ReconJob
from x_spark.session import load_table
from x_spark.sources.base import MergeSpec


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def dsum(col) -> F.Column:
    """Exact cross-engine SUM of money-like doubles.

    Summing doubles is order-dependent, and rounding the result sits on
    cross-engine tie-break boundaries ~0.5% of the time per group when
    the true decimal value has more precision than the rounding unit
    (Spark rounds half-up, DuckDB half-even — observed divergence).
    Casting each value to DECIMAL(30,6) first makes the sum exact and
    order-independent; the final cast back to double is deterministic.
    DuckDB oracle equivalent: CAST(sum(CAST(x AS DECIMAL(30,6))) AS DOUBLE).
    """
    col = F.col(col) if isinstance(col, str) else col
    return F.sum(col.cast("decimal(30,6)")).cast("double")


def davg(col) -> F.Column:
    """Exact-sum average: decimal sum cast to double, divided by count —
    one deterministic double division instead of an order-dependent
    running mean. DuckDB: CAST(sum(CAST(x AS DECIMAL(30,6))) AS DOUBLE)
    / count(x)."""
    col = F.col(col) if isinstance(col, str) else col
    return dsum(col) / F.count(col)


# ---------------------------------------------------------------------------
# A1-A6: aggregation battery (TPC-H Q1 shape: partial agg map-side, one
# shuffle on the 6-group key; scales linearly with input).
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from x_spark.fanout import fan_out

    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    # seven DECIMAL(30,6) accumulators run in the pre-exchange stage —
    # fan a degenerate one-split layout out after the pushed filter
    # (guide §2.5/§2.3; exact sums are order-independent)
    src = fan_out(
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .select("l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount", "l_tax")
    )
    return (
        src
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
        )
    )


ORACLE_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE)           AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE)      AS sum_base_price,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(30,6))) AS DOUBLE) AS sum_charge,
       CAST(sum(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) / count(l_quantity)           AS avg_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) / count(l_extendedprice) AS avg_price,
       CAST(sum(CAST(l_discount AS DECIMAL(30,6))) AS DOUBLE) / count(l_discount)           AS avg_disc,
       CAST(count(*) AS BIGINT)                                         AS count_order,
       min(l_extendedprice)                                             AS min_price,
       max(l_extendedprice)                                             AS max_price
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# J3 + O1: 3-way join, filter pushdown, top-k with deterministic order.
# Scale: customer filter prunes before the join; orders⋈lineitem is the
# big shuffle; customer side is broadcast-able (AQE does this when the
# filtered side fits).
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1998-07-01").cast("timestamp")
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


ORACLE_SHIPPING_PRIORITY = """
SELECT o_orderkey, o_orderdate, o_orderpriority,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-07-01 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# J3 semi-join (EXISTS): orders with any late-shipped line.
def q_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").alias("o")
    li = _t(spark, sf_dir, "lineitem").alias("l")
    late_cond = (F.col("l.l_orderkey") == F.col("o.o_orderkey")) & (
        F.col("l.l_shipdate") > F.expr("o.o_orderdate + INTERVAL 60 DAY")
    )
    return (
        orders.join(li, late_cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


ORACLE_LATE_SHIPMENT_PRIORITY = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey
    AND l_shipdate > o_orderdate + INTERVAL 60 DAY
)
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# J3 anti-join (NOT EXISTS): customers with no orders in the first few
# months, per segment (a full-history anti-join returns 0 rows on this
# data — scoped to a window so the check is non-vacuous).
def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    early = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-06-01").cast("timestamp")
    )
    return (
        cust.join(early, cust.c_custkey == early.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


ORACLE_CUSTOMERS_WITHOUT_ORDERS = """
SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey
    AND o_orderdate < TIMESTAMP '1995-06-01 00:00:00'
)
GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# J1/J3: 6-way star join with small-dim broadcast (TPC-H Q5 shape).
# region/nation are tiny -> broadcast explicitly; the lineitem⋈orders
# shuffle dominates; local-supplier condition applied post-join.
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


ORACLE_LOCAL_SUPPLIER_VOLUME = """
SELECT r_name, n_name,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY r_name, n_name
"""


# ---------------------------------------------------------------------------
# P5/A2: tight filter + single aggregate (TPC-H Q6 shape) — the whole
# query folds into one scan with pushed predicates, no shuffle at all
# beyond the final single-row combine.
def q_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


ORACLE_REVENUE_FORECAST = """
SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# J3 + O1: revenue per customer with nation dim, global top-20
# (TPC-H Q10 shape). Nation broadcast; deterministic tie-break.
def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


ORACLE_TOP_CUSTOMERS = """
SELECT c_custkey, c_name, n_name,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# ---------------------------------------------------------------------------
# WF1: window functions — row_number + lag over a per-segment ordering.
# Scale: single shuffle on the partition key; no global sort.
def q_top_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("prev_price", F.lag("o_totalprice").over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "c_mktsegment",
            F.col("rn").cast("bigint").alias("rn"),
            "o_orderkey",
            "o_totalprice",
            F.round(F.col("o_totalprice") - F.coalesce("prev_price", "o_totalprice"), 2).alias(
                "gap_to_prev"
            ),
        )
    )


ORACLE_TOP_ORDERS_PER_SEGMENT = """
WITH ranked AS (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         row_number() OVER w AS rn,
         lag(o_totalprice) OVER w AS prev_price
  FROM orders JOIN customer ON o_custkey = c_custkey
  WINDOW w AS (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey ASC)
)
SELECT c_mktsegment, CAST(rn AS BIGINT) AS rn, o_orderkey, o_totalprice,
       round(o_totalprice - coalesce(prev_price, o_totalprice), 2) AS gap_to_prev
FROM ranked WHERE rn <= 3
"""


# ---------------------------------------------------------------------------
# A6: exact distinct counts (two distinct aggregates in one pass ->
# Spark expands to a multi-phase plan; DuckDB likewise).
def q_distinct_suppliers_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count("*").alias("n_lines"),
    )


ORACLE_DISTINCT_SUPPLIERS_PARTS = """
SELECT l_returnflag,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# A6 ROLLUP: hierarchical totals; NULL group markers coalesced to 'ALL'
# so both engines emit identical label rows.
def q_rollup_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n",
        )
    )


ORACLE_ROLLUP_QUANTITY = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# ---------------------------------------------------------------------------
# U1 set ops: INTERSECT / EXCEPT between customer-nations and
# supplier-nations, tagged and unioned.
def q_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation")
    cust_nations = (
        _t(spark, sf_dir, "customer")
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name")
        .distinct()
    )
    supp_nations = (
        _t(spark, sf_dir, "supplier")
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("n_name")
        .distinct()
    )
    both = cust_nations.intersect(supp_nations).withColumn("presence", F.lit("both"))
    cust_only = cust_nations.subtract(supp_nations).withColumn("presence", F.lit("customers_only"))
    return both.unionByName(cust_only)


ORACLE_NATION_PRESENCE = """
WITH cust_nations AS (
  SELECT DISTINCT n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
), supp_nations AS (
  SELECT DISTINCT n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey
)
SELECT n_name, 'both' AS presence FROM (SELECT n_name FROM cust_nations INTERSECT SELECT n_name FROM supp_nations)
UNION ALL
SELECT n_name, 'customers_only' AS presence FROM (SELECT n_name FROM cust_nations EXCEPT SELECT n_name FROM supp_nations)
"""


# ---------------------------------------------------------------------------
# A6 pivot: conditional aggregation via Spark's pivot operator; the
# oracle spells it as CASE aggregates (same relational algebra).
def q_quantity_by_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return out.select(
        "l_returnflag",
        F.col("O").alias("qty_open"),
        F.col("F").alias("qty_filled"),
    )


ORACLE_QUANTITY_BY_STATUS_PIVOT = """
SELECT l_returnflag,
       round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_open,
       round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_filled
FROM lineitem
GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# F1-F6 scalar battery: string/case/arithmetic functions, row-level.
def q_part_catalog_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 200)
    return part.select(
        "p_partkey",
        F.upper(F.col("p_brand")).alias("brand_upper"),
        F.lower(F.substring("p_type", 1, 6)).alias("type_prefix"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.when(F.col("p_size") < 10, "small")
        .when(F.col("p_size") < 30, "medium")
        .otherwise("large")
        .alias("size_bucket"),
        # unrounded: per-row round() diverges across engines on exact
        # halves (Spark half-up vs DuckDB half-even); one IEEE multiply
        # is bit-deterministic
        (F.col("p_retailprice") * 1.1).alias("marked_up"),
        F.abs(F.col("p_size") - 25).alias("size_dev"),
        (F.col("p_partkey") % 7).alias("bucket7"),
        F.coalesce(F.nullif(F.col("p_brand"), F.lit("Brand#00")), F.lit("unknown")).alias(
            "brand_or_unknown"
        ),
    )


ORACLE_PART_CATALOG_REPORT = """
SELECT p_partkey,
       upper(p_brand)                    AS brand_upper,
       lower(substr(p_type, 1, 6))       AS type_prefix,
       length(p_name)                    AS name_len,
       concat_ws('|', p_brand, p_type)   AS brand_type,
       CASE WHEN p_size < 10 THEN 'small'
            WHEN p_size < 30 THEN 'medium'
            ELSE 'large' END             AS size_bucket,
       p_retailprice * 1.1               AS marked_up,
       abs(p_size - 25)                  AS size_dev,
       p_partkey % 7                     AS bucket7,
       coalesce(nullif(p_brand, 'Brand#00'), 'unknown') AS brand_or_unknown
FROM part
WHERE p_partkey <= 200
"""


# ---------------------------------------------------------------------------
# F5/date-time battery over events: truncation + extraction + grouped agg.
def q_event_hourly_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            F.hour("ts").alias("hour_of_day"),
            F.date_trunc("day", F.col("ts")).alias("day"),
            "value",
        )
        .groupBy("event_type", "hour_of_day")
        .agg(
            dsum("value").alias("total_value"),
            F.count("*").alias("n_events"),
            F.countDistinct("day").alias("n_days"),
        )
    )


ORACLE_EVENT_HOURLY_PROFILE = """
SELECT event_type,
       CAST(hour(ts) AS INT) AS hour_of_day,
       CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total_value,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT date_trunc('day', ts)) AS BIGINT) AS n_days
FROM events
GROUP BY event_type, hour(ts)
"""


# ---------------------------------------------------------------------------
# W3/W4 as a query: the merge algebra (update+insert) applied to orders
# with a synthetic changeset, summarized. Oracle spells the same
# semantics as LEFT JOIN update + anti-join insert.
def q_merge_upsert_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Changeset arithmetic is ADDITIVE with 2-decimal constants so the
    # true decimal values keep exactly 2 decimals: a rounded SUM of such
    # values can never sit on a cross-engine rounding boundary (Spark
    # rounds half-up, DuckDB half-even — multiplying by 1.1 or 0.5 here
    # produced exact half-cent sums that flipped differently).
    orders = _t(spark, sf_dir, "orders")
    updates = orders.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey",
        (F.col("o_totalprice") + 1000.0).alias("o_totalprice"),
        F.lit("U").alias("o_orderstatus"),
    )
    inserts = orders.filter(F.col("o_orderkey") % 97 == 0).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        (F.col("o_totalprice") + 0.75).alias("o_totalprice"),
        F.lit("N").alias("o_orderstatus"),
    )
    changeset = updates.unionByName(inserts)
    spec = MergeSpec(
        primary_key_columns=["o_orderkey"],
        update_columns=["o_totalprice", "o_orderstatus"],
        insert_when_not_matched=True,
        validate_unique_source_keys=False,  # keys are disjoint by construction
    )
    merged = merge_frames(orders, changeset, spec)
    return merged.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        dsum("o_totalprice").alias("total_value"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


ORACLE_MERGE_UPSERT_EFFECT = """
WITH changeset AS (
  SELECT o_orderkey, o_totalprice + 1000.0 AS o_totalprice, 'U' AS o_orderstatus
  FROM orders WHERE o_orderstatus = 'O'
  UNION ALL
  SELECT o_orderkey + 10000000, o_totalprice + 0.75, 'N'
  FROM orders WHERE o_orderkey % 97 = 0
), merged AS (
  SELECT t.o_orderkey,
         coalesce(s.o_totalprice, t.o_totalprice)   AS o_totalprice,
         coalesce(s.o_orderstatus, t.o_orderstatus) AS o_orderstatus,
         t.o_custkey
  FROM orders t LEFT JOIN changeset s ON t.o_orderkey = s.o_orderkey
  UNION ALL
  SELECT s.o_orderkey, s.o_totalprice, s.o_orderstatus, NULL
  FROM changeset s WHERE NOT EXISTS (SELECT 1 FROM orders t WHERE t.o_orderkey = s.o_orderkey)
)
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS total_value,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
FROM merged
GROUP BY o_orderstatus
"""


# ---------------------------------------------------------------------------
# D6/W3 against the real transactional store, audited through the CDF:
# build a txlog table (v1 append), run the SAME merge algebra as
# merge_upsert_effect against it (v2), DELETE a nation (v3), then read
# the semantic version diff — the multiset snapshot(v3)-snapshot(v1),
# recovered from the file-granular change feed by canceling identical
# rewrite pairs. The oracle recomputes both snapshots declaratively and
# takes EXCEPT ALL both ways: if the store's merge/delete/CDF machinery
# drops, duplicates or corrupts a single row image, the hash diverges.
# (Reference parity: datasource/delta.py:104-148 MERGE semantics + CDF
# read; this exercises them on the atomic-commit store end to end.)
def q_txlog_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from x_spark.sources.base import TableRef
    from x_spark.sources.txlog import TxLogDataSource

    workdir = tempfile.mkdtemp(prefix="xs_version_diff_")
    try:
        ds = TxLogDataSource(spark)
        ref = TableRef(path=os.path.join(workdir, "cust"))
        base = _t(spark, sf_dir, "customer").select(
            "c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal"
        )
        s0 = base.filter(F.col("c_custkey") % 3 == 0)
        ds.create(ref, s0.schema)
        ds.append(s0, ref)  # commit v1: the diff baseline
        updates = s0.filter(F.col("c_custkey") % 6 == 0).withColumn(
            "c_acctbal", F.col("c_acctbal") + 100.0
        )
        inserts = base.filter(F.col("c_custkey") % 30 == 0).select(
            (F.col("c_custkey") + 1_000_000).alias("c_custkey"),
            "c_nationkey",
            "c_mktsegment",
            (F.col("c_acctbal") + 0.25).alias("c_acctbal"),
        )
        # all non-pk columns are update columns: inserted rows then carry
        # the full image (W4's NULL-insert quirk would otherwise leave
        # non-set columns NULL — exercised by merge_upsert_effect; here
        # the point is the store/CDF round trip of full rows)
        spec = MergeSpec(
            primary_key_columns=["c_custkey"],
            update_columns=["c_nationkey", "c_mktsegment", "c_acctbal"],
            insert_when_not_matched=True,
            validate_unique_source_keys=False,  # disjoint by construction
        )
        ds.merge(updates.unionByName(inserts), ref, spec)  # v2
        ds.delete(ref, "c_nationkey = 5")  # v3
        diff = ds.semantic_diff(ref, from_version=1)
        net_bal = F.col("c_acctbal").cast("decimal(30,6)") * F.col("net")
        return (
            diff.groupBy("c_mktsegment")
            .agg(
                F.sum(
                    F.when(F.col("net") > 0, F.col("net")).otherwise(F.lit(0))
                ).cast("bigint").alias("rows_added"),
                F.sum(
                    F.when(F.col("net") < 0, -F.col("net")).otherwise(F.lit(0))
                ).cast("bigint").alias("rows_removed"),
                F.sum(net_bal).cast("double").alias("bal_delta"),
            )
            # materialize before the temp store disappears
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


ORACLE_TXLOG_VERSION_DIFF = """
WITH s0 AS (
  SELECT c_custkey, c_nationkey, c_mktsegment, c_acctbal
  FROM customer WHERE c_custkey % 3 = 0
), s1 AS (
  SELECT c_custkey, c_nationkey, c_mktsegment,
         CASE WHEN c_custkey % 6 = 0 THEN c_acctbal + 100.0
              ELSE c_acctbal END AS c_acctbal
  FROM s0
  UNION ALL
  SELECT c_custkey + 1000000, c_nationkey, c_mktsegment, c_acctbal + 0.25
  FROM customer WHERE c_custkey % 30 = 0
), s2 AS (
  SELECT * FROM s1 WHERE c_nationkey IS DISTINCT FROM 5
), diff AS (
  SELECT c_mktsegment, c_acctbal, 1 AS net
  FROM (SELECT * FROM s2 EXCEPT ALL SELECT * FROM s0)
  UNION ALL
  SELECT c_mktsegment, c_acctbal, -1 AS net
  FROM (SELECT * FROM s0 EXCEPT ALL SELECT * FROM s2)
)
SELECT c_mktsegment,
       CAST(sum(CASE WHEN net > 0 THEN net ELSE 0 END) AS BIGINT) AS rows_added,
       CAST(sum(CASE WHEN net < 0 THEN -net ELSE 0 END) AS BIGINT) AS rows_removed,
       CAST(sum(CAST(c_acctbal AS DECIMAL(30,6)) * net) AS DOUBLE) AS bal_delta
FROM diff
GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# W7 RESTORE, driver-checked end to end: build a txlog table (v1), run
# the same merge algebra as txlog_version_diff (v2), DELETE (v3), then
# RESTORE TO VERSION 1 (v4 — a metadata-only rollback commit) and prove
# the roundtrip two ways at once: (a) aggregates over the restored
# snapshot must equal aggregates over the v1 state recomputed
# declaratively by the oracle, and (b) the CDF-derived semantic diff
# v1 -> v4 must be EMPTY (diff_rows = 0) — if restore drops, duplicates
# or corrupts any row image, one of the two diverges.
# (Reference parity: extends datasource/delta.py:104-148 MERGE/time
# travel to the rollback surface; Delta RESTORE semantics.)
def q_txlog_restore_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from x_spark.sources.base import TableRef
    from x_spark.sources.txlog import TxLogDataSource

    workdir = tempfile.mkdtemp(prefix="xs_restore_rt_")
    try:
        ds = TxLogDataSource(spark)
        ref = TableRef(path=os.path.join(workdir, "ord"))
        base = _t(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
        )
        s0 = base.filter(F.col("o_orderkey") % 5 == 0)
        ds.create(ref, s0.schema)
        ds.append(s0, ref)  # v1: the restore target
        updates = s0.filter(F.col("o_orderkey") % 10 == 0).withColumn(
            "o_totalprice", F.col("o_totalprice") + 50.0
        )
        inserts = base.filter(F.col("o_orderkey") % 50 == 0).select(
            (F.col("o_orderkey") + 20_000_000).alias("o_orderkey"),
            "o_custkey",
            F.lit("X").alias("o_orderstatus"),
            "o_totalprice",
        )
        spec = MergeSpec(
            primary_key_columns=["o_orderkey"],
            update_columns=["o_custkey", "o_orderstatus", "o_totalprice"],
            insert_when_not_matched=True,
            validate_unique_source_keys=False,  # disjoint by construction
        )
        ds.merge(updates.unionByName(inserts), ref, spec)  # v2
        ds.delete(ref, "o_orderstatus = 'F'")  # v3
        ds.restore(ref, 1)  # v4: metadata-only rollback to v1
        # (b) the CDF must certify v4 == v1 as a multiset
        n_diff = ds.semantic_diff(ref, from_version=1).agg(
            F.count("*").cast("bigint").alias("diff_rows")
        )
        # (a) aggregate the restored snapshot per status
        return (
            ds.read(ref)
            .groupBy("o_orderstatus")
            .agg(
                F.count("*").cast("bigint").alias("n_orders"),
                dsum("o_totalprice").alias("total_value"),
            )
            .crossJoin(F.broadcast(n_diff))
            # materialize before the temp store disappears
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


ORACLE_TXLOG_RESTORE_ROUNDTRIP = """
WITH s0 AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 5 = 0
)
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS total_value,
       CAST(0 AS BIGINT) AS diff_rows
FROM s0
GROUP BY o_orderstatus
"""


# ---------------------------------------------------------------------------
# Deletion vectors, driver-checked end to end: a lineitem slice lands
# in a DV-enabled txlog store, two overlapping DELETEs mask rows
# merge-on-read (the query ASSERTS the data-file set gained no files —
# a rewrite would), and the output carries three independently audited
# surfaces: (a) the per-flag/status aggregate of the surviving rows
# (the masked reader), (b) the metadata-only row count — numRecords
# minus mask cardinality, zero data bytes read — and (c) the change
# feed's delete count across both DELETE commits, which must equal
# |pred1 OR pred2| exactly because the second commit emits only its
# mask DELTA. The oracle recomputes all three declaratively (DELETE
# via DV vs EXCEPT); any drift in masking, mask merging, metadata
# subtraction, or CDF delta emission hash-diverges.
# (Extension surface: the reference's delta-core 0.8 era has no DVs;
# semantics follow Delta Lake's enableDeletionVectors, public docs.)
def q_dv_delete_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from x_spark.sources.base import TableRef
    from x_spark.sources.txlog import (
        DV_ENABLE_KEY, TxLogDataSource, resolve_snapshot,
    )

    workdir = tempfile.mkdtemp(prefix="xs_dv_scan_")
    try:
        ds = TxLogDataSource(spark)
        ref = TableRef(path=os.path.join(workdir, "li"))
        s0 = _t(spark, sf_dir, "lineitem").filter(
            F.col("l_orderkey") % 7 == 0
        ).select(
            "l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus",
            "l_quantity", "l_tax",
        )
        ds.create(ref, s0.schema)
        ds.append(s0, ref)                                   # v1
        ds.set_properties(ref, {DV_ENABLE_KEY: "true"})      # v2
        v2 = resolve_snapshot(ref.path).version
        files_v2 = set(resolve_snapshot(ref.path).files)
        ds.delete(ref, "l_tax > 0.06")                       # v3 (DV)
        ds.delete(ref, "l_quantity < 10")                    # v4 (DV, overlaps)
        snap = resolve_snapshot(ref.path)
        grew = set(snap.files) - files_v2
        assert not grew, f"DV delete wrote data files: {sorted(grew)[:3]}"
        meta_rows = ds.count_rows(ref)  # metadata-only, masks subtracted
        cdf_deletes = ds.changes(ref, v2, snap.version).filter(
            F.col("_change_type") == "delete"
        ).agg(F.count("*").cast("bigint").alias("cdf_deletes"))
        return (
            ds.read(ref)
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                dsum("l_quantity").alias("sum_qty"),
            )
            .withColumn("meta_rows", F.lit(int(meta_rows)).cast("bigint"))
            .crossJoin(F.broadcast(cdf_deletes))
            # materialize before the temp store disappears
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


# Schema evolution end to end, driver-checked: build a txlog table,
# enable column mapping, RENAME a column, ADD a column, append a batch
# under the evolved schema, DROP a column — every DDL metadata-only
# (asserted: the pre-evolution data files are never rewritten) — then
# aggregate the final state. The oracle recomputes the equivalent
# final relation declaratively; a reader that mis-binds a physical
# column, resurrects dropped data, or loses the rename diverges.
# (Delta parity surface: ALTER TABLE ADD COLUMNS / RENAME COLUMN /
# DROP COLUMN under columnMapping.mode='name'.)
def q_schema_evolution_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from x_spark.sources.base import TableRef
    from x_spark.sources.txlog import (
        COLUMN_MAPPING_KEY, TxLogDataSource, resolve_snapshot,
    )

    workdir = tempfile.mkdtemp(prefix="xs_se_scan_")
    try:
        ds = TxLogDataSource(spark)
        ref = TableRef(path=os.path.join(workdir, "li"))
        li = _t(spark, sf_dir, "lineitem")
        b1 = li.filter(F.col("l_orderkey") % 5 == 0).select(
            "l_orderkey", "l_linenumber", "l_returnflag",
            "l_quantity", "l_extendedprice",
        )
        ds.create(ref, b1.schema)
        ds.append(b1, ref)                                       # v1
        ds.set_properties(ref, {COLUMN_MAPPING_KEY: "name"})     # v2
        files_v2 = set(resolve_snapshot(ref.path).files)
        ds.rename_column(ref, "l_extendedprice", "price")        # v3
        ds.add_columns(ref, "disc_price double")                 # v4
        b2 = li.filter(F.col("l_orderkey") % 5 == 1).select(
            "l_orderkey", "l_linenumber", "l_returnflag",
            F.col("l_quantity").alias("l_quantity"),
            F.col("l_extendedprice").alias("price"),
            (F.col("l_extendedprice") * F.lit(0.9)).alias("disc_price"),
        )
        ds.append(b2, ref)                                       # v5
        ds.drop_column(ref, "l_linenumber")                      # v6
        # every DDL was metadata-only: batch-1 files never rewritten
        survivors = set(resolve_snapshot(ref.path).files)
        assert files_v2 <= survivors, "schema DDL rewrote data files"
        return (
            ds.read(ref)
            .groupBy("l_returnflag")
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                dsum("l_quantity").alias("sum_qty"),
                dsum("price").alias("sum_price"),
                dsum("disc_price").alias("sum_disc"),
                F.count("disc_price").cast("bigint").alias("n_disc"),
            )
            # materialize before the temp store disappears
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


ORACLE_SCHEMA_EVOLUTION_SCAN = """
WITH final AS (
  SELECT l_orderkey, l_returnflag, l_quantity,
         l_extendedprice AS price,
         CAST(NULL AS DOUBLE) AS disc_price
  FROM lineitem WHERE l_orderkey % 5 = 0
  UNION ALL
  SELECT l_orderkey, l_returnflag, l_quantity,
         l_extendedprice AS price,
         l_extendedprice * 0.9 AS disc_price
  FROM lineitem WHERE l_orderkey % 5 = 1
)
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(price AS DECIMAL(30,6))) AS DOUBLE) AS sum_price,
       CAST(sum(CAST(disc_price AS DECIMAL(30,6))) AS DOUBLE) AS sum_disc,
       CAST(count(disc_price) AS BIGINT) AS n_disc
FROM final
GROUP BY l_returnflag
"""


ORACLE_DV_DELETE_SCAN = """
WITH s0 AS (
  SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus,
         l_quantity, l_tax
  FROM lineitem WHERE l_orderkey % 7 = 0
),
surv AS (
  SELECT * FROM s0
  WHERE NOT coalesce(l_tax > 0.06, FALSE)
    AND NOT coalesce(l_quantity < 10, FALSE)
),
inv AS (
  SELECT
    (SELECT CAST(count(*) AS BIGINT) FROM surv) AS meta_rows,
    (SELECT CAST(count(*) AS BIGINT) FROM s0
      WHERE coalesce(l_tax > 0.06, FALSE)
         OR coalesce(l_quantity < 10, FALSE)) AS cdf_deletes
)
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
       meta_rows, cdf_deletes
FROM surv, inv
GROUP BY l_returnflag, l_linestatus, meta_rows, cdf_deletes
"""


# ---------------------------------------------------------------------------
# IVM JoinView, driver-checked end to end: materialize an equi-join of
# two txlog tables, mutate BOTH bases (append to A; merge + delete on
# B), refresh INCREMENTALLY (each side applies only its CDF deltas
# against the other side pinned at its last-applied version), and
# aggregate the maintained bag. The oracle recomputes the join from the
# final base states declaratively — if the delta rule double-applies,
# misses, or mis-signs a single (a, b) pair, counts diverge.
# (Reference parity: extends etl/update_and_upsert.py:10-57 merge
# semantics to the maintained-view surface; classic incremental view
# maintenance delta rule.)
def q_join_view_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from x_spark.operators.ivm import JoinView
    from x_spark.sources.base import TableRef
    from x_spark.sources.txlog import TxLogDataSource

    workdir = tempfile.mkdtemp(prefix="xs_joinview_")
    try:
        ds = TxLogDataSource(spark)
        a_ref = TableRef(path=os.path.join(workdir, "a"))
        b_ref = TableRef(path=os.path.join(workdir, "b"))
        v_ref = TableRef(path=os.path.join(workdir, "view"))
        orders = _t(spark, sf_dir, "orders")
        cust = _t(spark, sf_dir, "customer")
        a0 = orders.filter(F.col("o_orderkey") % 4 == 0).select(
            F.col("o_custkey").alias("custkey"), "o_orderstatus"
        )
        b0 = cust.select(
            F.col("c_custkey").alias("custkey"), "c_mktsegment", "c_nationkey"
        )
        ds.create(a_ref, a0.schema)
        ds.append(a0, a_ref)  # A v1
        ds.create(b_ref, b0.schema)
        ds.append(b0, b_ref)  # B v1
        view = JoinView(
            ds, a_ref, b_ref, v_ref, on=["custkey"],
            a_cols=["o_orderstatus"], b_cols=["c_mktsegment", "c_nationkey"],
        )
        view.refresh()  # initial build
        # mutate both sides, then refresh incrementally
        a1 = orders.filter(F.col("o_orderkey") % 4 == 1).select(
            F.col("o_custkey").alias("custkey"), "o_orderstatus"
        )
        ds.append(a1, a_ref)  # A v2
        moved = b0.filter(F.col("custkey") % 7 == 0).withColumn(
            "c_mktsegment", F.lit("MOVED")
        )
        ds.merge(
            moved, b_ref,
            MergeSpec(
                primary_key_columns=["custkey"],
                update_columns=["c_mktsegment"],
                insert_when_not_matched=False,
            ),
        )  # B v2
        ds.delete(b_ref, "c_nationkey = 13")  # B v3
        view.refresh()  # applies delta-A against B@v1, delta-B against A@v2
        bag = view.read()
        return (
            bag.groupBy("c_mktsegment")
            .agg(
                F.sum("n_rows").cast("bigint").alias("n_pairs"),
                F.countDistinct("custkey").cast("bigint").alias("n_customers"),
            )
            # materialize before the temp store disappears
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


ORACLE_JOIN_VIEW_REFRESH = """
WITH a AS (
  SELECT o_custkey AS custkey, o_orderstatus
  FROM orders WHERE o_orderkey % 4 IN (0, 1)
), b AS (
  SELECT c_custkey AS custkey,
         CASE WHEN c_custkey % 7 = 0 THEN 'MOVED' ELSE c_mktsegment END
           AS c_mktsegment,
         c_nationkey
  FROM customer
  WHERE c_nationkey IS DISTINCT FROM 13
)
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(count(DISTINCT custkey) AS BIGINT) AS n_customers
FROM a JOIN b USING (custkey)
GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# IVM MIN/MAX maintenance, driver-checked: build a txlog base from
# orders, refresh a maintained (count, sum, min, max) view, then
# DELETE exactly the rows carrying per-group extrema and refresh
# incrementally — the targeted-rescan path must land the survivors'
# true extrema. The oracle recomputes everything from the final state
# declaratively; if the rescan misses a group or picks a stale
# extremum, min/max diverge.
def q_minmax_view_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from x_spark.operators.ivm import AggregateView
    from x_spark.sources.base import TableRef
    from x_spark.sources.txlog import TxLogDataSource

    workdir = tempfile.mkdtemp(prefix="xs_minmax_view_")
    try:
        ds = TxLogDataSource(spark)
        base_ref = TableRef(path=os.path.join(workdir, "ord"))
        agg_ref = TableRef(path=os.path.join(workdir, "agg"))
        b0 = _t(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        ).filter(F.col("o_orderkey") % 3 == 0)
        ds.create(base_ref, b0.schema)
        ds.append(b0, base_ref)  # v1
        view = AggregateView(
            ds, base_ref, agg_ref,
            keys=["o_orderstatus"], sums=["o_totalprice"],
            minmax=["o_totalprice"],
        )
        view.refresh()  # initial build
        # delete the cheap tail AND the most expensive band: both ends
        # of every group's price range go away, forcing the rescan on
        # every group; the orderkey predicate also removes interior
        # rows so counts/sums move too
        ds.delete(
            base_ref,
            "o_totalprice < 5000.0 OR o_totalprice > 250000.0 "
            "OR o_orderkey % 21 = 0",
        )
        view.refresh()  # incremental: targeted rescans only
        return (
            view.read()
            .select(
                "o_orderstatus",
                "n_rows",
                F.col("sum_o_totalprice").cast("double").alias("total_value"),
                F.col("min_o_totalprice").alias("min_price"),
                F.col("max_o_totalprice").alias("max_price"),
            )
            # materialize before the temp store disappears
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


# ---------------------------------------------------------------------------
# Aggregate-view AUTO-ROUTING (operators/view_router.ViewRouter): the
# warehouse summary-table rewrite. A txlog base built from lineitem
# carries a maintained (returnflag, linestatus) aggregate; a coarser
# GROUP BY returnflag request is answered by ROLLING UP THE VIEW —
# O(groups), the base fact table is never scanned (inputFiles pinned
# in tests/test_view_router.py). The base goes stale between refresh
# and request, so the route also exercises the auto-refresh (O(delta)
# CDF fold) path. The oracle recomputes everything from the declared
# final state; served_from is asserted in-plan (a silent fallback to
# the base scan would defeat the routed-plan claim, so it raises).
def q_agg_view_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from x_spark.operators.ivm import AggregateView
    from x_spark.operators.view_router import Measure, ViewRouter
    from x_spark.sources.base import TableRef
    from x_spark.sources.txlog import TxLogDataSource

    workdir = tempfile.mkdtemp(prefix="xs_view_route_")
    try:
        ds = TxLogDataSource(spark)
        base_ref = TableRef(path=os.path.join(workdir, "fact"))
        li = _t(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus",
            "l_quantity", "l_extendedprice",
        )
        b0 = li.filter(F.col("l_orderkey") % 3 == 0)
        ds.create(base_ref, b0.schema)
        ds.append(b0, base_ref)  # v1
        view = AggregateView(
            ds, base_ref, TableRef(path=os.path.join(workdir, "agg")),
            keys=["l_returnflag", "l_linestatus"],
            sums=["l_quantity", "l_extendedprice"],
            minmax=["l_extendedprice"],
        )
        view.refresh()
        # second ingest AFTER the refresh: the route below must detect
        # staleness and fold only this delta before serving
        ds.append(
            li.filter((F.col("l_orderkey") % 3 == 1)
                      & (F.col("l_linenumber") <= 2)),
            base_ref,
        )  # v2
        router = ViewRouter(ds, base_ref)
        router.register("rf_ls", view)
        routed = router.route(
            ["l_returnflag"],
            [Measure("count", alias="n_rows"),
             Measure("sum", "l_quantity", "sum_qty"),
             Measure("avg", "l_extendedprice", "avg_price"),
             Measure("max", "l_extendedprice", "max_price")],
        )
        if not routed.served_from.startswith("view:"):
            raise AssertionError(
                f"expected view-routed plan, got {routed.served_from}"
            )
        return (
            routed.df.select(
                "l_returnflag",
                "n_rows",
                F.col("sum_qty").cast("double").alias("sum_qty"),
                "avg_price",
                "max_price",
            )
            # materialize before the temp store disappears
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


ORACLE_AGG_VIEW_ROUTE = """
WITH s AS (
  SELECT l_returnflag, l_quantity, l_extendedprice
  FROM lineitem
  WHERE l_orderkey % 3 = 0
     OR (l_orderkey % 3 = 1 AND l_linenumber <= 2)
)
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE)
         / count(*) AS avg_price,
       max(l_extendedprice) AS max_price
FROM s
GROUP BY l_returnflag
"""


ORACLE_MINMAX_VIEW_REFRESH = """
WITH s AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders
  WHERE o_orderkey % 3 = 0
    AND NOT (o_totalprice < 5000.0 OR o_totalprice > 250000.0
             OR o_orderkey % 21 = 0)
)
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS total_value,
       min(o_totalprice) AS min_price,
       max(o_totalprice) AS max_price
FROM s
GROUP BY o_orderstatus
"""


# ---------------------------------------------------------------------------
# Key-skew diagnostic (operators/profile.skew_report): the measurement
# taken before choosing a skew strategy — top-N heaviest key tuples
# with corpus share and multiple-of-mean-load. Distributed top-N
# (TakeOrderedAndProject), broadcast scalar totals, no global sort.
def q_lineitem_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from x_spark.operators.profile import skew_report

    return skew_report(_t(spark, sf_dir, "lineitem"), ["l_suppkey"], top=20)


ORACLE_LINEITEM_KEY_SKEW = """
WITH c AS (
  SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_rows
  FROM lineitem GROUP BY l_suppkey
), t AS (
  SELECT CAST(sum(n_rows) AS DOUBLE) AS total,
         CAST(count(*) AS DOUBLE) AS nkeys
  FROM c
)
SELECT l_suppkey, n_rows,
       round(n_rows / total, 6) AS share,
       round(n_rows / (total / nkeys), 6) AS x_mean
FROM c CROSS JOIN t
ORDER BY n_rows DESC, l_suppkey ASC
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Table profiling (data-quality primitive): per-column null counts,
# exact distincts, numeric range + exact percentiles, string lengths —
# one shared aggregation pass for everything except the per-column
# exact distincts (which deliberately stay separate plans: multiple
# countDistinct in one agg plans an Expand that duplicates every scan
# row per aggregate — see operators/profile.py).
_PROFILE_NUM_COLS = ["o_orderkey", "o_custkey", "o_totalprice"]
_PROFILE_STR_COLS = ["o_orderstatus"]


def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from x_spark.operators.profile import profile_table

    # exact mode pinned: the DuckDB oracle computes exact distincts
    # (the operator's DEFAULT is the scale-safe approx path)
    prof = profile_table(
        _t(spark, sf_dir, "orders"),
        _PROFILE_NUM_COLS + _PROFILE_STR_COLS,
        mode="exact",
    )
    return prof.select("col_name", "metric", F.round("value", 6).alias("value"))


def _table_profile_oracle(source: str = "orders") -> str:
    parts = []
    for c in _PROFILE_NUM_COLS + _PROFILE_STR_COLS:
        parts.append(
            f"SELECT '{c}' AS col_name, 'null_count' AS metric, "
            f"round(CAST(count(CASE WHEN {c} IS NULL THEN 1 END) AS DOUBLE), 6) AS value "
            f"FROM {source}"
        )
        parts.append(
            f"SELECT '{c}', 'n_distinct', round(CAST(count(DISTINCT {c}) AS DOUBLE), 6) FROM {source}"
        )
    for c in _PROFILE_NUM_COLS:
        parts.append(f"SELECT '{c}', 'min', round(CAST(min({c}) AS DOUBLE), 6) FROM {source}")
        parts.append(f"SELECT '{c}', 'max', round(CAST(max({c}) AS DOUBLE), 6) FROM {source}")
        for q in (25, 50, 75):
            parts.append(
                f"SELECT '{c}', 'p{q}', "
                f"round(quantile_cont(CAST({c} AS DOUBLE), {q / 100}), 6) FROM {source}"
            )
    for c in _PROFILE_STR_COLS:
        parts.append(
            f"SELECT '{c}', 'avg_len', round(CAST(avg(length({c})) AS DOUBLE), 6) FROM {source}"
        )
        parts.append(
            f"SELECT '{c}', 'max_len', round(CAST(max(length({c})) AS DOUBLE), 6) FROM {source}"
        )
    return "\nUNION ALL\n".join(parts)


# ---------------------------------------------------------------------------
# Profile drift: the post-transform gate — profile the table before
# and after a (simulated) truncating filter, report per-metric deltas.
_DRIFT_PRED = "o_totalprice < 200000"


def q_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from x_spark.operators.profile import profile_drift

    orders = _t(spark, sf_dir, "orders")
    cols = _PROFILE_NUM_COLS + _PROFILE_STR_COLS
    # exact mode pinned for the oracle, as in q_table_profile
    return profile_drift(
        orders, orders.filter(_DRIFT_PRED), cols, mode="exact"
    )


def _profile_drift_oracle() -> str:
    before = _table_profile_oracle("orders")
    after = _table_profile_oracle(f"(SELECT * FROM orders WHERE {_DRIFT_PRED})")
    return f"""
WITH before_p AS ({before}), after_p AS ({after})
SELECT COALESCE(b.col_name, a.col_name) AS col_name,
       COALESCE(b.metric, a.metric) AS metric,
       b.value AS before_value,
       a.value AS after_value,
       round(a.value - b.value, 6) AS delta,
       round(round(a.value - b.value, 6) / nullif(b.value, 0), 6) AS rel_change
FROM before_p b
FULL OUTER JOIN after_p a ON b.col_name = a.col_name AND b.metric = a.metric
"""


# ---------------------------------------------------------------------------
# The 100-TB profile DEFAULT, driver-exercised (round-10 verdict #5):
# table_profile/profile_drift pin mode="exact" because their oracles
# need exact percentiles/distincts — which leaves the plan a real user
# gets at scale (mode="approx": ONE shared agg pass, HLL distincts +
# bounded-memory quantile sketches, no per-column exact passes, no
# value buffering) bench-visible but never hash-checked. This query
# runs the APPROX plan and emits (a) the metrics that are exact even
# under approx mode — null_count/min/max/avg_len/max_len all come from
# the same shared pass — and (b) one gate row proving the sketch
# metrics passed their invariants: percentiles ordered and inside
# [min, max] per numeric column, the HLL estimate of a known-unique
# key within 10% of the row count, and the tiny-domain column's
# estimate within its domain bounds. The oracle reproduces (a) exactly
# and predicts the gate as 1.0 — a sketch regression (disordered
# percentiles, wild HLL error) flips the gate and fails the hash.
def q_approx_profile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from x_spark.operators.profile import profile_table

    orders = _t(spark, sf_dir, "orders")
    # ONE shared agg pass produces the whole long profile (~20 rows);
    # persist it so the gate's pivot branches (ordering checks, HLL
    # bound checks) read the tiny cached frame instead of re-running
    # the table scan per branch (the registry's standing
    # project-collapse rule — measured 6x without this)
    prof = profile_table(
        orders, _PROFILE_NUM_COLS + _PROFILE_STR_COLS, mode="approx"
    ).persist()
    portable = prof.filter(
        F.col("metric").isin(
            "null_count", "min", "max", "avg_len", "max_len"
        )
    ).select("col_name", "metric", F.round("value", 6).alias("value"))
    wide = (
        prof.groupBy("col_name")
        .pivot("metric", ["n_distinct", "min", "max", "p25", "p50", "p75"])
        .agg(F.first("value"))
    )
    num_ok = (
        wide.filter(F.col("col_name").isin(_PROFILE_NUM_COLS))
        .select(
            (
                (F.col("min") <= F.col("p25"))
                & (F.col("p25") <= F.col("p50"))
                & (F.col("p50") <= F.col("p75"))
                & (F.col("p75") <= F.col("max"))
            ).cast("int").alias("ok")
        )
        .agg(F.min("ok").alias("pctl_ok"),
             F.count("*").alias("n_num_cols"))
    )
    key_est = wide.filter(F.col("col_name") == "o_orderkey").select(
        F.col("n_distinct").alias("key_est")
    )
    status_est = wide.filter(F.col("col_name") == "o_orderstatus").select(
        F.col("n_distinct").alias("status_est")
    )
    n_rows = orders.agg(F.count("*").cast("double").alias("n_rows"))
    gate = (
        num_ok.crossJoin(key_est).crossJoin(status_est).crossJoin(n_rows)
        .select(
            F.lit("__sketch_gate").alias("col_name"),
            F.lit("all_ok").alias("metric"),
            (
                (F.col("pctl_ok") == 1)
                & (F.col("n_num_cols") == len(_PROFILE_NUM_COLS))
                # o_orderkey is unique: HLL (~2% rel. error) must land
                # within 10% of count(*)
                & (F.col("key_est") >= 0.9 * F.col("n_rows"))
                & (F.col("key_est") <= 1.1 * F.col("n_rows"))
                # o_orderstatus has 3 values; HLL is exact at tiny
                # cardinalities but the gate allows its error bound
                & (F.col("status_est") >= 1)
                & (F.col("status_est") <= 10)
            ).cast("double").alias("value"),
        )
    )
    return portable.unionByName(gate)


def _approx_profile_gate_oracle() -> str:
    parts = []
    for c in _PROFILE_NUM_COLS + _PROFILE_STR_COLS:
        parts.append(
            f"SELECT '{c}' AS col_name, 'null_count' AS metric, "
            f"round(CAST(count(CASE WHEN {c} IS NULL THEN 1 END) "
            f"AS DOUBLE), 6) AS value FROM orders"
        )
    for c in _PROFILE_NUM_COLS:
        parts.append(
            f"SELECT '{c}', 'min', round(CAST(min({c}) AS DOUBLE), 6) "
            f"FROM orders"
        )
        parts.append(
            f"SELECT '{c}', 'max', round(CAST(max({c}) AS DOUBLE), 6) "
            f"FROM orders"
        )
    for c in _PROFILE_STR_COLS:
        parts.append(
            f"SELECT '{c}', 'avg_len', "
            f"round(CAST(avg(length({c})) AS DOUBLE), 6) FROM orders"
        )
        parts.append(
            f"SELECT '{c}', 'max_len', "
            f"round(CAST(max(length({c})) AS DOUBLE), 6) FROM orders"
        )
    parts.append(
        "SELECT '__sketch_gate', 'all_ok', 1.0"
    )
    return "\nUNION ALL\n".join(parts)


# ---------------------------------------------------------------------------
# X6/X7 recon as a query: lineitem vs a perturbed copy, 2-source compare
# with delta/match columns (native tolerance expression).
def q_recon_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    config = {
        "version": 0,
        "group_by": ["l_returnflag"],
        "data": [
            {
                "name": "base",
                "datasource": "parquet",
                "query": "SELECT * FROM lineitem",
                "metrics": [
                    {"sum_price": "cast(sum(cast(l_extendedprice as decimal(30,6))) as double)"},
                    {"avg_disc": "cast(sum(cast(l_discount as decimal(30,6))) as double) / count(l_discount)"},
                    {"n": "count(*)"},
                ],
            },
            {
                "name": "derived",
                "datasource": "parquet",
                "query": "SELECT * FROM lineitem WHERE l_linestatus = 'F'",
                "metrics": [
                    {"sum_price": "cast(sum(cast(l_extendedprice as decimal(30,6))) as double)"},
                    {"avg_disc": "cast(sum(cast(l_discount as decimal(30,6))) as double) / count(l_discount)"},
                    {"n": "count(*)"},
                ],
            },
        ],
    }
    out = ReconJob(config, spark).run()
    # Cast the bigint count delta for a stable cross-engine schema.
    return out.select(
        "l_returnflag",
        "base_sum_price",
        "base_avg_disc",
        "base_n",
        "derived_sum_price",
        "derived_avg_disc",
        "derived_n",
        "delta_sum_price",
        "delta_avg_disc",
        F.col("delta_n").cast("bigint").alias("delta_n"),
        "match_sum_price",
        "match_avg_disc",
        "match_n",
    )


ORACLE_RECON_LINEITEM = """
WITH base AS (
  SELECT l_returnflag, cast(sum(cast(l_extendedprice as decimal(30,6))) as double) AS sum_price,
         cast(sum(cast(l_discount as decimal(30,6))) as double) / count(l_discount) AS avg_disc,
         CAST(count(*) AS BIGINT) AS n
  FROM lineitem GROUP BY l_returnflag
), derived AS (
  SELECT l_returnflag, cast(sum(cast(l_extendedprice as decimal(30,6))) as double) AS sum_price,
         cast(sum(cast(l_discount as decimal(30,6))) as double) / count(l_discount) AS avg_disc,
         CAST(count(*) AS BIGINT) AS n
  FROM lineitem WHERE l_linestatus = 'F' GROUP BY l_returnflag
)
SELECT b.l_returnflag,
       b.sum_price AS base_sum_price, b.avg_disc AS base_avg_disc, b.n AS base_n,
       d.sum_price AS derived_sum_price, d.avg_disc AS derived_avg_disc, d.n AS derived_n,
       abs(b.sum_price - d.sum_price) AS delta_sum_price,
       abs(b.avg_disc - d.avg_disc) AS delta_avg_disc,
       CAST(abs(b.n - d.n) AS BIGINT) AS delta_n,
       CASE WHEN b.sum_price IS NULL AND d.sum_price IS NULL THEN true
            WHEN b.sum_price IS NULL OR d.sum_price IS NULL THEN false
            WHEN greatest(abs(b.sum_price), abs(d.sum_price)) = 0 THEN true
            ELSE abs(b.sum_price - d.sum_price) <= 0.001 * greatest(abs(b.sum_price), abs(d.sum_price))
       END AS match_sum_price,
       CASE WHEN b.avg_disc IS NULL AND d.avg_disc IS NULL THEN true
            WHEN b.avg_disc IS NULL OR d.avg_disc IS NULL THEN false
            WHEN greatest(abs(b.avg_disc), abs(d.avg_disc)) = 0 THEN true
            ELSE abs(b.avg_disc - d.avg_disc) <= 0.001 * greatest(abs(b.avg_disc), abs(d.avg_disc))
       END AS match_avg_disc,
       CASE WHEN b.n IS NULL AND d.n IS NULL THEN true
            WHEN b.n IS NULL OR d.n IS NULL THEN false
            ELSE b.n = d.n END AS match_n
FROM base b FULL OUTER JOIN derived d ON b.l_returnflag = d.l_returnflag
"""


# ---------------------------------------------------------------------------
# N>2 reconciliation (pairwise mode): three sources over lineitem, every
# non-baseline source compared against the first — drives the pairwise
# extension at operators/recon.py:122 (the reference gates compare to
# exactly 2 sources, recon/recon.py:149).
def q_recon_3way(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    metrics = [
        {"sum_qty": "cast(sum(cast(l_quantity as decimal(30,6))) as double)"},
        {"n": "count(*)"},
    ]
    config = {
        "version": 0,
        "group_by": ["l_returnflag"],
        "compare": "pairwise",
        "data": [
            {
                "name": "base",
                "datasource": "parquet",
                "query": "SELECT * FROM lineitem",
                "metrics": metrics,
            },
            {
                "name": "fstat",
                "datasource": "parquet",
                "query": "SELECT * FROM lineitem WHERE l_linestatus = 'F'",
                "metrics": metrics,
            },
            {
                "name": "bigqty",
                "datasource": "parquet",
                "query": "SELECT * FROM lineitem WHERE l_quantity >= 25",
                "metrics": metrics,
            },
        ],
    }
    out = ReconJob(config, spark).run()
    return out.select(
        "l_returnflag",
        "base_sum_qty",
        "base_n",
        "fstat_sum_qty",
        "fstat_n",
        "bigqty_sum_qty",
        "bigqty_n",
        F.col("delta_fstat_n").cast("bigint").alias("delta_fstat_n"),
        "delta_fstat_sum_qty",
        "match_fstat_n",
        "match_fstat_sum_qty",
        F.col("delta_bigqty_n").cast("bigint").alias("delta_bigqty_n"),
        "delta_bigqty_sum_qty",
        "match_bigqty_n",
        "match_bigqty_sum_qty",
    )


def _recon_3way_match_sql(a: str, b: str) -> str:
    return (
        f"CASE WHEN {a} IS NULL AND {b} IS NULL THEN true "
        f"WHEN {a} IS NULL OR {b} IS NULL THEN false "
        f"WHEN greatest(abs({a}), abs({b})) = 0 THEN true "
        f"ELSE abs({a} - {b}) <= 0.001 * greatest(abs({a}), abs({b})) END"
    )


ORACLE_RECON_3WAY = f"""
WITH base AS (
  SELECT l_returnflag,
         cast(sum(cast(l_quantity as decimal(30,6))) as double) AS sum_qty,
         CAST(count(*) AS BIGINT) AS n
  FROM lineitem GROUP BY l_returnflag
), fstat AS (
  SELECT l_returnflag,
         cast(sum(cast(l_quantity as decimal(30,6))) as double) AS sum_qty,
         CAST(count(*) AS BIGINT) AS n
  FROM lineitem WHERE l_linestatus = 'F' GROUP BY l_returnflag
), bigqty AS (
  SELECT l_returnflag,
         cast(sum(cast(l_quantity as decimal(30,6))) as double) AS sum_qty,
         CAST(count(*) AS BIGINT) AS n
  FROM lineitem WHERE l_quantity >= 25 GROUP BY l_returnflag
)
SELECT COALESCE(b.l_returnflag, f.l_returnflag, g.l_returnflag) AS l_returnflag,
       b.sum_qty AS base_sum_qty, b.n AS base_n,
       f.sum_qty AS fstat_sum_qty, f.n AS fstat_n,
       g.sum_qty AS bigqty_sum_qty, g.n AS bigqty_n,
       CAST(abs(b.n - f.n) AS BIGINT) AS delta_fstat_n,
       abs(b.sum_qty - f.sum_qty) AS delta_fstat_sum_qty,
       CASE WHEN b.n IS NULL AND f.n IS NULL THEN true
            WHEN b.n IS NULL OR f.n IS NULL THEN false
            ELSE b.n = f.n END AS match_fstat_n,
       {_recon_3way_match_sql('b.sum_qty', 'f.sum_qty')} AS match_fstat_sum_qty,
       CAST(abs(b.n - g.n) AS BIGINT) AS delta_bigqty_n,
       abs(b.sum_qty - g.sum_qty) AS delta_bigqty_sum_qty,
       CASE WHEN b.n IS NULL AND g.n IS NULL THEN true
            WHEN b.n IS NULL OR g.n IS NULL THEN false
            ELSE b.n = g.n END AS match_bigqty_n,
       {_recon_3way_match_sql('b.sum_qty', 'g.sum_qty')} AS match_bigqty_sum_qty
FROM base b
FULL OUTER JOIN fstat f ON b.l_returnflag = f.l_returnflag
FULL OUTER JOIN bigqty g
  ON COALESCE(b.l_returnflag, f.l_returnflag) = g.l_returnflag
"""


# ---------------------------------------------------------------------------
# Skew-mitigating salted JOIN (operators/skew.py salted_join): fact side
# salted, dim side replicated per salt — result-identical to the plain
# join (the oracle IS the plain join). Family's head rep is
# salted_event_totals (two-stage salted agg); this drives the join twin.
def q_salted_brand_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    from x_spark.operators.skew import salted_join

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("p_partkey"), "l_quantity"
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        salted_join(li, part, ["p_partkey"])
        .groupBy("p_brand")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            F.count("*").alias("n_lines"),
        )
    )


ORACLE_SALTED_BRAND_VOLUME = """
SELECT p_brand,
       CAST(sum(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


# ---------------------------------------------------------------------------
# Deterministic second-moment statistics (operators/stats.py): Pearson
# correlation matrix + grouped least-squares trend, closed forms over
# dsum-exact moment sums (F.corr's float co-moments are partition-
# order dependent and would flap a hash check).
_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def q_lineitem_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from x_spark.operators.stats import corr_matrix

    return corr_matrix(_t(spark, sf_dir, "lineitem"), _CORR_COLS)


def _lineitem_correlations_oracle() -> str:
    """Mirrors stats._corr_matrix_complete: ONE complete-rows moment
    CTE (shared per-column sums), closed form per pair."""
    from itertools import combinations

    sums = ["count(*) AS n", "CAST(count(*) AS DOUBLE) AS nd"]
    for c in _CORR_COLS:
        sums.append(
            f"CAST(sum(CAST(CAST({c} AS DOUBLE) AS DECIMAL(30,6))) AS DOUBLE) AS s_{c}"
        )
        sums.append(
            f"CAST(sum(CAST(CAST({c} AS DOUBLE)*CAST({c} AS DOUBLE) AS DECIMAL(30,6))) AS DOUBLE) AS ss_{c}"
        )
    pairs = list(combinations(_CORR_COLS, 2))
    for x, y in pairs:
        sums.append(
            f"CAST(sum(CAST(CAST({x} AS DOUBLE)*CAST({y} AS DOUBLE) AS DECIMAL(30,6))) AS DOUBLE) AS sp_{x}__{y}"
        )
    where = " AND ".join(f"{c} IS NOT NULL" for c in _CORR_COLS)
    parts = []
    for x, y in pairs:
        parts.append(f"""
SELECT '{x}' AS col_x, '{y}' AS col_y, CAST(n AS BIGINT) AS n,
       CASE WHEN n >= 2 AND (nd*ss_{x} - s_{x}*s_{x}) > 0
                 AND (nd*ss_{y} - s_{y}*s_{y}) > 0
            THEN round((nd*sp_{x}__{y} - s_{x}*s_{y})
                       / sqrt((nd*ss_{x} - s_{x}*s_{x})
                              * (nd*ss_{y} - s_{y}*s_{y})), 6)
       END AS corr
FROM m""")
    return (
        f"WITH m AS (SELECT {', '.join(sums)} FROM lineitem WHERE {where})"
        + "\nUNION ALL\n".join(parts)
    )


def q_price_trend_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    from x_spark.operators.stats import grouped_linreg

    return grouped_linreg(
        _t(spark, sf_dir, "lineitem"),
        "l_quantity",
        "l_extendedprice",
        ["l_returnflag"],
    )


ORACLE_PRICE_TREND_BY_FLAG = """
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n,
       round(CASE WHEN n >= 2 AND (nd*sxx - sx*sx) > 0
                  THEN (nd*sxy - sx*sy) / (nd*sxx - sx*sx) END, 6) AS slope,
       round(CASE WHEN n >= 2 AND (nd*sxx - sx*sx) > 0
                  THEN (sy - ((nd*sxy - sx*sy) / (nd*sxx - sx*sx)) * sx) / nd
             END, 6) AS intercept,
       round(CASE WHEN n >= 2 AND (nd*sxx - sx*sx) > 0 AND (nd*syy - sy*sy) > 0
                  THEN ((nd*sxy - sx*sy) * (nd*sxy - sx*sy))
                       / ((nd*sxx - sx*sx) * (nd*syy - sy*sy)) END, 6) AS r2
FROM (
  SELECT l_returnflag, count(*) AS n, CAST(count(*) AS DOUBLE) AS nd,
         CAST(sum(CAST(CAST(l_quantity AS DOUBLE) AS DECIMAL(30,6))) AS DOUBLE) AS sx,
         CAST(sum(CAST(CAST(l_extendedprice AS DOUBLE) AS DECIMAL(30,6))) AS DOUBLE) AS sy,
         CAST(sum(CAST(CAST(l_quantity AS DOUBLE)*CAST(l_quantity AS DOUBLE) AS DECIMAL(30,6))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(CAST(l_extendedprice AS DOUBLE)*CAST(l_extendedprice AS DOUBLE) AS DECIMAL(30,6))) AS DOUBLE) AS syy,
         CAST(sum(CAST(CAST(l_quantity AS DOUBLE)*CAST(l_extendedprice AS DOUBLE) AS DECIMAL(30,6))) AS DOUBLE) AS sxy
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
  GROUP BY l_returnflag
)
"""


# ---------------------------------------------------------------------------
# O1 global top-k on raw columns (no fp arithmetic at all).
def q_priciest_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return (
        part.select("p_partkey", "p_name", "p_brand", "p_retailprice")
        .orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
        .limit(15)
    )


ORACLE_PRICIEST_PARTS = """
SELECT p_partkey, p_name, p_brand, p_retailprice
FROM part
ORDER BY p_retailprice DESC, p_partkey ASC
LIMIT 15
"""


# ---------------------------------------------------------------------------
# Correlated-aggregate pattern: customers above their nation's average
# balance (expressed as join-with-aggregate; same algebra both engines).
def q_above_avg_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    # "balance above nation average" decided in EXACT decimal arithmetic
    # (bal * n > sum) — a float average threshold can flip borderline
    # rows differently per engine when a balance equals the true mean.
    nation_stats = cust.groupBy("c_nationkey").agg(
        F.sum(F.col("c_acctbal").cast("decimal(30,6)")).alias("bal_sum"),
        F.count("c_acctbal").alias("n_bal"),
    )
    return (
        cust.join(nation_stats, "c_nationkey")
        .filter(F.col("c_acctbal").cast("decimal(30,6)") * F.col("n_bal") > F.col("bal_sum"))
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_above"),
            F.max("c_acctbal").alias("top_balance"),
        )
    )


ORACLE_ABOVE_AVG_BALANCE = """
WITH nation_stats AS (
  SELECT c_nationkey, sum(CAST(c_acctbal AS DECIMAL(30,6))) AS bal_sum,
         count(c_acctbal) AS n_bal
  FROM customer GROUP BY c_nationkey
)
SELECT c.c_nationkey,
       CAST(count(*) AS BIGINT) AS n_above,
       max(c_acctbal) AS top_balance
FROM customer c JOIN nation_stats a ON c.c_nationkey = a.c_nationkey
WHERE CAST(c.c_acctbal AS DECIMAL(30,6)) * a.n_bal > a.bal_sum
GROUP BY c.c_nationkey
"""


# ---------------------------------------------------------------------------
# File-level Bloom data skipping, driver-checked end to end: build a
# txlog store with one append per custkey-residue batch (ids clustered
# per file but spanning the full range — footer min/max stats cannot
# prune a point lookup, the Bloom sidecar must), index o_custkey,
# then answer an IN-list lookup through bloom_prune + the pruned
# snapshot read. The oracle is the plain filter+aggregate on orders:
# if pruning ever drops a true match (a false NEGATIVE), the hash
# diverges. (Delta-parity: per-file Bloom filter indexes; the pruning
# RATIO is asserted in tests/test_bloom_index.py, correctness here.)
def q_bloom_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from x_spark.sources.base import TableRef
    from x_spark.sources.bloom_index import build_bloom_index, read_where_in
    from x_spark.sources.txlog import TxLogDataSource

    workdir = tempfile.mkdtemp(prefix="xs_bloom_lookup_")
    try:
        ds = TxLogDataSource(spark)
        ref = TableRef(path=os.path.join(workdir, "orders"))
        base = _t(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
        )
        ds.create(ref, base.schema)
        for b in range(8):
            ds.append(base.filter(F.col("o_custkey") % 8 == b).coalesce(1), ref)
        build_bloom_index(ds, ref, "o_custkey")
        hits = read_where_in(ds, ref, "o_custkey", [5, 38, 121])
        return (
            hits.groupBy("o_orderstatus")
            .agg(
                F.count("*").cast("bigint").alias("n_orders"),
                F.sum(F.col("o_totalprice").cast("decimal(30,6)"))
                .cast("double")
                .alias("total_price"),
            )
            .localCheckpoint(eager=True)  # materialize before cleanup
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


ORACLE_BLOOM_POINT_LOOKUP = """
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS total_price
FROM orders
WHERE o_custkey IN (5, 38, 121)
GROUP BY o_orderstatus
"""



# Change-data-feed 4-type contract, driver-checked end to end: a
# lineitem slice lands in a CDF-enabled txlog store, an UPDATE doubles
# 'R' rows' prices (one cdc commit: update_preimage/update_postimage
# pairs, NO rewrite-noise rows for co-located survivors), then a MERGE
# WITH SCHEMA EVOLUTION upserts line-1 rows (+1000 qty, a brand-new
# src_flag column widening the table in the same commit) plus disjoint
# inserts. The feed over both commits aggregates per change type; the
# oracle recomputes every image declaratively — any drift in cdc row
# content, pair emission, evolution timing, or the
# latest-schema-convention NULL fill hash-diverges.
# (Delta parity surface: delta.enableChangeDataFeed cdc actions +
# schema.autoMerge, public docs; reference merge surface
# datasource/delta.py:135-148.)
def q_cdf_update_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from x_spark.sources.base import MergeSpec, TableRef
    from x_spark.sources.txlog import CDF_ENABLE_KEY, TxLogDataSource

    workdir = tempfile.mkdtemp(prefix="xs_cdf_feed_")
    try:
        ds = TxLogDataSource(spark)
        ref = TableRef(path=os.path.join(workdir, "li"))
        li = _t(spark, sf_dir, "lineitem")
        base = li.filter(F.col("l_orderkey") % 11 == 0).select(
            "l_orderkey", "l_linenumber", "l_quantity",
            "l_extendedprice", "l_returnflag",
        )
        ds.create(ref, base.schema)
        ds.append(base, ref)                                     # v1
        ds.set_properties(ref, {CDF_ENABLE_KEY: "true"})         # v2
        ds.update(ref, {"l_extendedprice": "l_extendedprice * 2"},
                  "l_returnflag = 'R'")                          # v3
        # the synthetic lineitem is NOT unique on (orderkey, line
        # number) — the merge source aggregates per key (Delta MERGE
        # aborts on duplicate source keys, and this engine keeps that
        # contract), while every matching TARGET row still updates
        def src_slice(mod: int) -> DataFrame:
            return li.filter(
                (F.col("l_orderkey") % 11 == mod)
                & (F.col("l_linenumber") == 1)
            ).groupBy("l_orderkey", "l_linenumber").agg(
                (F.max("l_quantity") + F.lit(1000.0)).alias("l_quantity"),
            ).withColumn("src_flag", F.lit("M"))

        upd, ins = src_slice(0), src_slice(1)
        ds.merge(
            upd.unionByName(ins), ref,
            MergeSpec(["l_orderkey", "l_linenumber"],
                      ["l_quantity", "src_flag"],
                      insert_when_not_matched=True),
            merge_schema=True,                                   # v4
        )
        return (
            ds.changes(ref, 2)          # v3 + v4, both cdc-served
            .groupBy("_change_type")
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                dsum("l_quantity").alias("sum_qty"),
                dsum("l_extendedprice").alias("sum_price"),
                F.count("src_flag").cast("bigint").alias("n_flag"),
            )
            # materialize before the temp store disappears
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


ORACLE_CDF_UPDATE_FEED = """
WITH base AS (
  SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
         l_returnflag
  FROM lineitem WHERE l_orderkey % 11 = 0
),
after3 AS (
  SELECT l_orderkey, l_linenumber, l_quantity,
         CASE WHEN l_returnflag = 'R' THEN l_extendedprice * 2
              ELSE l_extendedprice END AS price
  FROM base
),
matched AS (SELECT * FROM after3 WHERE l_linenumber = 1),
src_qty AS (
  SELECT l_orderkey, l_linenumber, max(l_quantity) + 1000 AS new_qty
  FROM lineitem WHERE l_orderkey % 11 = 0 AND l_linenumber = 1
  GROUP BY l_orderkey, l_linenumber
),
feed AS (
  SELECT 'update_preimage' AS ct, l_quantity AS qty,
         l_extendedprice AS price, CAST(NULL AS VARCHAR) AS flag
  FROM base WHERE l_returnflag = 'R'
  UNION ALL
  SELECT 'update_postimage', l_quantity, l_extendedprice * 2, NULL
  FROM base WHERE l_returnflag = 'R'
  UNION ALL
  SELECT 'update_preimage', l_quantity, price, NULL FROM matched
  UNION ALL
  SELECT 'update_postimage', s.new_qty, m.price, 'M'
  FROM matched m JOIN src_qty s USING (l_orderkey, l_linenumber)
  UNION ALL
  SELECT 'insert', max(l_quantity) + 1000, CAST(NULL AS DOUBLE), 'M'
  FROM lineitem WHERE l_orderkey % 11 = 1 AND l_linenumber = 1
  GROUP BY l_orderkey, l_linenumber
)
SELECT ct AS "_change_type",
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(qty AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(price AS DECIMAL(30,6))) AS DOUBLE) AS sum_price,
       CAST(count(flag) AS BIGINT) AS n_flag
FROM feed
GROUP BY ct
"""


# Identity columns + column DEFAULTs, driver-checked end to end: a
# customer slice ingests into a txlog table whose id is GENERATED
# ALWAYS AS IDENTITY (START 1000 STEP 2) and whose segment column has
# DEFAULT 'UNKNOWN' — batch 1 omits segment (default fills), batch 2
# provides it, an update-only MERGE bumps matched balances. Dense
# two-stage allocation makes the id SET deterministic (exactly
# {1000 + 2k}) even though which row gets which id is not, so the
# oracle pins count/min/max/distinct over ids plus per-segment
# aggregates declaratively; a stride-allocator (partition_id<<33
# gaps), a NULL-filled default, or a double-allocated range all
# hash-diverge.
# (Delta parity surface: GENERATED ALWAYS AS IDENTITY +
# allowColumnDefaults, public docs.)
def q_sql_dml_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's write lifecycle driven PURELY through SQL
    statements on the pass-through surface — no API write calls
    (reference tests/dbr_notebook/test_case.sql cmds 1,15-18 INSERT
    INTO ...; update/upsert = Delta MERGE, datasource/delta.py:135-148):
    CREATE TABLE ... USING txlog AS SELECT (CTAS), INSERT INTO ...
    SELECT, and a full MERGE INTO with WHEN MATCHED UPDATE / WHEN NOT
    MATCHED INSERT / WHEN NOT MATCHED BY SOURCE DELETE clauses, with
    the change-data feed enabled so the merge's 4-type cdc rows audit
    the whole flow. Result: final table state per status joined with
    the feed's per-change-type counts."""
    import uuid

    from x_spark.sources.base import TableRef
    from x_spark.sources.txlog import TxLogDataSource

    ds = TxLogDataSource(spark)
    t = f"sqlflow_{uuid.uuid4().hex[:8]}"
    view = f"orders_src_{uuid.uuid4().hex[:8]}"
    _t(spark, sf_dir, "orders").createOrReplaceTempView(view)
    try:
        ds.sql(
            f"CREATE TABLE {t} USING txlog "
            "TBLPROPERTIES ('enableChangeDataFeed'='true') AS "
            "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice "
            f"FROM {view} WHERE o_orderkey % 7 = 0"
        )
        ds.sql(
            f"INSERT INTO {t} "
            "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice "
            f"FROM {view} WHERE o_orderkey % 7 = 1"
        )
        path = ds._table_path(TableRef(table=t))
        v = ds._latest_version(path)
        ds.sql(f"""
            MERGE INTO {t} t USING (
                SELECT o_orderkey, o_totalprice FROM {view}
                WHERE o_orderkey % 7 IN (0, 2) AND o_orderkey % 3 = 0
            ) s ON t.o_orderkey = s.o_orderkey
            WHEN MATCHED THEN UPDATE SET
                o_totalprice = s.o_totalprice * 2, o_orderstatus = 'U'
            WHEN NOT MATCHED THEN INSERT
                (o_orderkey, o_custkey, o_orderstatus, o_totalprice)
                VALUES (s.o_orderkey, -1, 'I', s.o_totalprice)
            WHEN NOT MATCHED BY SOURCE
                AND t.o_orderstatus = 'F' AND t.o_orderkey % 7 = 1
                THEN DELETE
        """)
        feed = ds.changes(TableRef(table=t), v).groupBy().agg(
            F.count(F.when(F.col("_change_type") == "update_preimage",
                           1)).cast("bigint").alias("n_pre"),
            F.count(F.when(F.col("_change_type") == "update_postimage",
                           1)).cast("bigint").alias("n_post"),
            F.count(F.when(F.col("_change_type") == "delete",
                           1)).cast("bigint").alias("n_del"),
            F.count(F.when(F.col("_change_type") == "insert",
                           1)).cast("bigint").alias("n_ins"),
        )
        return (
            ds.sql(f"SELECT o_orderstatus, o_custkey, o_totalprice FROM {t}")
            .groupBy("o_orderstatus")
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                dsum("o_totalprice").alias("sum_price"),
                F.countDistinct("o_custkey").cast("bigint").alias("n_cust"),
            )
            .crossJoin(F.broadcast(feed))
            # materialize before the table is dropped
            .localCheckpoint(eager=True)
        )
    finally:
        ds.sql(f"DROP TABLE IF EXISTS {t}")
        spark.catalog.dropTempView(view)


def q_mv_sql_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MATERIALIZED VIEW lifecycle driven purely through SQL
    (sources/mview.py): CTAS a txlog fact slice, CREATE MATERIALIZED
    VIEW over it, INSERT more data (view goes stale), then run a
    coarser aggregate SELECT against the BASE table — the statement
    must be transparently ROUTED to the (auto-refreshed) MV, never
    re-scanning the fact table, and a raised tripwire guards against a
    silent fallback. The oracle recomputes the aggregate from the
    declared final base state, so routing correctness (the O(groups)
    roll-up + the O(delta) refresh algebra) is what the hash checks."""
    import uuid

    from x_spark.sources.txlog import TxLogDataSource

    ds = TxLogDataSource(spark)
    t = f"mvflow_{uuid.uuid4().hex[:8]}"
    mv = f"mvflow_mv_{uuid.uuid4().hex[:8]}"
    view = f"lineitem_src_{uuid.uuid4().hex[:8]}"
    _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus",
        "l_quantity", "l_extendedprice",
    ).createOrReplaceTempView(view)
    try:
        ds.sql(
            f"CREATE TABLE {t} USING txlog AS "
            f"SELECT * FROM {view} WHERE l_orderkey % 5 = 0"
        )
        ds.sql(
            f"CREATE MATERIALIZED VIEW {mv} AS "
            f"SELECT l_returnflag, l_linestatus, count(*) AS n, "
            f"sum(l_quantity) AS qty, max(l_extendedprice) AS hi "
            f"FROM {t} GROUP BY l_returnflag, l_linestatus"
        )
        ds.sql(
            f"INSERT INTO {t} SELECT * FROM {view} "
            "WHERE l_orderkey % 5 = 2 AND l_linenumber <= 3"
        )  # MV now stale by one version
        stmt = (
            f"SELECT l_returnflag, count(*) AS n_rows, "
            f"sum(l_quantity) AS sum_qty, max(l_extendedprice) AS max_price "
            f"FROM {t} GROUP BY l_returnflag"
        )
        if ds.mviews.route_select(stmt) is None:
            raise AssertionError("aggregate SELECT was not MV-routable")
        routed = ds.sql(stmt)  # end-to-end: routed + auto-refreshed
        stale = ds.mviews.staleness(mv)  # 0 after the routed refresh
        return (
            routed.select(
                "l_returnflag",
                "n_rows",
                F.col("sum_qty").cast("double").alias("sum_qty"),
                "max_price",
                F.lit(stale).cast("bigint").alias("staleness"),
            )
            # materialize before the table + MV are dropped
            .localCheckpoint(eager=True)
        )
    finally:
        ds.sql(f"DROP MATERIALIZED VIEW IF EXISTS {mv}")
        ds.sql(f"DROP TABLE IF EXISTS {t}")
        spark.catalog.dropTempView(view)


ORACLE_MV_SQL_FLOW = """
WITH s AS (
  SELECT l_returnflag, l_quantity, l_extendedprice
  FROM lineitem
  WHERE l_orderkey % 5 = 0
     OR (l_orderkey % 5 = 2 AND l_linenumber <= 3)
)
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
       max(l_extendedprice) AS max_price,
       CAST(0 AS BIGINT) AS staleness
FROM s
GROUP BY l_returnflag
"""


def q_convert_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONVERT TO TXLOG then DML then time travel (Delta's CONVERT TO
    DELTA migration on-ramp): a plain hive-partitioned parquet
    directory is adopted as a txlog table in ONE atomic commit (footer
    stats ride the adds — data-skipping DML works immediately), a CoW
    DELETE and a partition-scoped UPDATE run on the adopted files, and
    version 0 stays time-travelable to the pre-DML state. Result:
    current vs converted-snapshot aggregates per order status."""
    import os
    import shutil
    import tempfile

    from x_spark.sources.base import TableRef
    from x_spark.sources.txlog import TxLogDataSource

    workdir = tempfile.mkdtemp(prefix="xs_convert_")
    try:
        ds = TxLogDataSource(spark)
        path = os.path.join(workdir, "ord")
        base = _t(spark, sf_dir, "orders").filter(
            F.col("o_orderkey") % 9 == 0
        ).select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        base.write.partitionBy("o_orderstatus").parquet(path)
        ref = TableRef(path=path)
        ds.convert(ref, partition_by="o_orderstatus string")     # v0
        ds.delete(ref, "o_orderkey % 2 = 0")                     # v1
        ds.update(ref, {"o_totalprice": "o_totalprice * 3"},
                  "o_orderstatus = 'F'")                         # v2
        cur = ds.read(ref).groupBy("o_orderstatus").agg(
            F.count("*").cast("bigint").alias("n_cur"),
            dsum("o_totalprice").alias("sum_cur"),
        )
        v0 = ds.read(
            TableRef(path=path, options={"versionAsOf": "0"})
        ).groupBy("o_orderstatus").agg(
            F.count("*").cast("bigint").alias("n_v0"),
            dsum("o_totalprice").alias("sum_v0"),
        )
        return (
            cur.join(v0, "o_orderstatus")
            .select("o_orderstatus", "n_cur", "sum_cur", "n_v0", "sum_v0")
            # materialize before the temp store disappears
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def q_row_tracking_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row tracking (Delta rowTracking parity): stable row ids
    assigned at commit, preserved through UPDATE, DELETE and OPTIMIZE.
    The audit joins the post-DML ids back to the initial snapshot's
    ids BY ROW ID and checks the binding still points at the same
    row (same customer key) — plus per-segment counts keyed on
    ``_row_commit_version`` (which rows were touched by which commit)
    and the initial dense id range. Id VALUES are engine-assigned
    (file-order dependent), so the result aggregates only
    assignment-order-independent facts — all SQL-expressible."""
    import os
    import shutil
    import tempfile

    from pyspark.sql.types import StructType

    from x_spark.sources.base import TableRef
    from x_spark.sources.txlog import ROW_TRACKING_KEY, TxLogDataSource

    workdir = tempfile.mkdtemp(prefix="xs_rowtrack_")
    try:
        ds = TxLogDataSource(spark)
        ref = TableRef(path=os.path.join(workdir, "cust"))
        base = _t(spark, sf_dir, "customer").filter(
            F.col("c_custkey") % 4 == 0
        ).select("c_custkey", "c_mktsegment", "c_acctbal")
        ds.create(ref, StructType.fromDDL(
            "c_custkey bigint, c_mktsegment string, c_acctbal double"
        ))                                                        # v0
        ds.set_properties(ref, {ROW_TRACKING_KEY: "true"})        # v1
        ds.append(base.repartition(3), ref)                       # v2
        v_initial = 2
        ids_v2 = ds.with_row_ids(
            TableRef(path=ref.path, options={"versionAsOf": "2"})
        )
        ds.update(ref, {"c_acctbal": "c_acctbal + 100"},
                  "c_custkey % 8 = 0")                            # v3
        ds.delete(ref, "c_mktsegment = 'BUILDING'")               # v4
        ds.optimize(ref, target_size_mb=128)                      # v5
        cur = ds.with_row_ids(ref)
        per_seg = cur.groupBy("c_mktsegment").agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.countDistinct("_row_id").cast("bigint").alias("n_ids"),
            F.count(F.when(F.col("_row_commit_version") == 3, 1))
            .cast("bigint").alias("n_updated"),
            F.count(F.when(F.col("_row_commit_version") == v_initial, 1))
            .cast("bigint").alias("n_untouched"),
            dsum("c_acctbal").alias("sum_bal"),
        )
        stable = (
            cur.select("_row_id", F.col("c_custkey").alias("k_now"))
            .join(ids_v2.select("_row_id",
                                F.col("c_custkey").alias("k_then")),
                  "_row_id")
            .agg(
                F.count("*").cast("bigint").alias("n_joined"),
                F.count(F.when(F.col("k_now") == F.col("k_then"), 1))
                .cast("bigint").alias("n_stable"),
            )
        )
        v2_range = ids_v2.agg(
            F.min("_row_id").alias("v2_min_id"),
            F.max("_row_id").alias("v2_max_id"),
            F.countDistinct("_row_id").cast("bigint").alias("v2_n_ids"),
        )
        return (
            per_seg
            .crossJoin(F.broadcast(stable))
            .crossJoin(F.broadcast(v2_range))
            # materialize before the temp store disappears
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def q_or_delete_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-conjuncts data skipping through a real DELETE (Delta's
    disjunction rule): a txlog table clustered on l_orderkey (tight
    per-file footer ranges) takes a DELETE whose predicate is an OR of
    range conjuncts — candidate selection excludes a file only when
    EVERY disjunct is provably false on its stats, and the survivors
    must equal the declarative complement. The reference's own
    generated replaceWhere predicate is exactly this OR-of-ranges
    shape (etl/overwrite.py:27-33). Result: per-returnflag survivor
    profile."""
    import os
    import shutil
    import tempfile

    from x_spark.sources.base import TableRef
    from x_spark.sources.txlog import TxLogDataSource

    workdir = tempfile.mkdtemp(prefix="xs_ordel_")
    try:
        ds = TxLogDataSource(spark)
        ref = TableRef(path=os.path.join(workdir, "li"))
        base = _t(spark, sf_dir, "lineitem").filter(
            F.col("l_orderkey") % 5 == 0
        ).select("l_orderkey", "l_partkey", "l_quantity",
                 "l_returnflag", "l_extendedprice")
        ds.create(ref, base.schema)
        ds.append(base, ref)
        ds.cluster(ref, ["l_orderkey"], target_files=8)
        ds.delete(
            ref,
            "(l_orderkey < 600) "
            "OR (l_orderkey >= 4000 AND l_orderkey < 4600) "
            "OR (l_quantity <= 2 AND l_orderkey >= 5000)",
        )
        return (
            ds.read(ref).groupBy("l_returnflag").agg(
                F.count("*").cast("bigint").alias("n_rows"),
                dsum("l_extendedprice").alias("sum_price"),
                F.min("l_orderkey").cast("bigint").alias("min_ok"),
                F.max("l_orderkey").cast("bigint").alias("max_ok"),
            )
            # materialize before the temp store disappears
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


ORACLE_OR_DELETE_SKIPPING = """
WITH base AS (
  SELECT l_orderkey, l_quantity, l_returnflag, l_extendedprice
  FROM lineitem WHERE l_orderkey % 5 = 0
),
survivors AS (
  SELECT * FROM base
  WHERE NOT ((l_orderkey < 600)
             OR (l_orderkey >= 4000 AND l_orderkey < 4600)
             OR (l_quantity <= 2 AND l_orderkey >= 5000))
)
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE)
         AS sum_price,
       CAST(min(l_orderkey) AS BIGINT) AS min_ok,
       CAST(max(l_orderkey) AS BIGINT) AS max_ok
FROM survivors GROUP BY l_returnflag
"""


def q_partition_stats_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition discovery + per-partition profile from the METADATA
    plane alone (reference D1 — ``SHOW PARTITIONS`` at
    etl/overwrite.py:10-18 — plus the typed-sidecar pv/num_records
    columns): neither surface opens a data file, which is what lets a
    100-TB ingest dashboard poll partition health for free. SHOW
    PARTITIONS supplies the typed tuple list, partition_stats the
    per-partition row counts; the result must equal the declarative
    GROUP BY over the data."""
    import os
    import shutil
    import tempfile

    from x_spark.sources.base import TableRef
    from x_spark.sources.txlog import TxLogDataSource

    workdir = tempfile.mkdtemp(prefix="xs_pstats_")
    try:
        ds = TxLogDataSource(spark)
        ref = TableRef(path=os.path.join(workdir, "ord"))
        base = _t(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice"
        )
        ds.create(ref, base.schema, partition_by=["o_orderpriority"])
        # two appends: partitions hold several files, metadata must sum
        ds.append(base.filter(F.col("o_orderkey") % 2 == 0), ref)
        ds.append(base.filter(F.col("o_orderkey") % 2 == 1), ref)
        parts = ds.show_partitions(ref)
        n_parts = parts.count()
        return (
            ds.partition_stats(ref)
            .select(
                "o_orderpriority",
                F.col("n_rows").cast("bigint").alias("n_rows"),
                F.lit(n_parts).cast("bigint").alias("n_parts"),
            )
            # materialize before the temp store disappears
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


ORACLE_PARTITION_STATS_METADATA = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST((SELECT count(DISTINCT o_orderpriority) FROM orders)
            AS BIGINT) AS n_parts
FROM orders GROUP BY o_orderpriority
"""


def q_sql_view_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE VIEW / TEMPORARY VIEW over txlog names: definitions
    store raw SQL and re-expand at QUERY time, so a view created
    BEFORE an insert reads the post-insert state (Spark/Delta view
    semantics, never creation-time freezing), and a temp view over
    the view exercises recursive expansion. Result: the view-over-view
    segment profile."""
    import uuid

    from x_spark.sources.base import TableRef
    from x_spark.sources.txlog import TxLogDataSource

    ds = TxLogDataSource(spark)
    tag = uuid.uuid4().hex[:8]
    t, v, w = f"vwf_t_{tag}", f"vwf_v_{tag}", f"vwf_w_{tag}"
    src = f"cust_src_{tag}"
    _t(spark, sf_dir, "customer").createOrReplaceTempView(src)
    try:
        ds.sql(
            f"CREATE TABLE {t} USING txlog AS "
            "SELECT c_custkey, c_mktsegment, c_acctbal "
            f"FROM {src} WHERE c_custkey % 3 = 0"
        )
        # the view is defined BEFORE the second insert lands
        ds.sql(
            f"CREATE VIEW {v} AS SELECT c_mktsegment, c_acctbal, "
            f"c_custkey FROM {t} WHERE c_acctbal > 0"
        )
        ds.sql(
            f"INSERT INTO {t} SELECT c_custkey, c_mktsegment, "
            f"c_acctbal FROM {src} WHERE c_custkey % 3 = 1"
        )
        ds.sql(
            f"CREATE TEMPORARY VIEW {w} AS "
            f"SELECT c_mktsegment, c_acctbal FROM {v} "
            "WHERE c_custkey % 2 = 0"
        )
        return (
            ds.sql(
                f"SELECT c_mktsegment, count(*) AS n_rows, "
                f"sum(CAST(c_acctbal AS DECIMAL(30,6))) AS bal "
                f"FROM {w} GROUP BY c_mktsegment"
            )
            .select(
                "c_mktsegment",
                F.col("n_rows").cast("bigint").alias("n_rows"),
                F.col("bal").cast("double").alias("sum_bal"),
            )
            # materialize before table and views are dropped
            .localCheckpoint(eager=True)
        )
    finally:
        ds.sql(f"DROP VIEW IF EXISTS {w}")
        ds.sql(f"DROP VIEW IF EXISTS {v}")
        ds.sql(f"DROP TABLE IF EXISTS {t}")
        spark.catalog.dropTempView(src)


ORACLE_SQL_VIEW_FLOW = """
WITH t AS (
  SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
  WHERE c_custkey % 3 IN (0, 1)
)
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE) AS sum_bal
FROM t WHERE c_acctbal > 0 AND c_custkey % 2 = 0
GROUP BY c_mktsegment
"""


ORACLE_ROW_TRACKING_LINEAGE = """
WITH base AS (
  SELECT c_custkey, c_mktsegment, c_acctbal
  FROM customer WHERE c_custkey % 4 = 0
),
survivors AS (
  SELECT c_custkey, c_mktsegment,
         CASE WHEN c_custkey % 8 = 0 THEN c_acctbal + 100
              ELSE c_acctbal END AS c_acctbal,
         CASE WHEN c_custkey % 8 = 0 THEN 3 ELSE 2 END AS rcv
  FROM base WHERE c_mktsegment <> 'BUILDING'
),
audit AS (
  SELECT CAST((SELECT count(*) FROM survivors) AS BIGINT) AS n_joined,
         CAST((SELECT count(*) FROM survivors) AS BIGINT) AS n_stable,
         CAST(0 AS BIGINT) AS v2_min_id,
         CAST((SELECT count(*) FROM base) - 1 AS BIGINT) AS v2_max_id,
         CAST((SELECT count(*) FROM base) AS BIGINT) AS v2_n_ids
)
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_ids,
       CAST(count(CASE WHEN rcv = 3 THEN 1 END) AS BIGINT) AS n_updated,
       CAST(count(CASE WHEN rcv = 2 THEN 1 END) AS BIGINT) AS n_untouched,
       CAST(sum(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE) AS sum_bal,
       audit.n_joined, audit.n_stable,
       audit.v2_min_id, audit.v2_max_id, audit.v2_n_ids
FROM survivors CROSS JOIN audit
GROUP BY c_mktsegment, audit.n_joined, audit.n_stable,
         audit.v2_min_id, audit.v2_max_id, audit.v2_n_ids
"""


ORACLE_CONVERT_TIME_TRAVEL = """
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 9 = 0
),
cur AS (
  SELECT o_orderstatus,
         CAST(count(*) AS BIGINT) AS n_cur,
         CAST(sum(CAST(CASE WHEN o_orderstatus = 'F'
                            THEN o_totalprice * 3
                            ELSE o_totalprice END
                       AS DECIMAL(30,6))) AS DOUBLE) AS sum_cur
  FROM base WHERE NOT (o_orderkey % 2 = 0)
  GROUP BY o_orderstatus
),
v0 AS (
  SELECT o_orderstatus,
         CAST(count(*) AS BIGINT) AS n_v0,
         CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_v0
  FROM base GROUP BY o_orderstatus
)
SELECT o_orderstatus, n_cur, sum_cur, n_v0, sum_v0
FROM cur JOIN v0 USING (o_orderstatus)
"""


ORACLE_SQL_DML_FLOW = """
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 7 IN (0, 1)
),
merged AS (
  SELECT o_orderkey, o_custkey,
         CASE WHEN o_orderkey % 7 = 0 AND o_orderkey % 3 = 0
              THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
         CASE WHEN o_orderkey % 7 = 0 AND o_orderkey % 3 = 0
              THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice
  FROM base
  WHERE NOT (o_orderstatus = 'F' AND o_orderkey % 7 = 1)
  UNION ALL
  SELECT o_orderkey, -1 AS o_custkey, 'I' AS o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 7 = 2 AND o_orderkey % 3 = 0
),
feed AS (
  SELECT
    CAST((SELECT count(*) FROM orders
          WHERE o_orderkey % 7 = 0 AND o_orderkey % 3 = 0)
         AS BIGINT) AS n_pre,
    CAST((SELECT count(*) FROM orders
          WHERE o_orderkey % 7 = 0 AND o_orderkey % 3 = 0)
         AS BIGINT) AS n_post,
    CAST((SELECT count(*) FROM orders
          WHERE o_orderkey % 7 = 1 AND o_orderstatus = 'F')
         AS BIGINT) AS n_del,
    CAST((SELECT count(*) FROM orders
          WHERE o_orderkey % 7 = 2 AND o_orderkey % 3 = 0)
         AS BIGINT) AS n_ins
)
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
         AS sum_price,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust,
       feed.n_pre, feed.n_post, feed.n_del, feed.n_ins
FROM merged CROSS JOIN feed
GROUP BY o_orderstatus, feed.n_pre, feed.n_post, feed.n_del, feed.n_ins
"""


def q_default_identity_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from pyspark.sql.types import StructType

    from x_spark.sources.base import MergeSpec, TableRef
    from x_spark.sources.txlog import TxLogDataSource

    workdir = tempfile.mkdtemp(prefix="xs_dflt_id_")
    try:
        ds = TxLogDataSource(spark)
        ref = TableRef(path=os.path.join(workdir, "cust"))
        ds.create(ref, StructType.fromDDL(
            "id bigint, c_name string, c_acctbal double, segment string"
        ))
        ds.set_identity_column(ref, "id", start=1000, step=2)
        ds.set_column_default(ref, "segment", "'UNKNOWN'")
        cust = _t(spark, sf_dir, "customer")
        b1 = cust.filter(F.col("c_custkey") % 3 == 0).select(
            "c_name", "c_acctbal",
        )
        ds.append(b1, ref)             # omits segment AND id: both fill
        b2 = cust.filter(F.col("c_custkey") % 3 == 1).select(
            "c_name", "c_acctbal", F.col("c_mktsegment").alias("segment"),
        )
        ds.append(b2, ref)
        src = cust.filter(
            (F.col("c_custkey") % 3 == 0) & (F.col("c_custkey") % 2 == 0)
        ).select("c_name", (F.col("c_acctbal") + F.lit(100.0))
                 .alias("c_acctbal"))
        ds.merge(src, ref, MergeSpec(["c_name"], ["c_acctbal"]))
        ids = ds.read(ref).agg(
            F.count("id").cast("bigint").alias("n_ids"),
            F.countDistinct("id").cast("bigint").alias("n_distinct_ids"),
            F.min("id").alias("min_id"),
            F.max("id").alias("max_id"),
        )
        return (
            ds.read(ref)
            .groupBy("segment")
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                dsum("c_acctbal").alias("sum_bal"),
            )
            .crossJoin(F.broadcast(ids))
            # materialize before the temp store disappears
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


ORACLE_DEFAULT_IDENTITY_INGEST = """
WITH b1 AS (
  SELECT c_name, c_acctbal, 'UNKNOWN' AS segment
  FROM customer WHERE c_custkey % 3 = 0
),
b2 AS (
  SELECT c_name, c_acctbal, c_mktsegment AS segment
  FROM customer WHERE c_custkey % 3 = 1
),
merged AS (
  SELECT c_name,
         CASE WHEN c_name IN (
                SELECT c_name FROM customer
                WHERE c_custkey % 3 = 0 AND c_custkey % 2 = 0)
              THEN c_acctbal + 100 ELSE c_acctbal END AS c_acctbal,
         segment
  FROM (SELECT * FROM b1 UNION ALL SELECT * FROM b2)
),
ids AS (
  SELECT CAST(count(*) AS BIGINT) AS n_ids,
         CAST(count(*) AS BIGINT) AS n_distinct_ids,
         CAST(1000 AS BIGINT) AS min_id,
         CAST(1000 + 2 * (count(*) - 1) AS BIGINT) AS max_id
  FROM merged
)
SELECT segment,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE) AS sum_bal,
       ids.n_ids, ids.n_distinct_ids, ids.min_id, ids.max_id
FROM merged CROSS JOIN ids
GROUP BY segment, ids.n_ids, ids.n_distinct_ids, ids.min_id, ids.max_id
"""


# ---------------------------------------------------------------------------
# COPY INTO, driver-checked end to end: simulate a landing zone fed in
# two batches. COPY loads batch 1; an immediate re-COPY must be a
# no-op (its rows_loaded is folded into the result as a column the
# oracle pins to 0 — a duplicate load breaks the hash TWICE, once
# through that column and once through every count/sum); batch 2 lands
# and a third COPY picks up ONLY the new files. The final table must
# equal batch1 ∪ batch2 exactly once each.
# (Reference parity: the reference's ingestion loop is source scan +
# table sink, etl/parent.py write verbs; COPY INTO is the idempotent
# SQL-native form — Delta's COPY INTO semantics.)
def q_copy_into_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from x_spark.sources.base import TableRef
    from x_spark.sources.txlog import TxLogDataSource

    workdir = tempfile.mkdtemp(prefix="xs_copy_into_")
    try:
        ds = TxLogDataSource(spark)
        ref = TableRef(path=os.path.join(workdir, "ord"))
        orders = _t(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
        )
        ds.create(ref, orders.schema)
        land = os.path.join(workdir, "landing")
        orders.filter(F.col("o_orderkey") % 7 == 0).write.parquet(
            os.path.join(land, "b1")
        )
        ds.copy_into(ref, land)
        _, second_rows = ds.copy_into(ref, land)  # idempotent: 0 rows
        orders.filter(F.col("o_orderkey") % 7 == 3).write.parquet(
            os.path.join(land, "b2")
        )
        ds.copy_into(ref, land)  # loads ONLY the new batch's files
        return (
            ds.read(ref)
            .groupBy("o_orderstatus")
            .agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.countDistinct("o_orderkey").cast("bigint")
                .alias("n_orders"),
                dsum("o_totalprice").alias("sum_price"),
            )
            .withColumn("second_copy_rows",
                        F.lit(int(second_rows)).cast("bigint"))
            # materialize before the temp store disappears
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


ORACLE_COPY_INTO_INGEST = """
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_price,
       CAST(0 AS BIGINT) AS second_copy_rows
FROM orders
WHERE o_orderkey % 7 IN (0, 3)
GROUP BY o_orderstatus
"""

RELATIONAL_QUERIES = {
    "bloom_point_lookup": q_bloom_point_lookup,
    "pricing_summary": q_pricing_summary,
    "shipping_priority": q_shipping_priority,
    "late_shipment_priority": q_late_shipment_priority,
    "customers_without_orders": q_customers_without_orders,
    "local_supplier_volume": q_local_supplier_volume,
    "revenue_forecast": q_revenue_forecast,
    "top_customers": q_top_customers,
    "top_orders_per_segment": q_top_orders_per_segment,
    "distinct_suppliers_parts": q_distinct_suppliers_parts,
    "rollup_quantity": q_rollup_quantity,
    "nation_presence": q_nation_presence,
    "quantity_by_status_pivot": q_quantity_by_status_pivot,
    "part_catalog_report": q_part_catalog_report,
    "event_hourly_profile": q_event_hourly_profile,
    "merge_upsert_effect": q_merge_upsert_effect,
    "txlog_version_diff": q_txlog_version_diff,
    "txlog_restore_roundtrip": q_txlog_restore_roundtrip,
    "dv_delete_scan": q_dv_delete_scan,
    "schema_evolution_scan": q_schema_evolution_scan,
    "cdf_update_feed": q_cdf_update_feed,
    "default_identity_ingest": q_default_identity_ingest,
    "sql_dml_flow": q_sql_dml_flow,
    "convert_time_travel": q_convert_time_travel,
    "row_tracking_lineage": q_row_tracking_lineage,
    "or_delete_skipping": q_or_delete_skipping,
    "partition_stats_metadata": q_partition_stats_metadata,
    "sql_view_flow": q_sql_view_flow,
    "copy_into_ingest": q_copy_into_ingest,
    "join_view_refresh": q_join_view_refresh,
    "minmax_view_refresh": q_minmax_view_refresh,
    "agg_view_route": q_agg_view_route,
    "mv_sql_flow": q_mv_sql_flow,
    "lineitem_key_skew": q_lineitem_key_skew,
    "table_profile": q_table_profile,
    "profile_drift": q_profile_drift,
    "approx_profile_gate": q_approx_profile_gate,
    "salted_brand_volume": q_salted_brand_volume,
    "lineitem_correlations": q_lineitem_correlations,
    "price_trend_by_flag": q_price_trend_by_flag,
    "recon_lineitem": q_recon_lineitem,
    "recon_3way": q_recon_3way,
    "priciest_parts": q_priciest_parts,
    "above_avg_balance": q_above_avg_balance,
}

RELATIONAL_ORACLES = {
    "bloom_point_lookup": ORACLE_BLOOM_POINT_LOOKUP,
    "pricing_summary": ORACLE_PRICING_SUMMARY,
    "shipping_priority": ORACLE_SHIPPING_PRIORITY,
    "late_shipment_priority": ORACLE_LATE_SHIPMENT_PRIORITY,
    "customers_without_orders": ORACLE_CUSTOMERS_WITHOUT_ORDERS,
    "local_supplier_volume": ORACLE_LOCAL_SUPPLIER_VOLUME,
    "revenue_forecast": ORACLE_REVENUE_FORECAST,
    "top_customers": ORACLE_TOP_CUSTOMERS,
    "top_orders_per_segment": ORACLE_TOP_ORDERS_PER_SEGMENT,
    "distinct_suppliers_parts": ORACLE_DISTINCT_SUPPLIERS_PARTS,
    "rollup_quantity": ORACLE_ROLLUP_QUANTITY,
    "nation_presence": ORACLE_NATION_PRESENCE,
    "quantity_by_status_pivot": ORACLE_QUANTITY_BY_STATUS_PIVOT,
    "part_catalog_report": ORACLE_PART_CATALOG_REPORT,
    "event_hourly_profile": ORACLE_EVENT_HOURLY_PROFILE,
    "merge_upsert_effect": ORACLE_MERGE_UPSERT_EFFECT,
    "txlog_version_diff": ORACLE_TXLOG_VERSION_DIFF,
    "txlog_restore_roundtrip": ORACLE_TXLOG_RESTORE_ROUNDTRIP,
    "dv_delete_scan": ORACLE_DV_DELETE_SCAN,
    "schema_evolution_scan": ORACLE_SCHEMA_EVOLUTION_SCAN,
    "cdf_update_feed": ORACLE_CDF_UPDATE_FEED,
    "default_identity_ingest": ORACLE_DEFAULT_IDENTITY_INGEST,
    "sql_dml_flow": ORACLE_SQL_DML_FLOW,
    "convert_time_travel": ORACLE_CONVERT_TIME_TRAVEL,
    "row_tracking_lineage": ORACLE_ROW_TRACKING_LINEAGE,
    "or_delete_skipping": ORACLE_OR_DELETE_SKIPPING,
    "partition_stats_metadata": ORACLE_PARTITION_STATS_METADATA,
    "sql_view_flow": ORACLE_SQL_VIEW_FLOW,
    "copy_into_ingest": ORACLE_COPY_INTO_INGEST,
    "join_view_refresh": ORACLE_JOIN_VIEW_REFRESH,
    "minmax_view_refresh": ORACLE_MINMAX_VIEW_REFRESH,
    "agg_view_route": ORACLE_AGG_VIEW_ROUTE,
    "mv_sql_flow": ORACLE_MV_SQL_FLOW,
    "lineitem_key_skew": ORACLE_LINEITEM_KEY_SKEW,
    "table_profile": _table_profile_oracle(),
    "profile_drift": _profile_drift_oracle(),
    "approx_profile_gate": _approx_profile_gate_oracle(),
    "salted_brand_volume": ORACLE_SALTED_BRAND_VOLUME,
    "lineitem_correlations": _lineitem_correlations_oracle(),
    "price_trend_by_flag": ORACLE_PRICE_TREND_BY_FLAG,
    "recon_lineitem": ORACLE_RECON_LINEITEM,
    "recon_3way": ORACLE_RECON_3WAY,
    "priciest_parts": ORACLE_PRICIEST_PARTS,
    "above_avg_balance": ORACLE_ABOVE_AVG_BALANCE,
}
