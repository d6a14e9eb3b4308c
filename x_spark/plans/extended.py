"""Extended operator battery: temporal as-of join, CUBE, exact
percentiles, analytic lag windows, BPE-ish token stats, rolling-hash
fingerprints.

These cover SURVEY §2 rows marked ABSENT-as-extension (WF1 window
frames, A6 cube/percentiles, J3 as-of) plus the remaining Phase-E text
primitives (token counting with a BPE-ish regex, rolling-hash
document fingerprinting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from x_spark.functions.portable import MINHASH_PRIME, umicros
from x_spark.operators.temporal import as_of_join
from x_spark.session import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def dsum(col) -> F.Column:
    col = F.col(col) if isinstance(col, str) else col
    return F.sum(col.cast("decimal(30,6)")).cast("double")


# ---------------------------------------------------------------------------
# J3-extension: as-of join — for each click, the user's most recent
# purchase at-or-before the click (point-in-time lookup, feature-store
# shape). One shuffle on user_id; no range explosion.
def q_asof_purchase_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    joined = as_of_join(
        clicks,
        purchases,
        key_cols=["user_id"],
        right_payload=["value"],
        tiebreak="event_id",
    )
    return joined.select(
        "event_id",
        "user_id",
        (
            (umicros("ts") - umicros("asof_ts")) / F.lit(1000000.0)
        ).alias("gap_sec"),
        F.round(F.col("value_asof").cast("double"), 6).alias("purchase_value"),
    )


ORACLE_ASOF_PURCHASE_GAP = """
WITH u AS (
  SELECT user_id, ts, 1 AS m, NULL::BIGINT AS tb, event_id AS left_id,
         NULL::DOUBLE AS r_value, NULL::TIMESTAMP AS r_ts
  FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT user_id, ts, 0, event_id, NULL, value, ts
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, ts, m, left_id,
         last_value(r_ts IGNORE NULLS) OVER w AS asof_ts,
         last_value(r_value IGNORE NULLS) OVER w AS asof_value
  FROM u
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, m, tb NULLS LAST
               ROWS UNBOUNDED PRECEDING)
)
SELECT left_id AS event_id, user_id,
       (epoch_us(ts) - epoch_us(asof_ts)) / 1000000.0 AS gap_sec,
       round(asof_value, 6) AS purchase_value
FROM c WHERE m = 1
"""


# ---------------------------------------------------------------------------
# J3-extension: bucketized range join — clicks within the 30 minutes
# before each purchase, per user (zero-click purchases kept via a final
# left join against the pair counts).
def q_range_click_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    from x_spark.operators.temporal import range_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    pairs = range_join(
        purchases, clicks, ["user_id"], lower_sec=-1800.0, upper_sec=0.0
    )
    counts = pairs.groupBy("event_id").agg(F.count("*").alias("n"))
    return purchases.join(counts, "event_id", "left").select(
        "event_id",
        "user_id",
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n_clicks_30m"),
    )


ORACLE_RANGE_CLICK_CONTEXT = """
SELECT p.event_id, p.user_id, CAST(count(c.event_id) AS BIGINT) AS n_clicks_30m
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
  ON c.user_id = p.user_id
 AND c.ts >= p.ts - INTERVAL 30 MINUTE
 AND c.ts < p.ts
GROUP BY p.event_id, p.user_id
"""


# ---------------------------------------------------------------------------
# A6: CUBE with grouping id (all aggregation lattice cells in one pass).
def q_quantity_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    from x_spark.fanout import fan_out

    li = _t(spark, sf_dir, "lineitem")
    # Expand (x4 lattice cells) + DECIMAL(30,6) accumulation run in the
    # pre-exchange stage — fan a degenerate one-split layout out first
    # (guide §2.5; no-op on multi-split tables, exact sums are
    # order-independent)
    li = fan_out(li.select("l_returnflag", "l_linestatus", "l_quantity"))
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            F.count("*").alias("n_rows"),
            F.grouping_id("l_returnflag", "l_linestatus").cast("bigint").alias("gid"),
        )
    )


ORACLE_QUANTITY_CUBE = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


# ---------------------------------------------------------------------------
# A6: exact percentiles (continuous interpolation), per group.
def q_quantity_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("double")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(cast(l_quantity as double), 0.5)"), 6).alias("median_qty"),
        F.round(F.expr("percentile(cast(l_quantity as double), 0.9)"), 6).alias("p90_qty"),
        F.round(F.min(qty), 6).alias("min_qty"),
        F.round(F.max(qty), 6).alias("max_qty"),
    )


ORACLE_QUANTITY_PERCENTILES = """
SELECT l_returnflag,
       round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.5), 6) AS median_qty,
       round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.9), 6) AS p90_qty,
       round(min(CAST(l_quantity AS DOUBLE)), 6) AS min_qty,
       round(max(CAST(l_quantity AS DOUBLE)), 6) AS max_qty
FROM lineitem
GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# WF1: analytic window frames — weekly revenue with week-over-week lag.
# The ORDER BY window is tiny (one row per week) after pre-aggregation.
def q_weekly_revenue_wow(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    weekly = (
        orders.groupBy(F.date_trunc("week", F.col("o_orderdate")).alias("week"))
        .agg(dsum("o_totalprice").alias("revenue"), F.count("*").alias("n_orders"))
    )
    w = W.orderBy("week")
    return weekly.select(
        "week",
        "revenue",
        "n_orders",
        F.round(F.col("revenue") - F.lag("revenue", 1).over(w), 6).alias("wow_delta"),
        F.lag("n_orders", 1).over(w).alias("prev_orders"),
    )


ORACLE_WEEKLY_REVENUE_WOW = """
WITH weekly AS (
  SELECT date_trunc('week', o_orderdate) AS week,
         CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1
)
SELECT week, revenue, n_orders,
       round(revenue - lag(revenue, 1) OVER (ORDER BY week), 6) AS wow_delta,
       lag(n_orders, 1) OVER (ORDER BY week) AS prev_orders
FROM weekly
"""


# ---------------------------------------------------------------------------
# Phase-E text: BPE-ish token counting (letter runs / digits / marks as
# separate tokens) and a polynomial rolling-hash fingerprint over the
# 32-bit token hashes — both single-projection, scan-speed.
_BPE_RE = "[A-Za-z]+|[0-9]|[^\\sA-Za-z0-9]"


def q_token_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    tok_hashes = (
        "transform(regexp_extract_all(lower(text), '\\\\S+', 0), "
        "t -> cast(conv(substr(md5(t),1,8),16,10) as bigint))"
    )
    return docs.select(
        "doc_id",
        F.regexp_count("text", F.lit(_BPE_RE)).cast("bigint").alias("n_bpe_tokens"),
        F.regexp_count("text", F.lit(r"\S+")).cast("bigint").alias("n_ws_tokens"),
        F.expr(
            f"aggregate({tok_hashes}, 0L, (acc, h) -> (acc * 31 + h) % {MINHASH_PRIME}L)"
        ).alias("rolling_fp"),
    )


ORACLE_TOKEN_FINGERPRINTS = f"""
SELECT doc_id,
       CAST(length(regexp_extract_all(text, '{_BPE_RE}')) AS BIGINT) AS n_bpe_tokens,
       CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_ws_tokens,
       CAST(list_reduce(
         list_prepend(0::BIGINT,
           list_transform(regexp_extract_all(lower(text), '\\S+'),
                          t -> cast(concat('0x', substr(md5(t),1,8)) as bigint))),
         (acc, h) -> (acc * 31 + h) % {MINHASH_PRIME}) AS BIGINT) AS rolling_fp
FROM documents
"""


# ---------------------------------------------------------------------------
# W7 extension: SCD Type-2 apply over a synthetic customer dimension.
# Exercises every branch: pre-closed history passthrough, close+reopen
# on change, no-op changes kept open, new keys inserted open. Decimal
# arithmetic keeps values bit-identical across engines.
_SCD_TS0, _SCD_TS1, _SCD_TS2 = "2019-01-01", "2020-01-01", "2024-06-01"


def q_scd2_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from x_spark.operators.scd import scd2_apply

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_acctbal").cast("decimal(12,2)").alias("bal"),
        "c_mktsegment",
    )
    ts = lambda s: F.lit(s).cast("timestamp")  # noqa: E731
    null_ts = F.lit(None).cast("timestamp")
    open_rows = cust.select(
        "c_custkey", "bal", "c_mktsegment",
        ts(_SCD_TS1).alias("valid_from"), null_ts.alias("valid_to"),
    )
    hist = cust.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        (F.col("bal") - F.lit(50.00).cast("decimal(12,2)")).cast("decimal(12,2)").alias("bal"),
        "c_mktsegment",
        ts(_SCD_TS0).alias("valid_from"), ts(_SCD_TS1).alias("valid_to"),
    )
    dim = hist.unionByName(open_rows)
    changed = cust.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        (F.col("bal") + F.lit(100.50).cast("decimal(12,2)")).cast("decimal(12,2)").alias("bal"),
        "c_mktsegment",
        ts(_SCD_TS2).alias("ts"),
    )
    noop = cust.filter((F.col("c_custkey") % 9 == 0) & (F.col("c_custkey") % 10 != 0)).select(
        "c_custkey", "bal", "c_mktsegment", ts(_SCD_TS2).alias("ts")
    )
    newk = cust.filter(F.col("c_custkey") % 50 == 0).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        "bal",
        F.lit("NEWSEG").alias("c_mktsegment"),
        ts(_SCD_TS2).alias("ts"),
    )
    changes = changed.unionByName(noop).unionByName(newk)
    out = scd2_apply(dim, changes, ["c_custkey"], ["bal", "c_mktsegment"])
    return out.select(
        "c_custkey",
        F.col("bal").cast("double").alias("c_acctbal"),
        "c_mktsegment",
        "valid_from",
        "valid_to",
    )


ORACLE_SCD2_CUSTOMER = f"""
WITH cust AS (
  SELECT c_custkey, CAST(c_acctbal AS DECIMAL(12,2)) AS bal, c_mktsegment FROM customer
), dim AS (
  SELECT c_custkey, CAST(bal - 50.00 AS DECIMAL(12,2)) AS bal, c_mktsegment,
         TIMESTAMP '{_SCD_TS0}' AS valid_from, TIMESTAMP '{_SCD_TS1}' AS valid_to
  FROM cust WHERE c_custkey % 7 = 0
  UNION ALL
  SELECT c_custkey, bal, c_mktsegment, TIMESTAMP '{_SCD_TS1}', NULL FROM cust
), changes AS (
  SELECT c_custkey AS k, CAST(bal + 100.50 AS DECIMAL(12,2)) AS nbal,
         c_mktsegment AS nseg, TIMESTAMP '{_SCD_TS2}' AS cts
  FROM cust WHERE c_custkey % 10 = 0
  UNION ALL
  SELECT c_custkey, bal, c_mktsegment, TIMESTAMP '{_SCD_TS2}'
  FROM cust WHERE c_custkey % 9 = 0 AND c_custkey % 10 <> 0
  UNION ALL
  SELECT c_custkey + 1000000, bal, 'NEWSEG', TIMESTAMP '{_SCD_TS2}'
  FROM cust WHERE c_custkey % 50 = 0
), closed_hist AS (
  SELECT * FROM dim WHERE valid_to IS NOT NULL
), open_rows AS (
  SELECT * FROM dim WHERE valid_to IS NULL
), j AS (
  SELECT o.c_custkey AS ok, o.bal, o.c_mktsegment, o.valid_from,
         c.k, c.nbal, c.nseg, c.cts,
         (o.bal IS DISTINCT FROM c.nbal OR o.c_mktsegment IS DISTINCT FROM c.nseg) AS differs
  FROM open_rows o FULL JOIN changes c ON o.c_custkey = c.k
)
SELECT c_custkey, CAST(bal AS DOUBLE) AS c_acctbal, c_mktsegment, valid_from, valid_to
FROM (
  SELECT * FROM closed_hist
  UNION ALL
  SELECT ok, bal, c_mktsegment, valid_from, cts FROM j
  WHERE ok IS NOT NULL AND cts IS NOT NULL AND differs
  UNION ALL
  SELECT coalesce(ok, k), nbal, nseg, cts, NULL FROM j
  WHERE cts IS NOT NULL AND (ok IS NULL OR differs)
  UNION ALL
  SELECT ok, bal, c_mktsegment, valid_from, NULL FROM j
  WHERE ok IS NOT NULL AND (cts IS NULL OR NOT differs)
)
"""


# ---------------------------------------------------------------------------
# F6 extension: JSON functions over the events props column —
# extraction stays in the scan projection (whole-stage codegen), no
# UDFs, aggregation exact on integers.
def q_json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count(k).alias("n_with_k"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


ORACLE_JSON_PROPS_STATS = """
SELECT event_type,
       CAST(count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS n_with_k,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
       CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# A6/F6: ordered array aggregation — collect_list is order-dependent,
# so sort_array makes it deterministic and cross-engine comparable.
def q_nation_supplier_roster(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    return (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            # serialized rather than array-typed: array columns
            # stringify differently across pandas/numpy paths, which
            # breaks naive value-hash comparison
            F.array_join(F.sort_array(F.collect_list("s_name")), "|").alias("suppliers"),
            F.count("*").alias("n_suppliers"),
        )
    )


ORACLE_NATION_SUPPLIER_ROSTER = """
SELECT n_name,
       array_to_string(list_sort(list(s_name)), '|') AS suppliers,
       CAST(count(*) AS BIGINT) AS n_suppliers
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# F6: scalar string/date function battery in one scan projection.
def q_scalar_function_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    return orders.select(
        "o_orderkey",
        F.upper(F.substring("o_orderpriority", 1, 1)).alias("prio_code"),
        F.concat_ws("-", F.lit("ord"), F.col("o_orderkey").cast("string")).alias("tag"),
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0").alias("padded"),
        F.length(F.trim(F.col("o_orderpriority"))).cast("bigint").alias("prio_len"),
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.quarter("o_orderdate").cast("bigint").alias("qtr"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("dom"),
        # DATE results surface as timestamps so the pandas-level compare
        # is type-stable (pandas has no date dtype)
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        F.date_add(F.to_date("o_orderdate"), 30).cast("timestamp").alias("due_date"),
        F.datediff(F.lit("1999-01-01").cast("date"), F.to_date("o_orderdate"))
        .cast("bigint")
        .alias("days_to_1999"),
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("non_open_status"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("open")).alias("status_label"),
    )


ORACLE_SCALAR_FUNCTION_BATTERY = """
SELECT o_orderkey,
       upper(substr(o_orderpriority, 1, 1)) AS prio_code,
       concat('ord', '-', CAST(o_orderkey AS VARCHAR)) AS tag,
       lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS padded,
       CAST(length(trim(o_orderpriority)) AS BIGINT) AS prio_len,
       CAST(year(o_orderdate) AS BIGINT) AS yr,
       CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
       CAST(day(o_orderdate) AS BIGINT) AS dom,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(o_orderdate AS DATE) + 30 AS due_date,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS BIGINT) AS days_to_1999,
       nullif(o_orderstatus, 'O') AS non_open_status,
       coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_label
FROM orders
WHERE o_orderkey % 100 = 0
"""


# ---------------------------------------------------------------------------
# TPC-H Q21 flavor: correlated EXISTS / NOT EXISTS self-joins on
# lineitem — Catalyst decorrelates into semi/anti joins; the suppliers
# whose lineitems arrived late on multi-supplier orders where every
# OTHER supplier delivered on time.
def q_blamed_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 flavor, single-aggregation formulation.

    The textbook decorrelated EXISTS/NOT EXISTS costs two extra
    lineitem self-join shuffles. Both predicates are per-order set
    properties, so ONE groupBy(l_orderkey) computes them for every
    row at once:

    - EXISTS(other supplier on the order)      <=> distinct suppliers >= 2
    - NOT EXISTS(other supplier with flag 'R') <=> distinct 'R' suppliers = 1
      (the candidate row itself has flag 'R', so it contributes the 1)

    One lineitem aggregation + one orderkey-equi join replaces the two
    semi/anti self-joins; the oracle keeps the canonical correlated
    form, proving the rewrite's equivalence on every run.

    The two distinct counts are computed as a TWO-LEVEL aggregation
    (distinct (order, supplier) pairs first, then plain count/sum) —
    two multi-child countDistincts in one agg would plan an Expand
    that doubles every lineitem row through the shuffle (same trap as
    approx+exact distinct, ROADMAP invariants; measured 2x).
    """
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    pairs = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max((F.col("l_returnflag") == "R").cast("int")).alias("has_r")
    )
    per_order = pairs.groupBy("l_orderkey").agg(
        F.count("*").alias("n_sup"),
        F.sum("has_r").cast("bigint").alias("n_r_sup"),
    )
    blamed = (
        li.filter(F.col("l_returnflag") == "R")
        .join(per_order, "l_orderkey")
        .filter((F.col("n_sup") >= 2) & (F.col("n_r_sup") == 1))
    )
    return (
        blamed.join(sup, blamed.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").cast("bigint").alias("numwait"))
    )


ORACLE_BLAMED_SUPPLIERS = """
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM supplier, lineitem l1
WHERE s_suppkey = l1.l_suppkey
  AND l1.l_returnflag = 'R'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R'
  )
GROUP BY s_name
"""


# ---------------------------------------------------------------------------
# TPC-H Q11 flavor: value concentration — parts whose revenue exceeds
# a fraction of TOTAL revenue (scalar subquery against the same agg;
# the total is computed once and broadcast).
def q_part_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("part_rev")
    )
    total = rev.agg(F.sum("part_rev").alias("t"))
    return (
        rev.crossJoin(F.broadcast(total))
        .filter(F.col("part_rev") > F.col("t") * 0.0005)
        .select("l_partkey", F.round("part_rev", 4).alias("part_rev"))
    )


ORACLE_PART_VALUE_CONCENTRATION = """
WITH rev AS (
  SELECT l_partkey,
         CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS part_rev
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, round(part_rev, 4) AS part_rev
FROM rev
WHERE part_rev > (SELECT sum(part_rev) FROM rev) * 0.0005
"""


# ---------------------------------------------------------------------------
# TPC-H Q16 flavor: supplier diversity per (brand, size band),
# excluding suppliers flagged by a NOT IN subquery (negative balance).
def q_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy(
            "p_brand",
            # floor, not int-cast: Spark's double->int truncates while
            # DuckDB's rounds — floor is unambiguous in both
            F.floor(F.col("p_size").cast("double") / 10).cast("int").alias("size_band"),
        )
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


ORACLE_SUPPLIER_DIVERSITY = """
SELECT p_brand,
       CAST(floor(CAST(p_size AS DOUBLE) / 10) AS INT) AS size_band,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# F6/U: explode (lateral view) — classic word count with a
# deterministic top-k (count desc, token asc).
def q_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.expr("regexp_extract_all(lower(text), '\\\\S+', 0)")).alias("token")
    )
    counts = toks.groupBy("token").agg(F.count("*").alias("n"))
    # orderBy().limit() keeps at most 20 rows per partition before the
    # merge — the full vocabulary never funnels through one partition;
    # the rank window then orders only the 20 survivors. (n desc, token
    # asc) is a total order, so output is identical to a whole-set
    # row_number window.
    order = [F.desc("n"), F.asc("token")]
    topk = counts.orderBy(*order).limit(20)
    return topk.withColumn(
        "rank", F.row_number().over(W.orderBy(*order)).cast("bigint")
    )


ORACLE_TOKEN_TOPK = r"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS token FROM documents
), counts AS (
  SELECT token, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY token
)
SELECT token, n, CAST(row_number() OVER (ORDER BY n DESC, token ASC) AS BIGINT) AS rank
FROM counts
QUALIFY rank <= 20
"""


# ---------------------------------------------------------------------------
# WF1: RANGE window frame — rolling 7-day revenue per order day
# (frame bounded by VALUE distance, not row count).
def q_rolling_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", "o_orderdate").alias("day")
    ).agg(dsum("o_totalprice").alias("revenue"))
    daily = daily.withColumn(
        "day_num", (umicros("day") / F.lit(86_400_000_000)).cast("bigint")
    )
    w = W.orderBy("day_num").rangeBetween(-6, 0)
    return daily.select(
        "day",
        "revenue",
        F.round(F.sum("revenue").over(w), 4).alias("rolling_7d_revenue"),
        F.count("*").over(w).alias("days_in_window"),
    )


ORACLE_ROLLING_REVENUE = """
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
         CAST(epoch_us(date_trunc('day', o_orderdate)) / 86400000000 AS BIGINT) AS day_num
  FROM orders GROUP BY 1
)
SELECT day, revenue,
       round(sum(revenue) OVER w, 4) AS rolling_7d_revenue,
       CAST(count(*) OVER w AS BIGINT) AS days_in_window
FROM daily
WINDOW w AS (ORDER BY day_num RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


# ---------------------------------------------------------------------------
# TPC-H Q8 flavor: market share — a 5-way join with conditional
# aggregation (share = conditional sum / total sum per group). Dims
# broadcast; the single fact shuffle carries the groupBy.
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region")
    from x_spark.fanout import fan_out

    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(30,6)")
    # customer is fact-scaled (150k rows x SF) — no broadcast hint; AQE
    # decides from runtime size. nation/region are fixed 25/5-row dims:
    # always broadcast.
    # When AQE broadcasts every right side, the whole join + DECIMAL
    # partial-agg chain runs in lineitem's scan stage — fan a
    # degenerate one-split layout out first (guide §2.5; exact sums
    # are order-independent)
    li = fan_out(li.select("l_orderkey", "l_extendedprice", "l_discount"))
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust.select("c_custkey", "c_nationkey"),
              orders.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(nat.select("n_nationkey", "n_name", "n_regionkey")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        joined.groupBy("r_name", F.year("o_orderdate").cast("bigint").alias("yr"))
        .agg(
            (
                F.sum(F.when(F.col("n_name") == "BRAZIL", rev).otherwise(F.lit(0).cast("decimal(30,6)")))
                / F.sum(rev)
            ).cast("double").alias("brazil_share"),
            F.sum(rev).cast("double").alias("total_rev"),
        )
        .withColumn("brazil_share", F.round("brazil_share", 6))
        .withColumn("total_rev", F.round("total_rev", 4))
    )


ORACLE_MARKET_SHARE = """
SELECT r_name,
       CAST(year(o_orderdate) AS BIGINT) AS yr,
       round(CAST(sum(CASE WHEN n_name = 'BRAZIL'
                           THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))
                           ELSE CAST(0 AS DECIMAL(30,6)) END)
                  / sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE), 6) AS brazil_share,
       round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE), 4) AS total_rev
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, year(o_orderdate)
"""


# ---------------------------------------------------------------------------
# WF1: ranking functions — ntile buckets + percent_rank/cume_dist per
# market segment (deterministic: acctbal ties broken by custkey).
def q_customer_value_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    tiles = cust.select(
        "c_mktsegment",
        "c_custkey",
        F.ntile(4).over(w).cast("bigint").alias("tile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )
    return tiles.groupBy("c_mktsegment", "tile").agg(
        F.count("*").alias("n"),
        F.round(F.min("pct_rank"), 6).alias("min_pct_rank"),
        F.round(F.max("cume"), 6).alias("max_cume"),
    )


ORACLE_CUSTOMER_VALUE_TILES = """
WITH tiles AS (
  SELECT c_mktsegment,
         ntile(4) OVER w AS tile,
         round(percent_rank() OVER w, 6) AS pct_rank,
         round(cume_dist() OVER w, 6) AS cume
  FROM customer
  WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
)
SELECT c_mktsegment, CAST(tile AS BIGINT) AS tile,
       CAST(count(*) AS BIGINT) AS n,
       round(min(pct_rank), 6) AS min_pct_rank,
       round(max(cume), 6) AS max_cume
FROM tiles GROUP BY c_mktsegment, tile
"""


# ---------------------------------------------------------------------------
# A6: approximate distinct (HLL). The estimate is engine-specific, so
# this is deliberately a rows-only entry (no oracle) — the honest
# labeling for approximate operators; the exact variant is covered by
# distinct_suppliers_parts.
def q_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The two aggregates run as SEPARATE plans joined on the (tiny)
    # group key: combining approx_count_distinct with countDistinct in
    # one agg makes Catalyst plan the distinct via Expand — every input
    # row is duplicated and the rsd=0.01 HLL sketch (~4KB of registers)
    # rides through the doubled shuffle. Measured 3.3x faster split
    # (1.4s vs 4.8s at sf0.1); the HLL estimate is identical — it
    # depends only on the distinct value set.
    ev = _t(spark, sf_dir, "events")
    approx = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx_users")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return approx.join(exact, "event_type")


# ---------------------------------------------------------------------------
# Skew pattern: two-stage salted aggregation over the hot event_type
# keys (low-cardinality GROUP BY — the shape where one reducer would
# otherwise absorb a hot key's every row). Result provably equals the
# direct groupBy; the oracle IS the direct groupBy.
def q_salted_event_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from x_spark.operators.skew import salted_agg
    from x_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").withColumn(
        "cents", F.floor(F.col("value") * 100.0).cast("bigint")
    )
    out = salted_agg(
        ev,
        ["event_type"],
        {
            "n_events": ("count", "event_id"),
            "total_cents": ("sum", "cents"),
            "min_value": ("min", "value"),
            "max_value": ("max", "value"),
        },
        n_salts=8,
    )
    return out.select(
        "event_type",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.col("total_cents").cast("bigint").alias("total_cents"),
        "min_value",
        "max_value",
    )


ORACLE_SALTED_EVENT_TOTALS = """
SELECT event_type,
       CAST(count(event_id) AS BIGINT) AS n_events,
       CAST(sum(CAST(floor(value * 100.0) AS BIGINT)) AS BIGINT) AS total_cents,
       min(value) AS min_value,
       max(value) AS max_value
FROM events
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# TPC-H Q13 flavor: order-count distribution. LEFT OUTER join customer
# -> (filtered) orders, per-customer count, then a histogram over the
# counts — two aggregations, the outer join keeps zero-order customers.
def q_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


ORACLE_ORDER_COUNT_DISTRIBUTION = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) GROUP BY c_count
"""


# ---------------------------------------------------------------------------
# TPC-H Q15 flavor: top supplier(s) by quarterly revenue — max-of-
# aggregate via a broadcast scalar max (ties all kept, like Q15's
# = max subquery): the per-supplier aggregate is computed once and
# filtered against its own broadcast 1-row max, so no window — let
# alone an unpartitioned one — appears anywhere in the plan.
def q_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = li.groupBy("l_suppkey").agg(
        F.round(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6).alias(
            "total_revenue"
        )
    )
    # the max is ONE scalar: collect it (bounded driver data) and
    # filter by literal — no cache to leak, no checkpoint job; the
    # second pass over the supplier-cardinality aggregate recomputes
    # from lineage (two lineitem scans total, both filter-pruned)
    best = rev.agg(F.max("total_revenue")).first()[0]
    top = rev.filter(F.col("total_revenue") == F.lit(best))
    sup = _t(spark, sf_dir, "supplier")
    return top.join(sup, top.l_suppkey == sup.s_suppkey).select(
        "s_suppkey", "s_name", "total_revenue"
    )


ORACLE_TOP_SUPPLIER_REVENUE = """
WITH rev AS (
  SELECT l_suppkey,
         round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE), 6)
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
"""


# ---------------------------------------------------------------------------
# TPC-H Q17 flavor: revenue from small-quantity lineitems — correlated
# per-part average decorrelated into an agg + join (what Catalyst's
# subquery decorrelation produces); one shuffle on l_partkey.
def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.round(dsum("l_extendedprice") / 7.0, 6).alias("avg_yearly"),
            F.count("*").alias("n_lineitems"),
        )
    )


ORACLE_SMALL_QUANTITY_REVENUE = """
SELECT round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) / 7.0, 6)
         AS avg_yearly,
       CAST(count(*) AS BIGINT) AS n_lineitems
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey AND p.p_brand = 'Brand#1'
JOIN (SELECT l_partkey AS ap_partkey, avg(l_quantity) AS avg_qty
      FROM lineitem GROUP BY l_partkey) a
  ON l.l_partkey = a.ap_partkey
WHERE l.l_quantity < 0.5 * a.avg_qty
"""


# ---------------------------------------------------------------------------
# TPC-H Q20 flavor: dominant suppliers — suppliers shipping more than
# 20% of some part's total shipped quantity. Correlated-aggregate
# semi-join decorrelated: per-(part, supplier) sums joined to per-part
# totals, then a semi-join back to supplier.
def q_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    by_ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("supp_qty")
    )
    by_p = li.groupBy(F.col("l_partkey").alias("tp_partkey")).agg(
        F.sum("l_quantity").alias("part_qty")
    )
    dominant = (
        by_ps.join(by_p, by_ps.l_partkey == F.col("tp_partkey"))
        .filter(F.col("supp_qty") > 0.2 * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    sup = _t(spark, sf_dir, "supplier")
    return sup.join(
        dominant, sup.s_suppkey == dominant.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name", "s_nationkey")


ORACLE_DOMINANT_SUPPLIERS = """
SELECT s_suppkey, s_name, s_nationkey
FROM supplier s
WHERE EXISTS (
  SELECT 1
  FROM (SELECT l_partkey, l_suppkey, sum(l_quantity) AS supp_qty
        FROM lineitem GROUP BY l_partkey, l_suppkey) ps
  JOIN (SELECT l_partkey AS tp_partkey, sum(l_quantity) AS part_qty
        FROM lineitem GROUP BY l_partkey) p
    ON ps.l_partkey = p.tp_partkey
  WHERE ps.supp_qty > 0.2 * p.part_qty AND ps.l_suppkey = s.s_suppkey
)
"""


# ---------------------------------------------------------------------------
# TPC-H Q22 flavor: wealthy idle customers — above the positive-balance
# average (scalar subquery) with no URGENT orders (NOT EXISTS over a
# filtered side -> anti join), grouped by market segment.
def q_wealthy_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    rich = cust.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("ab")
    )
    idle = rich.join(
        orders, rich.c_custkey == orders.o_custkey, "left_anti"
    )
    return idle.groupBy("c_mktsegment").agg(
        F.count("*").alias("numcust"),
        F.round(dsum("c_acctbal"), 6).alias("totacctbal"),
    )


ORACLE_WEALTHY_IDLE_CUSTOMERS = """
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS numcust,
       round(CAST(sum(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE), 6) AS totacctbal
FROM customer c
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# TPC-H completion batch — the remaining canonical query shapes, adapted
# to the driver schema (no partsupp/commitdate/shipmode/container
# columns; each adaptation keeps the original's PLAN shape, which is
# what exercises the engine). All tail entries: their join/agg families
# are driver-checked by head queries.


# Q4 shape: EXISTS-decorrelated semi join + priority histogram.
def q_priority_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    joined = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("order_count")
    )


ORACLE_PRIORITY_ORDER_COUNTS = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""


# Q7 shape: bilateral trade — supplier nation x customer nation flows,
# either direction between two named nations, grouped by year.
def q_bilateral_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    n1, n2 = "FRANCE", "GERMANY"
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sup = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust = _t(spark, sf_dir, "customer").join(
        F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    flows = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(
            ((F.col("supp_nation") == n1) & (F.col("cust_nation") == n2))
            | ((F.col("supp_nation") == n2) & (F.col("cust_nation") == n1))
        )
    )
    return flows.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("o_orderdate").cast("bigint").alias("l_year"),
    ).agg(
        F.round(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
        ).alias("revenue")
    )


ORACLE_BILATERAL_TRADE = """
SELECT n_s.n_name AS supp_nation,
       n_c.n_name AS cust_nation,
       CAST(year(o_orderdate) AS BIGINT) AS l_year,
       round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE), 6) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n_s ON s_nationkey = n_s.n_nationkey
JOIN nation n_c ON c_nationkey = n_c.n_nationkey
WHERE (n_s.n_name = 'FRANCE' AND n_c.n_name = 'GERMANY')
   OR (n_s.n_name = 'GERMANY' AND n_c.n_name = 'FRANCE')
GROUP BY 1, 2, 3
"""


# Q9 shape: product profit by supplier nation x year; supply cost is
# adapted to a retail-price fraction (no partsupp table).
def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup.select("s_suppkey", "s_nationkey")),
              li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            (
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
                - F.col("p_retailprice") * F.col("l_quantity") * 0.08
            ).alias("amount"),
        )
    )
    return profit.groupBy("nation", "o_year").agg(
        F.round(dsum("amount"), 6).alias("sum_profit")
    )


ORACLE_PRODUCT_PROFIT = """
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                           - p_retailprice * l_quantity * 0.08
                      AS DECIMAL(30,6))) AS DOUBLE), 6) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_type = 'PROMO'
GROUP BY 1, 2
"""


# Q12 shape: delay buckets x CASE-split priority counts (shipmode is
# adapted to ship-delay buckets; the plan shape — join + CASE sums —
# is Q12's).
def q_late_line_priority_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    delay_days = F.floor(
        (umicros("l_shipdate") - umicros("o_orderdate"))
        / F.lit(86_400_000_000)
    )
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.when(delay_days >= 90, "90+")
        .when(delay_days >= 60, "60-89")
        .when(delay_days >= 30, "30-59")
        .otherwise("0-29")
        .alias("delay_bucket"),
        "o_orderpriority",
    )
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return joined.groupBy("delay_bucket").agg(
        F.sum(urgent.cast("int")).cast("bigint").alias("high_line_count"),
        F.sum((~urgent).cast("int")).cast("bigint").alias("low_line_count"),
    )


ORACLE_LATE_LINE_PRIORITY_MIX = """
WITH j AS (
  SELECT CASE
           WHEN floor(epoch_us(l_shipdate - o_orderdate) / 86400000000) >= 90 THEN '90+'
           WHEN floor(epoch_us(l_shipdate - o_orderdate) / 86400000000) >= 60 THEN '60-89'
           WHEN floor(epoch_us(l_shipdate - o_orderdate) / 86400000000) >= 30 THEN '30-59'
           ELSE '0-29'
         END AS delay_bucket,
         o_orderpriority
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
SELECT delay_bucket,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM j GROUP BY delay_bucket
"""


# Q14 shape: conditional revenue share per month (promo share).
def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    j = li.join(part, li.l_partkey == part.p_partkey)
    return (
        j.groupBy(F.date_trunc("month", "l_shipdate").alias("month"))
        .agg(
            F.round(
                F.lit(100.0) * dsum(promo) / dsum(rev), 6
            ).alias("promo_share_pct"),
            F.round(dsum(rev), 4).alias("total_revenue"),
        )
        .withColumn("month", F.date_format("month", "yyyy-MM"))
    )


ORACLE_PROMO_REVENUE_SHARE = """
SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m') AS month,
       round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                                   THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))
                                   ELSE CAST(0.0 AS DECIMAL(30,6)) END) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE), 6) AS promo_share_pct,
       round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE), 4) AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1
"""


# Q18 shape: large-volume orders — HAVING-filtered agg as a semi-join
# filter, then customer enrichment and top-N.
def q_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 120.0)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("total_qty", 2).alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


ORACLE_LARGE_VOLUME_ORDERS = """
SELECT c_name, o_orderkey,
       round(o_totalprice, 2) AS o_totalprice,
       round(total_qty, 2) AS total_qty
FROM orders
JOIN (SELECT l_orderkey, sum(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 120.0) b ON o_orderkey = b.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
"""


# Q19 shape: disjunction-of-conjunction brackets pushed into one join.
def q_bracketed_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    j = li.join(part, li.l_partkey == part.p_partkey)
    bracket = (
        (
            (F.col("p_brand") == "Brand#11")
            & (F.col("p_size").between(1, 10))
            & (F.col("l_quantity").between(1.0, 20.0))
        )
        | (
            (F.col("p_brand") == "Brand#22")
            & (F.col("p_size").between(5, 20))
            & (F.col("l_quantity").between(10.0, 30.0))
        )
        | (
            (F.col("p_brand") == "Brand#33")
            & (F.col("p_size").between(10, 40))
            & (F.col("l_quantity").between(20.0, 40.0))
        )
    )
    return j.filter(bracket).agg(
        F.round(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
        ).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


ORACLE_BRACKETED_REVENUE = """
SELECT round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE), 6) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1.0 AND 20.0)
   OR (p_brand = 'Brand#22' AND p_size BETWEEN 5 AND 20 AND l_quantity BETWEEN 10.0 AND 30.0)
   OR (p_brand = 'Brand#33' AND p_size BETWEEN 10 AND 40 AND l_quantity BETWEEN 20.0 AND 40.0)
"""


# ---------------------------------------------------------------------------
# Distribution profiling twins (operators/profile.py): fixed-width
# histogram (exact integer bucketing) and trimmed interior statistics
# (deterministic-rank trim) over lineitem prices.
def q_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from x_spark.operators.profile import value_histogram

    return value_histogram(
        _t(spark, sf_dir, "lineitem"), "l_extendedprice", width=5000.0, scale=2
    )


ORACLE_PRICE_HISTOGRAM = """
WITH b AS (
  SELECT CAST(floor(CAST(CAST(floor(l_extendedprice * 100) AS BIGINT) AS DOUBLE) / 500000)
              AS BIGINT) AS bucket
  FROM lineitem WHERE l_extendedprice IS NOT NULL
), c AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows FROM b GROUP BY bucket
), t AS (SELECT CAST(sum(n_rows) AS DOUBLE) AS total FROM c)
SELECT bucket, CAST(bucket AS DOUBLE) * 5000.0 AS bucket_lo, n_rows,
       round(n_rows / total, 6) AS share
FROM c CROSS JOIN t
"""


def q_trimmed_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from x_spark.operators.profile import trimmed_stats

    return trimmed_stats(
        _t(spark, sf_dir, "lineitem"),
        "l_extendedprice",
        group_cols=["l_returnflag"],
        tiebreak_cols=["l_orderkey", "l_linenumber"],
        trim_frac=0.02,
    )


ORACLE_TRIMMED_PRICE_STATS = """
WITH r AS (
  SELECT l_returnflag, l_extendedprice,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
         count(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem
)
SELECT l_returnflag,
       CAST(max(n) AS BIGINT) AS n_total,
       CAST(count(*) AS BIGINT) AS n_kept,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) / count(*), 6)
         AS trimmed_mean,
       CAST(min(l_extendedprice) AS DOUBLE) AS trimmed_min,
       CAST(max(l_extendedprice) AS DOUBLE) AS trimmed_max
FROM r
WHERE rn > floor(n * 0.02) AND rn <= n - floor(n * 0.02)
GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Mergeable HLL distinct sketches (operators/sketches.py): per-day
# user sketches built in one pass, then per-day AND cross-day rolling
# estimates from the SAME sketch table — the "distinct users per day,
# maintained incrementally" shape where exact distincts cannot merge.
# Rows-only by design (DataSketches estimates are engine-specific, the
# approx_distinct_users precedent); accuracy pinned by
# tests/test_sketches.py (<5% rel err) and the 7-day roll is checked
# against the per-day exact in-test.
def q_sketch_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from x_spark.operators.sketches import build_distinct_sketches, estimate_distinct

    ev = _t(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "user_id"
    )
    sk = build_distinct_sketches(ev, "user_id", ["day"])
    per_day = estimate_distinct(sk, ["day"])
    total = estimate_distinct(sk).withColumn("day", F.lit("ALL"))
    return per_day.unionByName(total.select("day", "n_distinct", "n_rows"))


# ---------------------------------------------------------------------------
# Fixed-iteration PageRank (operators/graph.py) over the customer ->
# supplier purchase graph — the link-centrality document prior.
# The oracle UNROLLS the same three iterations as chained CTEs with
# the identical expression tree (decimal contribution sums, double
# closed forms, CAST(... AS DOUBLE) literals so neither engine slips
# into exact-decimal literal arithmetic where the other uses IEEE).
def q_supplier_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from x_spark.operators.graph import pagerank

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # dedup on the integer key pair BEFORE building node strings: the
    # distinct shuffles 16 bytes/row instead of two strings, and the
    # typed pairs map 1:1 onto the prefixed node ids, so the edge set
    # is identical (pagerank then skips its defensive re-dedup)
    edges = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select("o_custkey", "l_suppkey")
        .distinct()
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
    )
    pr = pagerank(edges, n_iter=3, edges_distinct=True)
    return (
        pr.filter(F.col("node").startswith("s"))
        .select("node", F.round("rank", 6).alias("rank"))
        .orderBy(F.col("rank").desc(), "node")
        .limit(20)
    )


def _pagerank_oracle(n_iter: int = 3, top: int = 20) -> str:
    dd = "CAST(0.85 AS DOUBLE)"
    parts = ["""WITH e AS (
  SELECT DISTINCT concat('c', CAST(o_custkey AS VARCHAR)) AS src,
                  concat('s', CAST(l_suppkey AS VARCHAR)) AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), nodes AS (
  SELECT src AS node FROM e UNION SELECT dst FROM e
), nt AS (SELECT CAST(count(*) AS BIGINT) AS cnt FROM nodes),
od AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM e GROUP BY src),
r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / cnt AS rank FROM nodes CROSS JOIN nt)"""]
    for i in range(n_iter):
        parts.append(f""", c{i} AS (
  SELECT e.dst AS node, CAST(r.rank / od.outdeg AS DECIMAL(30,6)) AS c
  FROM e JOIN od ON e.src = od.src JOIN r{i} r ON e.src = r.node
), a{i} AS (SELECT node, CAST(sum(c) AS DOUBLE) AS inflow FROM c{i} GROUP BY node),
r{i + 1} AS (
  SELECT n.node,
         (CAST(1.0 AS DOUBLE) - {dd}) / cnt
           + {dd} * coalesce(a.inflow, CAST(0 AS DOUBLE)) AS rank
  FROM nodes n CROSS JOIN nt LEFT JOIN a{i} a ON n.node = a.node
)""")
    parts.append(f"""
SELECT node, round(rank, 6) AS rank
FROM r{n_iter} WHERE node LIKE 's%'
ORDER BY rank DESC, node LIMIT {top}""")
    return "".join(parts)


EXTENDED_QUERIES = {
    "price_histogram": q_price_histogram,
    "trimmed_price_stats": q_trimmed_price_stats,
    "supplier_pagerank": q_supplier_pagerank,
    "sketch_distinct_rollup": q_sketch_distinct_rollup,  # rows-only: engine-specific sketch estimates
    "priority_order_counts": q_priority_order_counts,
    "bilateral_trade": q_bilateral_trade,
    "product_profit": q_product_profit,
    "late_line_priority_mix": q_late_line_priority_mix,
    "promo_revenue_share": q_promo_revenue_share,
    "large_volume_orders": q_large_volume_orders,
    "bracketed_revenue": q_bracketed_revenue,
    "part_value_concentration": q_part_value_concentration,
    "supplier_diversity": q_supplier_diversity,
    "approx_distinct_users": q_approx_distinct_users,
    "token_topk": q_token_topk,
    "rolling_revenue": q_rolling_revenue,
    "customer_value_tiles": q_customer_value_tiles,
    "market_share": q_market_share,
    "nation_supplier_roster": q_nation_supplier_roster,
    "scalar_function_battery": q_scalar_function_battery,
    "blamed_suppliers": q_blamed_suppliers,
    "json_props_stats": q_json_props_stats,
    "asof_purchase_gap": q_asof_purchase_gap,
    "quantity_cube": q_quantity_cube,
    "quantity_percentiles": q_quantity_percentiles,
    "weekly_revenue_wow": q_weekly_revenue_wow,
    "token_fingerprints": q_token_fingerprints,
    "scd2_customer": q_scd2_customer,
    "range_click_context": q_range_click_context,
    "salted_event_totals": q_salted_event_totals,
    # TPC-H decorrelation flavors (registry tail: join+agg families
    # already driver-checked; these widen local coverage + bench)
    "order_count_distribution": q_order_count_distribution,
    "top_supplier_revenue": q_top_supplier_revenue,
    "small_quantity_revenue": q_small_quantity_revenue,
    "dominant_suppliers": q_dominant_suppliers,
    "wealthy_idle_customers": q_wealthy_idle_customers,
}

EXTENDED_ORACLES = {
    "price_histogram": ORACLE_PRICE_HISTOGRAM,
    "trimmed_price_stats": ORACLE_TRIMMED_PRICE_STATS,
    "supplier_pagerank": _pagerank_oracle(),
    "priority_order_counts": ORACLE_PRIORITY_ORDER_COUNTS,
    "bilateral_trade": ORACLE_BILATERAL_TRADE,
    "product_profit": ORACLE_PRODUCT_PROFIT,
    "late_line_priority_mix": ORACLE_LATE_LINE_PRIORITY_MIX,
    "promo_revenue_share": ORACLE_PROMO_REVENUE_SHARE,
    "large_volume_orders": ORACLE_LARGE_VOLUME_ORDERS,
    "bracketed_revenue": ORACLE_BRACKETED_REVENUE,
    "json_props_stats": ORACLE_JSON_PROPS_STATS,
    "part_value_concentration": ORACLE_PART_VALUE_CONCENTRATION,
    "supplier_diversity": ORACLE_SUPPLIER_DIVERSITY,
    "token_topk": ORACLE_TOKEN_TOPK,
    "rolling_revenue": ORACLE_ROLLING_REVENUE,
    "customer_value_tiles": ORACLE_CUSTOMER_VALUE_TILES,
    "market_share": ORACLE_MARKET_SHARE,
    "salted_event_totals": ORACLE_SALTED_EVENT_TOTALS,
    # approx_distinct_users intentionally has NO oracle (HLL estimates
    # are engine-specific) -> driver records the rows-only check
    "nation_supplier_roster": ORACLE_NATION_SUPPLIER_ROSTER,
    "scalar_function_battery": ORACLE_SCALAR_FUNCTION_BATTERY,
    "blamed_suppliers": ORACLE_BLAMED_SUPPLIERS,
    "scd2_customer": ORACLE_SCD2_CUSTOMER,
    "range_click_context": ORACLE_RANGE_CLICK_CONTEXT,
    "asof_purchase_gap": ORACLE_ASOF_PURCHASE_GAP,
    "quantity_cube": ORACLE_QUANTITY_CUBE,
    "quantity_percentiles": ORACLE_QUANTITY_PERCENTILES,
    "weekly_revenue_wow": ORACLE_WEEKLY_REVENUE_WOW,
    "token_fingerprints": ORACLE_TOKEN_FINGERPRINTS,
    "order_count_distribution": ORACLE_ORDER_COUNT_DISTRIBUTION,
    "top_supplier_revenue": ORACLE_TOP_SUPPLIER_REVENUE,
    "small_quantity_revenue": ORACLE_SMALL_QUANTITY_REVENUE,
    "dominant_suppliers": ORACLE_DOMINANT_SUPPLIERS,
    "wealthy_idle_customers": ORACLE_WEALTHY_IDLE_CUSTOMERS,
}
