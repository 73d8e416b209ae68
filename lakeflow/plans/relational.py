"""Relational query surface (SURVEY §2.3, §2.5-2.9): projections,
filters, equi/semi/anti/theta/as-of/range joins, aggregations incl.
rollup/cube, windows, dedup, set ops, top-k, JSON path extraction.

The reference delegates all of this to Redshift (SURVEY §3.3); here each
query is a lazy DataFrame plan Catalyst optimizes: filters and column
pruning reach the parquet scans, small dimensions broadcast, aggregates
do map-side partial aggregation, AQE coalesces/skew-splits shuffles.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from lakeflow.catalog import load_table
from lakeflow.functions.exact import SQL_CENTS, SQL_MICROS, cents, lit_ts, micros
from lakeflow.operators.dedup import latest_wins
from lakeflow.operators.joins import asof_join, range_self_join
from lakeflow.plans.registry import query

def _disc_price():
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


def _charge():
    return _disc_price() * (F.lit(1.0) + F.col("l_tax"))


_SQL_DISC_PRICE = "l_extendedprice * (1e0 - l_discount)"
_SQL_CHARGE = f"{_SQL_DISC_PRICE} * (1e0 + l_tax)"


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM({SQL_CENTS.format(x='l_quantity')}) AS BIGINT) AS sum_qty_cents,
           CAST(SUM({SQL_CENTS.format(x='l_extendedprice')}) AS BIGINT) AS sum_base_cents,
           CAST(SUM({SQL_MICROS.format(x=_SQL_DISC_PRICE)}) AS BIGINT) AS sum_disc_price_micros,
           CAST(SUM({SQL_MICROS.format(x=_SQL_CHARGE)}) AS BIGINT) AS sum_charge_micros,
           COUNT(*) AS count_order,
           SUM({SQL_CENTS.format(x='l_quantity')}) / (100e0 * COUNT(*)) AS avg_qty,
           SUM({SQL_CENTS.format(x='l_extendedprice')}) / (100e0 * COUNT(*)) AS avg_price
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    description="TPC-H Q1-style pricing summary: filtered scan + hash agg "
    "(map-side partial) over 2 low-cardinality keys.",
    refs=("A5", "P8", "F5"),
)
def q1_pricing_summary(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= lit_ts(li, "l_shipdate", "1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(cents("l_quantity")).alias("sum_qty_cents"),
            F.sum(cents("l_extendedprice")).alias("sum_base_cents"),
            F.sum(micros(_disc_price())).alias("sum_disc_price_micros"),
            F.sum(micros(_charge())).alias("sum_charge_micros"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .withColumn(
            "avg_qty", F.col("sum_qty_cents") / (F.lit(100.0) * F.col("count_order"))
        )
        .withColumn(
            "avg_price", F.col("sum_base_cents") / (F.lit(100.0) * F.col("count_order"))
        )
    )


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           CAST(SUM({SQL_MICROS.format(x=_SQL_DISC_PRICE)}) AS BIGINT) AS revenue_micros,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1996-06-30'
      AND l_shipdate  > TIMESTAMP '1996-06-30'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue_micros DESC, l_orderkey
    LIMIT 10
    """,
    description="TPC-H Q3-style shipping priority: 3-way join (customer "
    "dimension broadcast) + agg + deterministic top-10.",
    refs=("J2", "A5", "D3", "P4"),
)
def q3_shipping_priority(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cutoff_o = lit_ts(orders, "o_orderdate", "1996-06-30")
    cutoff_l = lit_ts(li, "l_shipdate", "1996-06-30")
    return (
        li.filter(F.col("l_shipdate") > cutoff_l)
        .join(
            orders.filter(F.col("o_orderdate") < cutoff_o),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(micros(_disc_price())).alias("revenue_micros"))
        .select("l_orderkey", "revenue_micros", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue_micros"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name,
           CAST(SUM({SQL_MICROS.format(x=_SQL_DISC_PRICE)}) AS BIGINT) AS revenue_micros
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate <  TIMESTAMP '1996-01-01'
    GROUP BY n_name
    """,
    description="TPC-H Q5-style: 6-way join with broadcast dimension chain "
    "(region→nation→supplier) and a year-range partition-prunable predicate.",
    refs=("J2", "A5", "P8"),
)
def q5_local_supplier_volume(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    lo = lit_ts(orders, "o_orderdate", "1995-01-01")
    hi = lit_ts(orders, "o_orderdate", "1996-01-01")
    return (
        li.join(
            orders.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(micros(_disc_price())).alias("revenue_micros"))
    )


@query(
    "q_topk_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders) t
    WHERE rnk <= 3
    """,
    description="Top-3 orders per customer: ranking window (single shuffle "
    "on the partition key; no global sort).",
    refs=("§2.9", "D3"),
)
def q_topk_orders_per_customer(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rnk")
        )
        .filter(F.col("rnk") <= 3)
    )


@query(
    "q_dedup_latest_event",
    oracle="""
    SELECT user_id, event_type, event_id, ts, value FROM (
      SELECT user_id, event_type, event_id, ts, value,
             row_number() OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) t
    WHERE rn = 1
    """,
    description="Latest-record-wins dedup (reference kafka_s3_to_silver.py:28-30 "
    "semantics, D1): order-stable window form, not dropDuplicates.",
    refs=("D1", "§2.9"),
)
def q_dedup_latest_event(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return latest_wins(ev, ["user_id", "event_type"], "ts", ["event_id"]).select(
        "user_id", "event_type", "event_id", "ts", "value"
    )


@query(
    "q_rollup_lineitem",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM({SQL_CENTS.format(x='l_quantity')}) AS BIGINT) AS sum_qty_cents,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    description="Hierarchical rollup totals (A5 grouping sets).",
    refs=("A5",),
)
def q_rollup_lineitem(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(cents("l_quantity")).alias("sum_qty_cents"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q_cube_orders",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM({SQL_CENTS.format(x='o_totalprice')}) AS BIGINT) AS sum_total_cents
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    description="Full cube over status x priority (A5 grouping sets).",
    refs=("A5",),
)
def q_cube_orders(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(cents("o_totalprice")).alias("sum_total_cents"),
    )


@query(
    "q_semi_join_customers",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    """,
    description="Left-semi join: customers with at least one finished order "
    "(J3 — the reference's skip-lists were manual anti/semi joins).",
    refs=("J3",),
)
def q_semi_join_customers(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    return cust.join(
        orders, cust["c_custkey"] == orders["o_custkey"], "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "q_anti_join_customers",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    description="Left-anti join: customers with no orders (J3).",
    refs=("J3",),
)
def q_anti_join_customers(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust["c_custkey"] == orders["o_custkey"], "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "q_intersect_custkeys",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    description="Set intersection (D4): customers with both open and "
    "finished orders.",
    refs=("D4",),
)
def q_intersect_custkeys(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    b = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return a.intersect(b)


@query(
    "q_except_custkeys",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000e0
    """,
    description="Set difference (D4): customers with no order above 150k.",
    refs=("D4",),
)
def q_except_custkeys(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey")
    )
    big = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 150000.0)
        .select(F.col("o_custkey").alias("custkey"))
    )
    return cust.subtract(big)  # EXCEPT DISTINCT semantics, matching SQL


@query(
    "q_set_ops",
    oracle="""
    SELECT 'semi' AS setop, c_custkey AS custkey FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    UNION ALL
    SELECT 'anti' AS setop, c_custkey AS custkey FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    UNION ALL
    SELECT 'intersect' AS setop, custkey FROM (
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        INTERSECT
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    )
    UNION ALL
    SELECT 'except' AS setop, custkey FROM (
        SELECT c_custkey AS custkey FROM customer
        EXCEPT
        SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000e0
    )
    """,
    description="Consolidated set-operator coverage (J3 semi/anti, D4 "
    "intersect/except) in one driver-window query: each branch keeps its "
    "native Spark operator (LeftSemi, LeftAnti, Intersect, Except) and is "
    "tagged so the oracle compares all four result sets at once. Granular "
    "single-op variants remain registered outside the driver window.",
    refs=("J3", "D4"),
)
def q_set_ops(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")

    semi = (
        cust.join(
            orders.filter(F.col("o_orderstatus") == "F"),
            cust["c_custkey"] == orders["o_custkey"],
            "left_semi",
        )
        .select(F.lit("semi").alias("setop"), F.col("c_custkey").alias("custkey"))
    )
    anti = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left_anti")
        .select(F.lit("anti").alias("setop"), F.col("c_custkey").alias("custkey"))
    )
    inter = (
        orders.filter(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("custkey"))
        .intersect(
            orders.filter(F.col("o_orderstatus") == "F").select(
                F.col("o_custkey").alias("custkey")
            )
        )
        .select(F.lit("intersect").alias("setop"), "custkey")
    )
    exc = (
        cust.select(F.col("c_custkey").alias("custkey"))
        .subtract(
            orders.filter(F.col("o_totalprice") > 150000.0).select(
                F.col("o_custkey").alias("custkey")
            )
        )
        .select(F.lit("except").alias("setop"), "custkey")
    )
    return semi.unionByName(anti).unionByName(inter).unionByName(exc)


@query(
    "q_json_extract_events",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
    description="JSON path extraction from a string payload column (F7 — "
    "the reference's SUPER-column pattern) + agg.",
    refs=("F7", "N3", "N4"),
)
def q_json_extract_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


@query(
    "q_window_running",
    oracle=f"""
    SELECT event_id, user_id, ts,
           row_number() OVER w AS rn,
           CAST(SUM({SQL_MICROS.format(x='value')}) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_value_micros,
           lag(event_type) OVER w AS prev_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    description="Analytic windows per user: row_number, running sum, lag "
    "(§2.9 — absent in reference, exposed by the engine).",
    refs=("§2.9",),
)
def q_window_running(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.row_number().over(w).alias("rn"),
        F.sum(micros("value")).over(wsum).alias("run_value_micros"),
        F.lag("event_type").over(w).alias("prev_type"),
    )


@query(
    "q_theta_join_richer",
    oracle="""
    SELECT s_suppkey, COUNT(c_custkey) AS n_richer_customers
    FROM supplier LEFT JOIN customer
      ON c_nationkey = s_nationkey AND c_acctbal > s_acctbal
    GROUP BY s_suppkey
    """,
    description="Theta join (J5): equi key + non-equi accrual predicate, "
    "left-preserving with conditional count.",
    refs=("J5", "J2"),
)
def q_theta_join_richer(spark, sf_dir):
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    j = supp.join(
        cust,
        (supp["s_nationkey"] == cust["c_nationkey"])
        & (cust["c_acctbal"] > supp["s_acctbal"]),
        "left",
    )
    return j.groupBy("s_suppkey").agg(
        F.count("c_custkey").alias("n_richer_customers")
    )


@query(
    "q_mode_event_type",
    oracle="""
    SELECT event_type, COUNT(*) AS n FROM events
    GROUP BY event_type ORDER BY n DESC, event_type LIMIT 1
    """,
    description="Most frequent value (A1: the reference's "
    "value_counts().idxmax() topic-naming), deterministic tie-break.",
    refs=("A1",),
)
def q_mode_event_type(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("event_type"))
        .limit(1)
    )


@query(
    "q_asof_latest_order",
    oracle="""
    SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate
    FROM events e, LATERAL (
      SELECT o_orderkey, o_orderdate FROM orders
      WHERE o_custkey = e.user_id AND o_orderdate <= e.ts
      ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1) o
    """,
    description="As-of join (J4): each event gets the latest prior order "
    "of its user — union+window implementation, single shuffle, no "
    "row-multiplying join.",
    refs=("J4",),
)
def q_asof_latest_order(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("user_id"), "o_orderkey", "o_orderdate"
        )
    )
    return asof_join(
        ev,
        orders,
        on="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        payload_cols=["o_orderkey", "o_orderdate"],
        tiebreak_cols=["o_orderkey"],
    ).select("event_id", "user_id", "ts", "o_orderkey", "o_orderdate")


@query(
    "q_range_pairs_events",
    oracle="""
    SELECT e1.user_id, e1.event_id AS event_id_a, e2.event_id AS event_id_b,
           epoch_us(e2.ts) - epoch_us(e1.ts) AS gap_us
    FROM events e1 JOIN events e2
      ON e1.user_id = e2.user_id
     AND e1.event_id < e2.event_id
     AND abs(epoch_us(e2.ts) - epoch_us(e1.ts)) <= 600000000
    """,
    description="Time-range self-join (J4): same-user event pairs within "
    "10 minutes via bucketed equi-join (no O(n^2) nested loop).",
    refs=("J4",),
)
def q_range_pairs_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return range_self_join(ev, "user_id", "ts", 600, "event_id")


@query(
    "q_tumbling_hourly",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS hour_start, event_type,
           COUNT(*) AS n_events,
           CAST(SUM({SQL_MICROS.format(x='value')}) AS BIGINT) AS sum_value_micros
    FROM events
    GROUP BY 1, 2
    """,
    description="Tumbling 1-hour event-time window aggregation (§2.10 "
    "batch form; streaming form in lakeflow.streaming).",
    refs=("§2.10", "F4"),
)
def q_tumbling_hourly(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(micros("value")).alias("sum_value_micros"),
        )
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n_events",
            "sum_value_micros",
        )
    )


@query(
    "q_correlated_subquery",
    oracle=f"""
    SELECT l.l_partkey,
           CAST(SUM({SQL_CENTS.format(x='l.l_extendedprice')}) AS BIGINT) AS small_order_revenue_cents,
           CAST(COUNT(*) AS BIGINT) AS n_small
    FROM lineitem l
    WHERE l.l_quantity < (
        SELECT 0.5e0 * (SUM({SQL_CENTS.format(x='l2.l_quantity')}) / (100e0 * COUNT(*)))
        FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    GROUP BY l.l_partkey
    """,
    description="TPC-H Q17-style correlated scalar subquery (below half "
    "the part's average quantity) — Catalyst decorrelates to an "
    "aggregate+join; no per-row re-execution (SURVEY §4).",
    refs=("J2", "A5", "§4"),
)
def q_correlated_subquery(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    # expressed as the decorrelated form directly: per-part exact average
    # (integer cents keep it oracle-exact). No broadcast hint: the
    # aggregate has one row per partkey — scan-proportional at scale —
    # so the join must stay shuffle-based (AQE may still pick broadcast
    # at small SF where it genuinely fits).
    avg_qty = (
        li.groupBy(F.col("l_partkey").alias("pk"))
        .agg(
            F.sum(cents("l_quantity")).alias("sq"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "pk",
            (F.lit(0.5) * (F.col("sq") / (F.lit(100.0) * F.col("n")))).alias(
                "half_avg"
            ),
        )
    )
    return (
        li.join(avg_qty, li["l_partkey"] == avg_qty["pk"])
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .groupBy("l_partkey")
        .agg(
            F.sum(cents("l_extendedprice")).alias("small_order_revenue_cents"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


@query(
    "q_having",
    oracle=f"""
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM({SQL_CENTS.format(x='o_totalprice')}) AS BIGINT) AS total_cents
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 8
    """,
    description="Aggregate + HAVING group filter (large customers).",
    refs=("A5",),
)
def q_having(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents("o_totalprice")).alias("total_cents"),
        )
        .filter(F.col("n_orders") >= 8)
    )


@query(
    "q4_priority_check",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
    description="TPC-H Q4-style: correlated EXISTS (any lineitem shipped "
    "after order date) -> left-semi join + agg.",
    refs=("J3", "A5", "P8"),
)
def q4_priority_check(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    lo = lit_ts(orders, "o_orderdate", "1996-01-01")
    hi = lit_ts(orders, "o_orderdate", "1996-10-01")
    filtered = orders.filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    late = filtered.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@query(
    "q12_shipmode_buckets",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus
    """,
    description="TPC-H Q12-style: join + conditional-sum bucketing by "
    "priority class.",
    refs=("J2", "A5", "F6"),
)
def q12_shipmode_buckets(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem")
    lo = lit_ts(li, "l_shipdate", "1996-01-01")
    hi = lit_ts(li, "l_shipdate", "1997-01-01")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q14_promo_share",
    oracle=f"""
    SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                    THEN {SQL_MICROS.format(x=_SQL_DISC_PRICE)} ELSE 0 END) AS BIGINT)
             AS promo_revenue_micros,
           CAST(SUM({SQL_MICROS.format(x=_SQL_DISC_PRICE)}) AS BIGINT)
             AS total_revenue_micros,
           CAST(SUM(CASE WHEN p_type = 'PROMO'
                    THEN {SQL_MICROS.format(x=_SQL_DISC_PRICE)} ELSE 0 END) AS BIGINT)
             / (0.01e0 * SUM({SQL_MICROS.format(x=_SQL_DISC_PRICE)})) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
    """,
    description="TPC-H Q14-style promo revenue share: broadcast part "
    "dimension, conditional aggregation, exact-int ratio.",
    refs=("J2", "A5", "F6"),
)
def q14_promo_share(spark, sf_dir):
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load_table(spark, sf_dir, "lineitem")
    lo = lit_ts(li, "l_shipdate", "1996-03-01")
    hi = lit_ts(li, "l_shipdate", "1996-04-01")
    rev = micros(_disc_price())
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    agg = (
        li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(promo).alias("promo_revenue_micros"),
            F.sum(rev).alias("total_revenue_micros"),
        )
    )
    return agg.withColumn(
        "promo_pct",
        F.col("promo_revenue_micros")
        / (F.lit(0.01) * F.col("total_revenue_micros")),
    )


@query(
    "q_sliding_2h",
    oracle=f"""
    WITH starts AS (
      SELECT event_id, event_type, value, date_trunc('hour', ts) AS w FROM events
      UNION ALL
      SELECT event_id, event_type, value,
             date_trunc('hour', ts) - INTERVAL 1 HOUR FROM events)
    SELECT w AS window_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM({SQL_MICROS.format(x='value')}) AS BIGINT) AS sum_value_micros
    FROM starts GROUP BY w, event_type
    """,
    description="Sliding 2h/1h event-time windows (each event in exactly "
    "two windows) — batch twin of the streaming sliding window.",
    refs=("§2.10", "F4"),
)
def q_sliding_2h(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(micros("value")).alias("sum_value_micros"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value_micros",
        )
    )


@query(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT CAST(SUM({SQL_MICROS.format(x='l_extendedprice * l_discount')}) AS BIGINT)
             AS revenue_micros,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 5e-2 AND 7e-2
      AND l_quantity < 24e0
    """,
    description="TPC-H Q6-style forecasting revenue: pure scan-filter-agg"
    " — every predicate pushes to the parquet scan, no shuffle beyond "
    "the final single-row agg.",
    refs=("A5", "P8", "P11"),
)
def q6_forecast_revenue(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= lit_ts(li, "l_shipdate", "1996-01-01"))
            & (F.col("l_shipdate") < lit_ts(li, "l_shipdate", "1997-01-01"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24.0)
        )
        .agg(
            F.sum(micros(F.col("l_extendedprice") * F.col("l_discount"))).alias(
                "revenue_micros"
            ),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS ship_year,
           CAST(SUM({SQL_MICROS.format(x=_SQL_DISC_PRICE)}) AS BIGINT) AS revenue_micros
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    GROUP BY 1, 2, 3
    """,
    description="TPC-H Q7-style volume shipping: 6-way join with a "
    "cross-nation OR predicate — dimensions broadcast, the one real "
    "shuffle is lineitem-orders on orderkey.",
    refs=("J2", "A5", "F4"),
)
def q7_volume_shipping(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    n1 = nat.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nat.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.filter(
            F.col("l_shipdate").between(
                lit_ts(li, "l_shipdate", "1996-01-01"),
                lit_ts(li, "l_shipdate", "1997-12-31"),
            )
        )
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("ship_year"))
        .agg(F.sum(micros(_disc_price())).alias("revenue_micros"))
    )


@query(
    "q8_market_share",
    oracle=f"""
    WITH vol AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
             {SQL_MICROS.format(x=_SQL_DISC_PRICE)} AS v,
             n1.n_name AS supp_nation
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region ON n2.n_regionkey = r_regionkey
      WHERE r_name = 'AMERICA')
    SELECT order_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN v ELSE 0 END) AS BIGINT)
             AS nation_revenue_micros,
           CAST(SUM(v) AS BIGINT) AS total_revenue_micros,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN v ELSE 0 END) AS BIGINT)
             / CAST(SUM(v) AS DOUBLE) AS mkt_share
    FROM vol GROUP BY order_year
    """,
    description="TPC-H Q8-style market share: one nation's revenue share "
    "within a customer region by year — conditional aggregation over a "
    "broadcast-dimension join tree; the share divides two exact BIGINTs.",
    refs=("J2", "A5", "F6"),
)
def q8_market_share(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = nat.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nat.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    v = micros(_disc_price())
    return (
        li.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(reg), F.col("n2_region") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", v).otherwise(F.lit(0))
            ).alias("nation_revenue_micros"),
            F.sum(v).alias("total_revenue_micros"),
        )
        .withColumn(
            "mkt_share",
            F.col("nation_revenue_micros")
            / F.col("total_revenue_micros").cast("double"),
        )
    )


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           CAST(SUM({SQL_MICROS.format(x=_SQL_DISC_PRICE)}) AS BIGINT) AS revenue_micros,
           {SQL_CENTS.format(x='c_acctbal')} AS acctbal_cents,
           n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
    GROUP BY c_custkey, c_name, acctbal_cents, n_name
    ORDER BY revenue_micros DESC, c_custkey
    LIMIT 20
    """,
    description="TPC-H Q10-style returned-item report: top-20 customers "
    "by lost revenue in a quarter — join + agg + TakeOrderedAndProject.",
    refs=("J2", "A5", "D3"),
)
def q10_returned_items(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    nat = load_table(spark, sf_dir, "nation")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= lit_ts(orders, "o_orderdate", "1996-01-01"))
                & (F.col("o_orderdate") < lit_ts(orders, "o_orderdate", "1996-04-01"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            "c_custkey", "c_name", cents("c_acctbal").alias("acctbal_cents"), "n_name"
        )
        .agg(F.sum(micros(_disc_price())).alias("revenue_micros"))
        .select("c_custkey", "c_name", "revenue_micros", "acctbal_cents", "n_name")
        .orderBy(F.desc("revenue_micros"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q13_order_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey) t
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    description="TPC-H Q13-style order-count distribution: left outer "
    "join with an extra join-condition predicate, two-level aggregation "
    "(per-customer count, then histogram).",
    refs=("J2", "A5"),
)
def q13_order_distribution(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q17_small_quantity_parts",
    oracle=f"""
    WITH pa AS (
      SELECT l_partkey AS pk,
             CAST(SUM({SQL_CENTS.format(x='l_quantity')}) AS BIGINT) AS sum_qty_cents,
             COUNT(*) AS cnt
      FROM lineitem GROUP BY l_partkey)
    SELECT CAST(SUM({SQL_CENTS.format(x='l_extendedprice')}) AS BIGINT)
             AS small_qty_revenue_cents,
           COUNT(*) AS n
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN pa ON pk = l_partkey
    WHERE p_brand = 'Brand#11'
      AND {SQL_CENTS.format(x='l_quantity')} * 5 * cnt < sum_qty_cents
    """,
    description="TPC-H Q17-style small-quantity revenue: correlated "
    "per-part average rewritten as an aggregate-then-join (qty < 0.2*avg"
    " compared in exact integers: cents*5*count < sum_cents).",
    refs=("J2", "A5", "§2.8"),
)
def q17_small_quantity_parts(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11")
    # The per-part average only matters for partkeys that survive the
    # brand filter, so semi-join the scan to the filtered part FIRST:
    # the aggregate then reads ~1/25 of lineitem instead of all of it.
    # Both the semi-join and the groupBy hash on l_partkey, so the agg
    # reuses the join's shuffle partitioning (one shuffle, not two).
    # No broadcast hint: filtered part is still scan-proportional at
    # large SF; AQE picks broadcast where it genuinely fits.
    li_brand = li.join(
        part.select("p_partkey"),
        F.col("l_partkey") == F.col("p_partkey"),
        "left_semi",
    )
    pa = li_brand.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(cents("l_quantity")).alias("sum_qty_cents"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        li_brand.join(pa, F.col("pk") == F.col("l_partkey"))
        .filter(cents("l_quantity") * F.lit(5) * F.col("cnt") < F.col("sum_qty_cents"))
        .agg(
            F.sum(cents("l_extendedprice")).alias("small_qty_revenue_cents"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "q18_large_volume_orders",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey AS bk,
             CAST(SUM({SQL_CENTS.format(x='l_quantity')}) AS BIGINT) AS sum_qty_cents
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM({SQL_CENTS.format(x='l_quantity')}) > 25000)
    SELECT c_custkey, c_name, o_orderkey, o_orderdate,
           {SQL_CENTS.format(x='o_totalprice')} AS totalprice_cents,
           sum_qty_cents
    FROM big
    JOIN orders ON o_orderkey = bk
    JOIN customer ON o_custkey = c_custkey
    ORDER BY totalprice_cents DESC, o_orderkey
    LIMIT 50
    """,
    description="TPC-H Q18-style large-volume orders: HAVING on a "
    "grouped sum feeding a join — the aggregate prunes before the "
    "customer join touches anything.",
    refs=("A5", "J2", "D3"),
)
def q18_large_volume_orders(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy(F.col("l_orderkey").alias("bk"))
        .agg(F.sum(cents("l_quantity")).alias("sum_qty_cents"))
        .filter(F.col("sum_qty_cents") > 25000)
    )
    return (
        big.join(orders, F.col("o_orderkey") == F.col("bk"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            cents("o_totalprice").alias("totalprice_cents"),
            "sum_qty_cents",
        )
        .orderBy(F.desc("totalprice_cents"), F.asc("o_orderkey"))
        .limit(50)
    )


@query(
    "q19_disjunctive_predicates",
    oracle=f"""
    SELECT CAST(SUM({SQL_MICROS.format(x=_SQL_DISC_PRICE)}) AS BIGINT) AS revenue_micros,
           COUNT(*) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1e0 AND 11e0)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10e0 AND 20e0)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20e0 AND 30e0)
    """,
    description="TPC-H Q19-style disjunctive predicates: OR-of-ANDs "
    "across both join sides — Catalyst still broadcasts the part "
    "dimension and evaluates the residual predicate post-join.",
    refs=("J2", "P11", "A5"),
)
def q19_disjunctive_predicates(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & q.between(1.0, 11.0)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & q.between(10.0, 20.0)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & q.between(20.0, 30.0)
        )
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            F.sum(micros(_disc_price())).alias("revenue_micros"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "q22_dormant_customers",
    oracle=f"""
    WITH pos AS (
      SELECT CAST(SUM({SQL_CENTS.format(x='c_acctbal')}) AS BIGINT) AS s,
             COUNT(*) AS n
      FROM customer WHERE c_acctbal > 0e0)
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM({SQL_CENTS.format(x='c_acctbal')}) AS BIGINT) AS total_bal_cents
    FROM customer, pos
    JOIN nation ON c_nationkey = n_nationkey
    WHERE {SQL_CENTS.format(x='c_acctbal')} * n > s
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2001-01-01')
    GROUP BY n_name
    """,
    description="TPC-H Q22-style dormant high-balance customers: "
    "above-average positive balance (exact integer comparison "
    "cents*count > sum_cents against a 1-row broadcast aggregate) with "
    "no recent orders (anti-join), grouped by nation.",
    refs=("J3", "A5", "§2.8"),
)
def q22_dormant_customers(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nat = load_table(spark, sf_dir, "nation")
    pos = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(cents("c_acctbal")).alias("s"), F.count(F.lit(1)).alias("n")
    )
    recent = orders.filter(
        F.col("o_orderdate") >= lit_ts(orders, "o_orderdate", "2001-01-01")
    ).select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(pos))
        .filter(cents("c_acctbal") * F.col("n") > F.col("s"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(cents("c_acctbal")).alias("total_bal_cents"),
        )
    )


@query(
    "q_full_outer_activity",
    oracle="""
    WITH a AS (
      SELECT o_custkey AS ck, CAST(COUNT(*) AS BIGINT) AS n_1995
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        AND o_orderdate <  TIMESTAMP '1996-01-01'
      GROUP BY o_custkey),
    b AS (
      SELECT o_custkey AS ck, CAST(COUNT(*) AS BIGINT) AS n_1996
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1997-01-01'
      GROUP BY o_custkey)
    SELECT COALESCE(a.ck, b.ck) AS custkey,
           COALESCE(a.n_1995, 0) AS n_1995,
           COALESCE(b.n_1996, 0) AS n_1996,
           CASE WHEN a.ck IS NULL THEN 'new'
                WHEN b.ck IS NULL THEN 'churned'
                ELSE 'retained' END AS cohort
    FROM a FULL OUTER JOIN b ON a.ck = b.ck
    """,
    description="FULL OUTER join (J2 completeness): year-over-year "
    "customer activity with churn/new/retained cohorts — both "
    "unmatched sides must survive with null-filled counterparts.",
    refs=("J2", "F6"),
)
def q_full_outer_activity(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")

    def year_counts(lo: str, hi: str, alias: str):
        return (
            orders.filter(
                (F.col("o_orderdate") >= lit_ts(orders, "o_orderdate", lo))
                & (F.col("o_orderdate") < lit_ts(orders, "o_orderdate", hi))
            )
            .groupBy(F.col("o_custkey").alias(f"ck_{alias}"))
            .agg(F.count(F.lit(1)).alias(f"n_{alias}"))
        )

    a = year_counts("1995-01-01", "1996-01-01", "1995")
    b = year_counts("1996-01-01", "1997-01-01", "1996")
    zero = F.lit(0).cast("long")
    return (
        a.join(b, a["ck_1995"] == b["ck_1996"], "full_outer")
        .select(
            F.coalesce("ck_1995", "ck_1996").alias("custkey"),
            F.coalesce("n_1995", zero).alias("n_1995"),
            F.coalesce("n_1996", zero).alias("n_1996"),
            F.when(F.col("ck_1995").isNull(), "new")
            .when(F.col("ck_1996").isNull(), "churned")
            .otherwise("retained")
            .alias("cohort"),
        )
    )


def _zorder_oracle() -> str:
    from lakeflow.sinks.layout import sql_morton

    return f"""
    SELECT l_orderkey, l_partkey,
           CAST({sql_morton('l_orderkey', 'l_partkey')} AS BIGINT) AS morton_key
    FROM lineitem
    """


@query(
    "q_zorder_key",
    oracle=_zorder_oracle(),
    description="Z-order (Morton) clustering key: bit-interleave of the "
    "low 16 bits of two filter columns — the sort key that makes "
    "parquet min/max stats selective on BOTH dimensions at once "
    "(sinks/layout.zorder_write range-partitions + sorts by it). Pure "
    "integer bit arithmetic, bit-identical on any engine.",
    refs=("K1", "§2.12"),
)
def q_zorder_key(spark, sf_dir):
    from lakeflow.sinks.layout import morton_key

    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_partkey",
        morton_key("l_orderkey", "l_partkey").cast("long").alias("morton_key"),
    )


@query(
    "q_stats_moments",
    oracle="""
    WITH b AS (
      SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS q,
             CAST(FLOOR(l_extendedprice) AS BIGINT) AS p
      FROM lineitem),
    g AS (
      SELECT flag, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(q) AS BIGINT) AS sq, CAST(SUM(q*q) AS BIGINT) AS sq2,
             CAST(SUM(p) AS BIGINT) AS sp, CAST(SUM(p*p) AS BIGINT) AS sp2,
             CAST(SUM(q*p) AS BIGINT) AS spq
      FROM b GROUP BY flag)
    SELECT flag, n, sq, sp,
           CAST(sq AS DOUBLE) / n AS mean_qty,
           CAST(sp AS DOUBLE) / n AS mean_price,
           CAST(sq2 AS DOUBLE) / n
             - (CAST(sq AS DOUBLE) / n) * (CAST(sq AS DOUBLE) / n) AS var_qty,
           sqrt(CAST(sp2 AS DOUBLE) / n
             - (CAST(sp AS DOUBLE) / n) * (CAST(sp AS DOUBLE) / n)) AS stddev_price,
           (CAST(spq AS DOUBLE) / n
             - (CAST(sq AS DOUBLE) / n) * (CAST(sp AS DOUBLE) / n))
           / (sqrt(CAST(sq2 AS DOUBLE) / n
             - (CAST(sq AS DOUBLE) / n) * (CAST(sq AS DOUBLE) / n))
              * sqrt(CAST(sp2 AS DOUBLE) / n
             - (CAST(sp AS DOUBLE) / n) * (CAST(sp AS DOUBLE) / n))) AS corr_qp
    FROM g
    """,
    description="Statistical moments (A5): population mean/variance/"
    "stddev and Pearson correlation per group, derived from EXACT "
    "integer sums (n, Sx, Sx2, Sxy stay in longs through the "
    "aggregation; only the final per-group scalar derivation is "
    "double, written in the identical IEEE order on both engines so "
    "repr-level equality holds). One hash-agg; at true 100 TB the "
    "sums move to DECIMAL(38,0) but the shape is unchanged.",
    refs=("A5",),
)
def q_stats_moments(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("long").alias("q"),
        F.floor("l_extendedprice").cast("long").alias("p"),
    )
    g = li.groupBy("flag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").alias("sq"),
        F.sum(F.col("q") * F.col("q")).alias("sq2"),
        F.sum("p").alias("sp"),
        F.sum(F.col("p") * F.col("p")).alias("sp2"),
        F.sum(F.col("q") * F.col("p")).alias("spq"),
    )
    n = F.col("n")
    mq = F.col("sq").cast("double") / n
    mp = F.col("sp").cast("double") / n
    var_q = F.col("sq2").cast("double") / n - mq * mq
    var_p = F.col("sp2").cast("double") / n - mp * mp
    cov = F.col("spq").cast("double") / n - mq * mp
    return g.select(
        "flag",
        "n",
        "sq",
        "sp",
        mq.alias("mean_qty"),
        mp.alias("mean_price"),
        var_q.alias("var_qty"),
        F.sqrt(var_p).alias("stddev_price"),
        (cov / (F.sqrt(var_q) * F.sqrt(var_p))).alias("corr_qp"),
    )


@query(
    "q9_profit_by_nation",
    # adapted TPC-H Q9: the driver testdata has no partsupp table, so
    # unit cost is proxied by p_retailprice/10 (exact integer micros);
    # the PLAN SHAPE is Q9's — LIKE-filtered part, 6-way join, profit
    # rollup by nation and year
    oracle=f"""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM({SQL_MICROS.format(x=_SQL_DISC_PRICE)}
                    - CAST(l_quantity AS BIGINT)
                      * ({SQL_MICROS.format(x='p_retailprice')} // 10)) AS BIGINT)
             AS profit_micros
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%5%'
    GROUP BY 1, 2
    """,
    description="TPC-H Q9-style profit rollup: LIKE-filtered part "
    "dimension broadcast into the lineitem scan, supplier/nation "
    "broadcast, the one real shuffle is lineitem-orders; profit stays "
    "in exact integer micros (unit cost = p_retailprice/10 proxy — "
    "driver data has no partsupp).",
    refs=("J2", "A5", "F1"),
)
def q9_profit_by_nation(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%5%"))
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    profit = micros(_disc_price()) - F.col("l_quantity").cast(
        "long"
    ) * F.expr("CAST(FLOOR(p_retailprice * 1000000e0 + 0.5e0) AS BIGINT) div 10")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(profit).alias("profit_micros"))
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey,
             CAST(SUM({SQL_MICROS.format(x=_SQL_DISC_PRICE)}) AS BIGINT) AS total_rev_micros
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_rev_micros
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_rev_micros = (SELECT MAX(total_rev_micros) FROM rev)
    """,
    description="TPC-H Q15-style top supplier: quarterly per-supplier "
    "revenue aggregate, then a GLOBAL-MAX scalar subquery (1-row "
    "broadcast, no sort, ties kept) gates the supplier join — exact "
    "integer micros end to end.",
    refs=("J2", "A5", "D3"),
)
def q15_top_supplier(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= lit_ts(li, "l_shipdate", "1996-01-01"))
            & (F.col("l_shipdate") < lit_ts(li, "l_shipdate", "1996-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(micros(_disc_price())).alias("total_rev_micros"))
    )
    mx = rev.agg(F.max("total_rev_micros").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev_micros") == F.col("mx"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_rev_micros")
    )


@query(
    "q21_waiting_suppliers",
    # adapted TPC-H Q21 (driver lineitem has no commit/receipt dates):
    # "late" = shipped more than 90 days after the order date. The
    # Q21 plan shape is intact: a LATE line whose order HAS another
    # supplier (semi) but has NO other LATE supplier (anti)
    oracle="""
    WITH l AS (
      SELECT l_orderkey, l_suppkey,
             l_shipdate > o_orderdate + INTERVAL 90 DAY AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    base AS (SELECT DISTINCT l_orderkey, l_suppkey FROM l WHERE late),
    multi AS (
      SELECT DISTINCT b.l_orderkey, b.l_suppkey
      FROM base b JOIN l o
        ON o.l_orderkey = b.l_orderkey AND o.l_suppkey <> b.l_suppkey),
    solo_late AS (
      SELECT m.l_orderkey, m.l_suppkey FROM multi m
      WHERE NOT EXISTS (
        SELECT 1 FROM l o
        WHERE o.l_orderkey = m.l_orderkey
          AND o.l_suppkey <> m.l_suppkey AND o.late))
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM solo_late JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_name
    """,
    description="TPC-H Q21-style waiting suppliers: late lines "
    "(shipped >90 days after order) whose order involves ANOTHER "
    "supplier (left-semi on the self-join) but no OTHER late supplier "
    "(left-anti) — the classic exists/not-exists composition, both "
    "sides equi-joins on orderkey.",
    refs=("J3", "A5"),
)
def q21_waiting_suppliers(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    sup = load_table(spark, sf_dir, "supplier")
    l = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        ).alias("late"),
    )
    base = l.filter("late").select("l_orderkey", "l_suppkey").distinct()
    other = l.select(
        F.col("l_orderkey").alias("o_key"),
        F.col("l_suppkey").alias("o_supp"),
        "late",
    )
    multi = base.join(
        other,
        (F.col("o_key") == F.col("l_orderkey"))
        & (F.col("o_supp") != F.col("l_suppkey")),
        "left_semi",
    )
    solo_late = multi.join(
        other.filter("late"),
        (F.col("o_key") == F.col("l_orderkey"))
        & (F.col("o_supp") != F.col("l_suppkey")),
        "left_anti",
    )
    return (
        solo_late.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "q_cohort_retention",
    oracle="""
    WITH a AS (
      SELECT DISTINCT user_id,
             CAST(epoch_us(ts) AS BIGINT) // 604800000000 AS wk
      FROM events),
    c AS (SELECT user_id, MIN(wk) AS c0 FROM a GROUP BY user_id)
    SELECT c0 AS cohort_week, wk - c0 AS week_n,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM a JOIN c USING (user_id)
    GROUP BY 1, 2
    """,
    description="Weekly cohort retention matrix: distinct active "
    "(user, week) pairs, per-user first week (the cohort), then the "
    "users-retained count per (cohort, weeks-since) cell — two "
    "aggregations + one equi-join on user_id, weeks as exact integer "
    "epoch-week ordinals (no calendar-boundary engine drift).",
    refs=("A5", "J2", "F4"),
)
def q_cohort_retention(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    wk = F.expr("unix_micros(cast(ts as timestamp)) div 604800000000")
    a = ev.select("user_id", wk.alias("wk")).distinct()
    cohort = a.groupBy("user_id").agg(F.min("wk").alias("c0"))
    return (
        a.join(cohort, "user_id")
        .groupBy(
            F.col("c0").alias("cohort_week"),
            (F.col("wk") - F.col("c0")).alias("week_n"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@query(
    "q_funnel_steps",
    oracle="""
    WITH f AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_buy
      FROM events GROUP BY user_id),
    s AS (
      SELECT user_id,
             t_view IS NOT NULL AS s1,
             t_view IS NOT NULL AND t_click IS NOT NULL
               AND t_click > t_view AS s2,
             t_view IS NOT NULL AND t_click IS NOT NULL AND t_buy IS NOT NULL
               AND t_click > t_view AND t_buy > t_click AS s3
      FROM f)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS step_view,
           CAST(SUM(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) AS step_click,
           CAST(SUM(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT) AS step_purchase
    FROM s
    """,
    description="Ordered funnel analysis (view -> click -> purchase): "
    "the first-occurrence time of each step folds into ONE conditional "
    "hash-aggregate per user (no per-step self-joins, no sorted "
    "sessionization pass), then strict ordering gates each prefix — "
    "the match_recognize-style product query as a single shuffle.",
    refs=("A5", "F6", "§2.9"),
)
def q_funnel_steps(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))

    def first_ts(evt):
        return F.min(F.when(F.col("event_type") == evt, us))

    f = ev.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_buy"),
    )
    s1 = F.col("t_view").isNotNull()
    s2 = s1 & F.col("t_click").isNotNull() & (F.col("t_click") > F.col("t_view"))
    s3 = (
        s2
        & F.col("t_buy").isNotNull()
        & (F.col("t_buy") > F.col("t_click"))
    )
    return f.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(s1.cast("long")).alias("step_view"),
        F.sum(s2.cast("long")).alias("step_click"),
        F.sum(s3.cast("long")).alias("step_purchase"),
    )


@query(
    "q_salted_agg",
    oracle="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(value * 1000000e0 + 0.5e0) AS BIGINT)) AS BIGINT)
             AS sum_value_micros,
           MIN(CAST(FLOOR(value * 1000000e0 + 0.5e0) AS BIGINT)) AS min_value_micros,
           MAX(CAST(FLOOR(value * 1000000e0 + 0.5e0) AS BIGINT)) AS max_value_micros
    FROM events GROUP BY event_type
    """,
    description="Skew-proof two-phase aggregation (operators/skew."
    "salted_aggregate): each hot key spreads across 16 salted "
    "reducers for the partial aggregate, then a 16-rows-per-key merge "
    "recovers exact results — the oracle is the PLAIN group-by, "
    "proving salting changes the plan, never the answer.",
    refs=("A5", "§4"),
)
def q_salted_agg(spark, sf_dir):
    from lakeflow.functions.exact import micros
    from lakeflow.operators.skew import salted_aggregate

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", micros("value").alias("v")
    )
    out = salted_aggregate(
        ev,
        keys=["event_type"],
        aggs={
            "n": ("v", "count"),
            "sum_value_micros": ("v", "sum"),
            "min_value_micros": ("v", "min"),
            "max_value_micros": ("v", "max"),
        },
        n_salts=16,
    )
    return out.select(
        "event_type", "n", "sum_value_micros", "min_value_micros", "max_value_micros"
    )


@query(
    "q_union_drifting",
    oracle="""
    SELECT event_id, event_type,
           CAST(FLOOR(value * 1000000e0 + 0.5e0) AS BIGINT) AS value_micros,
           CAST(NULL AS BIGINT) AS user_id
    FROM events WHERE event_id % 3 = 0
    UNION ALL
    SELECT event_id, event_type, CAST(NULL AS BIGINT), user_id
    FROM events WHERE event_id % 3 = 1
    """,
    description="Drifting-schema union (operators/union.union_drifting "
    "= unionByName + allowMissingColumns): two projections of the same "
    "feed that each miss a column union into the superset schema with "
    "null fill — the reference's append-frames-from-changing-exports "
    "pattern (D2) as one oracle-checked relation.",
    refs=("D2",),
)
def q_union_drifting(spark, sf_dir):
    from lakeflow.functions.exact import micros
    from lakeflow.operators.union import union_drifting

    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_id") % 3 == 0).select(
        "event_id", "event_type", micros("value").alias("value_micros")
    )
    b = ev.filter(F.col("event_id") % 3 == 1).select(
        "event_id", "event_type", F.col("user_id").cast("long").alias("user_id")
    )
    return union_drifting([a, b])


# ---------------------------------------------------------------------------
# Round 4: the four TPC-H shapes still missing from the registry (Q2,
# Q11, Q16, Q20) — with them, all 22 TPC-H plan shapes are declared.
# The driver testdata has no partsupp table, so the "supply" relation
# is derived from lineitem: supplier s supplies part p iff a lineitem
# (p, s) exists, with unit cost proxied by the cheapest observed
# per-unit price in exact integer micros. The distinguishing plan
# shapes (correlated per-group MIN, global-share HAVING, NOT-IN +
# count-distinct, nested semi-joins) are intact.
# ---------------------------------------------------------------------------

_SQL_SUPPLY = """
    SELECT l_partkey AS sp_partkey, l_suppkey AS sp_suppkey,
           MIN(CAST(FLOOR(l_extendedprice * 1000000e0 + 0.5e0) AS BIGINT)
               // CAST(l_quantity AS BIGINT)) AS cost_micros
    FROM lineitem GROUP BY 1, 2
"""


def _supply(spark, sf_dir):
    """lineitem-derived supply relation: one row per (part, supplier)
    with the min observed per-unit price (exact integer micros)."""
    li = load_table(spark, sf_dir, "lineitem")
    unit = F.expr(
        "CAST(FLOOR(l_extendedprice * 1000000e0 + 0.5e0) AS BIGINT)"
        " div CAST(l_quantity AS BIGINT)"
    )
    return li.groupBy(
        F.col("l_partkey").alias("sp_partkey"),
        F.col("l_suppkey").alias("sp_suppkey"),
    ).agg(F.min(unit).alias("cost_micros"))


@query(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH supply AS ({_SQL_SUPPLY}),
    eu AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'),
    cand AS (
      SELECT p_partkey, p_name, sp_suppkey, cost_micros
      FROM part JOIN supply ON p_partkey = sp_partkey
      WHERE p_size = 15 AND p_type LIKE '%BRASS%'),
    mins AS (
      SELECT p_partkey, MIN(cost_micros) AS min_cost
      FROM cand JOIN eu ON sp_suppkey = s_suppkey GROUP BY p_partkey)
    SELECT CAST(FLOOR(s_acctbal * 100e0 + 0.5e0) AS BIGINT) AS acctbal_cents,
           s_name, n_name, cand.p_partkey AS p_partkey, p_name, cost_micros
    FROM cand
    JOIN eu ON sp_suppkey = s_suppkey
    JOIN mins ON cand.p_partkey = mins.p_partkey
             AND cand.cost_micros = mins.min_cost
    ORDER BY acctbal_cents DESC, n_name, s_name, cand.p_partkey
    LIMIT 100
    """,
    description="TPC-H Q2-style min-cost supplier: for each BRASS "
    "size-15 part, the European supplier(s) achieving the per-part "
    "MINIMUM supply cost — the correlated MIN subquery decorrelated "
    "into a per-part aggregate joined back on (part, cost), exactly "
    "the q17 rewrite shape; region/nation/supplier dims broadcast, "
    "final order is a TakeOrderedAndProject (limit 100). Supply costs "
    "are lineitem-derived exact integer micros (no partsupp in the "
    "driver data).",
    refs=("J2", "A5", "D3", "P11"),
)
def q2_min_cost_supplier(spark, sf_dir):
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & F.col("p_type").like("%BRASS%")
    )
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = sup.join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
    cand = (
        _supply(spark, sf_dir)
        .join(F.broadcast(part), F.col("sp_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(eu.select("s_suppkey", "s_name", "s_acctbal", "n_name")),
            F.col("sp_suppkey") == F.col("s_suppkey"),
        )
    )
    mins = cand.groupBy(F.col("p_partkey").alias("mp")).agg(
        F.min("cost_micros").alias("min_cost")
    )
    return (
        cand.join(
            mins,
            (F.col("p_partkey") == F.col("mp"))
            & (F.col("cost_micros") == F.col("min_cost")),
        )
        .select(
            cents("s_acctbal").alias("acctbal_cents"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            "cost_micros",
        )
        .orderBy(
            F.desc("acctbal_cents"), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


@query(
    "q11_important_stock",
    oracle=f"""
    WITH supply AS ({_SQL_SUPPLY}),
    nat AS (
      SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'GERMANY'),
    val AS (
      SELECT sp_partkey, CAST(SUM(cost_micros) AS BIGINT) AS value_micros
      FROM supply JOIN nat ON sp_suppkey = s_suppkey
      GROUP BY sp_partkey),
    tot AS (SELECT CAST(SUM(value_micros) AS BIGINT) AS total FROM val)
    SELECT sp_partkey AS p_partkey, value_micros
    FROM val, tot
    WHERE value_micros * 10000 > total
    """,
    description="TPC-H Q11-style important stock: per-part supply "
    "value restricted to one nation's suppliers, kept iff the part's "
    "value exceeds 1/10000 of the GLOBAL total — the global-share "
    "HAVING subquery realized as a 1-row broadcast into the filter "
    "(integer cross-multiplication, no division drift); the nation "
    "supplier list broadcasts into the supply scan.",
    refs=("J2", "A5"),
)
def q11_important_stock(spark, sf_dir):
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "GERMANY")
    de = sup.join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    val = (
        _supply(spark, sf_dir)
        .join(F.broadcast(de), F.col("sp_suppkey") == F.col("s_suppkey"))
        .groupBy("sp_partkey")
        .agg(F.sum("cost_micros").alias("value_micros"))
    )
    tot = val.agg(F.sum("value_micros").alias("total"))
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(F.col("value_micros") * 10000 > F.col("total"))
        .select(F.col("sp_partkey").alias("p_partkey"), "value_micros")
    )


@query(
    "q16_supplier_relationship",
    oracle=f"""
    WITH supply AS ({_SQL_SUPPLY}),
    bad AS (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT sp_suppkey) AS BIGINT) AS supplier_cnt
    FROM supply
    JOIN part ON sp_partkey = p_partkey
    WHERE p_brand <> 'Brand#45'
      AND p_type NOT LIKE 'MEDIUM%'
      AND p_size IN (9, 14, 19, 23, 36, 45, 49, 3)
      AND sp_suppkey NOT IN (SELECT s_suppkey FROM bad)
    GROUP BY p_brand, p_type, p_size
    """,
    description="TPC-H Q16-style supplier relationship: distinct "
    "supplier count per (brand, type, size) over NOT-brand / NOT-LIKE "
    "/ IN-list filtered parts, excluding a supplier denylist — the "
    "NOT IN realized as a broadcast left-anti join (the denylist is "
    "tiny), the count-distinct as Spark's two-phase partial-distinct "
    "aggregate. (Denylist = negative account balance; the driver "
    "supplier table has no comment column.)",
    refs=("J3", "A5", "P4", "P5"),
)
def q16_supplier_relationship(spark, sf_dir):
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & ~F.col("p_type").like("MEDIUM%")
        & F.col("p_size").isin(9, 14, 19, 23, 36, 45, 49, 3)
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        _supply(spark, sf_dir)
        .join(
            F.broadcast(bad),
            F.col("sp_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(part), F.col("sp_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("sp_suppkey").alias("supplier_cnt"))
    )


@query(
    "q20_potential_promotion",
    oracle="""
    WITH forest AS (
      SELECT p_partkey FROM part WHERE p_name LIKE '%1%'),
    shipped AS (
      SELECT l_partkey, l_suppkey,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_partkey IN (SELECT p_partkey FROM forest)
      GROUP BY 1, 2),
    qualified AS (
      SELECT DISTINCT l_suppkey FROM shipped WHERE qty > 50)
    SELECT s_name, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'CANADA'
      AND s_suppkey IN (SELECT l_suppkey FROM qualified)
    """,
    description="TPC-H Q20-style potential promotion: suppliers in one "
    "nation who shipped >50 units of LIKE-matched parts in 1996 — the "
    "nested IN-subqueries realized as two stacked left-semi joins "
    "(part list into the lineitem aggregate's scan, qualified-supplier "
    "set into the supplier dim), never a distinct-then-inner-join "
    "blowup.",
    refs=("J3", "A5", "P8"),
)
def q20_potential_promotion(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%1%"))
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "CANADA")
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= lit_ts(li, "l_shipdate", "1996-01-01"))
            & (F.col("l_shipdate") < lit_ts(li, "l_shipdate", "1997-01-01"))
        )
        .join(
            F.broadcast(part.select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
    )
    qualified = shipped.filter(F.col("qty") > 50).select("l_suppkey")
    return (
        sup.join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            qualified, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        )
        .select("s_name", "n_name")
    )


@query(
    "q_gold_funnel_join",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS invitation_ts,
             MIN(CASE WHEN event_type = 'signup' THEN ts END) AS application_start,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS approval_ts
      FROM events GROUP BY user_id)
    SELECT c.c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_invited,
           CAST(SUM(CASE WHEN u.application_start IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_applied,
           CAST(SUM(CASE WHEN u.approval_ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_approved,
           CAST(SUM(CASE WHEN u.application_start >= u.invitation_ts
                    THEN epoch_us(u.application_start) - epoch_us(u.invitation_ts) END)
                AS BIGINT) AS invite_to_apply_us
    FROM per_user u
    JOIN customer c ON c.c_custkey = u.user_id
    WHERE u.invitation_ts IS NOT NULL
    GROUP BY segment
    """,
    description="Gold-layer card-funnel star build collapsed to its "
    "essential plan (pipelines/gold.py; reference card_funnel/"
    "create_card_funnel_schema.py + sqls/create_customers_table.sql): "
    "the status timeline becomes per-entity milestones via ONE "
    "conditional hash-aggregate over the event stream (the "
    "_applications_from_events shape — min ts per status, no second "
    "scan, no per-status self-joins), the funnel dims FK-join to the "
    "broadcast customer dimension, and conversion counts + exact "
    "integer invite-to-apply latency aggregate per market segment. "
    "At 100 TB: one events scan, one user_id shuffle, dimension "
    "broadcast, tiny result.",
    refs=("J2", "A5", "§2.5"),
)
def q_gold_funnel_join(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
                "invitation_ts"
            ),
            F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
                "application_start"
            ),
            F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
                "approval_ts"
            ),
        )
        .filter(F.col("invitation_ts").isNotNull())
    )
    joined = per_user.join(
        F.broadcast(
            cust.select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
        ),
        "user_id",
    )
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    return joined.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_invited"),
        F.sum(F.col("application_start").isNotNull().cast("long")).alias(
            "n_applied"
        ),
        F.sum(F.col("approval_ts").isNotNull().cast("long")).alias("n_approved"),
        F.sum(
            F.when(
                F.col("application_start") >= F.col("invitation_ts"),
                us("application_start") - us("invitation_ts"),
            )
        ).alias("invite_to_apply_us"),
    )


@query(
    "q_bloom_prune_join",
    oracle=f"""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM({SQL_CENTS.format(x='l_extendedprice')}) AS BIGINT) AS revenue_cents
    FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size <= 2)
    GROUP BY l_returnflag
    """,
    description="Selective fact-dim semi join with an explicit Bloom "
    "pre-filter on the fact scan (operators/bloom.py): the dim subset's "
    "membership is compiled to a ~10-bits/key bitmap that rides the plan "
    "as an array<long> literal, and every lineitem row is tested with a "
    "few codegen integer ops BEFORE any shuffle — the exact semi join "
    "after it removes the false positives, so the answer is identical "
    "to the plain semi join the oracle runs. At 100 TB this is the "
    "shuffle-avoidance lever for build sides too big to broadcast as a "
    "hash relation but small as a bitmap (10M keys ≈ 12 MB); mirrors "
    "Spark's runtime row-level bloom filtering, made explicit so one "
    "built filter can prune many downstream jobs.",
    refs=("J2", "P4"),
)
def q_bloom_prune_join(spark, sf_dir):
    from lakeflow.operators.bloom import bloom_semi_join

    li = load_table(spark, sf_dir, "lineitem")
    dim = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_size") <= 2)
        .select("p_partkey")
    )
    pruned = bloom_semi_join(li, dim, "l_partkey", "p_partkey")
    return pruned.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(cents("l_extendedprice")).alias("revenue_cents"),
    )


@query(
    "q_zonemap_scan",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM({SQL_CENTS.format(x='o_totalprice')}) AS BIGINT) AS total_cents
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <= TIMESTAMP '1996-12-31'
    GROUP BY o_orderpriority
    """,
    description="Zone-map data skipping (sinks/zonemap.py): the file "
    "list of the orders table is pruned driver-side from parquet FOOTER "
    "min/max stats before any scan task is scheduled, then the residual "
    "date-range predicate is re-applied to the surviving files — the "
    "answer is exactly the full scan's (pruning is conservative; files "
    "without stats are kept). This is the metadata layer Delta/Iceberg "
    "data skipping builds on: at 100 TB a sorted/Z-ordered table turns "
    "a million-file listing into a few hundred scheduled files, and the "
    "footer stats live in a persisted index table "
    "(build_zonemap_table) maintained on ingest, not re-read per query.",
    refs=("S1", "P8"),
)
def q_zonemap_scan(spark, sf_dir):
    from datetime import datetime

    from lakeflow.sinks.zonemap import pruned_read

    df = pruned_read(
        spark,
        f"{sf_dir}/orders.parquet",
        "o_orderdate",
        datetime(1996, 1, 1),
        datetime(1996, 12, 31),
    )
    return df.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(cents("o_totalprice")).alias("total_cents"),
    )


@query(
    "q_sketch_rollup",
    oracle=f"""
    SELECT event_type, date_trunc('day', ts) AS day_start,
           COUNT(*) AS n_events,
           CAST(SUM({SQL_MICROS.format(x='value')}) AS BIGINT) AS sum_value_micros,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS within_5pct
    FROM events GROUP BY 1, 2
    """,
    description="Re-aggregable rollup with mergeable sketches "
    "(operators/rollups.py): ONE scan builds per-(event_type, hour) "
    "partials — additive count/sum in exact micros plus a Datasketches "
    "HLL of user_id — and the daily report is served by MERGING "
    "partials (sums add, sketches hll_union_agg), never rescanning raw "
    "events. The continuous-aggregate/hypertable pattern: at 100 TB a "
    "day's answer costs 24 partial rows per key. Additive measures are "
    "oracle-exact; the merged distinct estimate carries the sketch's "
    "error contract, asserted as a within-5% flag against the exact "
    "per-day distinct both engines compute (HLL union is lossless over "
    "sketches, so merging hours matches a single-pass sketch).",
    refs=("§2.12", "A5", "F4"),
)
def q_sketch_rollup(spark, sf_dir):
    from lakeflow.operators.rollups import hourly_partials, merge_to_grain

    ev = load_table(spark, sf_dir, "events")
    partials = hourly_partials(
        ev, "ts", ["event_type"], micros("value"), "user_id"
    )
    daily = merge_to_grain(partials, ["event_type"], "day")
    exact = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day_start")
    ).agg(F.count_distinct(F.col("user_id")).alias("exact_users"))
    j = daily.withColumnRenamed("bucket_start", "day_start").join(
        exact, ["event_type", "day_start"]
    )
    tol = (
        F.abs(F.col("distinct_est").cast("double") - F.col("exact_users"))
        <= F.lit(0.05) * F.col("exact_users")
    )
    return j.select(
        "event_type",
        "day_start",
        F.col("n").alias("n_events"),
        F.col("sum_v").alias("sum_value_micros"),
        "exact_users",
        tol.alias("within_5pct"),
    )


@query(
    "q_snapshot_diff",
    oracle=f"""
    WITH v1 AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
    v2 AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % 100 = 0 THEN o_totalprice + 10
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 97 <> 0
      UNION ALL
      SELECT o_orderkey + 100000000, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 89 = 0
    ),
    d AS (
      SELECT CASE WHEN v1.o_orderkey IS NULL THEN 'I'
                  WHEN v2.o_orderkey IS NULL THEN 'D'
                  WHEN NOT (v1.o_totalprice IS NOT DISTINCT FROM v2.o_totalprice
                            AND v1.o_orderstatus IS NOT DISTINCT FROM v2.o_orderstatus)
                  THEN 'U' END AS op,
             COALESCE(v2.o_orderkey, v1.o_orderkey) AS o_orderkey,
             CASE WHEN v2.o_orderkey IS NULL THEN v1.o_orderstatus
                  ELSE v2.o_orderstatus END AS o_orderstatus,
             CASE WHEN v2.o_orderkey IS NULL THEN v1.o_totalprice
                  ELSE v2.o_totalprice END AS price
      FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey
    )
    SELECT op, o_orderkey, o_orderstatus,
           CAST({SQL_CENTS.format(x='price')} AS BIGINT) AS price_cents
    FROM d WHERE op IS NOT NULL
    """,
    description="Snapshot diff / change-data-feed reconstruction "
    "(operators/diff.py): two table versions (here a deterministic v2 "
    "of orders with updates on keys %100, deletes on %97, inserts on "
    "%89) become one I/D/U change feed via a single null-safe full "
    "outer join on the key plus a codegen value comparison — the "
    "incremental-consumer primitive for snapshot-only storage. At "
    "100 TB both snapshots shuffle once on the key (free co-location "
    "when versions are written bucketed), the comparison is a narrow "
    "projection, and downstream loads process |changes| rows instead "
    "of the full new snapshot.",
    refs=("J2", "P8", "§2.5"),
)
def q_snapshot_diff(spark, sf_dir):
    from lakeflow.operators.diff import snapshot_diff

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    v2 = (
        o.where(F.col("o_orderkey") % 97 != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 100 == 0, F.col("o_totalprice") + 10
            ).otherwise(F.col("o_totalprice")),
        )
        .unionByName(
            o.where(F.col("o_orderkey") % 89 == 0).withColumn(
                "o_orderkey", F.col("o_orderkey") + 100_000_000
            )
        )
    )
    d = snapshot_diff(o, v2, ["o_orderkey"])
    return d.select(
        "op",
        "o_orderkey",
        "o_orderstatus",
        cents("o_totalprice").alias("price_cents"),
    )


@query(
    "q_bitmap_rollup",
    oracle="""
    SELECT event_type, date_trunc('day', ts) AS day_start,
           COUNT(*) AS n,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_exact
    FROM events GROUP BY 1, 2
    """,
    description="EXACT mergeable distinct-count rollup via bitmap "
    "buckets (operators/rollups.hourly_bitmap_partials): per-(event_"
    "type, hour, bucket) partials hold bitmap_construct_agg of user-id "
    "bit positions; the daily report ORs bitmaps per bucket, counts "
    "bits, and sums buckets — bit-for-bit equal to COUNT(DISTINCT) at "
    "every grain with no rescan of raw events (the lossless companion "
    "to q_sketch_rollup's fixed-size HLL: bitmaps for bounded int id "
    "domains, sketches for unbounded/string ones). Partials are "
    "additive state — streaming hours append, late data merges, "
    "compaction is ordinary table maintenance.",
    refs=("§2.12", "A5", "F4"),
)
def q_bitmap_rollup(spark, sf_dir):
    from lakeflow.operators.rollups import (
        hourly_bitmap_partials,
        merge_bitmap_to_grain,
    )

    ev = load_table(spark, sf_dir, "events")
    partials = hourly_bitmap_partials(ev, "ts", ["event_type"], "user_id")
    return merge_bitmap_to_grain(partials, ["event_type"], "day").select(
        "event_type",
        F.col("bucket_start").alias("day_start"),
        "n",
        "distinct_exact",
    )


@query(
    "q_interval_join",
    oracle="""
    WITH iv AS (
      SELECT user_id, MIN(ts) AS s, MIN(ts) + INTERVAL 1 HOUR AS e
      FROM events GROUP BY user_id)
    SELECT e.user_id, CAST(COUNT(*) AS BIGINT) AS n_first_hour
    FROM events e
    JOIN iv ON iv.user_id = e.user_id AND e.ts >= iv.s AND e.ts <= iv.e
    GROUP BY e.user_id
    """,
    description="Two-table point-in-interval join "
    "(operators/joins.interval_join): per-user activity windows "
    "[first event, +1 hour] joined against the event stream to count "
    "first-hour events. The interval replicates over the fixed-width "
    "time buckets it covers (sequence+explode, fan-out = length/"
    "bucket), the point carries its single bucket, and Catalyst plans "
    "an EQUI join on (user, bucket) with the exact between-predicate "
    "as a post-filter — the nested-loop-free generalization of the "
    "bucketed self range join to sessions x events / validity windows "
    "x observations. At 100 TB both sides shuffle once on (key, "
    "bucket); hot buckets are ordinary AQE join skew.",
    refs=("J4", "§2.5"),
)
def q_interval_join(spark, sf_dir):
    from lakeflow.operators.joins import interval_join

    ev = load_table(spark, sf_dir, "events")
    iv = ev.groupBy("user_id").agg(
        F.min("ts").alias("s"),
        (F.min(F.col("ts").cast("timestamp")) + F.expr("INTERVAL 1 HOUR")).alias("e"),
    )
    pts = ev.select("user_id", "ts", "event_id")
    j = interval_join(pts, iv, "ts", "s", "e", keys=["user_id"])
    return j.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_first_hour"))


def _equi_depth_oracle(n_bins: int = 8) -> str:
    c = SQL_CENTS.format(x="o_totalprice")
    thr_cols = ", ".join(
        f"quantile_cont({c}, {i}/{n_bins}e0) AS t{i}" for i in range(1, n_bins)
    )
    bin_expr = " + ".join(f"CAST(c > t{i} AS INT)" for i in range(1, n_bins))
    return f"""
    WITH thr AS (SELECT {thr_cols} FROM orders),
    vals AS (SELECT {c} AS c FROM orders)
    SELECT CAST({bin_expr} AS INT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(c) AS BIGINT) AS min_v,
           CAST(MAX(c) AS BIGINT) AS max_v
    FROM vals, thr GROUP BY 1
    """


@query(
    "q_equi_depth_hist",
    oracle=_equi_depth_oracle(),
    description="Equi-depth (quantile-bucketed) histogram of order "
    "totals (operators/profile.equi_depth_histogram): bin boundaries "
    "at the i/8 percentiles so every bar holds ~1/8 of the rows — the "
    "profiling view that survives heavy-tailed skew. ONE aggregate "
    "computes the 7 interior boundaries (sketch percentiles at scale; "
    "exact interpolated here for bit parity with quantile_cont), "
    "broadcast as a 1-row relation; bin assignment is a narrow codegen "
    "sum of comparisons, monotone in the value — no sort, no ntile "
    "window, no driver collect.",
    refs=("A5", "F5"),
)
def q_equi_depth_hist(spark, sf_dir):
    from lakeflow.operators.profile import equi_depth_histogram

    o = load_table(spark, sf_dir, "orders").select(
        cents("o_totalprice").alias("price_cents")
    )
    return equi_depth_histogram(o, "price_cents", n_bins=8, approx=False)
