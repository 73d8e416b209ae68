"""Scalar-function and predicate coverage queries (SURVEY §2.3 P11,
§2.8 F1-F8, §2.6 A5 distinct/grouping-sets, §2.9 analytic windows).

The reference uses only a handful of scalar functions (regex renames,
epoch casts); the engine exposes Spark's full built-in surface — these
queries pin the behavior of each family against the oracle so the
coverage claim is executable, not aspirational.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from lakeflow.catalog import load_table
from lakeflow.functions.exact import SQL_CENTS, SQL_MICROS, cents, micros
from lakeflow.plans.registry import query


@query(
    "q_like_between",
    oracle=f"""
    SELECT p_brand,
           COUNT(*) AS n_parts,
           CAST(SUM({SQL_CENTS.format(x='p_retailprice')}) AS BIGINT) AS sum_price_cents
    FROM part
    WHERE p_name LIKE '%widget%'
      AND p_size BETWEEN 10 AND 40
      AND p_type IN ('ECONOMY', 'PROMO')
    GROUP BY p_brand
    """,
    description="Theta predicates the reference lacks (P11): LIKE, "
    "BETWEEN, IN — all pushdown-eligible.",
    refs=("P11", "P4"),
)
def q_like_between(spark, sf_dir):
    p = load_table(spark, sf_dir, "part")
    return (
        p.filter(
            F.col("p_name").like("%widget%")
            & F.col("p_size").between(10, 40)
            & F.col("p_type").isin("ECONOMY", "PROMO")
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(cents("p_retailprice")).alias("sum_price_cents"),
        )
    )


@query(
    "q_string_funcs",
    oracle="""
    SELECT c_custkey,
           upper(c_mktsegment) AS seg_upper,
           lower(c_name) AS name_lower,
           substr(c_name, 10, 9) AS cust_num,
           CAST(length(c_name) AS BIGINT) AS name_len,
           replace(c_name, 'Customer#', 'C-') AS name_short,
           regexp_replace(c_name, '0+', '0', 'g') AS name_squeezed,
           concat(c_mktsegment, ':', c_name) AS tagged,
           CASE WHEN c_name LIKE '%7' THEN 'seven' ELSE 'other' END AS tail7
    FROM customer
    """,
    description="String function family (F1-F3): case, substring, "
    "replace, regex, concat, conditional classification.",
    refs=("F1", "F2", "F3", "F6"),
)
def q_string_funcs(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_mktsegment").alias("seg_upper"),
        F.lower("c_name").alias("name_lower"),
        F.substring("c_name", 10, 9).alias("cust_num"),
        F.length("c_name").cast("long").alias("name_len"),
        F.replace(F.col("c_name"), F.lit("Customer#"), F.lit("C-")).alias(
            "name_short"
        ),
        F.regexp_replace("c_name", "0+", "0").alias("name_squeezed"),
        F.concat(F.col("c_mktsegment"), F.lit(":"), F.col("c_name")).alias(
            "tagged"
        ),
        F.when(F.col("c_name").like("%7"), F.lit("seven"))
        .otherwise(F.lit("other"))
        .alias("tail7"),
    )


@query(
    "q_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_month,
           CAST(day(o_orderdate) AS INT) AS order_day,
           CAST(dayofweek(o_orderdate) + 1 AS INT) AS order_dow,  -- DuckDB Sun=0, Spark Sun=1
           date_trunc('month', o_orderdate) AS month_start,
           o_orderdate + INTERVAL 30 DAY AS due_date,
           CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since_epoch_start,
           strftime(o_orderdate, '%Y-%m') AS ym
    FROM orders
    """,
    description="Date/time family (F4): extraction, truncation, interval "
    "arithmetic, difference, formatting.",
    refs=("F4",),
)
def q_date_funcs(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.dayofweek("o_orderdate").alias("order_dow"),
        F.date_trunc("month", F.col("o_orderdate"))
        .cast(o.schema["o_orderdate"].dataType)
        .alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due_date"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lit("1995-01-01").cast("date"),
        )
        .cast("long")
        .alias("days_since_epoch_start"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    )


@query(
    "q_math_funcs",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           CAST(FLOOR(sqrt(l_extendedprice) * 1000000e0 + 0.5e0) AS BIGINT) AS sqrt_price_micros,
           CAST(FLOOR(ln(l_extendedprice + 1e0) * 1000000e0 + 0.5e0) AS BIGINT) AS log_price_micros,
           CAST(FLOOR(power(1e0 + l_discount, 2e0) * 1000000e0 + 0.5e0) AS BIGINT) AS disc_sq_micros,
           abs(l_discount - l_tax) >= 0.05e0 AS spread_flag,
           CAST(l_quantity AS BIGINT) % 7 AS qty_mod7,
           greatest(l_discount, l_tax) AS max_rate,
           round(l_extendedprice / 1000e0) AS price_k
    FROM lineitem
    """,
    description="Math family (F5): sqrt/ln/power/abs/mod/greatest/round "
    "— deterministic IEEE expressions, micro-int boundaries.",
    refs=("F5",),
)
def q_math_funcs(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        micros(F.sqrt(F.col("l_extendedprice"))).alias("sqrt_price_micros"),
        micros(F.log(F.col("l_extendedprice") + F.lit(1.0))).alias(
            "log_price_micros"
        ),
        micros(F.pow(F.lit(1.0) + F.col("l_discount"), F.lit(2.0))).alias(
            "disc_sq_micros"
        ),
        (F.abs(F.col("l_discount") - F.col("l_tax")) >= F.lit(0.05)).alias(
            "spread_flag"
        ),
        (F.col("l_quantity").cast("long") % 7).alias("qty_mod7"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.round(F.col("l_extendedprice") / F.lit(1000.0)).alias("price_k"),
    )


@query(
    "q_conditional_null",
    oracle="""
    SELECT s_suppkey,
           coalesce(nullif(s_name, 'Supplier#000000003'), 'REDACTED') AS display_name,
           CASE WHEN s_acctbal < 0e0 THEN 'debt'
                WHEN s_acctbal < 5000e0 THEN 'low'
                ELSE 'high' END AS bal_tier,
           s_acctbal IS NULL AS bal_missing,
           ifnull(s_nationkey, -1) AS nation_or_default
    FROM supplier
    """,
    description="Conditional/null family (F6): coalesce, nullif, CASE "
    "tiers, null probes — the reference's NaN-null dance made typed.",
    refs=("F6",),
)
def q_conditional_null(spark, sf_dir):
    s = load_table(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.coalesce(
            F.nullif(F.col("s_name"), F.lit("Supplier#000000003")),
            F.lit("REDACTED"),
        ).alias("display_name"),
        F.when(F.col("s_acctbal") < 0.0, "debt")
        .when(F.col("s_acctbal") < 5000.0, "low")
        .otherwise("high")
        .alias("bal_tier"),
        F.col("s_acctbal").isNull().alias("bal_missing"),
        F.coalesce(F.col("s_nationkey"), F.lit(-1)).alias("nation_or_default"),
    )


@query(
    "q_scalar_funcs_wide",
    oracle="""
    SELECT o_orderkey,
           upper(o_orderpriority) AS pri_upper,
           lower(o_orderpriority) AS pri_lower,
           substr(o_orderpriority, 3, 6) AS pri_word,
           CAST(length(o_orderpriority) AS BIGINT) AS pri_len,
           replace(o_orderpriority, '-', '_') AS pri_snake,
           regexp_replace(o_orderpriority, '[0-9]+', '#', 'g') AS pri_nodigit,
           concat(o_orderstatus, ':', o_orderpriority) AS tagged,
           CASE WHEN o_orderpriority LIKE '%URGENT' THEN 'urgent' ELSE 'other' END AS is_urgent,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_month,
           CAST(day(o_orderdate) AS INT) AS order_day,
           CAST(dayofweek(o_orderdate) + 1 AS INT) AS order_dow,  -- DuckDB Sun=0, Spark Sun=1
           date_trunc('month', o_orderdate) AS month_start,
           o_orderdate + INTERVAL 30 DAY AS due_date,
           CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since_95,
           strftime(o_orderdate, '%Y-%m') AS ym,
           CAST(FLOOR(sqrt(o_totalprice) * 1000000e0 + 0.5e0) AS BIGINT) AS sqrt_price_micros,
           CAST(FLOOR(ln(o_totalprice + 1e0) * 1000000e0 + 0.5e0) AS BIGINT) AS log_price_micros,
           CAST(FLOOR(power(o_totalprice / 100000e0, 2e0) * 1000000e0 + 0.5e0) AS BIGINT) AS price_sq_micros,
           abs(o_totalprice - 150000e0) >= 50000e0 AS far_from_mid,
           o_orderkey % 7 AS key_mod7,
           greatest(o_totalprice, 100000e0) AS price_floor,
           round(o_totalprice / 1000e0) AS price_k,
           coalesce(nullif(o_orderpriority, '1-URGENT'), 'REDACTED') AS display_pri,
           CASE WHEN o_totalprice < 50000e0 THEN 'low'
                WHEN o_totalprice < 200000e0 THEN 'mid'
                ELSE 'high' END AS price_tier,
           nullif(o_orderstatus, 'F') IS NULL AS is_finished,
           ifnull(o_custkey, -1) AS cust_or_default
    FROM orders
    """,
    description="Consolidated scalar-function coverage (F1-F6) in one "
    "driver-window query over orders: string family (upper/lower/substr/"
    "length/replace/regex/concat/LIKE), date family (extract/trunc/interval/"
    "diff/format), math family (sqrt/ln/power/abs/mod/greatest/round at "
    "micro-int boundaries), conditional/null family (coalesce/nullif/CASE/"
    "null probes). Granular per-family variants remain registered outside "
    "the driver window.",
    refs=("F1", "F2", "F3", "F4", "F5", "F6"),
)
def q_scalar_funcs_wide(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.upper("o_orderpriority").alias("pri_upper"),
        F.lower("o_orderpriority").alias("pri_lower"),
        F.substring("o_orderpriority", 3, 6).alias("pri_word"),
        F.length("o_orderpriority").cast("long").alias("pri_len"),
        F.replace(F.col("o_orderpriority"), F.lit("-"), F.lit("_")).alias(
            "pri_snake"
        ),
        F.regexp_replace("o_orderpriority", "[0-9]+", "#").alias("pri_nodigit"),
        F.concat(
            F.col("o_orderstatus"), F.lit(":"), F.col("o_orderpriority")
        ).alias("tagged"),
        F.when(F.col("o_orderpriority").like("%URGENT"), F.lit("urgent"))
        .otherwise(F.lit("other"))
        .alias("is_urgent"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.dayofweek("o_orderdate").alias("order_dow"),
        F.date_trunc("month", F.col("o_orderdate"))
        .cast(o.schema["o_orderdate"].dataType)
        .alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due_date"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lit("1995-01-01").cast("date"),
        )
        .cast("long")
        .alias("days_since_95"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        micros(F.sqrt(F.col("o_totalprice"))).alias("sqrt_price_micros"),
        micros(F.log(F.col("o_totalprice") + F.lit(1.0))).alias(
            "log_price_micros"
        ),
        micros(F.pow(F.col("o_totalprice") / F.lit(100000.0), F.lit(2.0))).alias(
            "price_sq_micros"
        ),
        (F.abs(F.col("o_totalprice") - F.lit(150000.0)) >= F.lit(50000.0)).alias(
            "far_from_mid"
        ),
        (F.col("o_orderkey") % 7).alias("key_mod7"),
        F.greatest(F.col("o_totalprice"), F.lit(100000.0)).alias("price_floor"),
        F.round(F.col("o_totalprice") / F.lit(1000.0)).alias("price_k"),
        F.coalesce(
            F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")),
            F.lit("REDACTED"),
        ).alias("display_pri"),
        F.when(F.col("o_totalprice") < 50000.0, "low")
        .when(F.col("o_totalprice") < 200000.0, "mid")
        .otherwise("high")
        .alias("price_tier"),
        F.nullif(F.col("o_orderstatus"), F.lit("F")).isNull().alias(
            "is_finished"
        ),
        F.coalesce(F.col("o_custkey"), F.lit(-1)).alias("cust_or_default"),
    )


def _profile_oracle() -> str:
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
    parts = [
        f"""SELECT '{c}' AS column, COUNT(*) AS n_rows,
               COUNT(*) - COUNT({c}) AS n_null,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
               CAST(MIN({c}) AS VARCHAR) AS min_value,
               CAST(MAX({c}) AS VARCHAR) AS max_value
        FROM orders"""
        for c in cols
    ]
    return "\nUNION ALL\n".join(parts)


@query(
    "q_profile_orders",
    oracle=_profile_oracle(),
    description="Single-pass table profiling (intake audit): per-column "
    "null count, exact distinct count, stringified min/max for four "
    "orders columns, all computed in ONE aggregation over one scan and "
    "pivoted to a tidy row per column (operators/profile.py).",
    refs=("A5", "A2"),
)
def q_profile_orders(spark, sf_dir):
    from lakeflow.operators.profile import profile_table

    o = load_table(spark, sf_dir, "orders")
    return profile_table(
        o, ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
    )


@query(
    "q_grouping_sets",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM({SQL_CENTS.format(x='o_totalprice')}) AS BIGINT) AS sum_cents
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    description="Explicit GROUPING SETS (A5) — disjoint rollup paths in "
    "one pass.",
    refs=("A5",),
)
def q_grouping_sets(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__orders_gs")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100e0 + 0.5e0) AS BIGINT)) AS BIGINT) AS sum_cents
        FROM __orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "q_count_distinct",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
    description="Distinct aggregation (A5): expand-based distinct count "
    "alongside plain count.",
    refs=("A5",),
)
def q_count_distinct(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "q_analytic_windows",
    oracle="""
    SELECT o_custkey, o_orderkey,
           dense_rank() OVER w AS price_drank,
           ntile(4) OVER w AS price_quartile,
           first_value(o_orderkey) OVER w AS best_orderkey,
           lead(o_orderkey) OVER w AS next_orderkey,
           CAST(COUNT(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS n_cust_orders
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
    description="Analytic window family (§2.9): dense_rank, ntile, "
    "first_value, lead, partition counts.",
    refs=("§2.9",),
)
def q_analytic_windows(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    wp = Window.partitionBy("o_custkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.dense_rank().over(w).alias("price_drank"),
        F.ntile(4).over(w).alias("price_quartile"),
        F.first("o_orderkey").over(w).alias("best_orderkey"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
        F.count(F.lit(1)).over(wp).alias("n_cust_orders"),
    )


@query(
    "q_pivot_event_types",
    oracle="""
    SELECT user_id,
           CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
           CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view,
           CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
           CAST(COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
           CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error
    FROM events GROUP BY user_id
    """,
    description="Pivot (wide counts per category) — explicit value list "
    "so the plan is a single hash-agg, no distinct-scan.",
    refs=("A5", "P1"),
)
def q_pivot_event_types(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


@query(
    "q_sessionize_batch",
    oracle="""
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)
                  >= 1800000000 OR lag(ts) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    s AS (
      SELECT user_id, ts, event_id,
             CAST(SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM g)
    SELECT user_id, session_id,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, session_id
    """,
    description="Batch sessionization (30-min gap) via lag + running sum "
    "of boundaries — the batch twin of streaming session_window.",
    refs=("§2.10", "§2.9"),
)
def q_sessionize_batch(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev_us = F.lag(us).over(w)
    new_session = F.when(
        prev_us.isNull() | ((us - prev_us) >= 1_800_000_000), 1
    ).otherwise(0)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.sum(new_session).over(wsum).alias("session_id"),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "q_variant_extract",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
    description="Open-schema semi-structured access via Spark 4 VARIANT "
    "(parse_json + variant_get) — the typed replacement for the "
    "reference's Redshift SUPER columns (SURVEY §1.2).",
    refs=("F7", "§1.2"),
)
def q_variant_extract(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.parse_json(F.col("props")).alias("v")
    )
    return (
        v.select(
            "event_type",
            F.try_variant_get("v", "$.k", "long").alias("k"),
        )
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count(F.lit(1)).alias("n"))
    )


@query(
    "q_approx_distinct",
    # HLL estimates are engine-specific, so the oracle checks the
    # CONTRACT instead of the estimate: the Spark side emits a boolean
    # "estimate within ±5% of exact", the oracle asserts TRUE — a
    # deterministic hash-checkable row instead of a skipped check.
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           TRUE AS within_5pct
    FROM orders GROUP BY o_orderpriority
    """,
    description="approx_count_distinct (HyperLogLog++, rsd=0.01) per "
    "priority — the constant-memory distinct estimator for 100 TB "
    "cardinalities (A5); checked against the exact count via a ±5% "
    "tolerance contract; exact twin is q_count_distinct.",
    refs=("A5",),
)
def q_approx_distinct(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", 0.01).alias("approx_customers"),
        F.count_distinct(F.col("o_custkey")).alias("exact_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    tol = F.abs(
        F.col("approx_customers").cast("double") - F.col("exact_customers")
    ) <= F.lit(0.05) * F.col("exact_customers")
    return agg.select(
        "o_orderpriority",
        "exact_customers",
        "n_orders",
        tol.alias("within_5pct"),
    )


@query(
    "q_median_price",
    oracle=f"""
    SELECT l_returnflag,
           quantile_cont({SQL_CENTS.format(x='l_extendedprice')}, 0.5e0) AS median_price_cents,
           quantile_cont({SQL_CENTS.format(x='l_extendedprice')}, 0.9e0) AS p90_price_cents,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    description="Exact interpolated percentiles over integer cents "
    "(both engines linear-interpolate identically on exact ints); the "
    "100 TB variant is percentile_approx (see q_approx_distinct notes).",
    refs=("A5",),
)
def q_median_price(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    c = cents("l_extendedprice")
    return li.groupBy("l_returnflag").agg(
        F.percentile(c, 0.5).alias("median_price_cents"),
        F.percentile(c, 0.9).alias("p90_price_cents"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q_unpivot_metrics",
    oracle=f"""
    SELECT l_orderkey, l_linenumber, 'qty' AS metric,
           {SQL_CENTS.format(x='l_quantity')} AS value_cents FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'price',
           {SQL_CENTS.format(x='l_extendedprice')} FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount',
           {SQL_CENTS.format(x='l_discount')} FROM lineitem
    """,
    description="Unpivot (wide -> long metric rows) via stack() — one "
    "scan, no join, the inverse of q_pivot_event_types.",
    refs=("A5", "P1"),
)
def q_unpivot_metrics(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(3, 'qty', CAST(FLOOR(l_quantity * 100e0 + 0.5e0) AS BIGINT), "
            "'price', CAST(FLOOR(l_extendedprice * 100e0 + 0.5e0) AS BIGINT), "
            "'discount', CAST(FLOOR(l_discount * 100e0 + 0.5e0) AS BIGINT)) "
            "AS (metric, value_cents)"
        ),
    )


@query(
    "q_trailing_window",
    oracle=f"""
    SELECT event_id, user_id, ts,
           CAST(SUM({SQL_MICROS.format(x='value')}) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS trailing_1h_value_micros,
           CAST(COUNT(*) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS trailing_1h_events
    FROM events
    """,
    description="Time-range window frame (RANGE BETWEEN 1h PRECEDING): "
    "trailing per-user activity — value-based frames, not row counts "
    "(§2.9).",
    refs=("§2.9", "F4"),
)
def q_trailing_window(spark, sf_dir):
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(micros("value")).over(w).alias("trailing_1h_value_micros"),
        F.count(F.lit(1)).over(w).alias("trailing_1h_events"),
    )


@query(
    "q_array_ops",
    oracle="""
    WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
               FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           array_to_string(toks[1:3], ',') AS first3,
           list_contains(toks, 'spark') AS has_spark,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
           list_sort(list_distinct(toks))[1] AS first_alpha
    FROM t
    """,
    description="Array function family (F8): size, slice, membership, "
    "distinct, sort — the typed form of the reference's positional "
    "tag expansion (P6/N7).",
    refs=("F8", "P6", "N7"),
)
def q_array_ops(spark, sf_dir):
    from lakeflow.operators.text import tokens

    d = load_table(spark, sf_dir, "documents")
    pre = d.select("doc_id", tokens("text").alias("toks"))
    return pre.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.array_join(F.slice("toks", 1, 3), ",").alias("first3"),
        F.array_contains("toks", "spark").alias("has_spark"),
        F.size(F.array_distinct("toks")).cast("long").alias("n_distinct"),
        F.get(F.array_sort(F.array_distinct("toks")), 0).alias("first_alpha"),
    )


@query(
    "q_try_casts",
    oracle="""
    WITH s AS (
      SELECT event_type,
             CASE WHEN event_id % 7 = 0
                  THEN 'x' || json_extract_string(props, '$.k')
                  ELSE json_extract_string(props, '$.k') END AS dirty,
             event_id
      FROM events),
    p AS (
      SELECT event_type, TRY_CAST(dirty AS BIGINT) AS parsed,
             1.0e0 / NULLIF(event_id % 5, 0) AS maybe_div
      FROM s)
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(parsed) AS BIGINT) AS n_parsed,
           CAST(COUNT(*) - COUNT(parsed) AS BIGINT) AS n_failed,
           CAST(SUM(parsed) AS BIGINT) AS sum_parsed,
           CAST(SUM(CASE WHEN maybe_div IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_div_null
    FROM p GROUP BY event_type
    """,
    description="ANSI-mode robustness family: TRY_CAST over "
    "deterministically dirtied strings (null on failure, never a "
    "task abort at row 3 billion) and try_divide's null-on-zero — "
    "the ingest-hardening pattern Spark 4 ANSI mode requires; "
    "counts/sums stay integer-exact.",
    refs=("F6", "N3"),
)
def q_try_casts(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k")
    dirty = F.when(
        F.col("event_id") % 7 == 0, F.concat(F.lit("x"), k)
    ).otherwise(k)
    p = ev.select(
        "event_type",
        F.expr("event_id").alias("event_id"),
        dirty.alias("dirty"),
    ).select(
        "event_type",
        F.expr("try_cast(dirty AS BIGINT)").alias("parsed"),
        F.try_divide(F.lit(1.0), F.col("event_id") % 5).alias("maybe_div"),
    )
    return p.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("parsed").alias("n_parsed"),
        (F.count(F.lit(1)) - F.count("parsed")).alias("n_failed"),
        F.sum("parsed").alias("sum_parsed"),
        F.sum(F.col("maybe_div").isNull().cast("long")).alias("n_div_null"),
    )


@query(
    "q_struct_json",
    oracle="""
    SELECT o_orderkey,
           to_json({k: o_orderkey,
                    status: o_orderstatus,
                    pri: {label: o_orderpriority,
                          parts: str_split(o_orderpriority, '-')}})
             AS payload_json
    FROM orders WHERE o_orderkey % 50 = 0
    """,
    description="Struct -> JSON serialization at the sink boundary "
    "(N5, the reference's SUPER-column write path): nested struct + "
    "array serialize via the JVM to_json codegen — byte-identical "
    "JSON text across engines for int/string/array/struct content.",
    refs=("N5", "F7"),
)
def q_struct_json(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 50 == 0)
    payload = F.struct(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.struct(
            F.col("o_orderpriority").alias("label"),
            F.split(F.col("o_orderpriority"), "-").alias("parts"),
        ).alias("pri"),
    )
    return o.select("o_orderkey", F.to_json(payload).alias("payload_json"))


@query(
    "q_empty_to_null",
    oracle="""
    WITH b AS (
      SELECT o_orderkey,
             list_filter(str_split(o_orderpriority, '-'), x -> x >= '3')
               AS high_parts
      FROM orders)
    SELECT o_orderkey,
           CASE WHEN len(high_parts) > 0 THEN to_json(high_parts) END
             AS high_parts_json,
           CAST(CASE WHEN len(high_parts) > 0 THEN 0 ELSE 1 END AS BIGINT)
             AS was_empty
    FROM b
    """,
    description="Empty-collection normalization (N6, reference "
    "sql_utils empty->null rule): arrays that filter to empty become "
    "NULL, not [] — the write-path contract that keeps warehouse "
    "NULL semantics and parquet stats meaningful. The driver-compared "
    "surface serializes the surviving array to its canonical JSON "
    "text (NULL propagates through to_json untouched, so the nulling "
    "rule is still the thing certified) because the driver's pandas "
    "canonicalizer cannot sort raw list cells (CORRECTNESS_r07 err: "
    "unhashable type 'list'); q_empty_to_null_arrays keeps the native "
    "array<string> form registered for the local gate.",
    refs=("N6", "F8"),
)
def q_empty_to_null(spark, sf_dir):
    from lakeflow.operators.flatten import empty_collections_to_null

    o = load_table(spark, sf_dir, "orders")
    b = o.select(
        "o_orderkey",
        F.filter(
            F.split(F.col("o_orderpriority"), "-"), lambda x: x >= F.lit("3")
        ).alias("high_parts"),
    )
    n = empty_collections_to_null(b)
    return n.select(
        "o_orderkey",
        F.to_json(F.col("high_parts")).alias("high_parts_json"),
        F.when(F.col("high_parts").isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("was_empty"),
    )


@query(
    "q_empty_to_null_arrays",
    oracle="""
    WITH b AS (
      SELECT o_orderkey,
             list_filter(str_split(o_orderpriority, '-'), x -> x >= '3')
               AS high_parts
      FROM orders)
    SELECT o_orderkey,
           CASE WHEN len(high_parts) > 0 THEN high_parts END AS high_parts,
           CAST(CASE WHEN len(high_parts) > 0 THEN 0 ELSE 1 END AS BIGINT)
             AS was_empty
    FROM b
    """,
    description="The native array<string> form of q_empty_to_null — "
    "what a downstream consumer of the nulled collection actually "
    "reads. Registered for the local gate (lakeflow/testing.py "
    "stringifies cells before sorting, so list cells canonicalize "
    "fine there); the driver window carries the JSON-serialized "
    "q_empty_to_null instead.",
    refs=("N6", "F8"),
)
def q_empty_to_null_arrays(spark, sf_dir):
    from lakeflow.operators.flatten import empty_collections_to_null

    o = load_table(spark, sf_dir, "orders")
    b = o.select(
        "o_orderkey",
        F.filter(
            F.split(F.col("o_orderpriority"), "-"), lambda x: x >= F.lit("3")
        ).alias("high_parts"),
    )
    n = empty_collections_to_null(b)
    return n.select(
        "o_orderkey",
        "high_parts",
        F.when(F.col("high_parts").isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("was_empty"),
    )


@query(
    "q_sanitize_names",
    oracle="""
    SELECT event_id AS "event_id",
           event_type AS "raw_event_type",
           user_id AS "user_ref_id"
    FROM events WHERE event_id % 10 = 0
    """,
    description="Column-name sanitization (P3, the reference's "
    "Redshift-safe rename rule: lowercase; dot/dash/dollar/space -> "
    "underscore): vendor-style dirty names ('Raw.Event-Type', "
    "'User Ref$Id') sanitize to the oracle's column list — the "
    "driver's schema compare IS the assertion.",
    refs=("P3",),
)
def q_sanitize_names(spark, sf_dir):
    from lakeflow.operators.flatten import sanitize_columns

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 10 == 0)
    dirty = ev.select(
        F.col("event_id").alias("Event_ID"),
        F.col("event_type").alias("Raw.Event-Type"),
        F.col("user_id").alias("User Ref$Id"),
    )
    return sanitize_columns(dirty)


@query(
    "q_flatten_collision",
    oracle="""
    SELECT event_id,
           event_type AS payload_event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           user_id AS ctx_user_id
    FROM events WHERE event_id % 25 = 0
    """,
    description="Collision-safe struct flatten (N1, the reference's "
    "json_normalize rule): leaf paths keep their bare name unless "
    "taken — 'event_type' and 'user_id' collide with top-level "
    "columns, so they flatten to '{field}_{path}' while 'k' stays "
    "bare; the driver's schema compare asserts the naming rule and "
    "the values ride along.",
    refs=("N1", "N2", "J1"),
)
def q_flatten_collision(spark, sf_dir):
    from lakeflow.operators.flatten import flatten

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 25 == 0)
    nested = ev.select(
        "event_id",
        "event_type",
        "user_id",
        F.struct(
            F.col("event_type"),
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        ).alias("payload"),
        F.struct(F.col("user_id")).alias("ctx"),
    )
    flat = flatten(nested, ["payload", "ctx"])
    return flat.select("event_id", "payload_event_type", "k", "ctx_user_id")
