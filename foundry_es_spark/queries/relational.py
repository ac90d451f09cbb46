"""Relational query surface Q1–Q18 (SURVEY.md §2.4).

Declarative DataFrame plans throughout — Catalyst provides pushdown,
pruning, join selection (broadcast hints only where the dim side is
provably small), partial aggregation, and AQE re-planning. Aggregates over
doubles are rounded on BOTH sides to absorb summation-order FP noise.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import Window as W

from foundry_es_spark.queries.common import table


# --------------------------------------------------------------------- Q1

def q1_scan_filter(spark, sf):
    li = table(spark, sf, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice", "l_shipdate")
        .where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-04-01")
            & (F.col("l_quantity") > 30)
        )
    )


Q1_SQL = """
SELECT l_orderkey, l_linenumber, l_extendedprice, l_shipdate
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  AND l_quantity > 30
"""

# --------------------------------------------------------------------- Q2

def q2_join_orders_customer(spark, sf):
    o = table(spark, sf, "orders")
    c = table(spark, sf, "customer")
    # no forced broadcast hint: customer is small at bench SF but grows
    # linearly with scale — AQE + autoBroadcastJoinThreshold pick broadcast
    # when (and only when) the dim actually fits (VERDICT r1 item 8)
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .where(F.col("o_totalprice") > 100000)
        .select("o_orderkey", "c_name", "c_mktsegment", "o_totalprice")
    )


Q2_SQL = """
SELECT o_orderkey, c_name, c_mktsegment, o_totalprice
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_totalprice > 100000
"""

# --------------------------------------------------------------------- Q3

def q3_multiway_join_revenue(spark, sf):
    li = table(spark, sf, "lineitem")
    o = table(spark, sf, "orders")
    c = table(spark, sf, "customer")
    n = table(spark, sf, "nation")
    r = table(spark, sf, "region")
    # nation/region are constant-size (25/5 rows) → hint is always safe;
    # customer scales with SF → size-based selection (AQE) decides
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


Q3_SQL = """
SELECT n_name, r_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY n_name, r_name
"""

# --------------------------------------------------------------------- Q4

def q4_anti_semi_join(spark, sf):
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders")
    no_orders = c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", F.lit("none").alias("status")
    )
    with_urgent = (
        c.join(
            o.where(F.col("o_orderpriority") == "1-URGENT"),
            c.c_custkey == o.o_custkey,
            "left_semi",
        ).select("c_custkey", "c_name", F.lit("urgent").alias("status"))
    )
    return no_orders.unionByName(with_urgent)


Q4_SQL = """
SELECT c_custkey, c_name, 'none' AS status
FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
UNION ALL
SELECT c_custkey, c_name, 'urgent' AS status
FROM customer WHERE EXISTS (
  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
"""

# --------------------------------------------------------------------- Q5

def q5_range_self_join(spark, sf):
    e = table(spark, sf, "events")
    e1 = e.select(
        F.col("event_id").alias("eid1"), F.col("user_id"), F.col("ts").alias("ts1")
    )
    e2 = e.select(
        F.col("event_id").alias("eid2"), F.col("user_id"), F.col("ts").alias("ts2")
    )
    # equi key (user_id) + range predicate → hash join with residual filter,
    # not a nested-loop over the cross product
    pairs = e1.join(e2, "user_id").where(
        (F.col("ts2") > F.col("ts1"))
        & (F.col("ts2") <= F.col("ts1") + F.expr("INTERVAL 5 MINUTES"))
    )
    return pairs.groupBy("user_id").agg(F.count("*").alias("n_pairs"))


Q5_SQL = """
SELECT e1.user_id, count(*) AS n_pairs
FROM events e1 JOIN events e2
  ON e1.user_id = e2.user_id
 AND e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL 5 MINUTE
GROUP BY e1.user_id
"""

# --------------------------------------------------------------------- Q6

def q6_asof_latest_per_user(spark, sf):
    e = table(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type", "value")
    )


Q6_SQL = """
SELECT user_id, event_id, ts, event_type, value
FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
      FROM events) WHERE rn = 1
"""

# --------------------------------------------------------------------- Q7

def q7_tpch_q1_agg(spark, sf):
    li = table(spark, sf, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


Q7_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""

# --------------------------------------------------------------------- Q8

def q8_distinct_counts(spark, sf):
    e = table(spark, sf, "events")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


Q8_SQL = """
SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
FROM events GROUP BY event_type
"""


def q8b_approx_distinct(spark, sf):
    """approx_count_distinct — algorithm-specific, rows-only check."""
    e = table(spark, sf, "events")
    return e.agg(F.approx_count_distinct("user_id").alias("approx_users"))


# --------------------------------------------------------------------- Q9

def q9_rollup_revenue(spark, sf):
    o = table(spark, sf, "orders")
    c = table(spark, sf, "customer")
    n = table(spark, sf, "nation")
    # customer unhinted (scales with SF — AQE sizes it); nation is 25 rows
    joined = o.join(c, o.o_custkey == c.c_custkey).join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    )
    return (
        joined.withColumn("order_year", F.year("o_orderdate").cast("bigint"))
        .rollup("n_name", "order_year")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )


Q9_SQL = """
SELECT n_name, order_year, round(sum(o_totalprice), 2) AS revenue
FROM (SELECT n_name, year(o_orderdate) AS order_year, o_totalprice
      FROM orders JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey)
GROUP BY ROLLUP (n_name, order_year)
"""

# -------------------------------------------------------------------- Q10

def q10_topk_per_group(spark, sf):
    o = table(spark, sf, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", F.col("rnk").cast("bigint").alias("rnk"))
    )


Q10_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rnk
FROM (SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) rnk
      FROM orders) WHERE rnk <= 3
"""

# -------------------------------------------------------------------- Q11

def q11_running_window(spark, sf):
    o = table(spark, sf, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, 0)), 2
        ).alias("running_total"),
        F.lag("o_totalprice", 1).over(w).alias("prev_price"),
        F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
    )


Q11_SQL = """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER w, 2) AS running_total,
       lag(o_totalprice, 1) OVER w AS prev_price,
       round(first_value(o_totalprice) OVER w, 2) AS first_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""

# -------------------------------------------------------------------- Q12

def q12_global_topk(spark, sf):
    o = table(spark, sf, "orders")
    # TakeOrderedAndProject: no global sort materialization
    return o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")).limit(20).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


Q12_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
"""

# -------------------------------------------------------------------- Q13

def q13_set_ops(spark, sf):
    e = table(spark, sf, "events")
    purchasers = e.where(F.col("event_type") == "purchase").select("user_id").distinct()
    errorers = e.where(F.col("event_type") == "error").select("user_id").distinct()
    both = purchasers.intersect(errorers).withColumn("cohort", F.lit("both"))
    only_buy = purchasers.exceptAll(errorers).withColumn("cohort", F.lit("purchase_only"))
    return both.unionByName(only_buy)


Q13_SQL = """
WITH p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
     e AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
SELECT user_id, 'both' AS cohort FROM (SELECT user_id FROM p INTERSECT SELECT user_id FROM e)
UNION ALL
SELECT user_id, 'purchase_only' AS cohort FROM (SELECT user_id FROM p EXCEPT SELECT user_id FROM e)
"""

# -------------------------------------------------------------------- Q14

def q14_string_functions(spark, sf):
    p = table(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.upper(F.col("p_brand")).alias("brand_upper"),
        F.trim(F.col("p_name")).alias("name_trim"),
        F.substring("p_name", 1, 5).alias("name_pfx"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.regexp_replace("p_type", r"\s+", "_").alias("type_slug"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.size(F.split(F.col("p_name"), " ")).cast("bigint").alias("n_name_words"),
    )


Q14_SQL = """
SELECT p_partkey,
       upper(p_brand) AS brand_upper,
       trim(p_name) AS name_trim,
       substring(p_name, 1, 5) AS name_pfx,
       length(p_name) AS name_len,
       regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
       regexp_replace(p_type, '\\s+', '_', 'g') AS type_slug,
       concat_ws('|', p_brand, p_type) AS brand_type,
       len(string_split(p_name, ' ')) AS n_name_words
FROM part
"""

# -------------------------------------------------------------------- Q15

def q15_date_functions(spark, sf):
    o = table(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.month("o_orderdate").cast("bigint").alias("mo"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("dom"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.lit("1998-12-31").cast("date"), F.col("o_orderdate").cast("date")).cast("bigint").alias(
            "days_to_eoy"
        ),
        # string form: DATE round-trips differently through Arrow/pandas in
        # the two engines; the calendar value is what's being checked
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("odate"),
    )


Q15_SQL = """
SELECT o_orderkey,
       year(o_orderdate) AS yr,
       month(o_orderdate) AS mo,
       day(o_orderdate) AS dom,
       date_trunc('month', o_orderdate) AS month_start,
       date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS days_to_eoy,
       strftime(o_orderdate, '%Y-%m-%d') AS odate
FROM orders
"""

# -------------------------------------------------------------------- Q16

def q16_math_functions(spark, sf):
    p = table(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.round(F.col("p_retailprice") * 1.1, 2).alias("price_up"),
        F.abs(F.col("p_retailprice") - 1000).alias("dist_1000"),
        F.ceil("p_retailprice").alias("price_ceil"),
        F.floor("p_retailprice").alias("price_floor"),
        F.round(F.pow(F.col("p_size"), 2), 1).alias("size_sq"),
        F.pmod(F.col("p_partkey"), F.lit(7)).cast("bigint").alias("key_mod7"),
        F.round(F.sqrt(F.col("p_retailprice")), 4).alias("price_sqrt"),
    )


Q16_SQL = """
SELECT p_partkey,
       round(p_retailprice * 1.1, 2) AS price_up,
       abs(p_retailprice - 1000) AS dist_1000,
       CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
       CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
       round(pow(p_size, 2), 1) AS size_sq,
       CAST(p_partkey % 7 AS BIGINT) AS key_mod7,
       round(sqrt(p_retailprice), 4) AS price_sqrt
FROM part
"""

# -------------------------------------------------------------------- Q17

def q17_array_functions(spark, sf):
    e = table(spark, sf, "embeddings")
    emb_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        F.round(
            F.sqrt(F.aggregate(emb_d, F.lit(0.0), lambda acc, x: acc + x * x)), 4
        ).alias("l2_norm"),
        F.round(F.element_at(F.sort_array(emb_d, asc=False), 1), 4).alias("max_val"),
        F.round(F.aggregate(emb_d, F.lit(0.0), lambda a, x: a + x) / F.size("embedding"), 4).alias(
            "mean_val"
        ),
        F.round(F.element_at(emb_d, 1), 4).alias("first_val"),
    )


Q17_SQL = """
SELECT vec_id,
       len(embedding) AS dim,
       round(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))), 4) AS l2_norm,
       round(CAST(list_max(embedding) AS DOUBLE), 4) AS max_val,
       round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))) / len(embedding), 4) AS mean_val,
       round(CAST(embedding[1] AS DOUBLE), 4) AS first_val
FROM embeddings
"""

# -------------------------------------------------------------------- Q18

def q18_json_functions(spark, sf):
    e = table(spark, sf, "events")
    return (
        e.withColumn("k", F.get_json_object("props", "$.k").cast("bigint"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )


Q18_SQL = """
SELECT event_type,
       count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY event_type
"""


# -------------------------------------------------------------------- Q26+
# Surface extensions beyond the §2.4 core: pivot, exact percentiles,
# correlated EXISTS, lag/lead/ntile windows, CUBE grouping sets. Each has
# a DuckDB oracle twin; value columns are rounded on both sides so the
# driver's value-hash is FP-stable.

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]  # testdata enum


def q26_pivot_events(spark, sf):
    """Pivot: per user-cohort revenue by event type. Explicit pivot values
    keep the output column ORDER deterministic (Spark would otherwise sort
    discovered values — same set, but discovery costs a job)."""
    e = table(spark, sf, "events")
    return (
        e.withColumn("cohort", F.pmod(F.col("user_id"), F.lit(10)).cast("bigint"))
        .groupBy("cohort")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.round(F.sum("value"), 2))
    )


Q26_SQL = """
SELECT CAST(user_id % 10 AS BIGINT) AS cohort,
       round(sum(value) FILTER (event_type = 'click'), 2) AS click,
       round(sum(value) FILTER (event_type = 'error'), 2) AS error,
       round(sum(value) FILTER (event_type = 'purchase'), 2) AS purchase,
       round(sum(value) FILTER (event_type = 'signup'), 2) AS signup,
       round(sum(value) FILTER (event_type = 'view'), 2) AS view
FROM events GROUP BY 1
"""


def q27_percentiles(spark, sf):
    """Exact discrete (nearest-rank) percentiles per return flag: the value
    at row ceil(p*n) of the per-group sort. Discrete quantiles return an
    actual data element, so the oracle compares raw values — interpolated
    (continuous) percentiles differ by 1 ulp between engines and flip the
    cent under rounding. Window-sort formulation keeps it distributed; at
    data-lake scale the one-pass sketch (`approx_percentile`, q8b family)
    is the production path and this is its exact-oracle twin."""
    li = table(spark, sf, "lineitem")
    wv = W.partitionBy("l_returnflag").orderBy("l_extendedprice")
    wn = W.partitionBy("l_returnflag")
    ranked = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.row_number().over(wv).alias("rk"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )

    def at(p, name):
        hit = F.when(
            F.col("rk") == F.ceil(F.col("n") * F.lit(p)).cast("bigint"),
            F.col("l_extendedprice"),
        )
        return F.max(hit).alias(name)

    return ranked.groupBy("l_returnflag").agg(
        at(0.5, "p50"), at(0.9, "p90"), at(0.99, "p99")
    )


Q27_SQL = """
WITH ranked AS (
  SELECT l_returnflag, l_extendedprice,
         row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rk,
         count(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem)
SELECT l_returnflag,
       max(CASE WHEN rk = CAST(ceil(n * 0.5) AS BIGINT) THEN l_extendedprice END) AS p50,
       max(CASE WHEN rk = CAST(ceil(n * 0.9) AS BIGINT) THEN l_extendedprice END) AS p90,
       max(CASE WHEN rk = CAST(ceil(n * 0.99) AS BIGINT) THEN l_extendedprice END) AS p99
FROM ranked GROUP BY l_returnflag
"""


def q28_exists_subquery(spark, sf):
    """Correlated EXISTS — planned by Catalyst as a semi join, but exercised
    through the SQL subquery surface (distinct from q4's explicit
    left_semi)."""
    table(spark, sf, "customer").createOrReplaceTempView("v_customer")
    table(spark, sf, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM v_customer c
        WHERE EXISTS (SELECT 1 FROM v_orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000)
        """
    )


Q28_SQL = """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
"""


def q29_lag_lead(spark, sf):
    """lag/lead/ntile window trio per user ordered by time (event_id as the
    unique tie-break so the frame is total-ordered and hash-stable)."""
    from pyspark.sql.window import Window

    e = table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        F.round(F.lag("value", 1).over(w), 3).alias("prev_value"),
        F.round(F.lead("value", 1).over(w), 3).alias("next_value"),
        F.ntile(4).over(w).alias("quartile"),
    )


Q29_SQL = """
SELECT user_id, event_id,
       round(lag(value, 1) OVER w, 3) AS prev_value,
       round(lead(value, 1) OVER w, 3) AS next_value,
       ntile(4) OVER w AS quartile
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q30_cube_orders(spark, sf):
    """CUBE grouping sets over (priority, order year): all 4 grouping
    combinations in one pass (q9 covers ROLLUP's prefix subset)."""
    o = table(spark, sf, "orders")
    return (
        o.withColumn("order_year", F.year("o_orderdate").cast("bigint"))
        .cube("o_orderpriority", "order_year")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


Q30_SQL = """
SELECT o_orderpriority, order_year, count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS revenue
FROM (SELECT o_orderpriority, year(o_orderdate) AS order_year, o_totalprice
      FROM orders)
GROUP BY CUBE (o_orderpriority, order_year)
"""


# --------------------------------------------------------------------- Q31

def q31_scd2_history(spark, sf):
    """SCD Type-2 dimension build from the change stream — THE classic CDC
    query shape (reference pipeline's ingest→enhance keeps only latest
    state; the history table is what a consumer builds from the same feed).
    Per user_id: suppress consecutive no-op states (event_type unchanged —
    mirrors the C3 operator), then derive validity intervals.

    Two windows over the SAME (user_id × order) partitioning — one
    Exchange + one sort serve the lag, lead, and row_number; everything
    else is a narrow filter. ``event_id`` breaks ts ties so the history is
    deterministic under any partitioning.
    """
    ev = table(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    kept = (
        ev.select("user_id", "event_type", "ts", "event_id")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
    )
    w2 = W.partitionBy("user_id").orderBy("valid_from", "event_id")
    return (
        kept.select("user_id", "event_type", F.col("ts").alias("valid_from"), "event_id")
        .withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("scd_version", F.row_number().over(w2).cast("bigint"))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("event_id")
    )


Q31_SQL = """
WITH ch AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
),
kept AS (
  SELECT user_id, event_type, ts AS valid_from, event_id
  FROM ch WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id, event_type, valid_from,
       lead(valid_from) OVER w AS valid_to,
       row_number() OVER w AS scd_version,
       lead(valid_from) OVER w IS NULL AS is_current
FROM kept
WINDOW w AS (PARTITION BY user_id ORDER BY valid_from, event_id)
"""

# --------------------------------------------------------------------- Q32

def q32_range_frame_window(spark, sf):
    """RANGE-frame window: per customer, trailing-30-day revenue at each
    order (frame = value range over the date, NOT row count — peers with
    the same date all join the frame, so the result is tie-insensitive).
    Spark range frames need a numeric sort key: days since epoch, so the
    (-29, 0) frame is exactly DuckDB's INTERVAL 29 DAY PRECEDING."""
    o = table(spark, sf, "orders")
    day = F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01"))
    w = W.partitionBy("o_custkey").orderBy(day).rangeBetween(-29, 0)
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(w), 2).alias("revenue_30d"),
    )


Q32_SQL = """
SELECT o_orderkey, o_custkey, o_orderdate,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
         RANGE BETWEEN INTERVAL 29 DAY PRECEDING AND CURRENT ROW), 2) AS revenue_30d
FROM orders
"""

# --------------------------------------------------------------------- Q33

def q33_scalar_subquery(spark, sf):
    """Scalar-subquery filter: customers with more orders than the global
    per-customer average. The scalar side is a 1-row aggregate —
    broadcast-joined (hinted: provably 1 row at any scale), so the plan is
    one shuffle for the groupBy and zero for the comparison. Counts are
    exact ints and their double average is computed identically on both
    engines, so the boundary cannot flip (no FP-noise hash risk)."""
    o = table(spark, sf, "orders")
    per_cust = o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    avg_cnt = per_cust.agg(F.avg("n_orders").alias("avg_orders"))
    return (
        per_cust.join(F.broadcast(avg_cnt))
        .where(F.col("n_orders") > F.col("avg_orders"))
        .select("c_custkey", "n_orders")
    )


Q33_SQL = """
SELECT o_custkey AS c_custkey, count(*) AS n_orders
FROM orders GROUP BY o_custkey
HAVING count(*) > (
  SELECT avg(cnt) FROM (SELECT count(*) AS cnt FROM orders GROUP BY o_custkey)
)
"""


def q41_asof_join(spark, sf):
    """Two-table AS-OF join — each event matched to the customer's latest
    order at or before the event's day (the canonical point-in-time
    enrichment: trades×quotes, events×prices, facts×SCD snapshots). Spark
    has no native ASOF; the oracle is DuckDB's native ``ASOF LEFT JOIN``,
    so two entirely different algorithms must agree row for row.

    Plan — the scalable union+window technique, NOT a range join: tag both
    sides, union them, and take ``last(order_cols, ignorenulls=True)``
    over (key ORDER BY day, side) with side ordering orders before events
    on equal days (inclusive >=). ONE exchange on the key, rows stay
    LINEAR (|L|+|R|). The naive equi-join + date filter + max-window plan
    materializes every (event, earlier-order) pair first — O(|L|·|R|) per
    key, quadratic on a hot key at 100 TB; a broadcast-range join has the
    same blowup. Orders are pre-deduped to one row per (custkey, day) —
    max o_orderkey wins — which both makes ASOF ties well-defined
    cross-engine and bounds the window state.

    Event days are folded deterministically onto the order-date domain
    (sf events span one month, orders six years) so matches actually
    interleave and the equal-day boundary is exercised, identically in
    both engines."""
    ev = table(spark, sf, "events").select(
        "event_id",
        F.col("user_id"),
        F.expr(
            "date_add(DATE'1995-01-01', CAST(day(ts) * 73 AS INT))"
        ).alias("t"),
        F.lit(1).alias("side"),
        F.lit(None).cast("bigint").alias("ok"),
        F.lit(None).cast("double").alias("tp"),
    )
    od = (
        table(spark, sf, "orders")
        .groupBy(
            F.col("o_custkey").alias("user_id"),
            F.to_date("o_orderdate").alias("t"),
        )
        .agg(
            F.max("o_orderkey").alias("ok"),
            F.max_by("o_totalprice", "o_orderkey").alias("tp"),
        )
        .select(
            F.lit(None).cast("bigint").alias("event_id"),
            "user_id", "t", F.lit(0).alias("side"), "ok", "tp",
        )
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("t", "side")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    u = ev.unionByName(od)
    return (
        u.select(
            "event_id", "user_id", "side",
            # surface convention: dates cross the oracle hash as strings
            F.date_format("t", "yyyy-MM-dd").alias("asof_day"),
            F.last("ok", ignorenulls=True).over(w).alias("o_orderkey"),
            F.round(F.last("tp", ignorenulls=True).over(w), 2).alias("o_totalprice_r"),
        )
        .where(F.col("side") == 1)
        .drop("side")
    )


Q41_SQL = """
WITH e AS (
  SELECT event_id, user_id,
         CAST(DATE '1995-01-01' + INTERVAL (datepart('day', ts) * 73) DAY AS DATE) AS asof_day
  FROM events
),
o AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
         max(o_orderkey) AS o_orderkey,
         max_by(o_totalprice, o_orderkey) AS o_totalprice
  FROM orders GROUP BY o_custkey, CAST(o_orderdate AS DATE)
)
SELECT e.event_id, e.user_id, strftime(e.asof_day, '%Y-%m-%d') AS asof_day,
       o.o_orderkey, round(o.o_totalprice, 2) AS o_totalprice_r
FROM e ASOF LEFT JOIN o
  ON e.user_id = o.o_custkey AND e.asof_day >= o.d
"""


# -------------------------------------------------------------------- Q42

def q42_temporal_snapshot(spark, sf, as_of: str = "2024-01-15 00:00:00"):
    """Point-in-time snapshot from an append-only change feed — "what was
    every user's state AS OF time T" (the temporal-table query a CDC
    consumer runs against the raw event log when the materialized table
    only holds latest state; complements q6's latest-overall and q31's
    full SCD2 history with the third temporal primitive: state at a fixed
    instant).

    Plan: the ``ts <= T`` predicate is applied BEFORE the per-key window,
    so it pushes to the parquet scan (row groups entirely after T are
    pruned via footer min/max — at 100 TB on a time-partitioned log this
    is partition pruning and the window only ever sees the prefix); one
    exchange on user_id for the row_number. The same shape back-tests any
    historical instant without a second copy of the data.
    """
    e = table(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.where(F.col("ts") <= F.lit(as_of).cast("timestamp"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(F.sum("value"), 2).alias("sum_value_r"),
            F.max("ts").alias("latest_ts"),
        )
    )


Q42_SQL = """
SELECT event_type, count(*) AS n_users,
       round(sum(value), 2) AS sum_value_r,
       max(ts) AS latest_ts
FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) rn
      FROM events WHERE ts <= TIMESTAMP '2024-01-15 00:00:00')
WHERE rn = 1 GROUP BY event_type
"""


QUERIES = {
    "q1_scan_filter": q1_scan_filter,
    "q2_join_orders_customer": q2_join_orders_customer,
    "q3_multiway_join_revenue": q3_multiway_join_revenue,
    "q4_anti_semi_join": q4_anti_semi_join,
    "q5_range_self_join": q5_range_self_join,
    "q6_asof_latest_per_user": q6_asof_latest_per_user,
    "q7_tpch_q1_agg": q7_tpch_q1_agg,
    "q8_distinct_counts": q8_distinct_counts,
    "q8b_approx_distinct": q8b_approx_distinct,
    "q9_rollup_revenue": q9_rollup_revenue,
    "q10_topk_per_group": q10_topk_per_group,
    "q11_running_window": q11_running_window,
    "q12_global_topk": q12_global_topk,
    "q13_set_ops": q13_set_ops,
    "q14_string_functions": q14_string_functions,
    "q15_date_functions": q15_date_functions,
    "q16_math_functions": q16_math_functions,
    "q17_array_functions": q17_array_functions,
    "q18_json_functions": q18_json_functions,
    "q26_pivot_events": q26_pivot_events,
    "q27_percentiles": q27_percentiles,
    "q28_exists_subquery": q28_exists_subquery,
    "q29_lag_lead": q29_lag_lead,
    "q30_cube_orders": q30_cube_orders,
    "q31_scd2_history": q31_scd2_history,
    "q32_range_frame_window": q32_range_frame_window,
    "q33_scalar_subquery": q33_scalar_subquery,
    "q41_asof_join": q41_asof_join,
    "q42_temporal_snapshot": q42_temporal_snapshot,
}

ORACLES = {
    "q1_scan_filter": Q1_SQL,
    "q2_join_orders_customer": Q2_SQL,
    "q3_multiway_join_revenue": Q3_SQL,
    "q4_anti_semi_join": Q4_SQL,
    "q5_range_self_join": Q5_SQL,
    "q6_asof_latest_per_user": Q6_SQL,
    "q7_tpch_q1_agg": Q7_SQL,
    "q8_distinct_counts": Q8_SQL,
    # q8b approx: rows-only by design
    "q9_rollup_revenue": Q9_SQL,
    "q10_topk_per_group": Q10_SQL,
    "q11_running_window": Q11_SQL,
    "q12_global_topk": Q12_SQL,
    "q13_set_ops": Q13_SQL,
    "q14_string_functions": Q14_SQL,
    "q15_date_functions": Q15_SQL,
    "q16_math_functions": Q16_SQL,
    "q17_array_functions": Q17_SQL,
    "q18_json_functions": Q18_SQL,
    "q26_pivot_events": Q26_SQL,
    "q27_percentiles": Q27_SQL,
    "q28_exists_subquery": Q28_SQL,
    "q29_lag_lead": Q29_SQL,
    "q30_cube_orders": Q30_SQL,
    "q31_scd2_history": Q31_SQL,
    "q32_range_frame_window": Q32_SQL,
    "q33_scalar_subquery": Q33_SQL,
    "q41_asof_join": Q41_SQL,
    "q42_temporal_snapshot": Q42_SQL,
}
