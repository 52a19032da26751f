"""Declared correctness queries Q1-Q10 (SURVEY.md §2.4).

Each isolates one dataflow primitive the reference algorithm is composed
of (SURVEY.md §2.2) as an idiomatic DataFrame program, paired with the
ANSI-SQL oracle DuckDB runs on the same parquet. Column names are
aliased identically on both sides (the driver's compare is hash-based
after sorting columns by name).

Every query reads only the columns it needs (column pruning reaches the
parquet scan) and expresses filters declaratively (predicate pushdown).
Joins against the small dimension tables are left to Catalyst's
broadcast selection — nation/region/customer are far below the
autoBroadcastJoinThreshold at every SF.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_nnd_spark.sources import load_table


def q1_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter + project (A2): pushed-down predicate, pruned columns."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_quantity") > 30)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    )


def q2_group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy count (A3): partial+final hash aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(F.count("*").alias("c")).orderBy("l_returnflag")


def q3_reduce_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """reduceByKey-style associative aggregation (A7)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("s"), F.max("l_extendedprice").alias("m"))
        .orderBy("l_orderkey")
    )


def q4_group_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-K window (A7/A11): the engine's core primitive."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


def q5_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer equi-join (A14: result join-back)."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .select("c_custkey", "o_orderkey")
        .orderBy(F.col("c_custkey"), F.col("o_orderkey").asc_nulls_first())
    )


def q6_inner_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join + aggregation; nation broadcasts."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("c"))
        .orderBy("n_name")
    )


def q7_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (A6/A7 in-group dedup, globalized). Note: the corpus
    lineitem has no l_shipmode column; l_linestatus plays its role."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_linestatus").distinct().orderBy("l_linestatus")


def q8_union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union + dedup (A10 adjacency assembly shape)."""
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    return s.union(c).distinct().orderBy("k")


def q9_regroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expand → regroup with HAVING (A8 reverse-edge derivation shape)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= 2)
        .orderBy("o_custkey")
    )


def q10_dedup_preference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-with-preference (A11 B-preferred candidate dedup)."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.select("c_nationkey", "c_custkey", "c_acctbal")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .orderBy("c_nationkey")
    )


def q45_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: one wide scan, filter pushed to
    parquet, grouped DECIMAL aggregation (exact, order-independent —
    float sums would hash differently between engines). The canonical
    'scan 100 TB, return 4 rows' query: shuffle is O(groups)."""
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    one = F.lit(1).cast("decimal(18,2)")
    disc_price = (dec("l_extendedprice") * (one - dec("l_discount"))).cast("decimal(18,4)")
    charge = (disc_price * (one + dec("l_tax"))).cast("decimal(18,6)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-06-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("string").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("string").alias("sum_base_price"),
            F.sum(disc_price).cast("string").alias("sum_disc_price"),
            F.sum(charge).cast("string").alias("sum_charge"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q46_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped shipping-priority top-k: customer filter →
    3-table join → grouped revenue → global top-20. Catalyst broadcasts
    the filtered customer side under the threshold; orders⋈lineitem
    stays a shuffled hash join on the fact keys — the right shape at
    100 TB. Revenue in DECIMAL; top-k ordered on the unrounded value."""
    cut = F.lit("1998-06-01").cast("timestamp")
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cut).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cut).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    one = F.lit(1).cast("decimal(18,2)")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (one - F.col("l_discount").cast("decimal(18,2)"))
    ).cast("decimal(18,4)")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).alias("rev"))
        .orderBy(F.desc("rev"), "l_orderkey")
        .limit(20)
        .select(
            "l_orderkey",
            F.col("rev").cast("string").alias("revenue"),
            # NTZ → TIMESTAMP (session tz is pinned UTC) → epoch seconds
            F.col("o_orderdate").cast("timestamp").cast("long").alias("o_orderdate_epoch"),
            "o_orderpriority",
        )
    )


def q47_sliding_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-frame window (ROWS 3 PRECEDING): per-user moving average
    over event time. The frame order is total (ts, event_id), so the
    ≤4-term float sum is evaluated in the same sequence by any engine —
    bitwise-stable without DECIMAL."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    return (
        ev.select(
            "user_id",
            "event_id",
            F.round(F.avg("value").over(w), 6).alias("sliding_avg"),
        )
        .orderBy("user_id", "event_id")
    )


def q52_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key skew join via explicit salting (operators/relational
    .salted_join): orders (fact, salted on o_orderkey) ⋈ customer (dim,
    replicated n_salts×) on custkey, aggregated per nation. The oracle
    is the PLAIN join — salting must be invisible in the result."""
    from spark_nnd_spark.operators.relational import salted_join

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_orderkey", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_nationkey"
    )
    return (
        salted_join(o, c, key="custkey", salt_src="o_orderkey", n_salts=8)
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("string").alias("total"),
        )
        .orderBy("c_nationkey")
    )


def q53_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE(status, priority): all four grouping sets in ONE pass with
    map-side partials (Catalyst expands the sets before the exchange,
    so the shuffle carries |groups|·4 partial rows, not the fact
    table). grouping() flags disambiguate real NULLs from subtotal
    rows, exactly as in ROLLUP q41."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("c"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("string").alias("total"),
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_prio"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("o_orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("o_orderpriority"),
            "g_status",
            "g_prio",
            "c",
            "total",
        )
        .orderBy("g_status", "g_prio", "o_orderstatus", "o_orderpriority")
    )


def q54_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi + left-anti joins — existence tests that never
    materialize the probe side's payload. Both probe orders with only
    o_custkey projected; Catalyst broadcasts the distinct key set at
    low SF and falls back to a shuffled semi-join at scale. The oracle
    states the same thing as EXISTS / NOT EXISTS."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    with_orders = c.join(o, c.c_custkey == o.o_custkey, "left_semi").withColumn(
        "status", F.lit("with_orders")
    )
    no_orders = c.join(o, c.c_custkey == o.o_custkey, "left_anti").withColumn(
        "status", F.lit("no_orders")
    )
    return with_orders.unionByName(no_orders).orderBy("c_custkey")


def q55_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT: nation keys with customers vs suppliers,
    tagged by which side(s) they appear on. Both set ops plan as
    hash aggregates over a union — no sort. The distinct inputs are
    tiny after pruning to the single key column."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    both = c.intersect(s).withColumn("side", F.lit("both"))
    cust_only = c.subtract(s).withColumn("side", F.lit("customer_only"))  # EXCEPT DISTINCT
    supp_only = s.subtract(c).withColumn("side", F.lit("supplier_only"))
    return both.unionByName(cust_only).unionByName(supp_only).orderBy("side", "k")


def q56_window_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions — ntile/percent_rank/cume_dist
    over account balance per nation: one exchange on c_nationkey, one
    sort, three frame-free rank functions evaluated in the same pass.
    The total order (acctbal DESC, custkey) leaves no peer rows, so
    cume_dist is deterministic across engines.

    percent_rank/cume_dist are small-denominator rationals ((rank-1)/
    (n-1), rank/n) that can land EXACTLY on a half at the 6th decimal
    (333/640 = 0.5203125 did, at sf0.1) — where Spark's round (half-up)
    and DuckDB's (half-to-even) disagree. Both sides therefore use an
    explicit floor(x*1e6 + 0.5)/1e6: the identical double arithmetic in
    either engine, so the compare is tie-proof."""
    from spark_nnd_spark.functions.numeric import round_half_up_expr as r6

    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), "c_custkey")
    return (
        c.select(
            "c_nationkey",
            "c_custkey",
            F.round("c_acctbal", 6).alias("acctbal"),
            F.ntile(4).over(w).cast("long").alias("quartile"),
            r6(F.percent_rank().over(w)).alias("pct_rank"),
            r6(F.cume_dist().over(w)).alias("cume"),
        )
        .orderBy("c_nationkey", F.desc("acctbal"), "c_custkey")
    )


def q57_above_cust_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders above their customer's average — the correlated-subquery
    shape, planned as aggregate + equi-join re-attachment (one shuffle
    on o_custkey, map-side partial average) instead of a per-row
    subquery. The oracle states it as a window AVG; same semantics."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    avgs = o.groupBy("o_custkey").agg(F.avg("o_totalprice").alias("cust_avg"))
    return (
        o.join(avgs, "o_custkey")
        .filter(F.col("o_totalprice") > F.col("cust_avg"))
        .select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 6).alias("o_totalprice"),
            F.round("cust_avg", 6).alias("cust_avg"),
        )
        .orderBy("o_orderkey")
    )


def q62_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 5-table join: revenue by nation where the
    supplier and customer share the nation. Catalyst orders the join
    tree and broadcasts nation/supplier/customer under the threshold;
    orders⋈lineitem stays the shuffled backbone — at 100 TB only the
    two fact tables ever exchange."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    one = F.lit(1).cast("decimal(18,2)")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (one - F.col("l_discount").cast("decimal(18,2)"))
    ).cast("decimal(18,4)")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(rev).cast("string").alias("revenue"),
        )
        .orderBy("n_name")
    )


def q63_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two aggregates — per-nation customer and
    supplier counts, keeping nations present on either side only.
    Exercises null-producing join semantics on both sides at once."""
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count("*").alias("n_cust"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count("*").alias("n_supp"))
    )
    return (
        c.join(s, "k", "full_outer")
        .select(
            "k",
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
        .orderBy("k")
    )


def q118_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shaped 4-table join: top-20 customers by revenue lost
    to returned items. The two fact tables (orders⋈lineitem) are the
    shuffled backbone; customer/nation broadcast; the returnflag filter
    pushes into the lineitem scan; the top-20 is a TakeOrdered, never a
    global sort."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    one = F.lit(1).cast("decimal(18,2)")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (one - F.col("l_discount").cast("decimal(18,2)"))
    ).cast("decimal(18,4)")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "n_name")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(rev).alias("rev_d"),
        )
        .orderBy(F.desc("rev_d"), F.asc("c_custkey"))
        .limit(20)
        .select("c_custkey", "n_name", "n_items", F.col("rev_d").cast("string").alias("revenue"))
    )


RELATIONAL_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q1_filter_project": q1_filter_project,
    "q2_group_count": q2_group_count,
    "q3_reduce_agg": q3_reduce_agg,
    "q4_group_topk": q4_group_topk,
    "q5_left_join": q5_left_join,
    "q6_inner_join_agg": q6_inner_join_agg,
    "q7_distinct": q7_distinct,
    "q8_union_dedup": q8_union_dedup,
    "q9_regroup": q9_regroup,
    "q10_dedup_preference": q10_dedup_preference,
    "q45_pricing_summary": q45_pricing_summary,
    "q46_ship_priority": q46_ship_priority,
    "q47_sliding_avg": q47_sliding_avg,
    "q52_salted_join": q52_salted_join,
    "q53_cube_counts": q53_cube_counts,
    "q54_semi_anti": q54_semi_anti,
    "q55_set_ops": q55_set_ops,
    "q56_window_ranks": q56_window_ranks,
    "q57_above_cust_avg": q57_above_cust_avg,
    "q62_nation_volume": q62_nation_volume,
    "q63_full_outer": q63_full_outer,
    "q118_returned_revenue": q118_returned_revenue,
}

RELATIONAL_ORACLES: dict[str, str] = {
    "q1_filter_project": """
        SELECT l_orderkey, l_linenumber, l_quantity
        FROM lineitem WHERE l_quantity > 30
        ORDER BY l_orderkey, l_linenumber
    """,
    "q2_group_count": """
        SELECT l_returnflag, COUNT(*) AS c FROM lineitem
        GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "q3_reduce_agg": """
        SELECT l_orderkey, SUM(l_quantity) AS s, MAX(l_extendedprice) AS m
        FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey
    """,
    "q4_group_topk": """
        SELECT * FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders
        ) WHERE rn <= 3 ORDER BY o_custkey, rn
    """,
    "q5_left_join": """
        SELECT c_custkey, o_orderkey
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        ORDER BY c_custkey, o_orderkey NULLS FIRST
    """,
    "q6_inner_join_agg": """
        SELECT n_name, COUNT(*) AS c
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name
    """,
    "q7_distinct": """
        SELECT DISTINCT l_linestatus FROM lineitem ORDER BY l_linestatus
    """,
    "q8_union_dedup": """
        SELECT s_nationkey AS k FROM supplier
        UNION SELECT c_nationkey FROM customer ORDER BY k
    """,
    "q9_regroup": """
        SELECT o_custkey, COUNT(*) AS c FROM orders
        GROUP BY o_custkey HAVING COUNT(*) >= 2 ORDER BY o_custkey
    """,
    "q10_dedup_preference": """
        SELECT * FROM (
            SELECT c_nationkey, c_custkey, c_acctbal,
                   ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                      ORDER BY c_acctbal DESC, c_custkey) AS rn
            FROM customer
        ) WHERE rn = 1 ORDER BY c_nationkey
    """,
    "q45_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               SUM(l_quantity::DECIMAL(18,2))::VARCHAR AS sum_qty,
               SUM(l_extendedprice::DECIMAL(18,2))::VARCHAR AS sum_base_price,
               SUM(CAST(l_extendedprice::DECIMAL(18,2)
                        * (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2))
                        AS DECIMAL(18,4)))::VARCHAR AS sum_disc_price,
               SUM(CAST(CAST(l_extendedprice::DECIMAL(18,2)
                             * (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2))
                             AS DECIMAL(18,4))
                        * (1::DECIMAL(18,2) + l_tax::DECIMAL(18,2))
                        AS DECIMAL(18,6)))::VARCHAR AS sum_charge,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-06-01'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q46_ship_priority": """
        SELECT l_orderkey, rev::VARCHAR AS revenue,
               (epoch_us(o_orderdate::TIMESTAMP) // 1000000) AS o_orderdate_epoch,
               o_orderpriority
        FROM (
            SELECT l_orderkey, o_orderdate, o_orderpriority,
                   SUM(CAST(l_extendedprice::DECIMAL(18,2)
                            * (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2))
                            AS DECIMAL(18,4))) AS rev
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON o_orderkey = l_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-06-01'
              AND l_shipdate > TIMESTAMP '1998-06-01'
            GROUP BY l_orderkey, o_orderdate, o_orderpriority
            ORDER BY rev DESC, l_orderkey LIMIT 20
        )
    """,
    "q47_sliding_avg": """
        SELECT user_id, event_id,
               round(AVG(value) OVER (PARTITION BY user_id
                                      ORDER BY ts::TIMESTAMP, event_id
                                      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6)
                   AS sliding_avg
        FROM events ORDER BY user_id, event_id
    """,
    "q52_salted_join": """
        SELECT c_nationkey, COUNT(*) AS n_orders,
               SUM(o_totalprice::DECIMAL(18,2))::VARCHAR AS total
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_nationkey ORDER BY c_nationkey
    """,
    "q53_cube_counts": """
        SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
               coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
               GROUPING(o_orderstatus)::INT AS g_status,
               GROUPING(o_orderpriority)::INT AS g_prio,
               COUNT(*) AS c,
               SUM(o_totalprice::DECIMAL(18,2))::VARCHAR AS total
        FROM orders
        GROUP BY CUBE(o_orderstatus, o_orderpriority)
        ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority
    """,
    "q54_semi_anti": """
        SELECT c_custkey, c_nationkey, 'with_orders' AS status
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        UNION ALL
        SELECT c_custkey, c_nationkey, 'no_orders' AS status
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        ORDER BY c_custkey
    """,
    "q55_set_ops": """
        WITH c AS (SELECT c_nationkey AS k FROM customer),
             s AS (SELECT s_nationkey AS k FROM supplier)
        SELECT k, 'both' AS side FROM (SELECT k FROM c INTERSECT SELECT k FROM s)
        UNION ALL
        SELECT k, 'customer_only' FROM (SELECT k FROM c EXCEPT SELECT k FROM s)
        UNION ALL
        SELECT k, 'supplier_only' FROM (SELECT k FROM s EXCEPT SELECT k FROM c)
        ORDER BY side, k
    """,
    "q56_window_ranks": """
        SELECT c_nationkey, c_custkey,
               round(c_acctbal, 6) AS acctbal,
               NTILE(4) OVER w AS quartile,
               floor(PERCENT_RANK() OVER w * 1000000.0 + 0.5) / 1000000.0 AS pct_rank,
               floor(CUME_DIST() OVER w * 1000000.0 + 0.5) / 1000000.0 AS cume
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
        ORDER BY c_nationkey, acctbal DESC, c_custkey
    """,
    "q57_above_cust_avg": """
        SELECT o_orderkey, o_custkey,
               round(o_totalprice, 6) AS o_totalprice,
               round(cust_avg, 6) AS cust_avg
        FROM (
            SELECT o_orderkey, o_custkey, o_totalprice,
                   AVG(o_totalprice) OVER (PARTITION BY o_custkey) AS cust_avg
            FROM orders
        )
        WHERE o_totalprice > cust_avg
        ORDER BY o_orderkey
    """,
    "q62_nation_volume": """
        SELECT n_name, COUNT(*) AS n_items,
               SUM(CAST(l_extendedprice::DECIMAL(18,2)
                        * (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2))
                        AS DECIMAL(18,4)))::VARCHAR AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE c_nationkey = s_nationkey
        GROUP BY n_name ORDER BY n_name
    """,
    "q118_returned_revenue": """
        WITH agg AS (
            SELECT c_custkey, n_name, COUNT(*) AS n_items,
                   SUM(CAST(l_extendedprice::DECIMAL(18,2)
                            * (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2))
                            AS DECIMAL(18,4))) AS rev_d
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
            GROUP BY c_custkey, n_name
        )
        SELECT c_custkey, n_name, n_items, rev_d::VARCHAR AS revenue
        FROM agg ORDER BY rev_d DESC, c_custkey LIMIT 20
    """,
    "q63_full_outer": """
        WITH c AS (SELECT c_nationkey AS k, COUNT(*) AS n_cust
                   FROM customer GROUP BY c_nationkey),
             s AS (SELECT s_nationkey AS k, COUNT(*) AS n_supp
                   FROM supplier GROUP BY s_nationkey)
        SELECT coalesce(c.k, s.k) AS k,
               coalesce(n_cust, 0) AS n_cust,
               coalesce(n_supp, 0) AS n_supp
        FROM c FULL OUTER JOIN s ON c.k = s.k
        ORDER BY k
    """,
}
