"""Relational star-schema suite (SURVEY D5, E13-E16 analogs, plus the
grouping surface Spark provides beyond the reference — rollup, semi/
anti joins, distinct aggregates — listed in SURVEY §2 notes as
driver-mandated engine surface).

Scale design notes (the point of this block):
- Dimension joins (region/nation/customer/supplier) are explicitly
  ``F.broadcast`` — at 100 TB the fact tables shuffle zero bytes for
  these joins; only fact-fact (lineitem⋈orders) uses sort-merge, on
  the natural key both sides are clustered by.
- Aggregates are expressed groupBy-first so partial (map-side)
  aggregation collapses rows before the shuffle.
- Top-k per group uses row_number + filter — Spark pushes the rank
  filter into the window sort (WindowGroupLimit), so the full sorted
  group is never materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from zcode_iceberg_spark.sources.tables import load_table
from zcode_iceberg_spark.suite import Query

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide hash aggregate over lineitem with computed
    measures — the canonical partial+final agg benchmark query."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 6).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                6,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 6) AS sum_qty,
       round(sum(l_extendedprice), 6) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 6) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 6) AS sum_charge,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_extendedprice), 6) AS avg_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_star_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full star join: lineitem⋈orders (sort-merge on the fact key)
    ⋈ customer⋈nation⋈region (all broadcast) → revenue rollup by
    region/nation."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


SQL_STAR_REVENUE = """
SELECT r_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


def q_top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by order value per nation — top-k per group via
    row_number (C2's relational twin)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    per_cust = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", "c_custkey", "c_name")
        .agg(F.round(F.sum("o_totalprice"), 6).alias("total_value"))
    )
    w = Window.partitionBy("n_name").orderBy(
        F.col("total_value").desc(), F.col("c_custkey")
    )
    return (
        per_cust.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("n_name", "c_custkey", "c_name", "total_value", "rank")
    )


SQL_TOP_CUSTOMERS_PER_NATION = """
WITH per_cust AS (
  SELECT n_name, c_custkey, c_name,
         round(sum(o_totalprice), 6) AS total_value
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name, c_custkey, c_name
)
SELECT n_name, c_custkey, c_name, total_value, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY n_name
                               ORDER BY total_value DESC, c_custkey) AS rank
  FROM per_cust
) WHERE rank <= 3
"""


def q_priority_with_discounted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join (TPC-H Q4 shape): count orders per priority that have
    at least one deeply-discounted line. leftsemi shuffles only keys —
    no fact-fact row explosion."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    disc = li.filter(F.col("l_discount") > 0.05).select("l_orderkey")
    return (
        o.join(disc, o.o_orderkey == disc.l_orderkey, "leftsemi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


SQL_PRIORITY_WITH_DISCOUNTED = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_discount > 0.05)
GROUP BY o_orderpriority
"""


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join: customers that never ordered, per market segment."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o.select("o_custkey"), c.c_custkey == o.o_custkey, "leftanti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


SQL_CUSTOMERS_WITHOUT_ORDERS = """
SELECT c_mktsegment, count(*) AS n_customers
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
"""


def q_rollup_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregate — hierarchical subtotals (flag → flag×status →
    grand total) in one pass; 'ALL' stands in for the null subtotal
    markers so the hash compare is label-stable."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n_rows",
        )
    )


SQL_ROLLUP_SALES = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       round(sum(l_quantity), 6) AS sum_qty,
       count(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q_cumulative_customer_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E14 analog: running order-value total per customer in order-date
    order (cumulative P&L twin, zscore_excel_logger.py:330-343)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.round(F.sum("o_totalprice").over(w), 6).alias("cum_value"),
    )


SQL_CUMULATIVE_CUSTOMER_VALUE = """
SELECT o_orderkey, o_custkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW), 6) AS cum_value
FROM orders
"""


def q_daily_order_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E13: daily ledger rollup — count/status splits/min/max/avg, the
    Excel Daily-Summary sheet as a groupBy(to_date) hash agg
    (zscore_excel_logger.py:345-407)."""
    o = load_table(spark, sf_dir, "orders")
    # money sums accumulate in DECIMAL(18,2): exact, order-independent
    # addition, so the hash agrees with the oracle regardless of how
    # either engine schedules partial aggregation across partitions
    # (a double sum differs in final ULPs between accumulation orders)
    price_dec = F.col("o_totalprice").cast("decimal(18,2)")
    return (
        o.groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_f"),
            F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("n_o"),
            F.sum(F.when(F.col("o_orderstatus") == "P", 1).otherwise(0)).alias("n_p"),
            F.round(F.sum(price_dec).cast("double"), 6).alias("total_value"),
            F.round(F.max("o_totalprice"), 6).alias("max_value"),
            F.round(F.min("o_totalprice"), 6).alias("min_value"),
            F.round(
                (F.sum(price_dec) / F.count(F.lit(1))).cast("double"), 6
            ).alias("avg_value"),
        )
    )


SQL_DAILY_ORDER_SUMMARY = """
SELECT strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       count(*) AS n_orders,
       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 6) AS total_value,
       round(max(o_totalprice), 6) AS max_value,
       round(min(o_totalprice), 6) AS min_value,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) / count(*) AS DOUBLE), 6) AS avg_value
FROM orders
GROUP BY strftime(o_orderdate, '%Y-%m-%d')
"""


def q_distinct_parts_per_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregate: distinct parts + orders per supplier."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_suppkey").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.count(F.lit(1)).alias("n_lines"),
    )


SQL_DISTINCT_PARTS_PER_SUPPLIER = """
SELECT l_suppkey,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_orderkey) AS n_orders,
       count(*) AS n_lines
FROM lineitem GROUP BY l_suppkey
"""


APPROX_DISTINCT_RTOL = 0.05  # 5× the sketch's 1% rsd


def q_approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — the scale path for
    distinct counts (no shuffle of distinct values, fixed-size
    mergeable sketches) — audited hash-checkably: the sketch estimate
    is engine-specific, so the output carries the exact count plus an
    `approx_ok` flag asserting the live HLL++ estimate landed within
    5× its configured 1% rsd of exact. The flag forces the sketch to
    run and be accurate under the driver's session while the value
    hash stays deterministic; the exact side doubles as the audit
    yardstick (pure scale-path usage drops the exact column —
    `distinct_parts_per_supplier` keeps the exact form)."""
    li = load_table(spark, sf_dir, "lineitem")
    # two-level agg instead of countDistinct+approx in one agg: the
    # latter EXPANDs every row (measured 4.9 s vs ~1 s at sf0.1). HLL
    # is multiplicity-invariant, so sketching the pre-deduped pairs
    # yields the identical estimate with one scan and two cheap
    # partial-agg shuffles.
    pairs = li.groupBy("l_returnflag", "l_partkey").agg(
        F.count(F.lit(1)).alias("c")
    )
    g = pairs.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"),
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("c").alias("n_lines"),
    )
    rel_err = F.abs(F.col("approx_parts") - F.col("n_parts")) / F.col("n_parts")
    return g.select(
        "l_returnflag",
        "n_parts",
        "n_lines",
        (rel_err <= APPROX_DISTINCT_RTOL).alias("approx_ok"),
    )


SQL_APPROX_DISTINCT_PARTS = """
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS n_parts,
       count(*) AS n_lines,
       TRUE AS approx_ok
FROM lineitem GROUP BY l_returnflag
"""


def q_segment_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-then-window: revenue share and rank per market
    segment (window over an aggregate output — E15 analog)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    seg = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.sum("o_totalprice").alias("seg_value"))
    )
    w_all = Window.partitionBy()
    return seg.select(
        "c_mktsegment",
        F.round("seg_value", 6).alias("seg_value"),
        F.round(F.col("seg_value") / F.sum("seg_value").over(w_all), 6).alias("share"),
        F.rank()
        .over(Window.orderBy(F.col("seg_value").desc(), F.col("c_mktsegment")))
        .alias("rank"),
    )


SQL_SEGMENT_SHARE = """
WITH seg AS (
  SELECT c_mktsegment, sum(o_totalprice) AS seg_value
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_mktsegment
)
SELECT c_mktsegment,
       round(seg_value, 6) AS seg_value,
       round(seg_value / sum(seg_value) OVER (), 6) AS share,
       rank() OVER (ORDER BY seg_value DESC, c_mktsegment) AS rank
FROM seg
"""


def q_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark `percentile` ==
    DuckDB `quantile_cont`, both linear interpolation). The scale path
    is `approx_percentile` (t-digest sketch, no sort) — kept exact here
    for the oracle; swap at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    pct = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.25)).alias("p25"),
        F.percentile("l_extendedprice", F.lit(0.5)).alias("p50"),
        F.percentile("l_extendedprice", F.lit(0.75)).alias("p75"),
        F.count(F.lit(1)).alias("n"),
    )
    return pct.select(
        "l_returnflag",
        F.round("p25", 6).alias("p25"),
        F.round("p50", 6).alias("p50"),
        F.round("p75", 6).alias("p75"),
        "n",
    )


SQL_PRICE_PERCENTILES = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
       round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
       round(quantile_cont(l_extendedprice, 0.75), 6) AS p75,
       count(*) AS n
FROM lineitem GROUP BY l_returnflag
"""


# Audit tolerance vs sketch accuracy: approx_percentile's GK sketch
# guarantees relative rank error ≤ 1/accuracy, so accuracy=1000 keeps
# a deterministic 10× margin under the ±0.01 audit band. r12 dropped
# accuracy from 10000 (100× margin) after measuring the sketch agg at
# 2.11 s vs 1.40 s warm at sf0.1 — the bigger sketch bought margin the
# audit never needed, and at 100 TB the 10× smaller summaries also
# shrink every partial-agg merge (guide §2.3: shuffle fewer bytes).
# The hash-checked output (n + three booleans) is unchanged: the
# booleans are deterministically TRUE under the worst-case guarantee
# at either accuracy.
PCT_ACCURACY = 1000
PCT_RANK_TOL = 0.01  # 10× the sketch's 1/1000 rank-error guarantee


def q_price_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB percentile path `q_price_percentiles` documents,
    implemented live: `approx_percentile` builds a mergeable sketch in
    one partial-agg pass — no per-group sort, no row buffering — at
    accuracy 1/1000 (rank error 10× inside the audit tolerance). Sketch estimates are engine-specific (merge-order
    dependent), so the hash-checked output is the RANK-TOLERANCE audit:
    for each quantile q the flag asserts
    count(price < approx)/n ≤ q+tol AND count(price ≤ approx)/n ≥ q−tol
    (the two-sided form is duplicate-value-safe), with tol = 100× the
    sketch's rank-error guarantee — deterministically TRUE however the
    merge ordered, while still requiring the sketch to run and be
    accurate under the driver's session. The audit's second scan +
    broadcast join-back is audit-only cost; pure scale-path usage is
    the bare agg. Exact values stay in `price_percentiles`."""
    li = load_table(spark, sf_dir, "lineitem")
    acc = F.lit(PCT_ACCURACY)
    appx = li.groupBy("l_returnflag").agg(
        F.approx_percentile("l_extendedprice", F.lit(0.25), acc).alias("a25"),
        F.approx_percentile("l_extendedprice", F.lit(0.5), acc).alias("a50"),
        F.approx_percentile("l_extendedprice", F.lit(0.75), acc).alias("a75"),
    )
    j = li.select("l_returnflag", "l_extendedprice").join(
        F.broadcast(appx), "l_returnflag"
    )
    price = F.col("l_extendedprice")

    def rank_ok(q: float, approx_col: str) -> F.Column:
        below = F.sum((price < F.col(approx_col)).cast("bigint"))
        at_or_below = F.sum((price <= F.col(approx_col)).cast("bigint"))
        n = F.count(F.lit(1))
        return (below / n <= q + PCT_RANK_TOL) & (
            at_or_below / n >= q - PCT_RANK_TOL
        )

    return j.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        rank_ok(0.25, "a25").alias("ok25"),
        rank_ok(0.5, "a50").alias("ok50"),
        rank_ok(0.75, "a75").alias("ok75"),
    )


SQL_PRICE_PERCENTILES_APPROX = """
SELECT l_returnflag, count(*) AS n,
       TRUE AS ok25, TRUE AS ok50, TRUE AS ok75
FROM lineitem GROUP BY l_returnflag
"""


def q_cube_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregate — all four grouping combinations of
    (lang, source) over the document corpus in ONE pass (per-group,
    per-lang, per-source, grand total). Completes the grouping-sets
    family next to rollup_sales; Spark expands the cube BELOW the
    shuffle, so partial aggregation still collapses rows map-side."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.cube("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("chars_total"),
        )
        .select(
            F.coalesce("lang", F.lit("ALL")).alias("lang"),
            F.coalesce("source", F.lit("ALL")).alias("source"),
            "n_docs",
            "chars_total",
        )
    )


SQL_CUBE_CORPUS = """
SELECT coalesce(lang, 'ALL') AS lang,
       coalesce(source, 'ALL') AS source,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS chars_total
FROM documents
GROUP BY CUBE (lang, source)
"""


def q_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: orders worth more than 2× their own
    customer's average order value. Written as SQL so CATALYST does the
    decorrelation — the optimizer rewrites the per-row subquery into a
    per-customer aggregate joined back on o_custkey (one scan + one
    hash agg + one join; plan-asserted in tests/test_plans.py). The
    naive interpretation would re-aggregate per outer row — the n²
    trap decorrelation exists to avoid."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey,
               round(o_totalprice, 6) AS totalprice
        FROM orders_v o
        WHERE o_totalprice > 2 * (SELECT avg(o_totalprice)
                                  FROM orders_v i
                                  WHERE i.o_custkey = o.o_custkey)
        """
    )


SQL_ABOVE_CUSTOMER_AVG = """
SELECT o_orderkey, o_custkey, round(o_totalprice, 6) AS totalprice
FROM orders o
WHERE o_totalprice > 2 * (SELECT avg(o_totalprice)
                          FROM orders i
                          WHERE i.o_custkey = o.o_custkey)
"""


SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


def q_pivot_priority_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts by priority × customer segment, segments as
    columns. The pivot values are an explicit literal list — with known
    values Spark plans a single-pass conditional aggregation (no extra
    distinct-values job, stable output schema), exactly the portable
    CASE-WHEN form the oracle uses."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    return (
        o.join(F.broadcast(c), "o_custkey")
        .groupBy("o_orderpriority")
        .pivot("c_mktsegment", SEGMENTS)
        .agg(F.count(F.lit(1)))
        .na.fill(0, SEGMENTS)
    )


# count(CASE …) (BIGINT) rather than sum(CASE …) (DuckDB HUGEINT):
# Spark's pivot-count is BIGINT and the hash compare is dtype-sensitive
SQL_PIVOT_PRIORITY_SEGMENT = f"""
SELECT o.o_orderpriority,
       {", ".join(f"count(CASE WHEN c.c_mktsegment = '{s}' THEN 1 END) AS {s}" for s in SEGMENTS)}
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY o.o_orderpriority
"""


UNPIVOT_COLS = ["l_quantity", "l_extendedprice", "l_discount"]


def q_unpivot_lineitem_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): per-returnflag sums of three measures rotated
    into (metric, value) rows — the long-format hand-off shape for
    stats/reporting consumers. Aggregate FIRST, melt the 3-row-per-
    group result: the unpivot fan-out happens after the data is tiny,
    never on the fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        *[F.round(F.sum(c), 6).alias(c) for c in UNPIVOT_COLS]
    )
    return agg.unpivot(
        ["l_returnflag"], UNPIVOT_COLS, "metric", "value"
    )


SQL_UNPIVOT_LINEITEM_STATS = f"""
WITH agg AS (
  SELECT l_returnflag,
         {", ".join(f"round(sum({c}), 6) AS {c}" for c in UNPIVOT_COLS)}
  FROM lineitem GROUP BY l_returnflag
)
{" UNION ALL ".join(f"SELECT l_returnflag, '{c}' AS metric, {c} AS value FROM agg" for c in UNPIVOT_COLS)}
"""


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per customer, Recency (days from the
    corpus's last order date), Frequency (order count), Monetary
    (DECIMAL-exact total spend) → ntile(5) quintiles on each axis
    (deterministic tie-break by custkey) → one row per (r, f, m)
    segment cell with size and exact average spend.

    Scale shape: one per-customer aggregate (map-side partials), the
    1-row max-date broadcast back, three ntile windows that share ONE
    global ordering problem each over the CUSTOMER relation (orders
    already collapsed — windows run on the small side), and a final
    125-cell hash agg. The classic CRM rollup every events/orders
    warehouse serves."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("monetary"),
    )
    maxd = per_cust.agg(F.max("last_order").alias("d0"))
    rfm = per_cust.crossJoin(F.broadcast(maxd)).select(
        "o_custkey",
        F.datediff("d0", "last_order").alias("recency_days"),
        "frequency",
        "monetary",
    )
    # recency quintile 1 = most recent; frequency/monetary 5 = best
    r_q = F.ntile(5).over(Window.orderBy(F.col("recency_days").asc(), "o_custkey"))
    f_q = F.ntile(5).over(Window.orderBy(F.col("frequency").desc(), "o_custkey"))
    m_q = F.ntile(5).over(
        Window.orderBy(F.col("monetary").desc(), "o_custkey")
    )
    scored = rfm.select(
        "o_custkey",
        "monetary",
        r_q.alias("r_q"),
        f_q.alias("f_q"),
        m_q.alias("m_q"),
    )
    # exact integer cents end-to-end: Spark's DECIMAL division rounds
    # HALF_UP at its own scale while DuckDB widens sum(DECIMAL)/count to
    # DOUBLE — a 6dp half-boundary ratio rounds differently between the
    # engines at some scale. Same half-away integer-division convention
    # as operators/stateful.avg_micro_exact (monetary ≥ 0, so the
    # non-negative branch suffices).
    return scored.groupBy("r_q", "f_q", "m_q").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.expr(
            "((2 * sum(CAST(monetary * 100 AS BIGINT)) * 10000 + count(1))"
            " DIV (2 * count(1))) / 1e6"
        ).alias("avg_monetary"),
    )


SQL_RFM_SEGMENTS = """
WITH per_cust AS (
  SELECT o_custkey,
         max(o_orderdate) AS last_order,
         count(*) AS frequency,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
  FROM orders GROUP BY o_custkey
),
rfm AS (
  SELECT o_custkey,
         date_diff('day', last_order, (SELECT max(last_order) FROM per_cust))
           AS recency_days,
         frequency, monetary
  FROM per_cust
),
scored AS (
  SELECT o_custkey, monetary,
         ntile(5) OVER (ORDER BY recency_days, o_custkey) AS r_q,
         ntile(5) OVER (ORDER BY frequency DESC, o_custkey) AS f_q,
         ntile(5) OVER (ORDER BY monetary DESC, o_custkey) AS m_q
  FROM rfm
)
SELECT r_q, f_q, m_q, count(*) AS n_customers,
       ((2 * sum(CAST(monetary * 100 AS BIGINT)) * 10000 + count(*))
        // (2 * count(*))) / 1000000.0 AS avg_monetary
FROM scored GROUP BY r_q, f_q, m_q
"""


RFM_AXES = ["recency_days", "frequency", "monetary"]
RFM_QS = [0.2, 0.4, 0.6, 0.8]
RFM_RANK_TOL = 0.01  # 10× the sketch's 1/1000 rank-error guarantee (r12:
# accuracy 10000 → 1000, same measured rationale as PCT_ACCURACY above —
# the audit booleans stay deterministically TRUE under the worst-case
# guarantee, and the 10× smaller sketches shrink every partial-agg merge)


def q_rfm_segments_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB RFM path (VERDICT r8 #6): quintile CUT POINTS from
    ONE ``approx_percentile`` partial-agg pass over the per-customer
    relation, then map-side bucketing ``1 + Σ(v > cut_i)`` — no
    unpartitioned ``ntile`` window, so nothing ever single-partition
    sorts the customer relation (``q_rfm_segments`` keeps the exact
    quintiles as the oracle twin; at 10⁸–10⁹ customers that global
    sort is the one scale hazard this swap retires, plan-asserted in
    tests/test_plans.py::test_rfm_approx_no_global_window).

    Sketch cut values are engine/merge-order specific, so the
    hash-checked output is the RANK-TOLERANCE audit (the
    ``price_percentiles_approx`` pattern): for each axis and quantile
    q, count(v < cut)/n ≤ q+tol AND count(v ≤ cut)/n ≥ q−tol, with
    tol = 100× the sketch's guarantee — deterministically TRUE
    however the merge ordered, while still requiring the sketch and
    the bucketing join to really run under the driver's session. The
    125-cell rollup itself is the production tail (bucket exprs
    below); its cell boundaries are sketch-dependent, so the audit is
    what hashes."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("monetary"),
    )
    maxd = per_cust.agg(F.max("last_order").alias("d0"))
    rfm = per_cust.crossJoin(F.broadcast(maxd)).select(
        "o_custkey",
        F.datediff("d0", "last_order").cast("double").alias("recency_days"),
        F.col("frequency").cast("double").alias("frequency"),
        F.col("monetary").cast("double").alias("monetary"),
    )
    pcts = F.array(*[F.lit(q) for q in RFM_QS])
    cuts = rfm.agg(
        *[
            F.approx_percentile(a, pcts, F.lit(PCT_ACCURACY)).alias(f"{a}_cuts")
            for a in RFM_AXES
        ]
    )
    j = rfm.crossJoin(F.broadcast(cuts))
    # production tail: the map-side quintile assignment (value-based
    # buckets; ties share a bucket, the documented semantic difference
    # vs exact row-number quintiles)
    def _bucket(a: str):
        return F.aggregate(
            F.col(f"{a}_cuts"),
            F.lit(1),
            lambda acc, c: acc + (F.col(a) > c).cast("int"),
        ).alias(f"{a}_q")

    _ = j.select(*[_bucket(a) for a in RFM_AXES])  # the production tail
    aggs = [F.count(F.lit(1)).alias("n")]
    for a in RFM_AXES:
        for i, q in enumerate(RFM_QS):
            cut = F.col(f"{a}_cuts")[i]
            below = F.sum((F.col(a) < cut).cast("bigint"))
            at_or_below = F.sum((F.col(a) <= cut).cast("bigint"))
            aggs.append(
                (
                    (below / F.count(F.lit(1)) <= q + RFM_RANK_TOL)
                    & (at_or_below / F.count(F.lit(1)) >= q - RFM_RANK_TOL)
                ).alias(f"ok_{a}_{i}")
            )
    one = j.agg(*aggs)
    parts = [
        one.select(
            F.lit(a).alias("axis"),
            F.lit(int(q * 100)).alias("q_pct"),
            F.col("n").alias("n_customers"),
            F.col(f"ok_{a}_{i}").alias("ok"),
        )
        for a in RFM_AXES
        for i, q in enumerate(RFM_QS)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


SQL_RFM_SEGMENTS_APPROX = f"""
WITH per_cust AS (
  SELECT o_custkey FROM orders GROUP BY o_custkey
),
n AS (SELECT count(*) AS n FROM per_cust)
SELECT v.axis, v.q_pct, n.n AS n_customers, TRUE AS ok
FROM (VALUES {", ".join(f"('{a}', {int(q * 100)})" for a in RFM_AXES for q in RFM_QS)})
     v(axis, q_pct), n
"""


# --------------------------------------------------- TPC-H archetype widening
#
# Five classic decision-support shapes the block didn't yet exercise:
# outer-join histogram (Q13), HAVING join-back (Q18), bilateral
# double-star (Q7), market-share ratio (Q8), and groupBy-min join-back
# argmin (Q2's correlated subquery, de-correlated). Each is the
# Spark-idiomatic de-correlated form: aggregate first so the shuffle
# moves collapsed rows, broadcast every dimension, and keep money sums
# in exact DECIMAL / integer micro-units per the repo determinism rules.


def q_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed k orders, INCLUDING
    k = 0 — the outer-join histogram. Aggregate orders per customer
    first (map-side partials collapse the fact table to ≤ |customer|
    rows), then LEFT join customer onto the counts so order-less
    customers surface as 0; a second tiny agg builds the distribution.
    At 100 TB both sides of the custkey join are large → shuffle
    equi-join on the key both tables are naturally clustered by; the
    histogram agg output is O(max orders per customer) rows."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    cnt = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    per = c.join(cnt, c.c_custkey == cnt.o_custkey, "left").select(
        F.coalesce(F.col("n"), F.lit(0)).alias("c_count")
    )
    return per.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


SQL_ORDER_COUNT_DISTRIBUTION = """
WITH cnt AS (
  SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey
),
per AS (
  SELECT coalesce(n, 0) AS c_count
  FROM customer LEFT JOIN cnt ON c_custkey = o_custkey
)
SELECT c_count, count(*) AS n_customers FROM per GROUP BY c_count
"""


LARGE_ORDER_QTY = 300  # Q18's canonical large-volume threshold


def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total lineitem quantity exceeds
    {LARGE_ORDER_QTY} — aggregate-HAVING first, then join the surviving
    keys back to orders⋈customer. The HAVING filter runs on the
    partial-aggregated fact side, so only the rare large keys reach the
    join (AQE typically broadcasts them); quantities are integral
    doubles, summed exactly and emitted as BIGINT."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").cast("bigint").alias("total_qty"))
        .where(F.col("total_qty") > LARGE_ORDER_QTY)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round("o_totalprice", 6).alias("o_totalprice"),
            "total_qty",
        )
    )


SQL_LARGE_ORDERS = f"""
WITH big AS (
  SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING CAST(sum(l_quantity) AS BIGINT) > {LARGE_ORDER_QTY}
)
SELECT c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       round(o_totalprice, 6) AS o_totalprice,
       total_qty
FROM big JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


# exact money: snap the 2dp price and the 2dp discount complement to
# DECIMAL before multiplying — the sum is exact integer arithmetic at
# scale 4, order-free under any partitioning (repo determinism rule)
_REV_DEC = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(4,2))"
)


def q_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume — revenue between every
    (supplier nation, customer nation) pair per ship year. The double
    star: lineitem reaches nation twice, once through supplier and once
    through orders⋈customer; both dimension chains broadcast, so the
    only shuffle is the lineitem⋈orders fact-fact sort-merge join."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(F.expr(f"CAST(sum({_REV_DEC}) AS DOUBLE)"), 6).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


SQL_NATION_TRADE_VOLUME = f"""
SELECT sn.n_name AS supp_nation,
       cn.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       round(CAST(sum({_REV_DEC}) AS DOUBLE), 6) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN supplier   ON l_suppkey = s_suppkey
JOIN nation sn  ON s_nationkey = sn.n_nationkey
JOIN orders     ON l_orderkey = o_orderkey
JOIN customer   ON o_custkey = c_custkey
JOIN nation cn  ON c_nationkey = cn.n_nationkey
GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
"""


MKT_REGION = "ASIA"
MKT_NATION = "NATION_5"


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: {MKT_NATION} suppliers' share of all revenue from
    {MKT_REGION}-region customers, per order year — conditional-sum
    ratio over one pass of the joined fact (no second scan for the
    denominator). The region filter rides the broadcast customer-side
    dimension chain, pruning fact rows at the join."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    cn = n.join(
        F.broadcast(r.where(F.col("r_name") == MKT_REGION)),
        n.n_regionkey == r.r_regionkey,
    ).select(F.col("n_nationkey").alias("cn_key"))
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    rev_u = F.expr(f"CAST(sum({_REV_DEC}) AS DOUBLE)")
    nat_u = F.expr(
        f"CAST(sum(CASE WHEN supp_nation = '{MKT_NATION}' THEN {_REV_DEC} "
        f"ELSE CAST(0 AS DECIMAL(4,2)) END) AS DOUBLE)"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(nat_u, 6).alias("nation_volume"),
            F.round(rev_u, 6).alias("total_volume"),
            # guard: a year whose region revenue nets to zero must
            # yield NULL share, not NULL/Inf from a 0 denominator
            F.round(F.when(rev_u != 0, nat_u / rev_u), 6).alias("mkt_share"),
        )
    )


SQL_MARKET_SHARE = f"""
WITH base AS (
  SELECT year(o_orderdate) AS o_year,
         sn.n_name AS supp_nation,
         {_REV_DEC} AS rev
  FROM lineitem
  JOIN orders    ON l_orderkey = o_orderkey
  JOIN customer  ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region    ON cn.n_regionkey = r_regionkey AND r_name = '{MKT_REGION}'
  JOIN supplier  ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
)
SELECT o_year,
       round(CAST(sum(CASE WHEN supp_nation = '{MKT_NATION}' THEN rev
                           ELSE CAST(0 AS DECIMAL(4,2)) END) AS DOUBLE), 6)
         AS nation_volume,
       round(CAST(sum(rev) AS DOUBLE), 6) AS total_volume,
       round(CASE WHEN CAST(sum(rev) AS DOUBLE) <> 0 THEN
               CAST(sum(CASE WHEN supp_nation = '{MKT_NATION}' THEN rev
                             ELSE CAST(0 AS DECIMAL(4,2)) END) AS DOUBLE)
               / CAST(sum(rev) AS DOUBLE) END, 6) AS mkt_share
FROM base GROUP BY o_year
"""


def q_cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape, de-correlated: for every part, the supplier
    achieving the minimum unit cost (extendedprice/quantity), ties
    broken by smallest suppkey. The correlated min subquery becomes
    groupBy-min + equi-join-back — two passes over the (partkey,
    cost) projection, both partial-aggregated map-side, joined on
    (partkey, cost) with zero inequality predicates. Unit costs are
    micro-quantized BIGINTs so the min and the join-back equality are
    exact integer operations on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    costs = li.select(
        "l_partkey",
        "l_suppkey",
        F.expr(
            "CAST(round(l_extendedprice / l_quantity * 1e6) AS BIGINT)"
        ).alias("cost_u"),
    )
    mn = (
        costs.groupBy(F.col("l_partkey").alias("mn_partkey"))
        .agg(F.min("cost_u").alias("min_cost_u"))
    )
    winners = (
        costs.join(
            mn,
            (costs.l_partkey == mn.mn_partkey)
            & (costs.cost_u == mn.min_cost_u),
        )
        .groupBy("mn_partkey", "min_cost_u")
        .agg(F.min("l_suppkey").alias("s_suppkey"))
    )
    return winners.select(
        F.col("mn_partkey").alias("p_partkey"),
        "s_suppkey",
        (F.col("min_cost_u") / F.lit(1e6)).alias("min_unit_cost"),
    )


SQL_CHEAPEST_SUPPLIER_PER_PART = """
WITH costs AS (
  SELECT l_partkey, l_suppkey,
         CAST(round(l_extendedprice / l_quantity * 1e6) AS BIGINT) AS cost_u
  FROM lineitem
),
mn AS (
  SELECT l_partkey, min(cost_u) AS min_cost_u FROM costs GROUP BY l_partkey
)
SELECT c.l_partkey AS p_partkey,
       min(c.l_suppkey) AS s_suppkey,
       min_cost_u / 1000000.0 AS min_unit_cost
FROM costs c JOIN mn ON c.l_partkey = mn.l_partkey AND c.cost_u = mn.min_cost_u
GROUP BY c.l_partkey, min_cost_u
"""


def q_late_ship_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders per priority having at least one line
    shipped >90 days after the order date. The EXISTS subquery is a
    LEFT SEMI join — Spark keeps it one pass over lineitem with the
    date inequality evaluated as the join's residual condition, never
    materializing the match multiplicity (an inner join + distinct
    would shuffle the full match set just to throw it away)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


SQL_LATE_SHIP_EXISTS = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority
"""


def q_priority_line_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per return flag, how many lines belong to
    high-priority vs low-priority orders — conditional CASE counts
    folded into ONE aggregation over the fact-fact join (two filtered
    scans would read lineitem twice). The only shuffle is the
    lineitem⋈orders sort-merge join; the counts partial-aggregate
    map-side to 3 rows."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


SQL_PRIORITY_LINE_BUCKETS = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_returnflag
"""


Q17_BRAND = "Brand#4"


def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape, de-correlated: average yearly revenue lost if
    small-quantity orders (below 20% of the part's mean order size)
    for one brand were not filled. The correlated per-part AVG becomes
    aggregate-then-join-back: one groupBy over the (partkey, quantity)
    projection, joined to the brand-filtered fact (brand predicate
    rides the broadcast part dim). Quantities are integer-valued, so
    the double mean is an exact-integer sum / count — deterministic
    under any partitioning; the revenue sum is exact DECIMAL."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    pa = li.groupBy(F.col("l_partkey").alias("pa_key")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("thr")
    )
    return (
        li.join(
            F.broadcast(p.where(F.col("p_brand") == Q17_BRAND)),
            li.l_partkey == p.p_partkey,
        )
        .join(pa, li.l_partkey == pa.pa_key)
        .where(F.col("l_quantity") < F.col("thr"))
        .agg(
            F.round(
                F.expr(
                    "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)"
                )
                / 7.0,
                6,
            ).alias("avg_yearly")
        )
    )


SQL_SMALL_QUANTITY_REVENUE = f"""
WITH pa AS (
  SELECT l_partkey AS pa_key, 0.2 * avg(l_quantity) AS thr
  FROM lineitem GROUP BY l_partkey
)
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / 7.0, 6) AS avg_yearly
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_brand = '{Q17_BRAND}'
JOIN pa ON l_partkey = pa_key
WHERE l_quantity < thr
"""


def q_disjunctive_band_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR-of-ANDs predicate over
    three (brand, size-band, quantity-band) combinations. One
    lineitem⋈part broadcast join with the disjunction as the join
    filter — the common brand/size conjuncts stay on the broadcast
    side where they prune the build table; no UNION of three scans
    (that would read the fact three times for one aggregate)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    band = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#4")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .where(band)
        .agg(
            F.round(F.expr(f"CAST(sum({_REV_DEC}) AS DOUBLE)"), 6).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


SQL_DISJUNCTIVE_BAND_REVENUE = f"""
SELECT round(CAST(sum({_REV_DEC}) AS DOUBLE), 6) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


def q_sole_latest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape on the available columns: per supplier, how
    many multi-supplier orders this supplier SOLELY closed out (its
    latest shipment strictly after every other supplier's — the
    "kept the order waiting" role). Q21's EXISTS/NOT-EXISTS pair of
    correlated self-joins becomes two stacked aggregations: per
    (order, supplier) max shipdate, then per order (supplier count,
    order max), joined back and reduced to orders where exactly one
    supplier attains the max. Three shuffles total, all on orderkey —
    AQE reuses the partitioning — vs the textbook form's two extra
    fact self-joins. Dates and counts are exact types; no float in
    the pipeline."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    per_os = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("supp_max")
    )
    per_o = per_os.groupBy(F.col("l_orderkey").alias("po_key")).agg(
        F.count(F.lit(1)).alias("n_supps"),
        F.max("supp_max").alias("order_max"),
    )
    sole = (
        per_os.join(
            per_o,
            (per_os.l_orderkey == per_o.po_key)
            & (per_o.n_supps > 1)
            & (per_os.supp_max == per_o.order_max),
        )
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_at_max"),
            F.max("l_suppkey").alias("win_supp"),
        )
        .where(F.col("n_at_max") == 1)
    )
    return (
        sole.join(F.broadcast(s), sole.win_supp == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


SQL_SOLE_LATEST_SUPPLIER = """
WITH per_os AS (
  SELECT l_orderkey, l_suppkey, max(l_shipdate) AS supp_max
  FROM lineitem GROUP BY l_orderkey, l_suppkey
),
per_o AS (
  SELECT l_orderkey AS po_key, count(*) AS n_supps,
         max(supp_max) AS order_max
  FROM per_os GROUP BY l_orderkey
),
sole AS (
  SELECT p.l_orderkey, max(p.l_suppkey) AS win_supp
  FROM per_os p
  JOIN per_o o ON p.l_orderkey = o.po_key
              AND o.n_supps > 1 AND p.supp_max = o.order_max
  GROUP BY p.l_orderkey HAVING count(*) = 1
)
SELECT s_name, count(*) AS numwait
FROM sole JOIN supplier ON win_supp = s_suppkey
GROUP BY s_name
"""


def q_lapsed_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape on the available columns: customers whose
    balance exceeds the average positive balance but who placed no
    order in the trailing 90 days — per market segment, count and
    total balance. The scalar AVG subquery is a 1-row broadcast; the
    above-average test is an integer CROSS-MULTIPLY in exact cents
    (bal_cents * n > sum_cents) so no float division ever enters the
    threshold (repo determinism rule); the NOT EXISTS is a LEFT ANTI
    join against the date-filtered orders projection."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    cents = F.expr("CAST(round(c_acctbal * 100) AS BIGINT)")
    pos = (
        c.where(F.col("c_acctbal") > 0)
        .agg(F.sum(cents).alias("sum_c"), F.count(F.lit(1)).alias("n_pos"))
    )
    cutoff = o.agg(
        (F.max("o_orderdate") - F.expr("INTERVAL 90 DAYS")).alias("cut")
    )
    recent = o.join(F.broadcast(cutoff)).where(
        F.col("o_orderdate") >= F.col("cut")
    )
    rich = c.join(F.broadcast(pos)).where(cents * F.col("n_pos") > F.col("sum_c"))
    lapsed = rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
    return lapsed.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_custs"),
        F.round(
            (F.sum(cents) / F.lit(100.0)).cast("double"), 6
        ).alias("total_bal"),
    )


SQL_LAPSED_RICH_CUSTOMERS = """
WITH pos AS (
  SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS sum_c,
         count(*) AS n_pos
  FROM customer WHERE c_acctbal > 0
),
cutoff AS (SELECT max(o_orderdate) - INTERVAL 90 DAY AS cut FROM orders)
SELECT c_mktsegment,
       count(*) AS n_custs,
       round(CAST(CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                  / 100.0 AS DOUBLE), 6) AS total_bal
FROM customer, pos, cutoff
WHERE CAST(round(c_acctbal * 100) AS BIGINT) * n_pos > sum_c
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderdate >= cut)
GROUP BY c_mktsegment
"""


def q_customer_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-rank window family: per-nation customer-value
    deciles (ntile) with percent_rank and cume_dist — all three ride
    ONE window sort keyed (nation, revenue desc, custkey), so the only
    shuffle is the per-nation hash partition; no global sort (a
    corpus-wide ntile would serialize into one partition — partitioned
    ranking is the shape that survives 1000 executors). Revenue is
    summed in exact cents so the rank order — and therefore every rank
    statistic — is partition-independent; the (rev desc, custkey)
    order is total, making percent_rank/cume_dist tie-free."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    rev = (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_nationkey", "c_custkey")
        .agg(
            F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")).alias(
                "rev_u"
            )
        )
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("rev_u").desc(), F.col("c_custkey")
    )
    return rev.select(
        "c_nationkey",
        "c_custkey",
        F.ntile(10).over(w).alias("decile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cum_share"),
    )


SQL_CUSTOMER_VALUE_DECILES = """
WITH rev AS (
  SELECT c_nationkey, c_custkey,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS rev_u
  FROM customer JOIN orders ON c_custkey = o_custkey
  GROUP BY c_nationkey, c_custkey
)
SELECT c_nationkey, c_custkey,
       ntile(10) OVER w AS decile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cum_share
FROM rev
WINDOW w AS (PARTITION BY c_nationkey ORDER BY rev_u DESC, c_custkey)
"""


def q_cohort_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation shapes: first-year buyers EXCEPT final-year
    buyers (churned) and INTERSECT (retained), as counts. Spark plans
    EXCEPT/INTERSECT DISTINCT as LeftAnti/LeftSemi over the
    de-duplicated key projections — one column shuffles, never whole
    rows — and the year bounds are date-literal ranges so both scans
    prune at the parquet footer instead of evaluating year() per
    row."""
    o = load_table(spark, sf_dir, "orders")

    def buyers(lo: str, hi: str) -> DataFrame:
        return (
            o.where(
                (F.col("o_orderdate") >= F.lit(lo).cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(hi).cast("timestamp"))
            )
            .select("o_custkey")
            .distinct()
        )

    first = buyers("1995-01-01", "1996-01-01")
    last = buyers("2001-01-01", "2002-01-01")
    churned = (
        first.subtract(last)
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .select(F.lit("churned").alias("cohort"), "n_customers")
    )
    retained = (
        first.intersect(last)
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .select(F.lit("retained").alias("cohort"), "n_customers")
    )
    return churned.unionAll(retained)


SQL_COHORT_SET_OPS = """
SELECT 'churned' AS cohort, count(*) AS n_customers FROM (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
    AND o_orderdate <  TIMESTAMP '1996-01-01'
  EXCEPT
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '2001-01-01'
    AND o_orderdate <  TIMESTAMP '2002-01-01')
UNION ALL
SELECT 'retained', count(*) FROM (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
    AND o_orderdate <  TIMESTAMP '1996-01-01'
  INTERSECT
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '2001-01-01'
    AND o_orderdate <  TIMESTAMP '2002-01-01')
"""


Q9_NAME_FRAGMENT = "red"
# cost proxy: the schema has no partsupp/supplycost, so product cost is
# modeled as half the part's retail price — exact DECIMAL end to end
_PROFIT_DEC = (
    f"({_REV_DEC} - CAST(p_retailprice AS DECIMAL(12,2))"
    " * CAST(l_quantity AS DECIMAL(4,0)) * CAST(0.5 AS DECIMAL(2,1)))"
)


def q_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per (supplier nation, order year) over
    parts whose name contains '{Q9_NAME_FRAGMENT}' — revenue minus a
    retail-price cost proxy (this schema carries no supplycost). The
    LIKE predicate rides the broadcast part dimension and prunes fact
    rows AT the join; nation arrives through the broadcast supplier
    chain; the only shuffle is the lineitem⋈orders fact-fact join.
    Profit is exact DECIMAL arithmetic (scale-4 revenue minus scale-3
    cost), so the sum is partition-order-free."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    red = p.where(F.col("p_name").contains(Q9_NAME_FRAGMENT)).select(
        "p_partkey", "p_retailprice"
    )
    return (
        li.join(F.broadcast(red), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            F.round(
                F.expr(f"CAST(sum({_PROFIT_DEC}) AS DOUBLE)"), 6
            ).alias("profit"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


SQL_NATION_PROFIT = f"""
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       round(CAST(sum({_PROFIT_DEC}) AS DOUBLE), 6) AS profit,
       count(*) AS n_items
FROM lineitem
JOIN part     ON l_partkey = p_partkey AND p_name LIKE '%{Q9_NAME_FRAGMENT}%'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
GROUP BY n_name, year(o_orderdate)
"""


RETURNED_TOPK = 20


def q_returned_item_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: the {RETURNED_TOPK} customers who returned the
    most revenue (return flag 'R'), with their nation. The flag
    predicate pushes into the lineitem scan; customer and nation ride
    broadcast joins; the ranking key is the EXACT DECIMAL revenue sum
    (ties broken by custkey) so the top-k cut is partition-independent
    — and it is a bounded TakeOrderedAndProject, never a global
    sort."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.where(F.col("l_returnflag") == "R")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.expr(f"sum({_REV_DEC})").alias("rev_dec"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("rev_dec").desc(), "c_custkey")
        .limit(RETURNED_TOPK)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            F.round(F.col("rev_dec").cast("double"), 6).alias("revenue"),
            "n_items",
        )
    )


SQL_RETURNED_ITEM_RANKING = f"""
SELECT c_custkey, c_name, n_name,
       round(CAST(sum({_REV_DEC}) AS DOUBLE), 6) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY sum({_REV_DEC}) DESC, c_custkey LIMIT {RETURNED_TOPK}
"""


Q15_FROM = "1996-01-01"
Q15_TO = "1996-04-01"


def q_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) achieving the maximum revenue
    in one quarter — the correlated MAX-of-aggregate becomes
    aggregate → 1-row max → broadcast equality join-back, all on the
    EXACT DECIMAL total so the max and the equality are exact
    comparisons (no float max drift). The date range pushes into the
    lineitem scan; supplier is a broadcast dim on the supplier-count-
    sized revenue table."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    window = li.where(
        (F.col("l_shipdate") >= F.lit(Q15_FROM).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(Q15_TO).cast("timestamp"))
    )
    rev = window.groupBy(F.col("l_suppkey").alias("r_suppkey")).agg(
        F.expr(f"sum({_REV_DEC})").alias("total_dec")
    )
    mx = rev.agg(F.max("total_dec").alias("max_dec"))
    return (
        rev.join(F.broadcast(mx), rev.total_dec == F.col("max_dec"))
        .join(F.broadcast(s), F.col("r_suppkey") == s.s_suppkey)
        .select(
            F.col("s_suppkey"),
            "s_name",
            F.round(F.col("total_dec").cast("double"), 6).alias(
                "total_revenue"
            ),
        )
    )


SQL_TOP_REVENUE_SUPPLIER = f"""
WITH rev AS (
  SELECT l_suppkey AS r_suppkey, sum({_REV_DEC}) AS total_dec
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_FROM}'
    AND l_shipdate <  TIMESTAMP '{Q15_TO}'
  GROUP BY l_suppkey
),
mx AS (SELECT max(total_dec) AS max_dec FROM rev)
SELECT s_suppkey, s_name,
       round(CAST(total_dec AS DOUBLE), 6) AS total_revenue
FROM rev JOIN mx ON total_dec = max_dec
JOIN supplier ON r_suppkey = s_suppkey
"""


TRI_PRIORITY = "1-URGENT"


def q_copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph analytics: triangle census + global clustering
    coefficient of the part co-purchase graph (parts co-occurring in
    the same {TRI_PRIORITY} order are adjacent) — the
    community-density statistic of a product graph, and the third
    graph operator next to pagerank and connected components.

    Scale shape: the graph never materializes adjacency lists — edges
    are a fact-fact self-join on orderkey (one shuffle, both sides
    identically partitioned) collapsed by DISTINCT; triangles are
    counted with DEGREE-ORDERED ORIENTATION: every edge points from
    its lower-(degree, id) endpoint, so each triangle is enumerated
    exactly once and the wedge join fans out from low-degree vertices
    only — the standard O(m^1.5) bound instead of the naive
    sum-of-deg² wedge explosion (on this dataset: 6.8M wedges at
    sf0.1, of which the oriented join visits a fraction). Every join
    is an equi-join; counts are exact integers, and the clustering
    coefficient 3·triangles / wedges is one integer ratio."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    urgent = o.where(F.col("o_orderpriority") == TRI_PRIORITY).select(
        "o_orderkey"
    )
    items = li.join(
        urgent, li.l_orderkey == urgent.o_orderkey, "left_semi"
    ).select("l_orderkey", "l_partkey")
    a, b = items.alias("a"), items.alias("b")
    e0 = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .distinct()
    )
    deg = (
        e0.select(F.col("u").alias("node"))
        .unionAll(e0.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("node").alias("u_n"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v_n"), F.col("d").alias("dv"))
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    ori = (
        e0.join(du, F.col("u") == F.col("u_n"))
        .join(dv, F.col("v") == F.col("v_n"))
        .select(
            F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("t"),
        )
    )
    e1 = ori.select(F.col("s").alias("s1"), F.col("t").alias("t1"))
    e2 = ori.select(F.col("s").alias("s2"), F.col("t").alias("t2"))
    e3 = ori.select(F.col("s").alias("s3"), F.col("t").alias("t3"))
    tri = (
        e1.join(e2, F.col("t1") == F.col("s2"))
        .join(
            e3,
            (F.col("s1") == F.col("s3")) & (F.col("t2") == F.col("t3")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    nodes = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    edges = e0.agg(F.count(F.lit(1)).alias("n_edges"))
    wedges = deg.agg(
        F.expr("CAST(sum(d * (d - 1)) DIV 2 AS BIGINT)").alias("n_wedges")
    )
    return (
        nodes.crossJoin(F.broadcast(edges))
        .crossJoin(F.broadcast(wedges))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.round(
                F.when(
                    F.col("n_wedges") != 0,
                    3.0 * F.col("n_triangles") / F.col("n_wedges"),
                ),
                6,
            ).alias("clustering"),
        )
    )


SQL_COPURCHASE_TRIANGLES = f"""
WITH li AS (
  SELECT l_orderkey, l_partkey
  FROM lineitem
  WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                       WHERE o_orderpriority = '{TRI_PRIORITY}')
),
e0 AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
deg AS (
  SELECT x AS node, count(*) AS d
  FROM (SELECT u AS x FROM e0 UNION ALL SELECT v FROM e0) GROUP BY x
),
o AS (
  SELECT CASE WHEN (du.d, u) < (dv.d, v) THEN u ELSE v END AS s,
         CASE WHEN (du.d, u) < (dv.d, v) THEN v ELSE u END AS t
  FROM e0 JOIN deg du ON u = du.node JOIN deg dv ON v = dv.node
),
stats AS (
  SELECT (SELECT count(*) FROM deg) AS n_nodes,
         (SELECT count(*) FROM e0) AS n_edges,
         (SELECT CAST(sum(d * (d - 1)) AS BIGINT) // 2 FROM deg) AS n_wedges,
         (SELECT count(*) FROM o e1
          JOIN o e2 ON e1.t = e2.s
          JOIN o e3 ON e1.s = e3.s AND e2.t = e3.t) AS n_triangles
)
SELECT n_nodes, n_edges, n_wedges, n_triangles,
       round(CASE WHEN n_wedges <> 0
                  THEN 3.0 * n_triangles / n_wedges END, 6) AS clustering
FROM stats
"""


# ------------------------------------------- archetype sweep closure
# Q3 / Q6 / Q11 / Q14 / Q16 / Q20 shapes — the last six of the 22
# TPC-H archetypes, reshaped onto the available star schema (no
# partsupp table: supplier-part relationships come from lineitem).
# Same rules as the rest of the block: dimensions broadcast, facts
# aggregate before they shuffle, money stays in exact DECIMAL until
# the final rounded-double projection.

Q3_SEGMENT = "BUILDING"
Q3_CUTOFF = "1998-06-15"
Q3_TOPK = 10


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: the {Q3_TOPK} highest-revenue orders placed
    before the cutoff but still unshipped after it, for one market
    segment. The segment filter is a broadcast LEFT SEMI against the
    customer dim (orders shuffle zero bytes for it); the only shuffle
    is the date-pruned lineitem⋈orders fact join plus the group-by,
    and the final top-k is TakeOrderedAndProject — ordered on the
    EXACT decimal revenue with l_orderkey as tiebreak, so the cut line
    is deterministic under any partitioning."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cut = F.to_timestamp(F.lit(Q3_CUTOFF))
    seg = c.where(F.col("c_mktsegment") == Q3_SEGMENT).select("c_custkey")
    open_orders = o.where(F.col("o_orderdate") < cut).join(
        F.broadcast(seg), o.o_custkey == seg.c_custkey, "left_semi"
    )
    return (
        li.where(F.col("l_shipdate") > cut)
        .join(open_orders, li.l_orderkey == open_orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.expr(f"sum({_REV_DEC})").alias("rev_dec"))
        .orderBy(F.col("rev_dec").desc(), "l_orderkey")
        .limit(Q3_TOPK)
        .select(
            "l_orderkey",
            "o_orderdate",
            "o_orderpriority",
            F.round(F.col("rev_dec").cast("double"), 6).alias("revenue"),
        )
    )


SQL_SHIPPING_PRIORITY = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       round(CAST(sum({_REV_DEC}) AS DOUBLE), 6) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderdate < TIMESTAMP '{Q3_CUTOFF}'
  AND l_shipdate  > TIMESTAMP '{Q3_CUTOFF}'
  AND o_custkey IN (SELECT c_custkey FROM customer
                    WHERE c_mktsegment = '{Q3_SEGMENT}')
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY sum({_REV_DEC}) DESC, l_orderkey
LIMIT {Q3_TOPK}
"""

# the discount delta is DECIMAL(18,2)·DECIMAL(4,2) — exact integer
# arithmetic at scale 4, order-free under any partitioning
_DISC_DEC = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(4,2))"
)


def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: revenue gained by eliminating a discount band
    for one ship year — a single scan whose THREE range predicates
    (ship-year bounds, discount band, quantity cap) are all plain
    comparisons, so every one reaches the parquet scan as a pushed
    filter and row groups outside the year never leave disk. The
    plan is scan → map-side partial sum → 1-row exchange: the
    cheapest possible shape, and the yardstick that the scan layer
    prunes correctly (asserted in tests/test_plans.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1999-01-01")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("2000-01-01")))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.expr(f"CAST(sum({_DISC_DEC}) AS DOUBLE)"), 6
            ).alias("revenue_delta")
        )
    )


SQL_FORECAST_REVENUE = f"""
SELECT round(CAST(sum({_DISC_DEC}) AS DOUBLE), 6) AS revenue_delta
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1999-01-01'
  AND l_shipdate <  TIMESTAMP '2000-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


def q_part_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose revenue exceeds 0.1% of TOTAL
    revenue. The scalar subquery de-correlates into a re-aggregation
    of the per-part frame itself — lineitem is scanned ONCE, the
    grand total is a second-stage fold over the already-collapsed
    part rows, and the threshold comparison is pure decimal integer
    arithmetic (``val·1000 > total``, no float division), broadcast
    as a 1-row frame."""
    li = load_table(spark, sf_dir, "lineitem")
    vals = li.groupBy("l_partkey").agg(
        F.expr(f"sum({_REV_DEC})").alias("val_dec")
    )
    total = vals.agg(F.expr("sum(val_dec)").alias("tot_dec"))
    return (
        vals.crossJoin(F.broadcast(total))
        .where(F.expr("val_dec * 1000 > tot_dec"))
        .select(
            "l_partkey",
            F.round(F.col("val_dec").cast("double"), 6).alias("part_value"),
        )
    )


SQL_PART_VALUE_CONCENTRATION = f"""
WITH vals AS (
  SELECT l_partkey, sum({_REV_DEC}) AS val_dec
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, round(CAST(val_dec AS DOUBLE), 6) AS part_value
FROM vals CROSS JOIN (SELECT sum(val_dec) AS tot_dec FROM vals) t
WHERE val_dec * 1000 > tot_dec
"""

# exact promo indicator: revenue × {0,1} as DECIMAL(1,0) keeps the
# conditional sum in the same exact-decimal lattice on both engines
# (a CASE whose ELSE is a bare 0 infers different decimal types in
# Spark vs DuckDB)
_PROMO_DEC = (
    f"{_REV_DEC} * (CASE WHEN p_type = 'PROMO' THEN CAST(1 AS DECIMAL(1,0)) "
    "ELSE CAST(0 AS DECIMAL(1,0)) END)"
)


def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share per ship year — the
    conditional-aggregate ratio. One broadcast part join, one
    group-by; numerator and denominator fold in the SAME aggregate
    pass (two filtered scans would read lineitem twice), both exact
    decimal until the final rounded ratio."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.year("l_shipdate").alias("l_year"))
        .agg(
            F.expr(f"sum({_PROMO_DEC})").alias("promo_dec"),
            F.expr(f"sum({_REV_DEC})").alias("tot_dec"),
        )
        .select(
            "l_year",
            F.round(
                F.lit(100.0)
                * F.col("promo_dec").cast("double")
                / F.col("tot_dec").cast("double"),
                6,
            ).alias("promo_share"),
        )
    )


SQL_PROMO_REVENUE = f"""
SELECT year(l_shipdate) AS l_year,
       round(100.0 * CAST(sum({_PROMO_DEC}) AS DOUBLE)
                   / CAST(sum({_REV_DEC}) AS DOUBLE), 6) AS promo_share
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY year(l_shipdate)
"""

Q16_EXCL_BRAND = "Brand#4"
Q16_SIZES = (1, 5, 9, 14, 19, 23, 36, 45)


def q_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many DISTINCT suppliers ship each
    (brand, type, size) combination, excluding one brand, a size
    whitelist, and suppliers in bad standing (negative account
    balance — the complaints analog). The NOT IN is a broadcast LEFT
    ANTI join (the exclusion list is dimension-sized); the brand/size
    predicates ride the broadcast part dim; the distinct count is
    Spark's standard two-phase partial-distinct aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    keep = p.where(
        (F.col("p_brand") != Q16_EXCL_BRAND)
        & F.col("p_size").isin(*Q16_SIZES)
    )
    bad = s.where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(keep), li.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


SQL_SUPPLIER_PART_VARIETY = f"""
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> '{Q16_EXCL_BRAND}'
  AND p_size IN {Q16_SIZES}
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""

Q20_TYPE = "PROMO"
Q20_YEAR = "1998"


def q_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: the nested semi-join chain — suppliers who
    shipped MORE THAN HALF of a promo part's total {Q20_YEAR} volume,
    with how many parts each dominates. partsupp's availability
    threshold becomes a shipped-share threshold on lineitem: per
    (part, supplier) quantities aggregate FIRST (one shuffle on the
    pair key), the per-part total is a re-aggregation of those
    collapsed rows (lineitem is scanned once), and the >50% test is
    exact integer arithmetic (``2·qty > total``). The surviving pair
    set joins back to supplier/nation as broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    promo = p.where(F.col("p_type") == Q20_TYPE).select("p_partkey")
    pairs = (
        li.where(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit(f"{Q20_YEAR}-01-01")))
            & (
                F.col("l_shipdate")
                < F.to_timestamp(F.lit(f"{int(Q20_YEAR) + 1}-01-01"))
            )
        )
        .join(F.broadcast(promo), li.l_partkey == promo.p_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.expr("CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)").alias("qty"))
    )
    totals = pairs.groupBy(F.col("l_partkey").alias("t_key")).agg(
        F.sum("qty").alias("tot_qty")
    )
    dom = pairs.join(totals, pairs.l_partkey == totals.t_key).where(
        F.col("qty") * 2 > F.col("tot_qty")
    )
    per_supp = dom.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n_dominated")
    )
    return (
        per_supp.join(F.broadcast(s), per_supp.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select(
            "s_name", F.col("n_name").alias("supp_nation"), "n_dominated"
        )
    )


SQL_DOMINANT_SUPPLIER = f"""
WITH pairs AS (
  SELECT l_partkey, l_suppkey,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q20_YEAR}-01-01'
    AND l_shipdate <  TIMESTAMP '{int(Q20_YEAR) + 1}-01-01'
    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_type = '{Q20_TYPE}')
  GROUP BY l_partkey, l_suppkey
), totals AS (
  SELECT l_partkey AS t_key, CAST(sum(qty) AS BIGINT) AS tot_qty
  FROM pairs GROUP BY l_partkey
), dom AS (
  SELECT l_suppkey FROM pairs JOIN totals ON l_partkey = t_key
  WHERE qty * 2 > tot_qty
)
SELECT s_name, n_name AS supp_nation,
       CAST(count(*) AS BIGINT) AS n_dominated
FROM dom
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY s_name, n_name
"""


# --------------------------------------------------- data-quality audit

EXP_QTY_LO, EXP_QTY_HI = 1.0, 50.0  # TPC-H l_quantity contract
EXP_DISC_LO, EXP_DISC_HI = 0.0, 0.1  # l_discount contract


def q_table_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality audit (the Deequ/expectations
    archetype): completeness, value-range, primary-key-uniqueness, and
    referential-integrity checks over lineitem, each emitted as one
    (check, value, ok) row — the validation gate a 100 TB ingest runs
    before publishing a partition.

    Scale shape: every ROW-level check folds into ONE map-side
    conditional aggregate over a single lineitem scan (adding a check
    adds a column, not a pass); the two set-level checks are the
    irreducible extras — PK uniqueness is one exact distinct-count on
    the key pair (hash agg on the natural clustering key), and the FK
    orphan check is a left-anti join against the orders keys (no
    row-level trick can see across rows). Output is a fixed ~6-row
    audit frame; ok booleans are exact-integer decisions."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    n = F.count(F.lit(1))
    row = li.agg(
        n.alias("n"),
        F.sum(F.col("l_shipdate").isNull().cast("long")).alias("null_ship"),
        F.sum(
            (~F.col("l_quantity").between(EXP_QTY_LO, EXP_QTY_HI)).cast("long")
        ).alias("qty_viol"),
        F.sum(
            (~F.col("l_discount").between(EXP_DISC_LO, EXP_DISC_HI)).cast(
                "long"
            )
        ).alias("disc_viol"),
        # null-safe struct: multi-arg count_distinct DROPS rows where any
        # key column is NULL, but DuckDB's count(DISTINCT (a, b)) counts
        # NULL-field structs — a struct wrapper matches both the oracle
        # and the intended "duplicate PK" semantics
        F.count_distinct(
            F.struct(F.col("l_orderkey"), F.col("l_linenumber"))
        ).alias("n_keys"),
    )
    orphans = (
        li.select("l_orderkey")
        .join(
            orders.select(F.col("o_orderkey").alias("l_orderkey")),
            "l_orderkey",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n_orphans"))
    )
    j = row.crossJoin(F.broadcast(orphans))

    def check(name: str, value, ok) -> DataFrame:
        return j.select(
            F.lit(name).alias("check"),
            F.round(value.cast("double"), 6).alias("value"),
            ok.alias("ok"),
        )

    nn = F.col("n")
    return (
        check("row_count", nn, nn > 0)
        .unionAll(
            check(
                "shipdate_completeness",
                (nn - F.col("null_ship")) / nn,
                F.col("null_ship") == 0,
            )
        )
        .unionAll(
            check(
                "quantity_in_range_frac",
                (nn - F.col("qty_viol")) / nn,
                F.col("qty_viol") == 0,
            )
        )
        .unionAll(
            check(
                "discount_in_range_frac",
                (nn - F.col("disc_viol")) / nn,
                F.col("disc_viol") == 0,
            )
        )
        .unionAll(
            check(
                "pk_duplicate_rows",
                nn - F.col("n_keys"),
                nn == F.col("n_keys"),
            )
        )
        .unionAll(
            check("fk_orphan_rows", F.col("n_orphans"), F.col("n_orphans") == 0)
        )
    )


SQL_TABLE_EXPECTATIONS = f"""
WITH row_agg AS (
  SELECT count(*) AS n,
         CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS null_ship,
         CAST(sum(CASE WHEN l_quantity NOT BETWEEN {EXP_QTY_LO} AND {EXP_QTY_HI}
                       THEN 1 ELSE 0 END) AS BIGINT) AS qty_viol,
         CAST(sum(CASE WHEN l_discount NOT BETWEEN {EXP_DISC_LO} AND {EXP_DISC_HI}
                       THEN 1 ELSE 0 END) AS BIGINT) AS disc_viol,
         count(DISTINCT (l_orderkey, l_linenumber)) AS n_keys
  FROM lineitem
),
orph AS (
  SELECT count(*) AS n_orphans
  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderkey IS NULL
),
j AS (SELECT * FROM row_agg CROSS JOIN orph)
SELECT 'row_count' AS check, round(CAST(n AS DOUBLE), 6) AS value, n > 0 AS ok
FROM j
UNION ALL
SELECT 'shipdate_completeness',
       round((n - null_ship) / CAST(n AS DOUBLE), 6), null_ship = 0 FROM j
UNION ALL
SELECT 'quantity_in_range_frac',
       round((n - qty_viol) / CAST(n AS DOUBLE), 6), qty_viol = 0 FROM j
UNION ALL
SELECT 'discount_in_range_frac',
       round((n - disc_viol) / CAST(n AS DOUBLE), 6), disc_viol = 0 FROM j
UNION ALL
SELECT 'pk_duplicate_rows',
       round(CAST(n - n_keys AS DOUBLE), 6), n = n_keys FROM j
UNION ALL
SELECT 'fk_orphan_rows',
       round(CAST(n_orphans AS DOUBLE), 6), n_orphans = 0 FROM j
"""


QUERIES = {
    "table_expectations": Query(q_table_expectations, SQL_TABLE_EXPECTATIONS),
    "pricing_summary": Query(q_pricing_summary, SQL_PRICING_SUMMARY),
    "rfm_segments": Query(q_rfm_segments, SQL_RFM_SEGMENTS),
    "rfm_segments_approx": Query(
        q_rfm_segments_approx, SQL_RFM_SEGMENTS_APPROX
    ),
    "price_percentiles": Query(q_price_percentiles, SQL_PRICE_PERCENTILES),
    # sketch estimates are engine-specific: rows-only by design; the
    # exact twin above is the accuracy reference
    "price_percentiles_approx": Query(
        q_price_percentiles_approx, SQL_PRICE_PERCENTILES_APPROX
    ),
    "star_revenue": Query(q_star_revenue, SQL_STAR_REVENUE),
    "top_customers_per_nation": Query(
        q_top_customers_per_nation, SQL_TOP_CUSTOMERS_PER_NATION
    ),
    "priority_with_discounted": Query(
        q_priority_with_discounted, SQL_PRIORITY_WITH_DISCOUNTED
    ),
    "customers_without_orders": Query(
        q_customers_without_orders, SQL_CUSTOMERS_WITHOUT_ORDERS
    ),
    "rollup_sales": Query(q_rollup_sales, SQL_ROLLUP_SALES),
    "cumulative_customer_value": Query(
        q_cumulative_customer_value, SQL_CUMULATIVE_CUSTOMER_VALUE
    ),
    "daily_order_summary": Query(q_daily_order_summary, SQL_DAILY_ORDER_SUMMARY),
    "distinct_parts_per_supplier": Query(
        q_distinct_parts_per_supplier, SQL_DISTINCT_PARTS_PER_SUPPLIER
    ),
    "approx_distinct_parts": Query(
        q_approx_distinct_parts, SQL_APPROX_DISTINCT_PARTS
    ),
    "segment_share": Query(q_segment_share, SQL_SEGMENT_SHARE),
    "cube_corpus": Query(q_cube_corpus, SQL_CUBE_CORPUS),
    "order_count_distribution": Query(
        q_order_count_distribution, SQL_ORDER_COUNT_DISTRIBUTION
    ),
    "large_orders": Query(q_large_orders, SQL_LARGE_ORDERS),
    "nation_trade_volume": Query(
        q_nation_trade_volume, SQL_NATION_TRADE_VOLUME
    ),
    "market_share": Query(q_market_share, SQL_MARKET_SHARE),
    "cheapest_supplier_per_part": Query(
        q_cheapest_supplier_per_part, SQL_CHEAPEST_SUPPLIER_PER_PART
    ),
    "above_customer_avg": Query(q_above_customer_avg, SQL_ABOVE_CUSTOMER_AVG),
    "pivot_priority_segment": Query(
        q_pivot_priority_segment, SQL_PIVOT_PRIORITY_SEGMENT
    ),
    "unpivot_lineitem_stats": Query(
        q_unpivot_lineitem_stats, SQL_UNPIVOT_LINEITEM_STATS
    ),
    "late_ship_exists": Query(q_late_ship_exists, SQL_LATE_SHIP_EXISTS),
    "priority_line_buckets": Query(
        q_priority_line_buckets, SQL_PRIORITY_LINE_BUCKETS
    ),
    "small_quantity_revenue": Query(
        q_small_quantity_revenue, SQL_SMALL_QUANTITY_REVENUE
    ),
    "disjunctive_band_revenue": Query(
        q_disjunctive_band_revenue, SQL_DISJUNCTIVE_BAND_REVENUE
    ),
    "sole_latest_supplier": Query(
        q_sole_latest_supplier, SQL_SOLE_LATEST_SUPPLIER
    ),
    "lapsed_rich_customers": Query(
        q_lapsed_rich_customers, SQL_LAPSED_RICH_CUSTOMERS
    ),
    "customer_value_deciles": Query(
        q_customer_value_deciles, SQL_CUSTOMER_VALUE_DECILES
    ),
    "cohort_set_ops": Query(q_cohort_set_ops, SQL_COHORT_SET_OPS),
    "copurchase_triangles": Query(
        q_copurchase_triangles, SQL_COPURCHASE_TRIANGLES
    ),
    "nation_profit": Query(q_nation_profit, SQL_NATION_PROFIT),
    "returned_item_ranking": Query(
        q_returned_item_ranking, SQL_RETURNED_ITEM_RANKING
    ),
    "top_revenue_supplier": Query(
        q_top_revenue_supplier, SQL_TOP_REVENUE_SUPPLIER
    ),
    "shipping_priority": Query(q_shipping_priority, SQL_SHIPPING_PRIORITY),
    "forecast_revenue": Query(q_forecast_revenue, SQL_FORECAST_REVENUE),
    "part_value_concentration": Query(
        q_part_value_concentration, SQL_PART_VALUE_CONCENTRATION
    ),
    "promo_revenue": Query(q_promo_revenue, SQL_PROMO_REVENUE),
    "supplier_part_variety": Query(
        q_supplier_part_variety, SQL_SUPPLIER_PART_VARIETY
    ),
    "dominant_supplier": Query(q_dominant_supplier, SQL_DOMINANT_SUPPLIER),
}
