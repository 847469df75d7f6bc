"""Star-schema multi-join rollups (TPC-H Q3 / Q5 shapes).

The classic decision-support joins over the fixture star schema — the
canonical demonstration that dimension joins broadcast and the fact
table is touched exactly once:

- **Shipping priority** (``agg_shipping_priority``, Q3 shape): segment-
  filtered customers ⋈ date-filtered orders ⋈ shipdate-filtered
  lineitem, top-10 orders by revenue. customer and the filtered orders
  are broadcast (both shrink far below the broadcast threshold after
  their filters), so lineitem — the 100 TB side — streams through two
  broadcast hash joins with its shipdate predicate pushed to the scan,
  then one hash aggregate on the orderkey. Top-10 is a
  TakeOrderedAndProject heap, not a global sort.

- **Regional supplier volume** (``agg_region_revenue``, Q5 shape): the
  six-way join region→nation→customer→orders→lineitem→supplier with
  the co-location predicate c_nationkey = s_nationkey. Every dimension
  (region, nation, customer, supplier) broadcasts; orders⋈lineitem is
  the one shuffle pair, and revenue reduces per nation through DECIMAL
  so the partition-parallel sum is exact.

Revenue sums are ordered on the exact DECIMAL aggregate (not the
rounded double) with a key tiebreak, so top-k selection is
deterministic and engine-portable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_project_spark.functions.scalars import round_portable, round_portable_sql
from bigdata_project_spark.sources.readers import load_table

_DEC = "decimal(18,2)"

Q3_SEGMENT = "BUILDING"
Q3_DATE = "1998-01-01"

Q5_REGION = "ASIA"
Q5_DATE_LO, Q5_DATE_HI = "1996-01-01", "1997-01-01"


def _revenue() -> Column:
    price = F.col("l_extendedprice").cast(_DEC)
    disc = F.col("l_discount").cast(_DEC)
    return price * (F.lit(1).cast(_DEC) - disc)


_REVENUE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
)


def query_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == Q3_SEGMENT
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < Q3_DATE
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > Q3_DATE)
    joined = li.join(
        F.broadcast(orders), F.col("l_orderkey") == F.col("o_orderkey")
    ).join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
    agg = joined.groupBy("l_orderkey", "o_orderdate").agg(
        F.sum(_revenue()).alias("rev_dec"), F.count(F.lit(1)).alias("n_items")
    )
    return (
        agg.orderBy(F.col("rev_dec").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            round_portable(F.col("rev_dec").cast("double"), 2).alias("revenue"),
            "n_items",
        )
    )


ORACLE_SHIPPING_PRIORITY = f"""
WITH agg AS (
    SELECT l_orderkey, o_orderdate,
           SUM({_REVENUE_SQL}) AS rev_dec,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = '{Q3_SEGMENT}'
      AND o_orderdate < TIMESTAMP '{Q3_DATE} 00:00:00'
      AND l_shipdate > TIMESTAMP '{Q3_DATE} 00:00:00'
    GROUP BY l_orderkey, o_orderdate
)
SELECT l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       {round_portable_sql("CAST(rev_dec AS DOUBLE)", 2)} AS revenue,
       n_items
FROM agg
ORDER BY rev_dec DESC, l_orderkey ASC
LIMIT 10
"""


def query_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == Q5_REGION)
    nation = load_table(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    cust = load_table(spark, sf_dir, "customer").join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= Q5_DATE_LO) & (F.col("o_orderdate") < Q5_DATE_HI)
    )
    li = load_table(spark, sf_dir, "lineitem")
    joined = (
        li.join(F.broadcast(orders), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
    )
    agg = joined.groupBy("n_name").agg(F.sum(_revenue()).alias("rev_dec"))
    return agg.orderBy(F.col("rev_dec").desc(), F.col("n_name").asc()).select(
        "n_name",
        round_portable(F.col("rev_dec").cast("double"), 2).alias("revenue"),
    )


ORACLE_REGION_REVENUE = f"""
WITH agg AS (
    SELECT n_name, SUM({_REVENUE_SQL}) AS rev_dec
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = '{Q5_REGION}'
      AND o_orderdate >= TIMESTAMP '{Q5_DATE_LO} 00:00:00'
      AND o_orderdate < TIMESTAMP '{Q5_DATE_HI} 00:00:00'
    GROUP BY n_name
)
SELECT n_name,
       {round_portable_sql("CAST(rev_dec AS DOUBLE)", 2)} AS revenue
FROM agg
ORDER BY rev_dec DESC, n_name ASC
"""


Q10_DATE_LO, Q10_DATE_HI = "1997-01-01", "1997-07-01"


def query_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: revenue lost to returned items per customer over a
    quarter-ish window — lineitem filtered to returnflag 'R' joins the
    date-filtered orders (broadcast after its filter) and the customer +
    nation dims (broadcast), one hash aggregate on the customer, top-20
    by the exact DECIMAL revenue with a key tiebreak."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= Q10_DATE_LO) & (F.col("o_orderdate") < Q10_DATE_HI)
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    joined = (
        li.join(F.broadcast(orders), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    agg = joined.groupBy("c_custkey", "c_name", "n_name").agg(
        F.sum(_revenue()).alias("rev_dec"), F.count(F.lit(1)).alias("n_items")
    )
    return (
        agg.orderBy(F.col("rev_dec").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            round_portable(F.col("rev_dec").cast("double"), 2).alias("revenue"),
            "n_items",
        )
    )


ORACLE_RETURNED_ITEMS = f"""
WITH agg AS (
    SELECT c_custkey, c_name, n_name,
           SUM({_REVENUE_SQL}) AS rev_dec,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '{Q10_DATE_LO} 00:00:00'
      AND o_orderdate < TIMESTAMP '{Q10_DATE_HI} 00:00:00'
    GROUP BY c_custkey, c_name, n_name
)
SELECT c_custkey, c_name, n_name,
       {round_portable_sql("CAST(rev_dec AS DOUBLE)", 2)} AS revenue,
       n_items
FROM agg
ORDER BY rev_dec DESC, c_custkey ASC
LIMIT 20
"""


Q4_DATE_LO, Q4_DATE_HI = "1997-01-01", "1997-04-01"
Q4_LATE_DAYS = 60


def query_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: per-priority count of orders (in a quarter) that have at
    least one LATE lineitem — an EXISTS semi-join whose condition
    correlates both sides (l_shipdate > o_orderdate + 60 days), the
    step past J4's uncorrelated IN-subquery. Plans as a LeftSemi hash
    join on the orderkey with the date comparison as residual: one scan
    of each side, no duplication of matching orders no matter how many
    late lineitems they have."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= Q4_DATE_LO) & (F.col("o_orderdate") < Q4_DATE_HI)
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), Q4_LATE_DAYS)),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


ORACLE_ORDER_PRIORITY = f"""
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE o_orderdate >= TIMESTAMP '{Q4_DATE_LO} 00:00:00'
  AND o_orderdate < TIMESTAMP '{Q4_DATE_HI} 00:00:00'
  AND EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL {Q4_LATE_DAYS} DAY
  )
GROUP BY o_orderpriority
"""


Q14_DATE_LO, Q14_DATE_HI = "1997-01-01", "1997-02-01"


def query_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: share of a month's revenue from PROMO-type parts — the
    conditional-aggregate-ratio over a fact⋈dim join (the one query
    family that exercises the `part` dimension). part broadcasts;
    lineitem streams through with its shipdate filter pushed to the
    scan; both sums reduce in ONE hash aggregate (no second pass for
    the conditional numerator)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= Q14_DATE_LO) & (F.col("l_shipdate") < Q14_DATE_HI)
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    joined = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    agg = joined.agg(
        F.sum(
            F.when(F.col("p_type") == "PROMO", _revenue()).otherwise(
                F.lit(0).cast("decimal(18,2)")
            )
        ).alias("promo_dec"),
        F.sum(_revenue()).alias("total_dec"),
        F.count(F.lit(1)).alias("n_items"),
    )
    return agg.select(
        round_portable(F.col("promo_dec").cast("double"), 2).alias("promo_revenue"),
        round_portable(F.col("total_dec").cast("double"), 2).alias("total_revenue"),
        round_portable(
            F.lit(100.0) * F.col("promo_dec").cast("double")
            / F.col("total_dec").cast("double"),
            6,
        ).alias("promo_pct"),
        "n_items",
    )


ORACLE_PROMO_REVENUE = f"""
WITH agg AS (
    SELECT SUM(CASE WHEN p_type = 'PROMO' THEN {_REVENUE_SQL}
                    ELSE CAST(0 AS DECIMAL(18,2)) END) AS promo_dec,
           SUM({_REVENUE_SQL}) AS total_dec,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '{Q14_DATE_LO} 00:00:00'
      AND l_shipdate < TIMESTAMP '{Q14_DATE_HI} 00:00:00'
)
SELECT {round_portable_sql("CAST(promo_dec AS DOUBLE)", 2)} AS promo_revenue,
       {round_portable_sql("CAST(total_dec AS DOUBLE)", 2)} AS total_revenue,
       {round_portable_sql("100.0 * CAST(promo_dec AS DOUBLE) / CAST(total_dec AS DOUBLE)", 6)} AS promo_pct,
       n_items
FROM agg
"""
