"""Additional TPC-H-shaped queries (Q2/Q14/Q22 adapted to the driver
star schema — it has no partsupp, so Q2's correlated-min runs on
part prices): nested/decorrelated subqueries, conditional-aggregate
ratios, anti-join + scalar-subquery composition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_kafka_2_spark.io import read_table
from bigdata_kafka_2_spark.plans import register


@register(
    "q222_min_price_per_brand",
    oracle="""
    SELECT p.p_brand, p.p_partkey, round(p.p_retailprice, 2) AS price
    FROM part p
    WHERE p.p_retailprice = (
      SELECT min(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = p.p_brand
    )
    """,
    description="TPC-H Q2 shape (correlated min subquery): the "
    "cheapest part(s) per brand. Catalyst decorrelates to an "
    "aggregate + join. (Renumbered from q80 in r11: the compact "
    "qNN bench key collided with q80_unigram_logprob.)",
    tags=("subquery", "join", "sql"),
)
def q222_min_price_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    read_table(spark, sf_dir, "part").createOrReplaceTempView("part_v80")
    return spark.sql(
        """
        SELECT p.p_brand, p.p_partkey, round(p.p_retailprice, 2) AS price
        FROM part_v80 p
        WHERE p.p_retailprice = (
          SELECT min(p2.p_retailprice) FROM part_v80 p2
          WHERE p2.p_brand = p.p_brand
        )
        """
    )


@register(
    "q223_promo_revenue_ratio",
    oracle="""
    SELECT round(
             100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    """,
    description="TPC-H Q14 shape: conditional-aggregate ratio (promo "
    "revenue share) over a broadcast join + date filter. "
    "(Renumbered from q81 in r11: the compact qNN bench key "
    "collided with q81_curation_v2.)",
    tags=("join", "aggregate"),
)
def q223_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    p = read_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    return joined.agg(
        F.round(
            100.0
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
            / F.sum(rev),
            4,
        ).alias("promo_pct")
    )


@register(
    "q83_supplier_balance_by_region",
    oracle="""
    SELECT r_name, n_name,
           count(*) AS n_suppliers,
           round(sum(s_acctbal), 2) AS total_bal,
           round(avg(s_acctbal), 4) AS avg_bal
    FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
    description="Supplier roll-up through the nation→region dimension "
    "chain (completes star-schema table coverage; both dims "
    "broadcast).",
    tags=("join", "aggregate"),
)
def q83_supplier_balance_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    joined = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return joined.groupBy("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.round(F.sum("s_acctbal"), 2).alias("total_bal"),
        F.round(F.avg("s_acctbal"), 4).alias("avg_bal"),
    )


@register(
    "q82_rich_inactive_customers",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_custs,
           round(sum(c_acctbal), 2) AS total_bal
    FROM customer c
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    """,
    description="TPC-H Q22 shape: scalar subquery (global positive-"
    "balance average) + anti join (no URGENT order) + grouped "
    "aggregate. The priority filter keeps the result NON-empty "
    "on the driver data — every customer has some order, so the "
    "unfiltered anti join validated nothing (the q09 lesson).",
    tags=("subquery", "join", "aggregate", "sql"),
)
def q82_rich_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    read_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_v82")
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v82")
    return spark.sql(
        """
        SELECT c_mktsegment, count(*) AS n_custs,
               round(sum(c_acctbal), 2) AS total_bal
        FROM customer_v82 c
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer_v82
                           WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders_v82
                          WHERE o_custkey = c_custkey
                            AND o_orderpriority = '1-URGENT')
        GROUP BY c_mktsegment
        """
    )