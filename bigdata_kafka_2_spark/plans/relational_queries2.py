"""Second relational batch: remaining §2.11 gap operators (intersect,
union, cube, exact percentiles, array/map functions, correlated
subqueries, min_by/max_by, unpivot) plus TPC-H-shaped classics and the
as-of join custom operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_kafka_2_spark.io import read_table
from bigdata_kafka_2_spark.plans import register


@register(
    "q21_intersect_union",
    oracle="""
    SELECT 'both' AS src, o_custkey FROM (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    )
    UNION ALL
    SELECT 'p_only' AS src, o_custkey FROM (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderstatus IN ('F', 'O')
    )
    """,
    description="INTERSECT + EXCEPT + UNION ALL composition over order "
    "statuses (set-op gap, §2.11).",
    tags=("setop",),
)
def q21_intersect_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")

    def cust(status: str) -> DataFrame:
        return o.filter(F.col("o_orderstatus") == status).select("o_custkey")

    both = cust("F").intersect(cust("O")).select(F.lit("both").alias("src"), "o_custkey")
    p_only = (
        cust("P")
        .subtract(cust("F").union(cust("O")))
        .select(F.lit("p_only").alias("src"), "o_custkey")
    )
    return both.unionAll(p_only)


@register(
    "q22_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    description="CUBE over status×priority (grouping-sets gap, §2.11).",
    tags=("aggregate", "rollup"),
)
def q22_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@register(
    "q23_percentiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
           round(min(l_extendedprice), 2) AS min_price,
           round(max(l_extendedprice), 2) AS max_price
    FROM lineitem GROUP BY l_returnflag
    """,
    description="Exact continuous percentiles (Spark `percentile` == "
    "DuckDB quantile_cont, linear interpolation). "
    "percentile_approx is the sketch-based scale path but is "
    "not oracle-comparable.",
    tags=("aggregate",),
)
def q23_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = read_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("p90"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
    )


@register(
    "q24_min_max_by",
    oracle="""
    SELECT c_mktsegment,
           min_by(c_name, c_acctbal) AS poorest,
           max_by(c_name, c_acctbal) AS richest
    FROM customer GROUP BY c_mktsegment
    """,
    description="min_by/max_by argmin-argmax aggregates (§2.11 gap). "
    "c_acctbal ties are absent in the synthetic data "
    "(verified), so the result is deterministic.",
    tags=("aggregate",),
)
def q24_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.min_by("c_name", "c_acctbal").alias("poorest"),
        F.max_by("c_name", "c_acctbal").alias("richest"),
    )


@register(
    "q25_array_agg",
    oracle="""
    SELECT n_regionkey,
           array_to_string(list_sort(list(n_name)), ',') AS nations,
           len(list(n_name)) AS n_nations
    FROM nation GROUP BY n_regionkey
    """,
    description="Array aggregation + sort + join-to-string (array "
    "functions gap; sorted so the value-hash is "
    "order-insensitive).",
    tags=("aggregate", "array"),
)
def q25_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = read_table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
        F.size(F.collect_list("n_name")).cast("long").alias("n_nations"),
    )


@register(
    "q26_correlated_subquery",
    oracle="""
    SELECT c_custkey, round(c_acctbal, 2) AS acctbal
    FROM customer c
    WHERE c_acctbal > (
      SELECT avg(c2.c_acctbal) FROM customer c2
      WHERE c2.c_mktsegment = c.c_mktsegment
    )
    """,
    description="Correlated scalar subquery: customers above their "
    "segment's average balance (decorrelates to a join; "
    "expressed via the SQL API to exercise it).",
    tags=("subquery", "sql"),
)
def q26_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    read_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    return spark.sql(
        """
        SELECT c_custkey, round(c_acctbal, 2) AS acctbal
        FROM customer_v c
        WHERE c_acctbal > (
          SELECT avg(c2.c_acctbal) FROM customer_v c2
          WHERE c2.c_mktsegment = c.c_mktsegment
        )
        """
    )


@register(
    "q27_unpivot",
    oracle="""
    SELECT p_partkey, metric, round(val, 2) AS val
    FROM (
      SELECT p_partkey, 'retail' AS metric, p_retailprice AS val FROM part
      UNION ALL
      SELECT p_partkey, 'size', CAST(p_size AS DOUBLE) FROM part
    ) WHERE p_partkey < 100
    """,
    description="Unpivot (wide→long) via stack (§2.11 pivot "
    "counterpart).",
    tags=("pivot",),
)
def q27_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = read_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 100)
    return p.select(
        "p_partkey",
        F.expr(
            "stack(2, 'retail', p_retailprice, 'size', CAST(p_size AS DOUBLE)) "
            "AS (metric, val)"
        ),
    ).select("p_partkey", "metric", F.round("val", 2).alias("val"))


@register(
    "q96_string_functions",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_upper,
           substr(p_type, 1, 4) AS type_prefix,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           replace(p_brand, '#', '-') AS brand_dashed,
           CAST(levenshtein(p_brand, 'Brand-00') AS BIGINT) AS edit_dist,
           concat(p_brand, '/', p_type) AS brand_type
    FROM part WHERE p_partkey < 100
    """,
    description="String-function breadth (§2.6): case mapping, "
    "substring, padding, replace, Levenshtein edit distance, "
    "concatenation — all codegen'd built-ins.",
    tags=("string",),
)
def q96_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = read_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 100)
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_type", 1, 4).alias("type_prefix"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.replace(F.col("p_brand"), F.lit("#"), F.lit("-")).alias("brand_dashed"),
        F.levenshtein(F.col("p_brand"), F.lit("Brand-00")).cast("long").alias(
            "edit_dist"
        ),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
    )


@register(
    "q95_date_arithmetic",
    oracle="""
    SELECT o.o_orderkey,
           CAST(extract(year FROM o.o_orderdate) AS BIGINT) AS order_year,
           CAST(extract(quarter FROM o.o_orderdate) AS BIGINT) AS order_quarter,
           CAST(isodow(o.o_orderdate) AS BIGINT) AS order_isodow,
           CAST(date_diff('day', o.o_orderdate, s.first_ship) AS BIGINT)
             AS days_to_first_ship
    FROM orders o
    JOIN (
      SELECT l_orderkey, min(l_shipdate) AS first_ship
      FROM lineitem GROUP BY l_orderkey
    ) s ON o.o_orderkey = s.l_orderkey
    WHERE o.o_orderkey < 200
    """,
    description="Date arithmetic breadth (§2.6 date-function gap): "
    "extract year/quarter, ISO weekday, day-difference to the "
    "first shipment (join + min-agg). ISO weekday chosen "
    "because Spark dayofweek and DuckDB dayofweek disagree on "
    "the week origin.",
    tags=("date", "join"),
)
def q95_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    l = read_table(spark, sf_dir, "lineitem")
    first_ship = l.groupBy("l_orderkey").agg(F.min("l_shipdate").alias("first_ship"))
    joined = o.join(first_ship, o.o_orderkey == first_ship.l_orderkey)
    return joined.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.quarter("o_orderdate").cast("long").alias("order_quarter"),
        (F.weekday("o_orderdate") + 1).cast("long").alias("order_isodow"),
        F.datediff("first_ship", "o_orderdate").cast("long").alias(
            "days_to_first_ship"
        ),
    )


@register(
    "q94_analytic_window_family",
    oracle="""
    SELECT o_orderkey,
           o_custkey,
           round(o_totalprice, 2) AS price,
           round(lag(o_totalprice) OVER w, 2) AS prev_price,
           round(lead(o_totalprice) OVER w, 2) AS next_price,
           round(first_value(o_totalprice) OVER w, 2) AS first_price,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           round(percent_rank() OVER w, 4) AS pct_rank
    FROM orders
    WHERE o_custkey < 20
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
    description="Analytic window family in one pass: lag/lead/"
    "first_value/ntile/percent_rank over a per-customer price "
    "ordering (§2.11 window gap, beyond row_number/running "
    "sums). One shuffle on the partition key serves all six "
    "functions.",
    tags=("window",),
)
def q94_analytic_window_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = read_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 20)
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round("o_totalprice", 2).alias("price"),
        F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
        F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
    )


@register(
    "q92_map_functions",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value,
           CAST(2 AS BIGINT) AS n_metrics
    FROM events GROUP BY event_type
    """,
    description="Map-typed columns round-trip (map functions gap, "
    "§2.6): per-type metrics packed with map_from_arrays, "
    "inspected with map_keys/size, unpacked with element_at "
    "— output is plain columns so the oracle (computed "
    "map-free) hash-matches.",
    tags=("map", "aggregate"),
)
def q92_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("s"),
    )
    packed = agg.select(
        "event_type",
        F.map_from_arrays(
            F.array(F.lit("n_events"), F.lit("sum_value")),
            F.array(F.col("n").cast("double"), F.col("s")),
        ).alias("metrics"),
    )
    return packed.select(
        "event_type",
        F.element_at("metrics", "n_events").cast("long").alias("n_events"),
        F.round(F.element_at("metrics", "sum_value"), 2).alias("sum_value"),
        F.size(F.map_keys("metrics")).cast("long")
        .alias("n_metrics"),
    )


@register(
    "q90_merge_upsert",
    oracle="""
    WITH updates AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             round(o_totalprice + 1000.0, 2) AS total
      FROM orders WHERE o_orderkey < 100
    )
    SELECT o_orderkey, o_custkey, o_orderstatus, total FROM updates
    UNION ALL
    SELECT o_orderkey, o_custkey, o_orderstatus,
           round(o_totalprice, 2) AS total
    FROM orders
    WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
    """,
    description="MERGE upsert through the correctness gate: a batch of "
    "updated orders replaces same-key rows (anti-join + union "
    "emulation, operators/cdc.py) — the corpus-maintenance "
    "path of a training-data lake without a table format.",
    tags=("cdc", "join"),
)
def q90_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.cdc import merge_upsert

    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.round("o_totalprice", 2).alias("total"),
    )
    updates = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 100)
        .select(
            "o_orderkey", "o_custkey", "o_orderstatus",
            F.round(F.col("o_totalprice") + 1000.0, 2).alias("total"),
        )
    )
    return merge_upsert(o, updates, ["o_orderkey"])


@register(
    "q91_split_profile",
    oracle="""
    SELECT CASE WHEN doc_id % 10 < 8 THEN 'train'
                WHEN doc_id % 10 = 8 THEN 'val'
                ELSE 'test' END AS split,
           count(*) AS n_docs,
           round(avg(n_chars), 4) AS avg_chars
    FROM documents GROUP BY 1
    """,
    description="Train/val/test split profile through the gate "
    "(key-modulo buckets here for SQL portability; the "
    "production path is operators/sampling.hash_split — "
    "xxhash64-based, append-stable, invariant-tested).",
    tags=("sampling", "aggregate"),
)
def q91_split_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    bucket = F.pmod(F.col("doc_id"), F.lit(10))
    split = (
        F.when(bucket < 8, F.lit("train"))
        .when(bucket == 8, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return d.groupBy(split.alias("split")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )


@register(
    "q93_scd2_history",
    oracle="""
    WITH history AS (
      SELECT c_custkey, round(c_acctbal, 2) AS bal,
             TIMESTAMP '2024-01-01 00:00:00' AS valid_from,
             CAST(NULL AS TIMESTAMP) AS valid_to,
             TRUE AS is_current
      FROM customer
    ),
    updates AS (
      SELECT c_custkey, round(c_acctbal + 100.0, 2) AS bal,
             TIMESTAMP '2024-06-01 00:00:00' AS ts
      FROM customer WHERE c_custkey < 50
    )
    SELECT c_custkey, bal,
           strftime(valid_from, '%Y-%m-%d') AS vf,
           CASE WHEN c_custkey < 50 THEN '2024-06-01' ELSE NULL END AS vt,
           (c_custkey >= 50) AS is_current
    FROM history
    UNION ALL
    SELECT c_custkey, bal, strftime(ts, '%Y-%m-%d') AS vf,
           CAST(NULL AS VARCHAR) AS vt, TRUE AS is_current
    FROM updates
    """,
    description="SCD type-2 history maintenance through the gate: an "
    "update batch closes each key's current version at the "
    "update timestamp and appends the new version "
    "(operators/cdc.scd2_apply). Oracle states the expected "
    "closed+appended history directly.",
    tags=("cdc",),
)
def q93_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.cdc import scd2_apply

    c = read_table(spark, sf_dir, "customer")
    history = c.select(
        "c_custkey",
        F.round("c_acctbal", 2).alias("bal"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    updates = c.filter(F.col("c_custkey") < 50).select(
        "c_custkey",
        F.round(F.col("c_acctbal") + 100.0, 2).alias("bal"),
        F.lit("2024-06-01 00:00:00").cast("timestamp").alias("ts"),
    )
    out = scd2_apply(history, updates, ["c_custkey"], "ts")
    return out.select(
        "c_custkey",
        "bal",
        F.date_format("valid_from", "yyyy-MM-dd").alias("vf"),
        F.date_format("valid_to", "yyyy-MM-dd").alias("vt"),
        "is_current",
    )


@register(
    "q28_tpch_q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
    description="TPC-H Q3 shape: segment filter + two joins + agg + "
    "top-10 by revenue (deterministic tie-break).",
    tags=("join", "aggregate", "sort"),
)
def q28_tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    l = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    joined = l.join(o, l.l_orderkey == o.o_orderkey).join(
        F.broadcast(c), o.o_custkey == c.c_custkey
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@register(
    "q29_asof_join",
    oracle="""
    SELECT o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           e.event_id AS last_event_id
    FROM (SELECT * FROM orders WHERE o_orderkey < 50) o
    ASOF LEFT JOIN (
      SELECT event_id,
             TIMESTAMP '1995-01-01 00:00:00'
               + INTERVAL (event_id % 2000) DAY AS ets
      FROM events WHERE event_id < 2000
    ) e ON o.o_orderdate >= e.ets
    """,
    description="As-of join (custom operator — Spark lacks a native "
    "one): latest event at-or-before each order date, built "
    "from a union + window last() carry-forward; matches "
    "DuckDB's ASOF JOIN. Scale: one shuffle on the union, no "
    "range cross join.",
    tags=("join", "asof", "custom"),
)
def q29_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.relational import asof_join

    o = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 50)
        .select("o_orderkey", "o_orderdate")
    )
    # synthesize a deterministic event-time table in the orders' date
    # range (driver events live in 2024, orders in 1995-2001)
    e = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("event_id") < 2000)  # keeps ets unique (no as-of ties)
        .select(
            "event_id",
            (
                F.lit("1995-01-01 00:00:00").cast("timestamp")
                + F.make_dt_interval(days=F.col("event_id") % 2000)
            ).alias("ets"),
        )
    )
    joined = asof_join(
        o, e, left_ts="o_orderdate", right_ts="ets", right_cols=["event_id"]
    )
    return joined.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        F.col("event_id").alias("last_event_id"),
    )

@register(
    "q58_salted_join",
    oracle="""
    SELECT s_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_name
    """,
    description="Skew-resistant salted equi-join (operators/relational."
    "py salted_join): the fact side's key is salted into 8 "
    "buckets and the supplier side replicated across salts "
    "(explode(sequence)), so a hot key spreads over 8 reducers "
    "instead of pinning one. Result is hash-checked equal to "
    "the plain join; the salt expansion is asserted in the "
    "physical plan (tests/test_scale_plans.py).",
    tags=("join", "skew"),
)
def q58_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.relational import salted_join

    l = read_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = read_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    joined = salted_join(l, s, key="l_suppkey", salt_buckets=8)
    return joined.groupBy("s_name").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "q97_cdc_apply_changes",
    oracle="""
    WITH chg AS (
      SELECT o_orderkey, o_orderstatus,
             round(o_totalprice * (1 + 0.1 * v), 2) AS o_totalprice,
             CASE WHEN o_orderkey % 7 = 0 AND v = 2 THEN 'D' ELSE 'U' END AS op,
             v AS version
      FROM orders, unnest([1, 2]) AS t(v)
      WHERE o_orderkey % 7 < 3
    ),
    last AS (
      SELECT *, row_number() OVER (
        PARTITION BY o_orderkey ORDER BY version DESC) AS rn
      FROM chg
    ),
    res AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM chg WHERE chg.o_orderkey = o.o_orderkey)
      UNION ALL
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM last WHERE rn = 1 AND op <> 'D'
    )
    SELECT o_orderstatus, count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total
    FROM res GROUP BY o_orderstatus
    """,
    description="CDC changelog application (operators/cdc.apply_changes"
    "): a synthesized change feed with two versioned changes per "
    "touched key — an update then, for every 7th key, a delete "
    "tombstone — applied last-op-wins onto the orders snapshot. "
    "Updated rows carry the v2 price, tombstoned keys disappear, "
    "untouched rows survive; the post-apply per-status rollup is "
    "hash-checked against the equivalent SQL (window last-version + "
    "anti-join + union).",
    tags=("cdc", "window", "join"),
)
def q97_cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.cdc import apply_changes

    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    chg = (
        o.filter(F.col("o_orderkey") % 7 < 3)
        .select(
            "o_orderkey",
            "o_orderstatus",
            "o_totalprice",
            F.explode(F.array(F.lit(1), F.lit(2))).alias("version"),
        )
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.round(
                F.col("o_totalprice") * (1 + 0.1 * F.col("version")), 2
            ).alias("o_totalprice"),
            F.when(
                (F.col("o_orderkey") % 7 == 0) & (F.col("version") == 2), "D"
            )
            .otherwise("U")
            .alias("op"),
            "version",
        )
    )
    res = apply_changes(o, chg, ["o_orderkey"])
    return res.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@register(
    "q98_correlation_stats",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n,
           round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar,
           round(covar_pop(l_quantity, l_discount), 6) AS qty_disc_covar_pop
    FROM lineitem
    GROUP BY l_returnflag
    """,
    description="Bivariate statistics breadth (§2.3 aggregate surface): "
    "Pearson correlation + sample/population covariance per return "
    "flag, all single-pass codegen'd aggregates (Spark's built-in "
    "moment accumulators — one shuffle with map-side partials).",
    tags=("aggregate",),
)
def q98_correlation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = read_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "qty_price_corr"
        ),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "qty_price_covar"
        ),
        F.round(F.covar_pop("l_quantity", "l_discount"), 6).alias(
            "qty_disc_covar_pop"
        ),
    )


@register(
    "q76_temperature_mixture",
    oracle="""
    WITH counts AS (
      SELECT lang, source, count(*) AS n_rows
      FROM documents GROUP BY 1, 2
    ),
    tot AS (
      SELECT sum(sqrt(CAST(n_rows AS DOUBLE))) AS ws FROM counts
    ),
    thr AS (
      SELECT lang, source, n_rows,
             floor(least(1.0,
                         200.0 * (sqrt(CAST(n_rows AS DOUBLE)) / ws)
                           / n_rows) * 1000000) AS t
      FROM counts, tot
    )
    SELECT d.lang, d.source, count(*) AS n_sampled
    FROM documents d JOIN thr USING (lang, source)
    WHERE (d.doc_id * 2654435761) % 1000000 < t
    GROUP BY 1, 2
    """,
    description="Temperature-balanced domain mixture sample "
    "(operators/sampling.temperature_mixture_sample, alpha=0.5): "
    "per-(lang, source) weights ∝ sqrt(group size) normalized to 1 — "
    "the multilingual rebalancing recipe that upsamples tail domains "
    "— then each group keeps a deterministic hash fraction "
    "min(1, target·w/n) of its rows. The keep decision is a per-row "
    "hash threshold, NOT a per-group row_number: an exact-count take "
    "would sort the head domain through one reducer, which 100 TB "
    "cannot do; this path is one scan + a broadcast join of the tiny "
    "weights table. Gate uses a portable multiplicative-hash bucket "
    "(q91's pattern; production path is seeded xxhash64, "
    "invariant-tested for stability under repartitioning).",
    tags=("sampling", "aggregate"),
)
def q76_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators import sampling as SP

    d = read_table(spark, sf_dir, "documents")
    bucket = F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(1_000_000))
    sampled = SP.temperature_mixture_sample(
        d, ["lang", "source"], "doc_id", total_rows=200, alpha=0.5,
        bucket=bucket,
    )
    return sampled.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_sampled")
    )


@register(
    "q86_table_profile",
    oracle="""
    SELECT 'o_orderkey' AS "column", count(*) AS n_rows,
           CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           count(DISTINCT o_orderkey) AS n_distinct,
           CAST(min(o_orderkey) AS VARCHAR) AS min_value,
           CAST(max(o_orderkey) AS VARCHAR) AS max_value
    FROM orders
    UNION ALL
    SELECT 'o_custkey', count(*),
           CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(DISTINCT o_custkey),
           CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(*),
           CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(DISTINCT o_orderstatus),
           CAST(min(o_orderstatus) AS VARCHAR),
           CAST(max(o_orderstatus) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', count(*),
           CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(DISTINCT o_totalprice),
           CAST(min(o_totalprice) AS VARCHAR),
           CAST(max(o_totalprice) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(*),
           CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(DISTINCT o_orderpriority),
           CAST(min(o_orderpriority) AS VARCHAR),
           CAST(max(o_orderpriority) AS VARCHAR)
    FROM orders
    """,
    description="Per-column dataset profile "
    "(operators/profile.profile_table): row/null/distinct counts and "
    "min/max (string-rendered for uniform stacking) for five orders "
    "columns in ONE scan — every statistic is an aggregate of the "
    "same pass (multiple exact count-distincts plan via expand), the "
    "wide 1-row result unpivoted row-locally. The inventory step of "
    "a data-quality gate; generalizes the reference's runtime "
    "data-sufficiency guards (spark_model_trainer.py:72,95,121,158) "
    "into an auditable profile.",
    tags=("aggregate", "quality"),
)
def q86_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.profile import profile_table

    o = read_table(spark, sf_dir, "orders")
    return profile_table(
        o,
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
         "o_orderpriority"],
    )


@register(
    "q87_constraint_check",
    oracle="""
    SELECT 'quantity_range' AS rule,
           CAST(sum(CASE WHEN NOT coalesce(l_quantity BETWEEN 1 AND 50, FALSE)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
           round(sum(CASE WHEN NOT coalesce(l_quantity BETWEEN 1 AND 50, FALSE)
                          THEN 1 ELSE 0 END) * 1.0
                 / greatest(count(*), 1), 6) AS violation_rate
    FROM lineitem
    UNION ALL
    SELECT 'discount_range',
           CAST(sum(CASE WHEN NOT coalesce(l_discount BETWEEN 0.0 AND 0.1, FALSE)
                    THEN 1 ELSE 0 END) AS BIGINT),
           round(sum(CASE WHEN NOT coalesce(l_discount BETWEEN 0.0 AND 0.1, FALSE)
                          THEN 1 ELSE 0 END) * 1.0
                 / greatest(count(*), 1), 6)
    FROM lineitem
    UNION ALL
    SELECT 'positive_price',
           CAST(sum(CASE WHEN NOT coalesce(l_extendedprice > 0.0, FALSE)
                    THEN 1 ELSE 0 END) AS BIGINT),
           round(sum(CASE WHEN NOT coalesce(l_extendedprice > 0.0, FALSE)
                          THEN 1 ELSE 0 END) * 1.0
                 / greatest(count(*), 1), 6)
    FROM lineitem
    UNION ALL
    SELECT 'returnflag_domain',
           CAST(sum(CASE WHEN NOT coalesce(l_returnflag IN ('A','N','R'), FALSE)
                    THEN 1 ELSE 0 END) AS BIGINT),
           round(sum(CASE WHEN NOT coalesce(l_returnflag IN ('A','N','R'), FALSE)
                          THEN 1 ELSE 0 END) * 1.0
                 / greatest(count(*), 1), 6)
    FROM lineitem
    """,
    description="Data-quality constraint gate "
    "(operators/profile.check_constraints): named boolean rules "
    "(range, positivity, domain membership; NULL = violation — a "
    "rule must AFFIRM the row) folded to conditional counts over ONE "
    "scan of lineitem, with violation rates for thresholding — the "
    "dbt-test / great-expectations shape in-engine, the gate every "
    "curation stage runs before promoting data. Referential "
    "integrity is the companion foreign_key_violations anti-join, "
    "planted-fixture-tested.",
    tags=("aggregate", "quality"),
)
def q87_constraint_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.profile import check_constraints

    li = read_table(spark, sf_dir, "lineitem")
    return check_constraints(
        li,
        {
            "quantity_range": F.col("l_quantity").between(1, 50),
            "discount_range": F.col("l_discount").between(0.0, 0.1),
            "positive_price": F.col("l_extendedprice") > 0.0,
            "returnflag_domain": F.col("l_returnflag").isin("A", "N", "R"),
        },
    )


@register(
    "q88_skew_profile",
    oracle="""
    WITH per_key AS (
      SELECT CAST(o_custkey AS VARCHAR) AS key_value, count(*) AS n_rows
      FROM orders GROUP BY 1
    ),
    tot AS (
      SELECT sum(n_rows) AS total, count(*) AS n_keys, max(n_rows) AS mx
      FROM per_key
    ),
    top AS (
      SELECT 'top:' || CAST(row_number() OVER (
               ORDER BY n_rows DESC, key_value ASC) AS VARCHAR) AS entry,
             key_value, n_rows,
             round(n_rows * 1.0 / total, 6) AS share
      FROM per_key, tot
      ORDER BY n_rows DESC, key_value ASC
      LIMIT 5
    )
    SELECT entry, key_value, n_rows, share FROM top
    UNION ALL
    SELECT 'summary:n_keys', NULL, CAST(n_keys AS BIGINT),
           CAST(NULL AS DOUBLE) FROM tot
    UNION ALL
    SELECT 'summary:max_per_key', NULL, mx,
           round(mx * 1.0 / total, 6) FROM tot
    """,
    description="Join-key skew diagnostics "
    "(operators/profile.skew_profile over orders.o_custkey): the "
    "top-5 heaviest keys with their row shares plus key-count summary "
    "stats — the measurement that decides whether a join needs "
    "salting (q58's salted_join) or AQE skew handling BEFORE it falls "
    "over at 100 TB. Two map-side-combined aggregates + a 5-row "
    "TakeOrdered; one scan; the only window runs on the 5-row top-k "
    "frame. Deterministic tie-break on (count desc, key asc).",
    tags=("aggregate", "quality"),
)
def q88_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.profile import skew_profile

    o = read_table(spark, sf_dir, "orders")
    return skew_profile(o, "o_custkey", top_k=5)


@register(
    "q103_value_histogram",
    oracle="""
    WITH bounds AS (
      SELECT min(CAST(o_totalprice AS DOUBLE)) AS lo,
             max(CAST(o_totalprice AS DOUBLE)) AS hi
      FROM orders
    ),
    bucketed AS (
      SELECT least(10, greatest(1,
               CAST(floor((CAST(o_totalprice AS DOUBLE) - lo)
                          / ((hi - lo) / 10)) AS INT) + 1)) AS bucket,
             lo, hi
      FROM orders, bounds
      WHERE o_totalprice IS NOT NULL
    )
    SELECT bucket,
           round(min(lo) + (min(bucket) - 1) * min((hi - lo) / 10), 4)
             AS lo,
           round(min(lo) + min(bucket) * min((hi - lo) / 10), 4) AS hi,
           count(*) AS n_rows
    FROM bucketed
    GROUP BY bucket
    """,
    description="Equal-width value histogram "
    "(operators/profile.value_histogram over orders.o_totalprice, 10 "
    "buckets): the distribution half of a data profile — one bounds "
    "pass (1-row broadcast) plus one map-side-combined bucket count, "
    "max values clamped into the last bucket on both engines. "
    "Hash-checked against a DuckDB transcription.",
    tags=("aggregate", "quality"),
)
def q103_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.profile import value_histogram

    o = read_table(spark, sf_dir, "orders")
    return value_histogram(o, "o_totalprice", n_buckets=10)


@register(
    "q111_mad_outliers",
    oracle="""
    WITH med AS (
      SELECT o_orderpriority,
             quantile_cont(CAST(o_totalprice AS DOUBLE), 0.5) AS m
      FROM orders GROUP BY 1
    ),
    mad AS (
      SELECT o.o_orderpriority,
             quantile_cont(abs(CAST(o_totalprice AS DOUBLE) - m.m), 0.5)
               AS d
      FROM orders o JOIN med m USING (o_orderpriority)
      GROUP BY 1
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) FILTER (
             WHERE o_totalprice IS NOT NULL AND d <> 0
               AND abs(round(0.6745 * (CAST(o_totalprice AS DOUBLE) - m)
                             / d, 4)) > 3.5
           ) AS BIGINT) AS n_outliers,
           round(min(m), 4) AS median_price,
           round(min(d), 4) AS mad_price
    FROM orders JOIN med USING (o_orderpriority)
                JOIN mad USING (o_orderpriority)
    GROUP BY 1
    """,
    description="Robust per-group outlier profile "
    "(operators/profile.mad_outliers over orders.o_totalprice, "
    "grouped by priority): modified z-score 0.6745*(x-median)/MAD "
    "with the Iglewicz-Hoaglin 3.5 threshold — median/MAD so the "
    "statistics aren't dragged by the outliers being hunted, the "
    "robust pass a data-quality gate runs on numeric features before "
    "training. Two aggregate passes (MAD isn't algebraic — the "
    "exact-computation floor), each one tiny per-group row broadcast "
    "back; exact interpolated percentiles (q23 parity) keep it "
    "hash-checkable.",
    tags=("aggregate", "quality"),
)
def q111_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.profile import mad_outliers

    o = read_table(spark, sf_dir, "orders")
    out = mad_outliers(
        o, "o_totalprice", group_col="o_orderpriority", threshold=3.5,
        keep_stats=True,
    )
    return out.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("is_outlier").cast("long")).alias("n_outliers"),
        F.round(F.min("med"), 4).alias("median_price"),
        F.round(F.min("mad"), 4).alias("mad_price"),
    )


@register(
    "q112_distribution_matched_sample",
    oracle="""
    WITH refd AS (
      SELECT n_chars FROM documents WHERE doc_id % 13 = 0
    ),
    trn AS (
      SELECT doc_id, n_chars FROM documents
      WHERE doc_id % 13 <> 0 AND n_chars IS NOT NULL
    ),
    bounds AS (
      SELECT min(CAST(n_chars AS DOUBLE)) AS lo,
             max(CAST(n_chars AS DOUBLE)) AS hi
      FROM refd
    ),
    rb AS (
      SELECT least(9, greatest(0,
               CAST(floor((CAST(n_chars AS DOUBLE) - lo)
                          / ((hi - lo) / 10)) AS INT))) AS bkt
      FROM refd, bounds WHERE n_chars IS NOT NULL
    ),
    rf AS (
      SELECT bkt,
             count(*) * 1.0 / (SELECT count(*) FROM rb) AS rfrac
      FROM rb GROUP BY 1
    ),
    db AS (
      SELECT doc_id, n_chars,
             least(9, greatest(0,
               CAST(floor((CAST(n_chars AS DOUBLE) - lo)
                          / ((hi - lo) / 10)) AS INT))) AS bkt
      FROM trn, bounds
    ),
    dfr AS (
      SELECT bkt,
             count(*) * 1.0 / (SELECT count(*) FROM db) AS dfrac
      FROM db GROUP BY 1
    ),
    rates AS (
      SELECT bkt,
             least(1.0,
               (SELECT min(dfrac / rfrac) FROM rf JOIN dfr USING (bkt))
               * rfrac / dfrac) AS rate
      FROM rf JOIN dfr USING (bkt)
    )
    SELECT bkt AS bucket, CAST(count(*) AS BIGINT) AS n_sampled
    FROM db JOIN rates USING (bkt)
    WHERE (db.doc_id * 2654435761) % 1000000
            < CAST(floor(rate * 1000000) AS BIGINT)
    GROUP BY 1
    """,
    description="Distribution-matched subsampling "
    "(operators/sampling.distribution_matched_sample): the largest "
    "deterministic train subset whose n_chars distribution matches "
    "the held-out eval slice's — the ablation/eval-construction "
    "primitive that de-confounds comparisons from length. Equal-width "
    "buckets over the REFERENCE bounds (1-row broadcast), per-bucket "
    "keep rate alpha*ref_frac/df_frac with alpha the largest uniform "
    "scaling no bucket can exceed, kept by hash threshold (stable "
    "under re-partitioning/appends; portable multiplicative hash for "
    "the oracle gate, q91's pattern). Output aggregated per bucket "
    "for a stable hash check.",
    tags=("sampling", "aggregate"),
)
def q112_distribution_matched_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.sampling import (
        distribution_matched_sample,
    )

    d = read_table(spark, sf_dir, "documents")
    ref = d.filter(F.col("doc_id") % 13 == 0)
    trn = d.filter(F.col("doc_id") % 13 != 0)
    out = distribution_matched_sample(
        trn, ref, "n_chars", "doc_id", n_buckets=10,
        bucket=F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(1_000_000)),
        keep_bucket=True,
    )
    return out.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_sampled")
    )


@register(
    "q118_fuzzy_entity_matches",
    oracle="""
    WITH b AS (
      SELECT c_custkey AS id, c_name AS name,
             substring(c_name, 1, 16) AS blk
      FROM customer
    )
    SELECT a.id AS id_a, bb.id AS id_b,
           a.name AS name_a, bb.name AS name_b,
           CAST(levenshtein(a.name, bb.name) AS INTEGER) AS distance
    FROM b a JOIN b bb ON a.blk = bb.blk AND a.id < bb.id
    WHERE levenshtein(a.name, bb.name) <= 1
    """,
    description="Blocked fuzzy entity matching "
    "(operators/entity.blocked_fuzzy_matches): record-linkage "
    "candidates within a deterministic blocking key (here a 16-char "
    "name prefix), verified by Levenshtein distance <= 1 — the "
    "master-data / entity-resolution primitive. Blocking turns the "
    "O(n^2) all-pairs comparison into an equi-join (candidate volume "
    "= sum of block sizes squared), and the string distance runs "
    "only on candidates inside codegen — the same candidate-bounding "
    "discipline as the dedup family's shingle/LSH joins. The filter "
    "is non-vacuous on driver data (a block holds 100 names "
    "differing in their last two digits; distance 1 keeps 18 "
    "neighbors per name, dropping 82% of candidates). Skew guard: "
    "max_block_size caps degenerate blocking keys (heavy-hitter "
    "pattern, default None for oracle parity).",
    tags=("join", "text"),
)
def q118_fuzzy_entity_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from bigdata_kafka_2_spark.operators.entity import (
        blocked_fuzzy_matches,
    )

    c = read_table(spark, sf_dir, "customer")
    return blocked_fuzzy_matches(
        c,
        "c_custkey",
        "c_name",
        block=F.expr("substring(c_name, 1, 16)"),
        max_distance=1,
    ).select(
        F.col("id_a"),
        F.col("id_b"),
        F.col("name_a"),
        F.col("name_b"),
        F.col("distance"),
    )


@register(
    "q122_bitmap_semi_join",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_items,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    WHERE l_orderkey IN (
      SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    GROUP BY l_returnflag
    """,
    description="Bitmap-prefiltered semi join "
    "(operators/relational.bitmap_semi_join): lineitems of urgent "
    "orders, with the probe side filtered against a compact hash "
    "BITMAP of the key set before the exact semi join — the "
    "shuffle-volume pattern for key sets too large to broadcast raw "
    "(10^8 keys = 800 MB raw, 16 MB as a 2^27 bitmap). Single-hash "
    "Bloom semantics: false positives = fill ratio (removed by the "
    "exact join that follows), false negatives impossible, so the "
    "result EXACTLY equals the plain semi join the oracle runs — "
    "the bitmap is plan-transparent. Bitmap build is one map-side-"
    "combined bit_or aggregate (<= m/64 rows, broadcast); the big "
    "side is never shuffled before the membership filter. The "
    "explicit form of Spark's runtime bloom-filter injection.",
    tags=("join", "aggregate"),
)
def q122_bitmap_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from bigdata_kafka_2_spark.operators.relational import (
        bitmap_semi_join,
    )

    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    keys = o.select(F.col("o_orderkey").alias("l_orderkey"))
    return bitmap_semi_join(li, keys, "l_orderkey").groupBy(
        "l_returnflag"
    ).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
    )


@register(
    "q125_winsorized_stats",
    oracle="""
    WITH cuts AS (
      SELECT event_type,
             quantile_cont(value, 0.05) AS lo,
             quantile_cont(value, 0.95) AS hi
      FROM events GROUP BY event_type
    )
    , w AS (
      SELECT event_type,
             CASE WHEN value IS NULL THEN NULL
                  ELSE least(greatest(value, lo), hi) END AS vw
      FROM events JOIN cuts USING (event_type)
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           min(vw) AS min_wins,
           max(vw) AS max_wins,
           CAST(sum(CAST(round(vw, 4) AS DECIMAL(28,4))) AS DOUBLE)
             AS sum_wins4
    FROM w
    GROUP BY event_type
    """,
    description="Winsorized per-type value statistics "
    "(operators/profile.winsorize, p05/p95 per event_type): the "
    "heavy-tail taming pass a feature pipeline runs before "
    "scaling/training — values clip to their group's exact "
    "interpolated percentiles (Spark percentile == DuckDB "
    "quantile_cont, the q23 parity) so outliers stop dominating "
    "means while their rows keep their other features. One aggregate "
    "pass computes both cut points per group (tiny broadcast rows — "
    "no window over the table, no second scan); the summary sums "
    "4-dp exact DECIMALs (order-independent).",
    tags=("aggregate", "profile"),
)
def q125_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from bigdata_kafka_2_spark.operators.profile import winsorize

    e = read_table(spark, sf_dir, "events")
    w = winsorize(e, "value", group_col="event_type", lower=0.05, upper=0.95)
    return w.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value_wins").alias("min_wins"),
        F.max("value_wins").alias("max_wins"),
        F.sum(F.round(F.col("value_wins"), 4).cast("decimal(28,4)"))
        .cast("double")
        .alias("sum_wins4"),
    )


@register(
    "q126_chi_square",
    oracle="""
    WITH cells AS (
      SELECT coalesce(CAST(lang AS VARCHAR), chr(0) || 'null') AS a,
             coalesce(CAST(source AS VARCHAR), chr(0) || 'null') AS b,
             count(*) AS o
      FROM documents GROUP BY 1, 2
    ),
    ma AS (SELECT a, sum(o) AS ra FROM cells GROUP BY a),
    mb AS (SELECT b, sum(o) AS rb FROM cells GROUP BY b),
    tot AS (SELECT sum(o) AS n FROM cells),
    agg AS (
      SELECT any_value(n) AS n,
             count(DISTINCT a) AS ka,
             count(DISTINCT b) AS kb,
             sum(CAST(round((o - ra * rb / n) * (o - ra * rb / n)
                            / (ra * rb / n), 6) AS DECIMAL(28,6)))
               AS chi_obs,
             sum(CAST(round(ra * rb / n, 6) AS DECIMAL(28,6))) AS exp_obs
      FROM cells JOIN ma USING (a) JOIN mb USING (b), tot
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST((ka - 1) * (kb - 1) AS BIGINT) AS dof,
           round(CAST(chi_obs AS DOUBLE) + (n - CAST(exp_obs AS DOUBLE)), 4)
             AS chi2
    FROM agg
    """,
    description="Chi-square independence profile between two "
    "categorical columns (operators/profile.chi_square_profile over "
    "documents lang x source): the association/drift gate a "
    "profiling pass runs on categorical feature pairs — chi2 far "
    "above dof flags joint-distribution structure the per-column "
    "profiles miss. ONE hash aggregate builds the contingency cells; "
    "marginals reduce FROM the cells (never a second table scan); "
    "unobserved cells enter in closed form (their expected mass is "
    "n - sum of observed expectations) so no dense level cross join "
    "exists anywhere; per-cell terms are 6-dp exact DECIMALs.",
    tags=("aggregate", "profile"),
)
def q126_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.profile import chi_square_profile

    d = read_table(spark, sf_dir, "documents")
    return chi_square_profile(d, "lang", "source")


@register(
    "q131_quantile_sketch",
    oracle="""
    WITH base AS (
      SELECT event_type AS g, event_id % 32 AS blk, value AS v, event_id
      FROM events
    ),
    ranked AS (
      SELECT g, blk, v,
             row_number() OVER (PARTITION BY g, blk ORDER BY v, event_id)
               AS r
      FROM base
    ),
    sizes AS (SELECT g, blk, count(*) AS n FROM base GROUP BY 1, 2),
    bounds AS (
      SELECT g, blk, (i * n) // 64 AS r,
             (i * n) // 64 - ((i - 1) * n) // 64 AS w
      FROM sizes, generate_series(1, 64) gs(i)
      WHERE (i * n) // 64 - ((i - 1) * n) // 64 > 0
    ),
    sample AS (
      SELECT g, v, CAST(sum(w) AS BIGINT) AS w
      FROM ranked JOIN bounds USING (g, blk, r)
      GROUP BY g, v
    ),
    cum AS (
      SELECT g, v, w,
             CAST(sum(w) OVER (
               PARTITION BY g ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cw
      FROM sample
    ),
    totals AS (SELECT g, CAST(sum(w) AS BIGINT) AS n FROM sample GROUP BY g)
    SELECT g AS event_type, n,
           min(CASE WHEN cw >= (n + 1) // 2 THEN v END) AS p50,
           min(CASE WHEN cw >= (9 * n + 9) // 10 THEN v END) AS p90,
           min(CASE WHEN cw >= (99 * n + 99) // 100 THEN v END) AS p99
    FROM cum JOIN totals USING (g)
    GROUP BY g, n
    """,
    description="Mergeable quantile sketch per event type "
    "(operators/sketch.quantile_sketch_build/estimate, k=64 boundary "
    "ranks x 32 content-keyed blocks): the at-scale companion to the "
    "exact interpolated percentiles (q23/q108) — exact percentiles "
    "shuffle every value to its group, the sketch keeps n_blocks*k "
    "weighted samples per group with rank error <= N/k. Construction "
    "is deterministic and INTEGER-exact (boundary ranks (i*n) div k, "
    "weights the boundary diffs summing to exactly n; ceil rank "
    "targets in integer div; values only compared, never operated "
    "on) so the whole sketch hash-matches the SQL transcription with "
    "no float-rounding protocol. Windows are block- or group-keyed, "
    "never single-partition; sketches over disjoint corpora merge by "
    "sample union with additive error (property-tested).",
    tags=("profile", "sketch", "window"),
)
def q131_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.sketch import (
        quantile_sketch_build,
        quantile_sketch_estimate,
    )

    e = read_table(spark, sf_dir, "events")
    sk = quantile_sketch_build(
        e, "value", "event_type", "event_id", k=64, n_blocks=32
    )
    return quantile_sketch_estimate(sk, "value", "event_type")


@register(
    "q141_coherent_sample",
    oracle="""
    WITH sc AS (
      SELECT * FROM customer
      WHERE (c_custkey * 2654435761) % 1000000 < 200000
    ),
    so AS (
      SELECT o.* FROM orders o
        JOIN sc ON o.o_custkey = sc.c_custkey
    ),
    sl AS (
      SELECT l.* FROM lineitem l
        JOIN (SELECT DISTINCT o_orderkey FROM so) k
          ON l.l_orderkey = k.o_orderkey
    )
    SELECT n_name,
           count(DISTINCT c_custkey) AS n_customers,
           count(DISTINCT o_orderkey) AS n_orders,
           count(l.l_orderkey) AS n_lineitems,
           round(coalesce(sum(CAST(round(
                   l.l_extendedprice * (1 - l.l_discount), 4)
                 AS DECIMAL(18,4))), 0), 2) AS revenue
    FROM sc
      JOIN nation n ON sc.c_nationkey = n.n_nationkey
      LEFT JOIN so ON so.o_custkey = sc.c_custkey
      LEFT JOIN sl l ON l.l_orderkey = so.o_orderkey
    GROUP BY n_name
    """,
    description="Referentially-consistent 20% sample "
    "(operators/sampling.coherent_sample, chained two levels): "
    "customers drawn by a deterministic hash threshold, their orders "
    "via left-semi join, those orders' lineitems via a second "
    "left-semi — the way a usable dev/test cut comes out of a 100 TB "
    "lake (independent per-table samples intersect joins away to "
    "~f² of rows; this keeps every sampled parent's FULL fan-out so "
    "join densities match production). Parent filter is row-local "
    "(no shuffle); each child adds only its own semi join. Output: "
    "per-nation sample profile, hash-checked with the portable "
    "multiplicative-hash bucket (q91's gate pattern; production uses "
    "seeded xxhash64).",
    tags=("sampling", "join"),
)
def q141_coherent_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.sampling import coherent_sample

    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    l = read_table(spark, sf_dir, "lineitem")
    n = read_table(spark, sf_dir, "nation")
    lvl1 = coherent_sample(
        c,
        "c_custkey",
        0.2,
        children={"orders": (o, "o_custkey")},
        bucket_fn=lambda key: F.pmod(
            key * F.lit(2654435761), F.lit(1_000_000)
        ),
    )
    sc, so = lvl1["parent"], lvl1["orders"]
    sl = l.join(
        so.select(F.col("o_orderkey").alias("l_orderkey")).distinct(),
        on="l_orderkey",
        how="left_semi",
    )
    joined = (
        sc.join(F.broadcast(n), sc.c_nationkey == n.n_nationkey)
        .join(so, so.o_custkey == sc.c_custkey, "left")
        .join(sl, sl.l_orderkey == so.o_orderkey, "left")
    )
    return joined.groupBy("n_name").agg(
        F.countDistinct("c_custkey").alias("n_customers"),
        F.countDistinct("o_orderkey").alias("n_orders"),
        F.count("l_orderkey").alias("n_lineitems"),
        F.round(
            F.coalesce(
                F.sum(
                    F.round(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")),
                        4,
                    ).cast("decimal(18,4)")
                ),
                F.lit(0),
            ),
            2,
        ).cast("double").alias("revenue"),
    )


@register(
    "q143_jenks_breaks",
    oracle=None,  # Lloyd's algorithm is iterative — no SQL rewrite;
    # rows-only + determinism/SSE-dominance property tests
    description="Per-event-type optimal 1-D bucketing "
    "(operators/profile.jenks_breaks, Jenks natural breaks ≈ 1-D "
    "k-means, k=3): histogram boundaries that minimize within-bucket "
    "variance where the equal-width grid (q103) wastes buckets on "
    "empty ranges of skewed data. The designated GROUPED-MAP escape "
    "hatch — applyInPandas completes the Arrow UDF trio (scalar "
    "pandas_udf entropy q38, mapInPandas multimodal q70/q71): "
    "iterative per-group refinement no SQL rewrite expresses, one "
    "Arrow batch per group, deterministic quantile seeding so output "
    "is stable across partitionings.",
    tags=("profile", "udf"),
)
def q143_jenks_breaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.profile import jenks_breaks

    e = read_table(spark, sf_dir, "events")
    return jenks_breaks(e, "value", "event_type", k=3)


@register(
    "q146_rendezvous_shards",
    oracle="""
    WITH s AS (SELECT unnest(generate_series(0, 7)) AS shard),
    h AS (
      SELECT d.doc_id, s.shard,
             CAST('0x' || substr(
               md5(CAST(d.doc_id AS VARCHAR) || '#'
                   || CAST(s.shard AS VARCHAR)), 1, 15) AS BIGINT) AS hv
      FROM documents d, s
    ),
    r AS (
      SELECT doc_id, shard,
             row_number() OVER (
               PARTITION BY doc_id ORDER BY hv DESC, shard DESC) AS rn
      FROM h
    )
    SELECT doc_id, shard FROM r WHERE rn = 1
    """,
    description="Rendezvous (highest-random-weight) shard assignment "
    "over 8 shards (operators/sampling.rendezvous_assign): shard = "
    "argmax over md5_15(key || '#' || shard) — the consistent-routing "
    "primitive for a served index, where adding a shard moves ONLY "
    "the keys won by the new shard (exact-set property test) instead "
    "of re-routing nearly everything like mod-n. Entirely row-local "
    "(transform over a literal shard sequence + array_max over "
    "(hash, shard) structs): no shuffle, no join — a scan-speed "
    "projection at any scale, portable to non-Spark serving tiers "
    "via the engine-stable md5_15 hash.",
    tags=("sampling", "serving", "row-local"),
)
def q146_rendezvous_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.sampling import rendezvous_assign

    d = read_table(spark, sf_dir, "documents")
    return rendezvous_assign(d, key_col="doc_id", n_shards=8)


@register(
    "q148_point_in_time_join",
    oracle="""
    WITH dim AS (
      SELECT c_custkey AS user_id, round(c_acctbal, 2) AS bal,
             TIMESTAMP '2024-01-01 00:00:00' AS valid_from,
             CASE WHEN c_custkey < 50
                  THEN TIMESTAMP '2024-01-15 00:00:00' END AS valid_to
      FROM customer
      UNION ALL
      SELECT c_custkey, round(c_acctbal + 100.0, 2),
             TIMESTAMP '2024-01-15 00:00:00',
             CASE WHEN c_custkey % 10 = 7
                  THEN TIMESTAMP '2024-01-22 00:00:00' END
      FROM customer WHERE c_custkey < 50
    )
    SELECT e.event_id, e.user_id, d.bal,
           strftime(d.valid_from, '%Y-%m-%d') AS vf,
           d.user_id IS NOT NULL AS matched
    FROM events e LEFT JOIN dim d ON d.user_id = e.user_id
      AND d.valid_from <= e.ts
      AND (d.valid_to IS NULL OR e.ts < d.valid_to)
    """,
    description="Point-in-time join (operators/cdc.point_in_time_join): "
    "every event enriched with the SCD2 customer version valid AT the "
    "event's timestamp — the feature-store correctness rule (no "
    "future leakage, no resurrecting churned keys: facts in a "
    "coverage gap keep NULL dims and matched=false). NOT executed as "
    "an inequality join (which multiplies facts by version count and "
    "nested-loops in engines without a range optimizer): dim-version "
    "START events union with facts, one per-key window picks "
    "last(version, ignorenulls) — one shuffle, zero amplification, "
    "valid_to carried inside the picked struct so open versions' "
    "NULLs can't be skipped. Dim: v1 for all keys from 2024-01-01 "
    "(closed 01-15 for key<50), v2 from 01-15 (closed 01-22 for "
    "key%10=7 — the churn gap the oracle's left join reproduces).",
    tags=("cdc", "join", "timeseries"),
)
def q148_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.cdc import point_in_time_join

    c = read_table(spark, sf_dir, "customer")
    key = F.col("c_custkey")
    v1 = c.select(
        key.alias("user_id"),
        F.round("c_acctbal", 2).alias("bal"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("valid_from"),
        F.when(
            key < 50, F.lit("2024-01-15 00:00:00").cast("timestamp")
        ).alias("valid_to"),
    )
    v2 = c.filter(key < 50).select(
        key.alias("user_id"),
        F.round(F.col("c_acctbal") + 100.0, 2).alias("bal"),
        F.lit("2024-01-15 00:00:00").cast("timestamp").alias("valid_from"),
        F.when(
            key % 10 == 7, F.lit("2024-01-22 00:00:00").cast("timestamp")
        ).alias("valid_to"),
    )
    dim = v1.unionByName(v2).withColumn(
        "vf", F.date_format("valid_from", "yyyy-MM-dd")
    )
    e = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts"
    )
    out = point_in_time_join(e, dim, ["user_id"], fact_ts="ts")
    return out.select(
        "event_id",
        "user_id",
        "bal",
        "vf",
        F.col("__matched").alias("matched"),
    )


@register(
    "q149_skyline_orders",
    oracle="""
    WITH pts AS (
      SELECT o_orderkey, o_totalprice AS x, o_orderdate AS y FROM orders
    ),
    g AS (SELECT x, max(y) AS ymax FROM pts GROUP BY x),
    p AS (
      SELECT x, ymax,
             max(ymax) OVER (
               ORDER BY x DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
      FROM g
    ),
    f AS (SELECT x, ymax FROM p WHERE pm IS NULL OR ymax > pm)
    SELECT pts.o_orderkey, round(pts.x, 2) AS price,
           strftime(pts.y, '%Y-%m-%d') AS od
    FROM pts JOIN f ON pts.x = f.x AND pts.y = f.ymax
    """,
    description="2-D skyline / Pareto frontier over orders "
    "(operators/relational.skyline_2d): the orders no other order "
    "beats on BOTH total price and recency — the non-dominated set. "
    "The naive plan is a quadratic dominance anti-join; the 2-D "
    "structure collapses it to one pass: per-distinct-price max "
    "date, then an EXCLUSIVE prefix-max over price descending built "
    "with the bucket/offset construction (range-bucket, <=64 "
    "per-bucket maxima to the driver, per-bucket window + broadcast "
    "offset — no single-partition exchange), then a semi join back. "
    "Equality with the brute-force NOT EXISTS dominance definition "
    "is asserted in tests; the oracle transcribes the one-pass form "
    "so DuckDB also avoids the quadratic plan at grading sf.",
    tags=("relational", "window"),
)
def q149_skyline_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.relational import skyline_2d

    o = read_table(spark, sf_dir, "orders")
    pts = o.select(
        "o_orderkey",
        F.col("o_totalprice").alias("x"),
        F.col("o_orderdate").alias("y"),
    )
    return skyline_2d(pts, "x", "y").select(
        "o_orderkey",
        F.round("x", 2).alias("price"),
        F.date_format("y", "yyyy-MM-dd").alias("od"),
    )


@register(
    "q150_incremental_agg_state",
    oracle="""
    WITH comp AS (
      SELECT event_type,
             CAST(count(value) AS BIGINT) AS n,
             CAST(sum(CAST(round(value, 4) AS DECIMAL(18,4)))
                  AS DOUBLE) AS s,
             CAST(sum(CAST(round(value, 4) AS DECIMAL(18,4))
                      * CAST(round(value, 4) AS DECIMAL(18,4)))
                  AS DOUBLE) AS q,
             min(value) AS vmin, max(value) AS vmax
      FROM events GROUP BY event_type
    )
    SELECT event_type, n, s AS sum4,
           round(s / CAST(n AS DOUBLE), 4) AS mean4,
           round(q / CAST(n AS DOUBLE)
                 - (s / CAST(n AS DOUBLE)) * (s / CAST(n AS DOUBLE)),
                 4) AS var4,
           vmin, vmax
    FROM comp
    """,
    description="Incremental aggregate maintenance "
    "(operators/incremental.agg_state/merge_agg_states/"
    "finalize_agg_state): per-type stats built as TWO separate "
    "states (events before/after 2024-01-15) and MERGED — the "
    "operational pattern where a daily pipeline folds each batch "
    "into a persisted state table instead of rescanning the corpus "
    "(cost per day ∝ delta + state, never ∝ corpus). Sums are exact "
    "DECIMALs of 4-dp-rounded values, so the merge is order- and "
    "split-independent and the oracle can simply recompute over ALL "
    "events: merge(state(old), state(delta)) == full recompute, "
    "hash-checked. Mean/population variance derive row-locally in "
    "double from the exact components.",
    tags=("aggregate", "incremental"),
)
def q150_incremental_agg_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.incremental import (
        agg_state,
        finalize_agg_state,
        merge_agg_states,
    )

    e = read_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-15 00:00:00").cast("timestamp")
    old = agg_state(e.filter(F.col("ts") < cut), ["event_type"], "value")
    delta = agg_state(e.filter(F.col("ts") >= cut), ["event_type"], "value")
    return finalize_agg_state(
        merge_agg_states(old, delta, ["event_type"])
    ).select("event_type", "n", "sum4", "mean4", "var4", "vmin", "vmax")


@register(
    "q154_snapshot_diff",
    oracle="""
    WITH new_snap AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 7 = 3
                  THEN round(c_acctbal + 50.0, 2)
                  ELSE c_acctbal END AS c_acctbal,
             CASE WHEN c_custkey % 11 = 5 THEN 'MOVED'
                  ELSE c_mktsegment END AS c_mktsegment
      FROM customer WHERE c_custkey % 97 <> 0
      UNION ALL
      SELECT c_custkey + 1000000, c_acctbal, c_mktsegment
      FROM customer WHERE c_custkey % 13 = 0
    ),
    old_snap AS (SELECT c_custkey, c_acctbal, c_mktsegment FROM customer),
    j AS (
      SELECT coalesce(o.c_custkey, n.c_custkey) AS c_custkey,
             o.c_custkey IS NULL AS is_add,
             n.c_custkey IS NULL AS is_rm,
             concat_ws(',',
               CASE WHEN o.c_acctbal IS DISTINCT FROM n.c_acctbal
                    THEN 'c_acctbal' END,
               CASE WHEN o.c_mktsegment IS DISTINCT FROM n.c_mktsegment
                    THEN 'c_mktsegment' END) AS ch
      FROM old_snap o FULL OUTER JOIN new_snap n USING (c_custkey)
    )
    SELECT c_custkey,
           CASE WHEN is_add THEN 'added'
                WHEN is_rm THEN 'removed'
                ELSE 'changed' END AS status,
           CASE WHEN is_add OR is_rm THEN '' ELSE ch END AS changed_cols
    FROM j
    WHERE is_add OR is_rm OR ch <> ''
    """,
    description="Snapshot diff between two table versions "
    "(operators/cdc.snapshot_diff): per-key status added/removed/"
    "changed plus the NULL-safe list of changed columns — the "
    "data-lake audit primitive (Delta's table_changes) without a "
    "table format. ONE full-outer equi-join on the key and row-local "
    "comparisons: no window, no sort, cost |old|+|new| regardless of "
    "change volume; bucketed snapshots make the join shuffle-free. "
    "The new snapshot is derived deterministically (deletes at "
    "key%97=0, balance change at %7=3, segment change at %11=5, "
    "adds at %13=0 shifted by 1e6) so the oracle can rebuild both "
    "sides.",
    tags=("cdc", "join"),
)
def q154_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.cdc import snapshot_diff

    c = read_table(spark, sf_dir, "customer")
    old = c.select("c_custkey", "c_acctbal", "c_mktsegment")
    key = F.col("c_custkey")
    new = (
        old.filter(key % 97 != 0)
        .select(
            "c_custkey",
            F.when(key % 7 == 3, F.round(F.col("c_acctbal") + 50.0, 2))
            .otherwise(F.col("c_acctbal"))
            .alias("c_acctbal"),
            F.when(key % 11 == 5, F.lit("MOVED"))
            .otherwise(F.col("c_mktsegment"))
            .alias("c_mktsegment"),
        )
        .unionByName(
            old.filter(key % 13 == 0).select(
                (key + 1000000).alias("c_custkey"),
                "c_acctbal",
                "c_mktsegment",
            )
        )
    )
    return snapshot_diff(old, new, ["c_custkey"])


@register(
    "q156_kmv_overlap",
    oracle="""
    WITH vals AS (
      SELECT DISTINCT event_type AS g, CAST(user_id AS VARCHAR) AS v
      FROM events WHERE event_type IN ('view', 'purchase')
    ),
    hashed AS (
      SELECT g,
             CAST('0x' || substr(md5(v || ':7'), 1, 15) AS BIGINT) AS h
      FROM vals
    ),
    all_g AS (
      SELECT g, h FROM hashed
      UNION
      SELECT '__union' AS g, h FROM hashed
    ),
    ranked AS (
      SELECT g, h,
             row_number() OVER (PARTITION BY g ORDER BY h) AS r
      FROM all_g
    ),
    agg AS (
      SELECT g, max(CASE WHEN r = 64 THEN h END) AS hk, count(*) AS nd
      FROM ranked GROUP BY g
    ),
    est AS (
      SELECT g,
             CAST(CASE WHEN nd < 64 THEN nd
                  ELSE floor(63.0 * (1152921504606846976.0 / hk))
                  END AS BIGINT) AS e
      FROM agg
    )
    SELECT 'view' AS group_a, 'purchase' AS group_b,
           ea.e AS est_a, eb.e AS est_b, eu.e AS est_union,
           greatest(0, ea.e + eb.e - eu.e) AS est_intersection
    FROM (SELECT e FROM est WHERE g = 'view') ea,
         (SELECT e FROM est WHERE g = 'purchase') eb,
         (SELECT e FROM est WHERE g = '__union') eu
    """,
    description="KMV sketch SET ALGEBRA (operators/sketch.kmv_overlap): "
    "distinct-user estimates for the 'view' and 'purchase' segments, "
    "their union, and — by inclusion-exclusion — their intersection, "
    "computed from the sketches alone. The union estimate IS a KMV "
    "sketch of the union (the k smallest hashes of A ∪ B are a "
    "subset of the merged candidates — the same mergeability that "
    "makes the sketch shard-parallel makes it an algebra), so 'how "
    "many users do two segments share' resolves from two <=k-row "
    "sketch tables with no join over the raw sets. Deterministic "
    "(portable md5_15 hashes, M = 2^60 exactly double-representable) "
    "and hash-checked against the full SQL transcription.",
    tags=("sketch", "aggregate"),
)
def q156_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.sketch import kmv_overlap

    e = read_table(spark, sf_dir, "events")
    return kmv_overlap(
        e, "user_id", "event_type", "view", "purchase", k=64, seed=7
    )


@register(
    "q161_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) AS INT) AS g_flag,
           CAST(grouping(l_linestatus) AS INT) AS g_status,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(l_extendedprice, 4) AS DECIMAL(28,4)))
                AS DOUBLE) AS revenue4
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
    description="GROUPING SETS with grouping() indicators — the "
    "multi-aggregation shape CUBE (q22) and ROLLUP (q16) can't "
    "express: two INDEPENDENT single-column groupings "
    "((l_returnflag), (l_linestatus)) computed in one pass over one "
    "scan, the NULL-vs-grouped ambiguity resolved by grouping() "
    "flags. Spark expands grouping sets exactly like cube/rollup "
    "(one Expand + one aggregate — map-side combined, one shuffle), "
    "so k groupings cost one scan instead of k. Revenue sums 4-dp "
    "exact DECIMALs.",
    tags=("aggregate",),
)
def q161_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("__q161_lineitem")
    return li.sparkSession.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS INT) AS g_flag,
               CAST(grouping(l_linestatus) AS INT) AS g_status,
               count(*) AS n,
               CAST(sum(CAST(round(l_extendedprice, 4)
                             AS DECIMAL(28,4))) AS DOUBLE) AS revenue4
        FROM __q161_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


@register(
    "q166_shuffle_rank",
    oracle="""
    SELECT doc_id, lang,
           CAST(row_number() OVER (
             ORDER BY CAST('0x' || substr(
               md5(CAST(doc_id AS VARCHAR) || ':17'), 1, 15) AS BIGINT),
             doc_id) AS BIGINT) AS shuffle_rank
    FROM documents
    """,
    description="Deterministic corpus shuffle order "
    "(operators/sampling.shuffle_rank, seed=17): every document's "
    "position in a seed-keyed pseudorandom permutation — the "
    "reproducible training-order primitive (epoch e orders by seed "
    "e; re-runs and resumes see the byte-identical order, which "
    "orderBy(rand()) can't give across engines or partitionings). "
    "Order key = portable md5_15(id ':' seed); ranking via the "
    "range-bucketed global row_number (no single-partition window), "
    "so ordering 100 TB costs one bucketed sort.",
    tags=("sampling", "window"),
)
def q166_shuffle_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.sampling import shuffle_rank

    d = read_table(spark, sf_dir, "documents")
    return shuffle_rank(d, "doc_id", seed=17).select(
        "doc_id", "lang", "shuffle_rank"
    )


@register(
    "q173_k_anonymity",
    oracle="""
    SELECT c_nationkey, c_mktsegment,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT c_acctbal) AS BIGINT) AS n_sensitive,
           count(*) >= 5 AS k_ok,
           count(DISTINCT c_acctbal) >= 2 AS l_ok
    FROM customer
    GROUP BY c_nationkey, c_mktsegment
    """,
    description="k-anonymity / l-diversity release gate "
    "(operators/profile.k_anonymity_profile, k=5, l=2): per "
    "(nation, segment) quasi-identifier group, the member count and "
    "distinct sensitive-value (balance) count with pass flags — a "
    "k-anonymous group whose members all share one sensitive value "
    "still leaks it, hence both checks. The pre-release privacy "
    "profile for a curated corpus, shaped as ONE map-side-combined "
    "hash aggregate (the exact-dedup shuffle): no window, no join, "
    "scan-speed at any scale; failing groups route to suppression "
    "or generalization.",
    tags=("profile", "aggregate"),
)
def q173_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.profile import (
        k_anonymity_profile,
    )

    c = read_table(spark, sf_dir, "customer")
    return k_anonymity_profile(
        c, ["c_nationkey", "c_mktsegment"], "c_acctbal", k=5, l=2
    )


@register(
    "q174_k_anonymize_release",
    oracle="""
    WITH prof AS (
      SELECT c_nationkey, c_mktsegment,
             count(*) >= 5 AND count(DISTINCT c_acctbal) >= 2 AS ok
      FROM customer GROUP BY c_nationkey, c_mktsegment
    ),
    released AS (
      SELECT c.c_custkey,
             CASE WHEN p.ok THEN CAST(c.c_nationkey AS VARCHAR)
                  ELSE '*' END AS c_nationkey,
             CASE WHEN p.ok THEN c.c_mktsegment ELSE '*' END
               AS c_mktsegment
      FROM customer c
        JOIN prof p USING (c_nationkey, c_mktsegment)
    )
    SELECT c_nationkey, c_mktsegment,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(c_custkey) AS BIGINT) AS min_key
    FROM released GROUP BY 1, 2
    """,
    description="k-anonymization release transform "
    "(operators/profile.k_anonymize, k=5, l=2): rows in failing "
    "quasi-identifier groups get their quasi columns suppressed to "
    "'*' (the one-step generalization ladder, collapsing failures "
    "into one residual group); the query profiles the RELEASED "
    "table per surviving quasi group. One aggregate + one equi-join "
    "back on the same keys (exchange reuse), no row amplification; "
    "the residual group's own k-anonymity is asserted in tests.",
    tags=("profile", "aggregate"),
)
def q174_k_anonymize_release(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.profile import k_anonymize

    c = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal"
    )
    rel = k_anonymize(
        c, ["c_nationkey", "c_mktsegment"], "c_acctbal", k=5, l=2
    )
    return rel.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("c_custkey").alias("min_key"),
    )


@register(
    "q176_t_closeness",
    oracle="""
    WITH cells AS (
      SELECT c_nationkey AS q, c_mktsegment AS v, count(*) AS c
      FROM customer GROUP BY 1, 2
    ),
    ext AS (
      SELECT q, v, c,
             sum(c) OVER (PARTITION BY q) AS ng,
             sum(c) OVER (PARTITION BY v) AS cv,
             sum(c) OVER () AS n
      FROM cells
    ),
    grp AS (
      SELECT q,
             max(ng) AS ng, max(n) AS n,
             sum(abs(CAST(c AS DECIMAL(18,0)) * CAST(n AS DECIMAL(18,0))
                     - CAST(cv AS DECIMAL(18,0))
                       * CAST(ng AS DECIMAL(18,0)))) AS s1,
             sum(cv) AS scv
      FROM ext GROUP BY q
    )
    SELECT q AS c_nationkey,
           CAST(ng AS BIGINT) AS n,
           round(CAST(s1 + CAST(ng AS DECIMAL(18,0))
                           * CAST(n - scv AS DECIMAL(18,0)) AS DOUBLE)
                 / ((2.0 * CAST(ng AS DOUBLE)) * CAST(n AS DOUBLE)),
                 6) AS tvd,
           round(CAST(s1 + CAST(ng AS DECIMAL(18,0))
                           * CAST(n - scv AS DECIMAL(18,0)) AS DOUBLE)
                 / ((2.0 * CAST(ng AS DOUBLE)) * CAST(n AS DOUBLE)),
                 6) <= 0.05 AS t_ok
    FROM grp
    """,
    description="t-closeness release gate "
    "(operators/profile.t_closeness_profile, t=0.05): per nation "
    "group, the total-variation distance between the group's market-"
    "segment distribution and the table-wide one — the disclosure "
    "k-anonymity and l-diversity (q173) both miss: a group can span "
    "l sensitive values and still broadcast a heavy skew toward one. "
    "Equal-ground-distance EMD = 1/2 L1, computed in exact integer "
    "units |c_gv*N - C_v*n_g| with the absent-value mass folded in "
    "closed form; same contingency-aggregate shape as q126's "
    "chi-square (one hash aggregate + window sums over the cells, "
    "never a group-by-value cross join).",
    tags=("profile", "aggregate"),
)
def q176_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.profile import (
        t_closeness_profile,
    )

    c = read_table(spark, sf_dir, "customer")
    return t_closeness_profile(c, ["c_nationkey"], "c_mktsegment", t=0.05)


@register(
    "q180_dp_segment_counts",
    oracle="""
    WITH counts AS (
      SELECT c_mktsegment, count(*) AS n FROM customer GROUP BY 1
    ),
    noise AS (
      SELECT c_mktsegment, n,
             (CAST('0x' || substr(md5(c_mktsegment || ':23'), 1, 15)
                   AS BIGINT) + 0.5) / 1152921504606846976.0 - 0.5 AS c
      FROM counts
    )
    SELECT c_mktsegment,
           round(n + (-1.0) * sign(c) * ln(1.0 - 2.0 * abs(c)), 4)
             AS noisy_count,
           1.0 AS epsilon
    FROM noise
    """,
    description="Differentially-private release of per-segment "
    "customer counts (operators/profile.dp_group_counts, Laplace "
    "mechanism, epsilon=1): each count plus Laplace(1/eps) noise via "
    "the inverse CDF over a seeded md5_15 uniform — deterministic "
    "and oracle-checkable (ship a secret seed for a real release); "
    "the true count never appears in the output. Completes the "
    "privacy-release family: k-anonymity/l-diversity (q173) and "
    "t-closeness (q176) bound what a group's shape discloses, DP "
    "bounds what one row's presence changes. One map-side-combined "
    "aggregate + row-local hash/log arithmetic.",
    tags=("profile", "aggregate"),
)
def q180_dp_segment_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.profile import dp_group_counts

    c = read_table(spark, sf_dir, "customer")
    return dp_group_counts(c, ["c_mktsegment"], epsilon=1.0, seed=23)


@register(
    "q184_psi_drift",
    oracle="""
    WITH ref AS (
      SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders
      WHERE o_orderdate < TIMESTAMP '1998-01-01'
        AND o_totalprice IS NOT NULL
    ),
    cur AS (
      SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders
      WHERE o_orderdate >= TIMESTAMP '1998-01-01'
        AND o_totalprice IS NOT NULL
    ),
    bounds AS (SELECT min(v) AS lo, max(v) AS hi FROM ref),
    rc AS (
      SELECT least(9, greatest(0, CAST(CASE WHEN hi > lo
               THEN floor((v - lo) / ((hi - lo) / 10.0)) ELSE 0 END
             AS INT))) AS bucket, count(*) AS cr
      FROM ref, bounds GROUP BY 1
    ),
    cc AS (
      SELECT least(9, greatest(0, CAST(CASE WHEN hi > lo
               THEN floor((v - lo) / ((hi - lo) / 10.0)) ELSE 0 END
             AS INT))) AS bucket, count(*) AS ccnt
      FROM cur, bounds GROUP BY 1
    ),
    joined AS (
      SELECT b.bucket,
             COALESCE(rc.cr, 0) AS cr,
             COALESCE(cc.ccnt, 0) AS ccnt
      FROM (SELECT unnest(generate_series(0, 9)) AS bucket) b
        LEFT JOIN rc USING (bucket)
        LEFT JOIN cc USING (bucket)
    ),
    totals AS (SELECT sum(cr) AS nr, sum(ccnt) AS nc FROM joined)
    SELECT CAST(max(nr) AS BIGINT) AS n_ref,
           CAST(max(nc) AS BIGINT) AS n_cur,
           CAST(sum(CAST(round(
             ((cr + 1.0) / (nr + 10.0) - (ccnt + 1.0) / (nc + 10.0))
             * ln(((cr + 1.0) * (nc + 10.0))
                  / ((ccnt + 1.0) * (nr + 10.0))), 6)
             AS DECIMAL(28,6))) AS DOUBLE) AS psi
    FROM joined, totals
    """,
    description="Population Stability Index drift gate "
    "(operators/profile.psi_drift): the order-value distribution of "
    "the current period (1998+) against the reference period, over "
    "10 equal-width buckets of the reference range — the standard "
    "model-monitoring drift metric (<0.1 stable, >0.25 retrain); "
    "out-of-range current values clamp into edge buckets, so a "
    "shifted snapshot still scores. Add-one smoothed proportions "
    "(no ln(0)), per-bucket terms as identical double expressions "
    "both engines rounded to 6 dp and DECIMAL-summed. One 1-row "
    "reference-bounds broadcast + two map-side-combined bucket "
    "counts + a 10-row reduction: scan speed at any scale.",
    tags=("profile", "aggregate"),
)
def q184_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.profile import psi_drift

    o = read_table(spark, sf_dir, "orders")
    split = F.lit("1998-01-01").cast("timestamp")
    ref = o.filter(F.col("o_orderdate") < split).select("o_totalprice")
    cur = o.filter(F.col("o_orderdate") >= split).select("o_totalprice")
    return psi_drift(ref, cur, "o_totalprice", n_buckets=10)


@register(
    "q185_filter_parity",
    oracle=r"""
    WITH flags AS (
      SELECT lang,
             (n_tokens >= 20 AND n_tokens <= 90
              AND cpt >= 4.5 AND cpt <= 6.0 AND ttr >= 0.45) AS keep
      FROM (
        SELECT lang,
               len(toks) AS n_tokens,
               round(length(norm) * 1.0
                     / greatest(len(toks), 1), 4) AS cpt,
               round(len(list_distinct(toks)) * 1.0
                     / greatest(len(toks), 1), 4) AS ttr
        FROM (
          SELECT lang,
                 coalesce(trim(regexp_replace(lower(text), '\s+', ' ',
                                              'g')), '') AS norm,
                 string_split_regex(
                   coalesce(trim(regexp_replace(lower(text), '\s+', ' ',
                                                'g')), ''), ' ') AS toks
          FROM documents
        )
      )
    ),
    agg AS (
      SELECT lang,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
               AS n_keep
      FROM flags GROUP BY lang
    ),
    rated AS (
      SELECT lang, n, n_keep,
             round(n_keep * 1.0 / n, 6) AS keep_rate
      FROM agg
    ),
    top AS (SELECT max(keep_rate) AS max_rate FROM rated)
    SELECT lang, n, n_keep, keep_rate,
           CASE WHEN max_rate > 0
                THEN round(keep_rate / max_rate, 6) END AS rate_ratio,
           CASE WHEN max_rate > 0
                THEN round(keep_rate / max_rate, 6) END >= 0.8
             AS parity_ok
    FROM rated, top
    """,
    description="Disparate-impact audit of the q49 quality filter "
    "(operators/profile.selection_parity): per-language keep rate, "
    "ratio to the best-kept language, and the four-fifths rule flag "
    "— quality heuristics tuned on one language silently over-drop "
    "others, and this one-scan parity gate is what catches it "
    "before a filtered corpus ships. Ratios are small-integer "
    "divisions rounded to 6 dp; one map-side-combined aggregate + a "
    "broadcast 1-row max.",
    tags=("profile", "text", "aggregate"),
)
def q185_filter_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.profile import selection_parity
    from bigdata_kafka_2_spark.operators.text import quality_filter_flags

    d = read_table(spark, sf_dir, "documents")
    flags = quality_filter_flags(d).select("doc_id", "keep")
    return selection_parity(
        d.join(flags, on="doc_id").select("lang", "keep"), "lang", "keep"
    )


@register(
    "q187_threshold_sweep",
    oracle=r"""
    WITH scores AS (
      SELECT round(len(list_distinct(toks)) * 1.0
                   / greatest(len(toks), 1), 4) AS ttr
      FROM (
        SELECT string_split_regex(
                 coalesce(trim(regexp_replace(lower(text), '\s+', ' ',
                                              'g')), ''), ' ') AS toks
        FROM documents
      )
    ),
    grid AS (
      SELECT unnest([0.3, 0.35, 0.4, 0.45, 0.5, 0.55, 0.6, 0.65, 0.7])
        AS threshold
    ),
    total AS (SELECT count(*) AS n FROM scores)
    SELECT g.threshold,
           CAST(count(s.ttr) AS BIGINT) AS n_keep,
           round(count(s.ttr) * 1.0 / greatest(max(total.n), 1), 6)
             AS keep_rate
    FROM grid g
      LEFT JOIN scores s ON s.ttr >= g.threshold
      CROSS JOIN total
    GROUP BY g.threshold
    """,
    description="Threshold tuning table "
    "(operators/profile.threshold_sweep): keep count and rate of "
    "the documents' type-token-ratio quality score at nine candidate "
    "cutoffs, in ONE corpus scan — each row contributes row-locally "
    "to every threshold it passes (bounded explode), one map-side-"
    "combined aggregate; the curve read before pinning q49's "
    "min_ttr. The oracle transcribes the naive per-threshold "
    "re-scan (an inequality join) this replaces.",
    tags=("profile", "text", "aggregate"),
)
def q187_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.profile import threshold_sweep
    from bigdata_kafka_2_spark.operators.text import quality_filter_flags

    d = read_table(spark, sf_dir, "documents")
    scores = quality_filter_flags(d).select("ttr")
    return threshold_sweep(
        scores, "ttr", [0.3, 0.35, 0.4, 0.45, 0.5, 0.55, 0.6, 0.65, 0.7]
    )


@register(
    "q192_ks_test",
    oracle="""
    WITH pooled AS (
      SELECT CAST(o_totalprice AS DOUBLE) AS v,
             CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
                  THEN 1 ELSE 0 END AS a,
             CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
                  THEN 0 ELSE 1 END AS b
      FROM orders
    ),
    cells AS (
      SELECT v, sum(a) AS ca, sum(b) AS cb FROM pooled GROUP BY v
    ),
    cum AS (
      SELECT sum(ca) OVER (ORDER BY v) AS cuma,
             sum(cb) OVER (ORDER BY v) AS cumb
      FROM cells
    ),
    totals AS (SELECT max(cuma) AS na, max(cumb) AS nb FROM cum)
    SELECT CAST(max(na) AS BIGINT) AS n_ref,
           CAST(max(nb) AS BIGINT) AS n_cur,
           round(CAST(max(abs(cuma * nb - cumb * na)) AS DOUBLE)
                 / (CAST(max(na) AS DOUBLE) * CAST(max(nb) AS DOUBLE)),
                 6) AS ks_d
    FROM cum, totals
    """,
    description="Exact two-sample Kolmogorov-Smirnov statistic "
    "(operators/profile.ks_test): max |F_ref - F_cur| between the "
    "1998+ and prior order-value distributions — the binning-free "
    "companion to q184's PSI (KS reads raw empirical CDFs, so it "
    "catches a pure location shift that lands inside one PSI "
    "bucket). All-integer: per-distinct-value counts of the pooled "
    "tagged union, inclusive cumulative counts via the range-"
    "bucketed global_prefix_sum (no single-partition window — the "
    "oracle transcribes exactly that naive global window), max over "
    "exact BIGINT cross-products, one final double division.",
    tags=("profile", "aggregate"),
)
def q192_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.profile import ks_test

    o = read_table(spark, sf_dir, "orders")
    split = F.lit("1998-01-01").cast("timestamp")
    ref = o.filter(F.col("o_orderdate") < split).select("o_totalprice")
    cur = o.filter(F.col("o_orderdate") >= split).select("o_totalprice")
    return ks_test(ref, cur, "o_totalprice")


# ---------------------------------------------------------------------------
# PII audit + redacted release (operators/pii) — r10
# ---------------------------------------------------------------------------

#: The synthetic corpus carries no natural PII (documents have zero
#: digits; the trimmed customer table has no phone/address columns),
#: so the PII queries CONSTRUCT a deterministic release-candidate
#: "contact record" per customer — name + synthesized email, dashed
#: phone, dotted IPv4, and (every third customer) an SSN-shaped id —
#: and audit/redact THAT. The construction is the fixture; the
#: operators are generic row-local regex passes (operators/pii.py).
_PII_TEXT_SQL = (
    "concat_ws(' ', c_name, "
    "'user' || CAST(c_custkey AS VARCHAR) || '@example.com', "
    "'555-' || lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') || '-' "
    "|| lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0'), "
    "'10.0.' || CAST(c_custkey % 256 AS VARCHAR) || '.' "
    "|| CAST(CAST(floor(c_custkey / 256) AS BIGINT) % 256 AS VARCHAR), "
    "CASE WHEN c_custkey % 3 = 0 THEN '078-05-' "
    "|| lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') END)"
)


def _pii_contact_text():
    ck = F.col("c_custkey")
    return F.concat_ws(
        " ",
        F.col("c_name"),
        F.concat(F.lit("user"), ck.cast("string"), F.lit("@example.com")),
        F.concat(
            F.lit("555-"),
            F.lpad((ck % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad((ck % 10000).cast("string"), 4, "0"),
        ),
        F.concat(
            F.lit("10.0."),
            (ck % 256).cast("string"),
            F.lit("."),
            (F.floor(ck / F.lit(256)) % 256).cast("string"),
        ),
        F.when(
            ck % 3 == 0,
            F.concat(
                F.lit("078-05-"),
                F.lpad((ck % 10000).cast("string"), 4, "0"),
            ),
        ),
    )


def _pii_counts_sql() -> str:
    from bigdata_kafka_2_spark.operators.pii import PII_PATTERNS

    return ",\n             ".join(
        f"len(regexp_extract_all(text, '{pat}')) AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )


@register(
    "q193_pii_audit",
    oracle=lambda sf_dir: f"""
    WITH rel AS (
      SELECT c_mktsegment, {_PII_TEXT_SQL} AS text FROM customer
    ),
    cnt AS (
      SELECT c_mktsegment,
             {_pii_counts_sql()}
      FROM rel
    )
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_records,
           CAST(sum(CASE WHEN n_email + n_ipv4 + n_ssn + n_phone > 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_with_pii,
           CAST(sum(n_email) AS BIGINT) AS n_email,
           CAST(sum(n_ipv4) AS BIGINT) AS n_ipv4,
           CAST(sum(n_ssn) AS BIGINT) AS n_ssn,
           CAST(sum(n_phone) AS BIGINT) AS n_phone
    FROM cnt GROUP BY 1
    """,
    description="PII release audit (operators/pii.pii_scan): per "
    "market segment, how many release-candidate contact records "
    "contain structured PII and how many matches each category has "
    "(emails, dashed phones, dotted IPv4s, SSN-shaped ids). The "
    "record text is CONSTRUCTED deterministically per customer (the "
    "synthetic corpus ships no natural PII — see the fixture note); "
    "the scan itself is generic: one regexp_count per category, "
    "row-local inside whole-stage codegen, one map-side-combined "
    "segment aggregate on top — scan speed at any corpus size.",
    tags=("pii", "profile", "aggregate"),
)
def q193_pii_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.pii import pii_scan

    c = read_table(spark, sf_dir, "customer")
    d = c.select("c_mktsegment", _pii_contact_text().alias("text"))
    s = pii_scan(d, "text", "c_mktsegment")
    return s.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_records"),
        F.sum((F.col("n_pii") > 0).cast("long")).alias("n_with_pii"),
        F.sum("n_email").alias("n_email"),
        F.sum("n_ipv4").alias("n_ipv4"),
        F.sum("n_ssn").alias("n_ssn"),
        F.sum("n_phone").alias("n_phone"),
    )


@register(
    "q194_pii_redacted_release",
    oracle=lambda sf_dir: f"""
    WITH rel AS (
      SELECT c_custkey, {_PII_TEXT_SQL} AS text FROM customer
    ),
    cnt AS (
      SELECT c_custkey,
             {_pii_counts_sql()}
      FROM rel
    )
    SELECT r.c_custkey,
           CAST(c.n_email + c.n_ipv4 + c.n_ssn + c.n_phone AS BIGINT)
             AS n_pii,
           regexp_replace(regexp_replace(regexp_replace(regexp_replace(
             r.text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}',
             '<EMAIL>', 'g'),
             '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b',
             '<IPV4>', 'g'),
             '\\b\\d{{3}}-\\d{{2}}-\\d{{4}}\\b', '<SSN>', 'g'),
             '\\b\\d{{3}}-\\d{{3}}-\\d{{4}}\\b', '<PHONE>', 'g')
             AS redacted
    FROM rel r JOIN cnt c USING (c_custkey)
    """,
    description="Redacted corpus release (operators/pii.pii_release "
    "— scan + redact FUSED): every release-candidate contact record "
    "rewritten with typed placeholders (<EMAIL>/<IPV4>/<SSN>/"
    "<PHONE>, applied in that order — most specific shapes first) "
    "plus its per-record redaction count, hash-checked on the FULL "
    "redacted text. Chained regexp_replace and the count sum are "
    "emitted by ONE select: a single scan, one projection inside "
    "codegen, zero Exchange (plan-asserted) — the 100 TB shape of a "
    "scrub pass.",
    tags=("pii", "filter"),
)
def q194_pii_redacted_release(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.pii import pii_release

    c = read_table(spark, sf_dir, "customer")
    d = c.select("c_custkey", _pii_contact_text().alias("text"))
    return pii_release(d, "text", "c_custkey")


@register(
    "q196_mutual_information",
    oracle="""
    WITH cells AS (
      SELECT COALESCE(CAST(o_orderpriority AS VARCHAR),
                      chr(0) || 'null') AS a,
             COALESCE(CAST(o_orderstatus AS VARCHAR),
                      chr(0) || 'null') AS b,
             count(*) AS o
      FROM orders GROUP BY 1, 2
    ),
    ma AS (SELECT a, sum(o) AS ra FROM cells GROUP BY a),
    mb AS (SELECT b, sum(o) AS rb FROM cells GROUP BY b),
    tot AS (SELECT sum(o) AS n FROM cells),
    mi AS (
      SELECT CAST(max(n) AS BIGINT) AS n,
             CAST(sum(CAST(round(
               (CAST(o AS DOUBLE) / n)
               * ln(CAST(o AS DOUBLE) * n
                    / (CAST(ra AS DOUBLE) * rb)), 6)
               AS DECIMAL(28,6))) AS DOUBLE) AS mi_nats
      FROM cells JOIN ma USING (a) JOIN mb USING (b), tot
    ),
    ha AS (
      SELECT CAST(sum(CAST(round(
               -(CAST(ra AS DOUBLE) / n)
               * ln(CAST(ra AS DOUBLE) / n), 6)
               AS DECIMAL(28,6))) AS DOUBLE) AS h_a_nats
      FROM ma, tot
    ),
    hb AS (
      SELECT CAST(sum(CAST(round(
               -(CAST(rb AS DOUBLE) / n)
               * ln(CAST(rb AS DOUBLE) / n), 6)
               AS DECIMAL(28,6))) AS DOUBLE) AS h_b_nats
      FROM mb, tot
    )
    SELECT n, mi_nats, h_a_nats, h_b_nats FROM mi, ha, hb
    """,
    description="Plug-in mutual information between order priority "
    "and order status (operators/profile.mutual_information): "
    "MI = sum (n_ab/N) ln(n_ab N / n_a n_b) over observed "
    "contingency cells, with both marginal entropies alongside so "
    "any normalization derives without a second pass. The "
    "feature-RANKING companion to q126's chi-square association "
    "test — the quantity a data-selection pass orders candidate "
    "features by. Per-cell terms rounded to 6 dp on identical "
    "integer-derived double expressions and DECIMAL-summed; one "
    "hash aggregate builds the cells, marginals reduce FROM the "
    "cells and ride in as broadcasts — never a dense level-set "
    "cross join.",
    tags=("profile", "aggregate"),
)
def q196_mutual_information(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.profile import (
        mutual_information,
    )

    o = read_table(spark, sf_dir, "orders")
    return mutual_information(o, "o_orderpriority", "o_orderstatus")


@register(
    "q202_randomized_response",
    oracle="""
    WITH flags AS (
      SELECT c_custkey,
             (c_mktsegment = 'HOUSEHOLD') AS flag,
             (CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)
                                      || ':7'), 1, 15)
                   AS BIGINT) + 0.5) / 1152921504606846976.0 AS u
      FROM customer
    ),
    reported AS (
      SELECT CASE WHEN u < 0.7310585786300049 THEN flag ELSE NOT flag END AS r
      FROM flags
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(coalesce(sum(CASE WHEN r THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS n_reported,
           round((CAST(coalesce(sum(CASE WHEN r THEN 1 ELSE 0 END), 0)
                       AS DOUBLE) / count(*)
                  + -0.2689414213699951) / 0.4621171572600098, 6) AS est_rate
    FROM reported
    """,
    description="Warner randomized response — LOCAL differential "
    "privacy (operators/profile.randomized_response + rr_debias, "
    "epsilon=1): each customer reports whether they are a HOUSEHOLD "
    "segment member truthfully with p = e/(1+e) and flipped "
    "otherwise (per-row deniability BEFORE aggregation — the "
    "complement to q180's central-DP Laplace noise, which trusts "
    "the aggregator), then the population rate debiases in closed "
    "form. The flip coin is the seeded md5-derived uniform (q180 "
    "discipline; ship a secret seed for a real release); p and the "
    "debias constants are Python-computed literals shared verbatim "
    "with the oracle (the q121 ladder rule). Row-local + one scalar "
    "aggregate.",
    tags=("profile", "privacy", "aggregate"),
)
def q202_randomized_response(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.profile import (
        randomized_response,
        rr_debias,
    )

    c = read_table(spark, sf_dir, "customer")
    flagged = c.withColumn(
        "__flag", F.col("c_mktsegment") == F.lit("HOUSEHOLD")
    )
    rep = randomized_response(
        flagged, "__flag", ["c_custkey"], epsilon=1.0, seed=7
    )
    return rr_debias(rep, epsilon=1.0)


@register(
    "q208_fd_violations",
    oracle="""
    SELECT o_custkey,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT COALESCE(CAST(o_orderpriority AS
             VARCHAR), chr(0) || 'null')) AS BIGINT) AS n_rhs
    FROM orders
    GROUP BY 1
    HAVING count(DISTINCT COALESCE(CAST(o_orderpriority AS VARCHAR),
                                   chr(0) || 'null')) > 1
    """,
    description="Functional-dependency probe (operators/profile."
    "fd_violations): customers whose orders span more than one "
    "order priority — i.e. the FD o_custkey -> o_orderpriority does "
    "NOT hold, listed per violating key with row and distinct-RHS "
    "counts. The schema-semantics member of the data-quality family "
    "(q87 tests row-local rules, the FK check cross-table refs): "
    "'is this column actually determined by that key' is the "
    "question that catches a bad join key before it silently fans "
    "out a downstream join. NULL RHS counts as its own level (the "
    "affirm rule). One map-side-combined aggregate on the LHS key.",
    tags=("profile", "quality", "aggregate"),
)
def q208_fd_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.profile import fd_violations

    o = read_table(spark, sf_dir, "orders")
    return fd_violations(o, ["o_custkey"], ["o_orderpriority"])


@register(
    "q211_dataset_digest",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(CAST(coalesce(sum(CAST('0x' || substr(md5(
             concat_ws(chr(31),
               COALESCE(CAST(c_custkey AS VARCHAR), chr(0) || 'null'),
               COALESCE(c_name, chr(0) || 'null'),
               COALESCE(CAST(c_nationkey AS VARCHAR),
                        chr(0) || 'null'),
               COALESCE(c_mktsegment, chr(0) || 'null')
             )), 1, 15) AS BIGINT)), 0) AS DECIMAL(38,0)) AS VARCHAR)
             AS digest
    FROM customer
    """,
    description="Order-independent dataset content digest "
    "(operators/incremental.dataset_digest over the customer key/"
    "string columns): n_rows plus the exact DECIMAL(38,0) SUM of a "
    "per-row portable hash (md5_15 over the canonical column "
    "string). Addition commutes, so the digest is independent of "
    "row order and partitioning, and MERGEABLE — digest(A∪B) = "
    "digest(A)+digest(B) for disjoint parts (the q150 contract "
    "applied to integrity checking): a migration, compaction, or "
    "replica verifies content equality shard-by-shard without "
    "sorting or shuffling a single row. One map-side-combined "
    "scalar aggregate; scan speed. (Raw DOUBLE columns render "
    "engine-dependently and are excluded by contract — round/"
    "format them first; the docstring states this.)",
    tags=("profile", "incremental", "aggregate"),
)
def q211_dataset_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.incremental import (
        dataset_digest,
    )

    c = read_table(spark, sf_dir, "customer")
    return dataset_digest(
        c, ["c_custkey", "c_name", "c_nationkey", "c_mktsegment"]
    )


@register(
    "q215_krippendorff_alpha",
    oracle="""
    WITH r AS (
      SELECT l_orderkey AS u, l_returnflag AS v
      FROM lineitem WHERE l_returnflag IS NOT NULL
    ),
    cells AS (SELECT u, v, count(*) AS c FROM r GROUP BY 1, 2),
    units AS (
      SELECT u, CAST(sum(c) AS BIGINT) AS m
      FROM cells GROUP BY u HAVING sum(c) >= 2
    ),
    pc AS (SELECT cells.u, v, c, m FROM cells JOIN units USING (u)),
    s AS (
      SELECT CAST(sum(CAST(round(c * (m - c) * 1.0 / (m - 1), 6)
                           AS DECIMAL(28,6))) AS DECIMAL(28,6)) AS s,
             CAST(count(DISTINCT u) AS BIGINT) AS n_units,
             CAST(sum(c) AS BIGINT) AS n
      FROM pc
    ),
    vc AS (
      SELECT CAST(coalesce(sum(nc * nc), 0) AS BIGINT) AS snc2
      FROM (SELECT CAST(sum(c) AS BIGINT) AS nc FROM pc GROUP BY v)
    )
    SELECT n_units, n,
           CASE WHEN n * n - snc2 <> 0 THEN
             round(1.0 - CAST(s * (n - 1) AS DOUBLE)
                         / CAST(n * n - snc2 AS DOUBLE), 6)
           END AS alpha
    FROM s, vc
    """,
    description="Krippendorff's alpha, nominal metric (operators/"
    "evalmetrics.krippendorff_alpha): inter-rater reliability over a "
    "long-form ratings frame with ANY number of raters per unit and "
    "missing ratings tolerated — each order is a unit, its line "
    "items the raters, the return flag the rating; single-rating "
    "units drop as unpairable. The multi-rater generalization of "
    "q198's two-rater Cohen's kappa and the reliability number an "
    "annotation campaign actually publishes (alpha >= 0.8 bar). "
    "Per-cell disagreement terms divide small exact-in-double "
    "integers identically on both engines, round to 6 dp, and sum "
    "as DECIMAL(28,6) (the round-then-DECIMAL-sum rule); all else "
    "is integer until the single final division. One hash aggregate "
    "-> unit-keyed window -> two scalar reductions -> broadcast "
    "combine: scan speed at any corpus.",
    tags=("evalmetrics", "aggregate"),
)
def q215_krippendorff_alpha(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.evalmetrics import (
        krippendorff_alpha,
    )

    li = read_table(spark, sf_dir, "lineitem")
    return krippendorff_alpha(li, "l_orderkey", "l_returnflag")


def _digest_sum_sql(cols: str) -> str:
    """DuckDB side of row_digest_column + DECIMAL sum (q211/q212
    pattern) over a comma-separated canonical column-string list."""
    return (
        "CAST(CAST(coalesce(sum(CAST('0x' || substr(md5("
        f"concat_ws(chr(31), {cols})"
        "), 1, 15) AS BIGINT)), 0) AS DECIMAL(38,0)) AS VARCHAR)"
    )


@register(
    "q216_erasure_audit",
    oracle=f"""
    WITH subj AS (
      SELECT DISTINCT c_custkey AS sid FROM customer
      WHERE c_mktsegment = 'AUTOMOBILE' AND c_custkey < 100
    ),
    c_aud AS (
      SELECT CAST(count(*) AS BIGINT) AS n_before,
             CAST(coalesce(sum(CASE WHEN s.sid IS NOT NULL
                                    THEN 1 ELSE 0 END), 0) AS BIGINT)
               AS n_erased,
             {_digest_sum_sql(
                 "COALESCE(CAST(c_custkey AS VARCHAR), chr(0) || 'null'), "
                 "COALESCE(c_name, chr(0) || 'null'), "
                 "COALESCE(CAST(c_nationkey AS VARCHAR), chr(0) || 'null'), "
                 "COALESCE(c_mktsegment, chr(0) || 'null')"
             ).replace("sum(", "sum(CASE WHEN s.sid IS NULL THEN ", 1)
              .replace(" AS BIGINT)), 0)", " AS BIGINT) END), 0)", 1)}
               AS released_digest
      FROM customer LEFT JOIN subj s ON c_custkey = s.sid
    ),
    o_aud AS (
      SELECT CAST(count(*) AS BIGINT) AS n_before,
             CAST(coalesce(sum(CASE WHEN s.sid IS NOT NULL
                                    THEN 1 ELSE 0 END), 0) AS BIGINT)
               AS n_erased,
             {_digest_sum_sql(
                 "COALESCE(CAST(o_orderkey AS VARCHAR), chr(0) || 'null'), "
                 "COALESCE(CAST(o_custkey AS VARCHAR), chr(0) || 'null'), "
                 "COALESCE(o_orderstatus, chr(0) || 'null'), "
                 "COALESCE(o_orderpriority, chr(0) || 'null')"
             ).replace("sum(", "sum(CASE WHEN s.sid IS NULL THEN ", 1)
              .replace(" AS BIGINT)), 0)", " AS BIGINT) END), 0)", 1)}
               AS released_digest
      FROM orders LEFT JOIN subj s ON o_custkey = s.sid
    )
    SELECT 'customer' AS table_name, n_before, n_erased,
           n_before - n_erased AS n_after, released_digest FROM c_aud
    UNION ALL
    SELECT 'orders', n_before, n_erased, n_before - n_erased,
           released_digest FROM o_aud
    """,
    description="Right-to-be-forgotten erasure audit (operators/"
    "incremental.erasure_audit): a deletion-request list (the "
    "under-100 AUTOMOBILE customers) cascaded across customer AND "
    "their orders, one audit row per table with counts before/"
    "erased/after plus the DATASET DIGEST of the released rows — "
    "the artifact a compliance review wants: not a deletion count "
    "(a drop elsewhere plus a duplicate can fake a count) but the "
    "exact mergeable content hash the post-erasure corpus must "
    "verify against shard-by-shard (q211's contract). One scan per "
    "table: the subject list broadcasts onto a left join and "
    "count/erased/digest reduce in a single map-side aggregate — "
    "table rows never shuffle; the purge write itself is the same "
    "join run as left_anti (digest equality asserted in tests).",
    tags=("privacy", "incremental", "aggregate"),
)
def q216_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.incremental import erasure_audit

    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    subjects = c.filter(
        (F.col("c_mktsegment") == "AUTOMOBILE") & (F.col("c_custkey") < 100)
    ).select("c_custkey")
    return erasure_audit(
        {
            "customer": (
                c,
                "c_custkey",
                ["c_custkey", "c_name", "c_nationkey", "c_mktsegment"],
            ),
            "orders": (
                o,
                "o_custkey",
                ["o_orderkey", "o_custkey", "o_orderstatus",
                 "o_orderpriority"],
            ),
        },
        subjects,
    )


def _q219_oracle() -> str:
    from bigdata_kafka_2_spark.operators.profile import BENFORD_P

    case = " ".join(
        f"WHEN {d} THEN {p!r}" for d, p in enumerate(BENFORD_P, start=1)
    )
    return f"""
    WITH c AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INTEGER) AS digit,
             count(*) AS n
      FROM orders WHERE o_totalprice >= 1 GROUP BY 1
    ),
    t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c)
    SELECT digit, CAST(n AS BIGINT) AS n_obs,
           round(CAST(n AS DOUBLE) / tot, 6) AS p_obs,
           round(CASE digit {case} END, 6) AS p_exp,
           round(CAST(n AS DOUBLE) / tot
                 - CASE digit {case} END, 6) AS excess
    FROM c, t
    """


@register(
    "q219_benford_profile",
    oracle=_q219_oracle(),
    description="Benford's-law first-digit forensics over order "
    "totals (operators/profile.benford_profile): per leading digit, "
    "observed count and share against the log10(1+1/d) expectation "
    "— the fraud/synthetic-feed smell test an ingest audit runs on "
    "naturally-growing magnitudes (organic multiplicative data "
    "leads with 1 ~30% of the time; fabricated or truncated feeds "
    "flatten toward uniform). The leading digit comes from the "
    "STRING of CAST(floor(v) AS BIGINT) — integer rendering is "
    "byte-identical across engines where floor(log10(v)) is not "
    "(boundary ulps at powers of ten) — and the expected "
    "probabilities are Python float literals shared verbatim with "
    "the oracle (q121 rule). One 9-group map-side aggregate + a "
    "broadcast 1-row total: scan speed.",
    tags=("profile", "aggregate"),
)
def q219_benford_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.profile import benford_profile

    o = read_table(spark, sf_dir, "orders")
    return benford_profile(o, "o_totalprice")


@register(
    "q225_mann_whitney",
    oracle="""
    WITH pooled AS (
      SELECT CAST(o_totalprice AS DOUBLE) AS v,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
               AS a,
             CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END
               AS b
      FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
    ),
    cells AS (
      SELECT v, sum(a) AS ca, sum(b) AS cb, sum(a) + sum(b) AS c
      FROM pooled GROUP BY v
    ),
    cum AS (
      SELECT ca, cb, c,
             coalesce(sum(c) OVER (
               ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS before
      FROM cells
    ),
    agg AS (
      SELECT sum(ca) AS na, sum(cb) AS nb,
             sum(ca * (2 * before + c + 1)) AS r2a,
             sum(c * c * c - c) AS t
      FROM cum
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           CAST(r2a AS DOUBLE) / 2.0 AS r_a,
           CAST(r2a - na * (na + 1) AS DOUBLE) / 2.0 AS u_a,
           CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
             - CAST(r2a - na * (na + 1) AS DOUBLE) / 2.0 AS u_b,
           round((CAST(r2a - na * (na + 1) AS DOUBLE) / 2.0)
                 / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 6)
             AS cles_a,
           round((CAST(r2a - na * (na + 1) AS DOUBLE) / 2.0
                  - CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 2.0)
                 / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
                        / 12.0
                        * ((CAST(na + nb AS DOUBLE) + 1.0)
                           - CAST(t AS DOUBLE)
                             / (CAST(na + nb AS DOUBLE)
                                * (CAST(na + nb AS DOUBLE) - 1.0)))),
                 6) AS z
    FROM agg
    """,
    description="Exact Mann-Whitney U / Wilcoxon rank-sum test "
    "(operators/profile.mann_whitney_u) between URGENT and LOW "
    "order-value distributions — the rank-based member of the "
    "two-sample family next to q192's KS (max CDF gap) and q184's "
    "PSI (binned mass): one standardized direction+magnitude "
    "statistic, robust to outliers that wreck a t-test. Ranks are "
    "NEVER materialized per row: per pooled distinct value the "
    "tie-averaged rank is C_v + (c_v+1)/2 from the range-bucketed "
    "exclusive prefix count (no single-partition window — the "
    "oracle's naive OVER (ORDER BY v) transcribes it), so the "
    "doubled rank-sum, U, and the tie correction T = Σ(c³-c) are "
    "exact integers in DECIMAL(38,0) (a 10^12-row table squares "
    "past 2^63); the z/effect-size divisions are the only doubles, "
    "evaluated through the same association on both engines.",
    tags=("profile", "aggregate"),
)
def q225_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.profile import mann_whitney_u

    o = read_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_totalprice"
    )
    b = o.filter(F.col("o_orderpriority") == "5-LOW").select(
        "o_totalprice"
    )
    return mann_whitney_u(a, b, "o_totalprice")


@register(
    "q226_gini_concentration",
    oracle="""
    WITH totals AS (
      SELECT o_custkey AS k,
             sum(CAST(round(CAST(o_totalprice AS DOUBLE), 4)
                      AS DECIMAL(38,4))) AS x
      FROM orders GROUP BY 1
    ),
    ranked AS (
      SELECT x, row_number() OVER (ORDER BY x, k) AS i FROM totals
    ),
    agg AS (
      SELECT count(*) AS n, sum(x) AS sx,
             sum(CAST(i AS DECIMAL(38,4)) * x) AS six
      FROM ranked
    ),
    top AS (
      SELECT sum(CASE WHEN i > n - (n + 99) // 100 THEN x
                      ELSE CAST(0 AS DECIMAL(38,4)) END) AS t1,
             sum(CASE WHEN i > n - (n + 9) // 10 THEN x
                      ELSE CAST(0 AS DECIMAL(38,4)) END) AS t10
      FROM ranked, agg
    )
    SELECT CAST(n AS BIGINT) AS n_keys,
           round(CAST(sx AS DOUBLE), 2) AS total,
           round((2.0 * CAST(six AS DOUBLE)
                  - (CAST(n AS DOUBLE) + 1.0) * CAST(sx AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
             AS gini,
           round(CAST(t1 AS DOUBLE) / CAST(sx AS DOUBLE), 6)
             AS top1pct_share,
           round(CAST(t10 AS DOUBLE) / CAST(sx AS DOUBLE), 6)
             AS top10pct_share
    FROM agg, top
    """,
    description="Gini coefficient + top-share concentration of "
    "customer revenue (operators/profile.gini_concentration): the "
    "inequality audit of a corpus or customer base — is 90% of the "
    "training mass coming from 1% of the sources? Complements q88's "
    "skew_profile (join-planning key skew) with the economic-"
    "concentration view a mixture designer reads. Per-key totals "
    "sum as exact DECIMAL(38,4); the ascending (total, key) rank "
    "rides the range-bucketed global_row_number (no single-"
    "partition window — the oracle's naive window transcribes it); "
    "G = (2·Σi·x_i − (n+1)·Σx)/(n·Σx) is assembled from exact "
    "DECIMAL sums with one double division, and the top-1%/10% "
    "tail counts use exact integer ⌈n/d⌉ (ceil(n*0.1) in doubles "
    "rounds 500*0.1 up and takes one key too many).",
    tags=("profile", "aggregate"),
)
def q226_gini_concentration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.profile import (
        gini_concentration,
    )

    o = read_table(spark, sf_dir, "orders")
    return gini_concentration(o, "o_custkey", "o_totalprice")


@register(
    "q230_weighted_sample",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             -ln((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                          || ':42'), 1, 15)
                       AS BIGINT) + 0.5) / 1152921504606846976.0)
               / CAST(n_chars AS DOUBLE) AS ekey
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars
    FROM keyed ORDER BY ekey, doc_id LIMIT 100
    """,
    description="Weighted sample WITHOUT replacement, 100 documents "
    "with inclusion probability rising in length (operators/"
    "sampling.weighted_sample — the Efraimidis-Spirakis A-ES "
    "scheme): each row draws an exponential order key -ln(u)/w and "
    "the k smallest win; one TakeOrderedAndProject pass (per-"
    "partition heaps of k), no global sort, no shuffle beyond the "
    "k-row merge — the quality-weighted corpus-subsampling "
    "primitive, where q76's temperature mixture balances GROUPS "
    "and this weights individual ROWS. The graded instance draws "
    "u from the portable md5_15 uniform (q202's construction) so "
    "the oracle transcribes the same sample; production uses the "
    "seeded-xxhash64 bucket (repartition-stable, invariant-"
    "tested).",
    tags=("sampling",),
)
def q230_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.sampling import weighted_sample

    d = read_table(spark, sf_dir, "documents")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":42"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(float(1 << 60))
    return weighted_sample(d, "n_chars", 100, "doc_id", u=u).select(
        "doc_id", F.col("n_chars").cast("long").alias("n_chars")
    )


@register(
    "q234_loo_contributions",
    oracle="""
    WITH g AS (
      SELECT lang, source, count(*) AS ng,
             sum(CAST(round(CAST(n_chars AS DOUBLE), 4)
                      AS DECIMAL(38,4))) AS sg
      FROM documents GROUP BY 1, 2
    ),
    tot AS (SELECT sum(ng) AS n, sum(sg) AS s FROM g)
    SELECT lang, source, CAST(ng AS BIGINT) AS n,
           round(CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE), 6)
             AS group_mean,
           round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6)
             AS corpus_mean,
           round(CASE WHEN n > ng THEN
             CAST(s - sg AS DOUBLE) / CAST(n - ng AS DOUBLE) END, 6)
             AS loo_mean,
           round(CASE WHEN n > ng THEN
             CAST(s - sg AS DOUBLE) / CAST(n - ng AS DOUBLE) END
             - CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS delta
    FROM g, tot
    """,
    description="Leave-one-group-out ablation table over (lang, "
    "source) document-length means (operators/profile."
    "loo_contributions) — data-valuation lite: per group, the corpus "
    "metric WITHOUT that group and the delta removing it would "
    "cause, the first-order mixture-design signal a training-data "
    "team reads before re-weighting domains (exact for the mean "
    "family where Shapley-style valuation needs sampling; q117's "
    "DSIR weights rank individual DOCUMENTS, this ranks GROUPS). "
    "Pure algebra off ONE map-side-combined aggregate of exact "
    "DECIMAL sums + a broadcast 1-row total — no second pass, scan "
    "speed; whole-corpus groups return NULL honestly.",
    tags=("profile", "sampling", "aggregate"),
)
def q234_loo_contributions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.profile import loo_contributions

    d = read_table(spark, sf_dir, "documents")
    return loo_contributions(d, ["lang", "source"], "n_chars")


@register(
    "q239_oof_target_encoding",
    oracle="""
    WITH cell AS (
      SELECT o_orderpriority AS pri, o_orderkey % 5 AS fold,
             count(*) AS nf,
             sum(CAST(round(CAST(o_totalprice AS DOUBLE), 4)
                      AS DECIMAL(38,4))) AS sf
      FROM orders GROUP BY 1, 2
    ),
    cat AS (
      SELECT pri, sum(nf) AS n, sum(sf) AS s FROM cell GROUP BY 1
    )
    SELECT cell.pri AS o_orderpriority, CAST(cell.fold AS BIGINT)
             AS fold,
           CAST(nf AS BIGINT) AS n_rows,
           round(CASE WHEN n - nf >= 1 THEN
             CAST(s - sf AS DOUBLE) / CAST(n - nf AS DOUBLE) END, 6)
             AS oof_mean
    FROM cell JOIN cat ON cell.pri = cat.pri
    """,
    description="Leakage-safe out-of-fold target encoding "
    "(operators/sampling.oof_target_encoding): per (order priority, "
    "fold), the mean order value over the OTHER folds — the "
    "categorical encoding that never lets a row see its own target, "
    "the feature-engineering member of the leakage-safety family "
    "(q79's splits and q134's folds guard EVAL integrity; this "
    "guards FEATURE integrity). Pure algebra off one map-side-"
    "combined aggregate of exact DECIMAL sums + a category-keyed "
    "join of the |categories|x|folds| cell table — no per-fold "
    "rescan, scan speed at any size. Fold here is the portable "
    "key-modulo bucket (q91's pattern; production folds come from "
    "leakage_safe_folds' cluster-representative hash).",
    tags=("sampling", "aggregate"),
)
def q239_oof_target_encoding(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.sampling import (
        oof_target_encoding,
    )

    o = read_table(spark, sf_dir, "orders").withColumn(
        "fold", F.pmod(F.col("o_orderkey"), F.lit(5))
    )
    return oof_target_encoding(
        o, "o_orderpriority", "o_totalprice", "fold"
    )


@register(
    "q240_gini_split_stump",
    oracle="""
    WITH cells AS (
      SELECT CAST(o_totalprice AS DOUBLE) AS v, count(*) AS c,
             sum(CASE WHEN o_orderpriority = '1-URGENT'
                      THEN 1 ELSE 0 END) AS p
      FROM orders GROUP BY 1
    ),
    pre AS (
      SELECT v, c, p,
             sum(c) OVER (ORDER BY v) AS nl,
             sum(p) OVER (ORDER BY v) AS pl
      FROM cells
    ),
    tot AS (SELECT sum(c) AS nt, sum(p) AS pt FROM cells),
    scored AS (
      SELECT v AS threshold,
             CAST(nl AS BIGINT) AS n_left,
             CAST(nt - nl AS BIGINT) AS n_right,
             CAST(pl AS BIGINT) AS pos_left,
             CAST(pt - pl AS BIGINT) AS pos_right,
             CAST(pl AS DOUBLE) * CAST(pl AS DOUBLE)
               / CAST(nl AS DOUBLE)
             + CAST(nl - pl AS DOUBLE) * CAST(nl - pl AS DOUBLE)
               / CAST(nl AS DOUBLE)
             + CAST(pt - pl AS DOUBLE) * CAST(pt - pl AS DOUBLE)
               / CAST(nt - nl AS DOUBLE)
             + CAST((nt - nl) - (pt - pl) AS DOUBLE)
               * CAST((nt - nl) - (pt - pl) AS DOUBLE)
               / CAST(nt - nl AS DOUBLE) AS f,
             (1.0 - (CAST(pt AS DOUBLE) / CAST(nt AS DOUBLE))
                    * (CAST(pt AS DOUBLE) / CAST(nt AS DOUBLE))
                  - (CAST(nt - pt AS DOUBLE) / CAST(nt AS DOUBLE))
                    * (CAST(nt - pt AS DOUBLE) / CAST(nt AS DOUBLE)))
             - (CAST(nl AS DOUBLE) / CAST(nt AS DOUBLE)
                * (1.0 - (CAST(pl AS DOUBLE) / CAST(nl AS DOUBLE))
                         * (CAST(pl AS DOUBLE) / CAST(nl AS DOUBLE))
                       - (CAST(nl - pl AS DOUBLE) / CAST(nl AS DOUBLE))
                         * (CAST(nl - pl AS DOUBLE)
                            / CAST(nl AS DOUBLE)))
                + CAST(nt - nl AS DOUBLE) / CAST(nt AS DOUBLE)
                  * (1.0 - (CAST(pt - pl AS DOUBLE)
                            / CAST(nt - nl AS DOUBLE))
                           * (CAST(pt - pl AS DOUBLE)
                              / CAST(nt - nl AS DOUBLE))
                         - (CAST((nt - nl) - (pt - pl) AS DOUBLE)
                            / CAST(nt - nl AS DOUBLE))
                           * (CAST((nt - nl) - (pt - pl) AS DOUBLE)
                              / CAST(nt - nl AS DOUBLE)))) AS gain
      FROM pre, tot WHERE nt - nl > 0
    )
    SELECT threshold, n_left, n_right, pos_left, pos_right,
           round(gain, 6) AS gini_gain
    FROM scored ORDER BY f DESC, threshold ASC LIMIT 1
    """,
    description="Exact decision-stump split search (operators/"
    "profile.gini_split_stump): the order-value threshold best "
    "separating URGENT from non-URGENT orders by Gini impurity "
    "decrease — CART's one-level split, the supervised-"
    "discretization primitive behind feature screening and monotone "
    "binning (q143's Jenks discretizes against the feature's own "
    "variance; this discretizes against a LABEL). All-integer: "
    "per-distinct-value (count, positives) cells, inclusive prefix "
    "sums via the range-bucketed global_prefix_sum (the oracle "
    "transcribes the naive global window it equals), broadcast "
    "totals; the maximized score and the reported gain are "
    "identical double expressions over those exact integers on "
    "both engines, argmax tie-broken toward the smallest "
    "threshold, one TakeOrdered(1).",
    tags=("profile", "aggregate"),
)
def q240_gini_split_stump(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.profile import gini_split_stump

    o = read_table(spark, sf_dir, "orders")
    return gini_split_stump(
        o, "o_totalprice", F.col("o_orderpriority") == "1-URGENT"
    )


@register(
    "q241_diff_in_differences",
    oracle="""
    WITH cells AS (
      SELECT
        sum(CASE WHEN event_type = 'purchase'
                  AND ts <  TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END)
          AS n_tpre,
        sum(CASE WHEN event_type = 'purchase'
                  AND ts <  TIMESTAMP '2024-01-16'
             THEN CAST(round(CAST(value AS DOUBLE), 4)
                       AS DECIMAL(38,4)) END) AS s_tpre,
        sum(CASE WHEN event_type = 'purchase'
                  AND ts <  TIMESTAMP '2024-01-16'
             THEN CAST(round(CAST(value AS DOUBLE)
                             * CAST(value AS DOUBLE), 4)
                       AS DECIMAL(38,4)) END) AS q_tpre,
        sum(CASE WHEN event_type = 'purchase'
                  AND ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END)
          AS n_tpost,
        sum(CASE WHEN event_type = 'purchase'
                  AND ts >= TIMESTAMP '2024-01-16'
             THEN CAST(round(CAST(value AS DOUBLE), 4)
                       AS DECIMAL(38,4)) END) AS s_tpost,
        sum(CASE WHEN event_type = 'purchase'
                  AND ts >= TIMESTAMP '2024-01-16'
             THEN CAST(round(CAST(value AS DOUBLE)
                             * CAST(value AS DOUBLE), 4)
                       AS DECIMAL(38,4)) END) AS q_tpost,
        sum(CASE WHEN event_type <> 'purchase'
                  AND ts <  TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END)
          AS n_cpre,
        sum(CASE WHEN event_type <> 'purchase'
                  AND ts <  TIMESTAMP '2024-01-16'
             THEN CAST(round(CAST(value AS DOUBLE), 4)
                       AS DECIMAL(38,4)) END) AS s_cpre,
        sum(CASE WHEN event_type <> 'purchase'
                  AND ts <  TIMESTAMP '2024-01-16'
             THEN CAST(round(CAST(value AS DOUBLE)
                             * CAST(value AS DOUBLE), 4)
                       AS DECIMAL(38,4)) END) AS q_cpre,
        sum(CASE WHEN event_type <> 'purchase'
                  AND ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END)
          AS n_cpost,
        sum(CASE WHEN event_type <> 'purchase'
                  AND ts >= TIMESTAMP '2024-01-16'
             THEN CAST(round(CAST(value AS DOUBLE), 4)
                       AS DECIMAL(38,4)) END) AS s_cpost,
        sum(CASE WHEN event_type <> 'purchase'
                  AND ts >= TIMESTAMP '2024-01-16'
             THEN CAST(round(CAST(value AS DOUBLE)
                             * CAST(value AS DOUBLE), 4)
                       AS DECIMAL(38,4)) END) AS q_cpost
      FROM events WHERE value IS NOT NULL
    )
    SELECT CAST(n_tpre AS BIGINT) AS n_t_pre,
           CAST(n_tpost AS BIGINT) AS n_t_post,
           CAST(n_cpre AS BIGINT) AS n_c_pre,
           CAST(n_cpost AS BIGINT) AS n_c_post,
           round(CAST(s_tpre AS DOUBLE) / CAST(n_tpre AS DOUBLE), 6)
             AS mean_t_pre,
           round(CAST(s_tpost AS DOUBLE) / CAST(n_tpost AS DOUBLE), 6)
             AS mean_t_post,
           round(CAST(s_cpre AS DOUBLE) / CAST(n_cpre AS DOUBLE), 6)
             AS mean_c_pre,
           round(CAST(s_cpost AS DOUBLE) / CAST(n_cpost AS DOUBLE), 6)
             AS mean_c_post,
           round((CAST(s_tpost AS DOUBLE) / CAST(n_tpost AS DOUBLE)
                  - CAST(s_tpre AS DOUBLE) / CAST(n_tpre AS DOUBLE))
                 - (CAST(s_cpost AS DOUBLE) / CAST(n_cpost AS DOUBLE)
                    - CAST(s_cpre AS DOUBLE)
                      / CAST(n_cpre AS DOUBLE)), 6) AS did,
           round(sqrt(
             ((CAST(q_tpost AS DOUBLE) / CAST(n_tpost AS DOUBLE)
               - (CAST(s_tpost AS DOUBLE) / CAST(n_tpost AS DOUBLE))
                 * (CAST(s_tpost AS DOUBLE) / CAST(n_tpost AS DOUBLE)))
              * CAST(n_tpost AS DOUBLE)
              / (CAST(n_tpost AS DOUBLE) - 1.0))
               / CAST(n_tpost AS DOUBLE)
             + ((CAST(q_tpre AS DOUBLE) / CAST(n_tpre AS DOUBLE)
               - (CAST(s_tpre AS DOUBLE) / CAST(n_tpre AS DOUBLE))
                 * (CAST(s_tpre AS DOUBLE) / CAST(n_tpre AS DOUBLE)))
              * CAST(n_tpre AS DOUBLE)
              / (CAST(n_tpre AS DOUBLE) - 1.0))
               / CAST(n_tpre AS DOUBLE)
             + ((CAST(q_cpost AS DOUBLE) / CAST(n_cpost AS DOUBLE)
               - (CAST(s_cpost AS DOUBLE) / CAST(n_cpost AS DOUBLE))
                 * (CAST(s_cpost AS DOUBLE) / CAST(n_cpost AS DOUBLE)))
              * CAST(n_cpost AS DOUBLE)
              / (CAST(n_cpost AS DOUBLE) - 1.0))
               / CAST(n_cpost AS DOUBLE)
             + ((CAST(q_cpre AS DOUBLE) / CAST(n_cpre AS DOUBLE)
               - (CAST(s_cpre AS DOUBLE) / CAST(n_cpre AS DOUBLE))
                 * (CAST(s_cpre AS DOUBLE) / CAST(n_cpre AS DOUBLE)))
              * CAST(n_cpre AS DOUBLE)
              / (CAST(n_cpre AS DOUBLE) - 1.0))
               / CAST(n_cpre AS DOUBLE)), 6) AS se
    FROM cells
    """,
    description="Difference-in-differences (operators/profile."
    "diff_in_differences; Card & Krueger 1994): purchase-event "
    "values vs all other events, before/after the 2024-01-16 split "
    "— the causal/experimentation member of the two-sample family: "
    "q225's Mann-Whitney and q192's KS ask IF the distributions "
    "differ; DiD asks how much of the post-period shift is "
    "ATTRIBUTABLE to the treated series net of the common trend, "
    "with the four-cell delta-method standard error. ONE map-side-"
    "combined aggregate builds all four (count, exact-DECIMAL sum, "
    "Σx²) cells; every mean, the estimate, and the SE divide those "
    "identical integers through the same double expressions on both "
    "engines. Scan speed at any scale, one output row.",
    tags=("profile", "aggregate", "timeseries"),
)
def q241_diff_in_differences(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.profile import (
        diff_in_differences,
    )

    e = read_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    return diff_in_differences(
        e,
        F.col("event_type") == "purchase",
        F.col("ts") >= F.lit("2024-01-16").cast("timestamp"),
        "value",
    )


def _q242_matches_cte() -> str:
    """Shared comparison-mining SQL for q242: within-customer duels
    between order PRIORITIES, decided by order value (smaller total
    wins; ties dropped)."""
    return """
      SELECT o1.o_orderpriority AS a, o2.o_orderpriority AS b,
             CAST(sum(CASE WHEN o1.o_totalprice < o2.o_totalprice
                           THEN 1 ELSE 0 END) AS BIGINT) AS wins_a,
             CAST(sum(CASE WHEN o2.o_totalprice < o1.o_totalprice
                           THEN 1 ELSE 0 END) AS BIGINT) AS wins_b
      FROM orders o1
        JOIN orders o2 ON o1.o_custkey = o2.o_custkey
                      AND o1.o_orderpriority < o2.o_orderpriority
      GROUP BY 1, 2
      HAVING sum(CASE WHEN o1.o_totalprice < o2.o_totalprice
                      THEN 1 ELSE 0 END)
           + sum(CASE WHEN o2.o_totalprice < o1.o_totalprice
                      THEN 1 ELSE 0 END) > 0
    """


def _q242_oracle(sf_dir: str | None = None) -> str:
    from bigdata_kafka_2_spark.operators.preference import bt_oracle_sql

    return bt_oracle_sql(_q242_matches_cte(), iterations=3)


@register(
    "q242_bradley_terry",
    oracle=_q242_oracle,
    description="Bradley-Terry preference strengths (operators/"
    "preference.bradley_terry; Bradley & Terry 1952, Hunter 2004 MM "
    "updates) over within-customer duels between order priorities "
    "decided by order value - the PREFERENCE-DATA family's first member: the model "
    "behind reward-model win rates, annotator auditing, and pairwise "
    "leaderboards, where raw win percentages mislead whenever the "
    "comparison graph is unbalanced. Comparison mining is one order-"
    "keyed self-join (pair volume bounded by basket size) into a "
    "|players|^2-bounded win table; the fit is 3 unrolled MM rounds "
    "on the engine's iterative-dataflow discipline - per-pair terms "
    "round(n_ij/(w_i+w_j), 12) summed as exact DECIMAL(38,12), "
    "strengths renormalized and re-rounded to 12 dp each round, "
    "strength vector broadcast below 2M players (Pregel shuffle "
    "shape above) - bit-identical to the unrolled-CTE oracle. "
    "Zero-win players are rejected up front (Ford 1957 MLE-existence "
    "guard, one bounded 1-row aggregate).",
    tags=("preference", "iterative", "join", "aggregate"),
)
def q242_bradley_terry(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.preference import (
        bradley_terry,
        pairwise_wins,
    )

    o = read_table(spark, sf_dir, "orders")
    matches = pairwise_wins(
        o, "o_custkey", "o_orderpriority", "o_totalprice"
    )
    return bradley_terry(matches, iterations=3)


def _q243_oracle(sf_dir: str | None = None) -> str:
    from bigdata_kafka_2_spark.operators.sampling import ipf_oracle_sql

    return ipf_oracle_sql(
        "orders", "o_orderpriority", "o_orderstatus", iterations=3
    )


@register(
    "q243_ipf_raking",
    oracle=_q243_oracle,
    description="Iterative proportional fitting / raking (operators/"
    "sampling.ipf_raking; Deming & Stephan 1940) of the order "
    "priority x status contingency table toward uniform marginals - "
    "the survey-statistics reweighting a data team runs to neutralize "
    "joint sampling skew (make every (language, domain)-like stratum "
    "contribute as if both marginals were balanced) without per-row "
    "resampling. One scan reduces the corpus to the |rows|x|cols| "
    "cell table; 3 fixed unrolled row/column scaling rounds on the "
    "12-dp schedule (marginal sums as exact DECIMAL(38,12) of rounded "
    "weights, every rescale re-rounded) - bit-identical to the "
    "unrolled-CTE oracle at any partitioning.",
    tags=("sampling", "iterative", "aggregate"),
)
def q243_ipf_raking(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.sampling import ipf_raking

    o = read_table(spark, sf_dir, "orders")
    return ipf_raking(o, "o_orderpriority", "o_orderstatus", iterations=3)


@register(
    "q244_stratified_ate",
    oracle="""
    WITH cells AS (
      SELECT o_orderstatus AS s, count(*) AS n,
             sum(CASE WHEN o_orderpriority = '1-URGENT'
                      THEN 1 ELSE 0 END) AS nt,
             sum(CASE WHEN o_orderpriority = '1-URGENT' THEN
               CAST(round(CAST(o_totalprice AS DOUBLE), 4)
                    AS DECIMAL(38,4)) END) AS st,
             sum(CASE WHEN o_orderpriority <> '1-URGENT' THEN
               CAST(round(CAST(o_totalprice AS DOUBLE), 4)
                    AS DECIMAL(38,4)) END) AS sc
      FROM orders WHERE o_totalprice IS NOT NULL
      GROUP BY 1
    ),
    per AS (
      SELECT CAST(s AS VARCHAR) AS stratum,
             CAST(n AS BIGINT) AS n, CAST(nt AS BIGINT) AS n_treated,
             round(CASE WHEN nt > 0 THEN
               CAST(st AS DOUBLE) / CAST(nt AS DOUBLE) END, 6)
               AS mean_treated,
             round(CASE WHEN n > nt THEN
               CAST(sc AS DOUBLE) / CAST(n - nt AS DOUBLE) END, 6)
               AS mean_control,
             round(CASE WHEN nt > 0 AND n > nt THEN
               CAST(st AS DOUBLE) / CAST(nt AS DOUBLE)
               - CAST(sc AS DOUBLE) / CAST(n - nt AS DOUBLE) END, 6)
               AS effect
      FROM cells
    ),
    overall AS (
      SELECT CAST(NULL AS VARCHAR) AS stratum,
             CAST(sum(n) AS BIGINT) AS n,
             CAST(NULL AS BIGINT) AS n_treated,
             CAST(NULL AS DOUBLE) AS mean_treated,
             CAST(NULL AS DOUBLE) AS mean_control,
             round(CAST(sum(CAST(round(CAST(n AS DOUBLE)
                 * round(CAST(st AS DOUBLE) / CAST(nt AS DOUBLE)
                   - CAST(sc AS DOUBLE) / CAST(n - nt AS DOUBLE), 6),
                 12) AS DECIMAL(38,12))) AS DOUBLE)
               / CAST(sum(n) AS DOUBLE), 6) AS effect
      FROM cells WHERE nt > 0 AND n > nt
    )
    SELECT * FROM per UNION ALL SELECT * FROM overall
    """,
    description="Stratified average treatment effect (operators/"
    "profile.stratified_ate; Cochran 1968): the effect of URGENT "
    "priority on order value within each order-status stratum plus "
    "the stratum-size-weighted overall ATE - identification by "
    "adjustment, the causal-family member next to q241's DiD "
    "(pre-period adjustment) and exactly IPW when propensities are "
    "stratum constants. One map-side-combined aggregate builds every "
    "cell (counts + exact-DECIMAL outcome sums); strata missing an "
    "arm return NULL effect and are renormalized out of the overall "
    "row. NULL outcomes excluded before counting (the q239/q234 "
    "NULL-deflation guard).",
    tags=("profile", "aggregate"),
)
def q244_stratified_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.profile import stratified_ate

    o = read_table(spark, sf_dir, "orders")
    return stratified_ate(
        o,
        "o_orderstatus",
        F.col("o_orderpriority") == "1-URGENT",
        "o_totalprice",
    )


@register(
    "q245_conformal_threshold",
    oracle="""
    WITH cnt AS (
      SELECT lang AS g, CAST(n_chars AS DOUBLE) AS v, count(*) AS c
      FROM documents GROUP BY 1, 2
    ),
    pre AS (
      SELECT g, v, c,
             sum(c) OVER (PARTITION BY g ORDER BY v) AS cum
      FROM cnt
    ),
    gk AS (
      SELECT g, CAST(sum(c) AS BIGINT) AS n,
             CAST(ceil(CAST(sum(c) + 1 AS DOUBLE) * 0.9) AS BIGINT)
               AS k
      FROM cnt GROUP BY g
    ),
    hit AS (
      SELECT pre.g, min(v) AS t
      FROM pre JOIN gk ON gk.g = pre.g
      WHERE cum >= k GROUP BY pre.g
    )
    SELECT gk.g AS lang, n, k,
           CASE WHEN k <= n THEN round(t, 6) END AS threshold
    FROM gk LEFT JOIN hit ON hit.g = gk.g
    """,
    description="Split-conformal calibration threshold per language "
    "(operators/evalmetrics.conformal_threshold; Vovk et al. 2005): "
    "the k-th smallest nonconformity score with k = "
    "ceil((n+1)(1-alpha)) at alpha=0.1 - the finite-sample, "
    "distribution-free quantile that certifies 'accept iff score <= "
    "threshold' covers new points with >= 90% probability, the "
    "guarantee an eval team wants from a calibration split before "
    "shipping a filter threshold. Exact distributed order statistic: "
    "per-(group, distinct value) counts + a group-PARTITIONED "
    "cumulative window over distinct values (bounded by per-group "
    "score cardinality, never rows), threshold = least value whose "
    "cumulative count reaches k; too-small groups return NULL.",
    tags=("evalmetrics", "window", "aggregate"),
)
def q245_conformal_threshold(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.evalmetrics import (
        conformal_threshold,
    )

    d = read_table(spark, sf_dir, "documents")
    return conformal_threshold(d, "lang", "n_chars", alpha=0.1)


@register(
    "q247_jackknife_ratio_se",
    oracle="""
    WITH g AS (
      SELECT c_nationkey,
             sum(CAST(round(CAST(o_totalprice AS DOUBLE), 4)
                      AS DECIMAL(38,4))) AS sn,
             sum(CAST(round(1.0, 4) AS DECIMAL(38,4))) AS sd
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE o_totalprice IS NOT NULL
      GROUP BY 1
    ),
    tot AS (
      SELECT sum(sn) AS tn, sum(sd) AS td, count(*) AS G FROM g
    ),
    pseudo AS (
      SELECT G, tn, td,
             round(CAST(tn - sn AS DOUBLE) / CAST(td - sd AS DOUBLE),
                   9) AS th
      FROM g, tot
    ),
    agg AS (
      SELECT max(G) AS G, max(tn) AS tn, max(td) AS td,
             sum(CAST(th AS DECIMAL(38,9))) AS s1,
             sum(CAST(round(th * th, 18) AS DECIMAL(38,18))) AS s2
      FROM pseudo
    )
    SELECT CAST(G AS BIGINT) AS groups,
           round(CAST(tn AS DOUBLE) / CAST(td AS DOUBLE), 6) AS ratio,
           round(sqrt((CAST(s2 AS DOUBLE) / CAST(G AS DOUBLE)
                       - (CAST(s1 AS DOUBLE) / CAST(G AS DOUBLE))
                         * (CAST(s1 AS DOUBLE) / CAST(G AS DOUBLE)))
                      * (CAST(G AS DOUBLE) - 1.0)), 6) AS se_jack
    FROM agg
    """,
    description="Delete-one-nation jackknife standard error of "
    "revenue-per-order (operators/profile.jackknife_ratio_se; "
    "Quenouille 1956, grouped/cluster form): the uncertainty a ratio "
    "metric actually carries when observations cluster by nation, "
    "which the naive iid SE understates - the inference member of "
    "the leave-one-group family (q234 reports each group's effect; "
    "this turns the same one-aggregate algebra into a confidence "
    "width). Per-group exact-DECIMAL sums + broadcast total give "
    "every pseudo-estimate; a second |groups|-row aggregate turns "
    "9-dp-rounded pseudo-estimates into the SE via exact "
    "DECIMAL(38,9)/(38,18) moments.",
    tags=("profile", "aggregate", "join"),
)
def q247_jackknife_ratio_se(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.profile import (
        jackknife_ratio_se,
    )

    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    j = o.join(c, o.o_custkey == c.c_custkey).select(
        "c_nationkey",
        "o_totalprice",
        F.lit(1.0).alias("one"),
    )
    return jackknife_ratio_se(j, ["c_nationkey"], "o_totalprice", "one")


@register(
    "q248_roc_curve",
    oracle="""
    WITH cells AS (
      SELECT CAST(l_discount AS DOUBLE) AS v, count(*) AS c,
             sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS p
      FROM lineitem GROUP BY 1
    ),
    pre AS (
      SELECT v, c, p,
             sum(c) OVER (ORDER BY v) - c AS bc,
             sum(p) OVER (ORDER BY v) - p AS bp
      FROM cells
    ),
    tot AS (SELECT sum(c) AS nt, sum(p) AS pt FROM cells)
    SELECT v AS threshold,
           CAST(nt - bc AS BIGINT) AS n_pred_pos,
           CAST(pt - bp AS BIGINT) AS tp,
           CAST((nt - bc) - (pt - bp) AS BIGINT) AS fp,
           round(CAST(pt - bp AS DOUBLE) / CAST(pt AS DOUBLE), 6)
             AS tpr,
           round(CAST((nt - bc) - (pt - bp) AS DOUBLE)
                 / CAST(nt - pt AS DOUBLE), 6) AS fpr
    FROM pre, tot
    """,
    description="Exact ROC curve points (operators/evalmetrics."
    "roc_points) for 'returned' against the discount score: one row "
    "per DISTINCT score for the rule predict-positive iff score >= "
    "threshold - the curve behind q164/q188's AUCs (AUC says HOW "
    "separable; the curve says WHERE to set the operating point, "
    "which is what a filter team ships). Descending cumulatives "
    "derived from the range-bucketed global_prefix_sum "
    "(total - exclusive-ascending prefix - never a single-partition "
    "window); all-integer until the final tpr/fpr divisions.",
    tags=("evalmetrics", "aggregate"),
)
def q248_roc_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.evalmetrics import roc_points

    li = read_table(spark, sf_dir, "lineitem")
    return roc_points(li, F.col("l_returnflag") == "R", "l_discount")


@register(
    "q249_neyman_allocation",
    oracle="""
    WITH g AS (
      SELECT o_orderpriority AS s, count(*) AS n,
             sum(CAST(round(CAST(o_totalprice AS DOUBLE), 4)
                      AS DECIMAL(38,4))) AS x,
             sum(CAST(round(CAST(o_totalprice AS DOUBLE)
                            * CAST(o_totalprice AS DOUBLE), 4)
                      AS DECIMAL(38,4))) AS q
      FROM orders WHERE o_totalprice IS NOT NULL
      GROUP BY 1
    ),
    cells AS (
      SELECT s, n,
             CASE WHEN n > 1 THEN
               sqrt(greatest((CAST(q AS DOUBLE) / CAST(n AS DOUBLE)
                 - (CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
                   * (CAST(x AS DOUBLE) / CAST(n AS DOUBLE)))
                 * CAST(n AS DOUBLE) / (CAST(n AS DOUBLE) - 1.0),
                 0.0))
             ELSE 0.0 END AS sd
      FROM g
    ),
    terms AS (
      SELECT s, n, sd,
             CAST(round(CAST(n AS DOUBLE) * sd, 9) AS DECIMAL(38,9))
               AS t
      FROM cells
    ),
    tot AS (SELECT sum(t) AS tt FROM terms)
    SELECT s AS o_orderpriority, CAST(n AS BIGINT) AS n,
           round(sd, 6) AS stddev,
           round(CAST(t AS DOUBLE) / CAST(tt AS DOUBLE), 6) AS share,
           CAST(floor(10000.0 * (CAST(t AS DOUBLE)
                                 / CAST(tt AS DOUBLE))) AS BIGINT)
             AS n_alloc
    FROM terms, tot
    """,
    description="Neyman-optimal stratified-sample allocation "
    "(operators/sampling.neyman_allocation; Neyman 1934) of a "
    "10000-row inspection budget across order priorities: n_h "
    "proportional to N_h*S_h - minimum-variance use of a labeling "
    "budget, the planning step in front of q-family stratified "
    "sampling (big VARIABLE strata earn more budget than big "
    "homogeneous ones). One map-side-combined aggregate (counts + "
    "exact-DECIMAL sum/sum-of-squares) per stratum; the normalizer "
    "is a broadcast 1-row DECIMAL(38,9) sum of rounded N*S terms.",
    tags=("sampling", "aggregate"),
)
def q249_neyman_allocation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.sampling import (
        neyman_allocation,
    )

    o = read_table(spark, sf_dir, "orders")
    return neyman_allocation(o, "o_orderpriority", "o_totalprice", 10000)


def _q251_oracle(sf_dir: str | None = None) -> str:
    return f"""
    WITH m AS ({_q242_matches_cte()}),
    per AS (
      SELECT player, CAST(sum(w) AS BIGINT) AS wins,
             CAST(sum(n) AS BIGINT) AS n_decided
      FROM (
        SELECT a AS player, wins_a AS w, wins_a + wins_b AS n FROM m
        UNION ALL
        SELECT b, wins_b, wins_a + wins_b FROM m
      ) GROUP BY player
    )
    SELECT player, n_decided, wins,
           round(CAST(wins AS DOUBLE) / CAST(n_decided AS DOUBLE), 6)
             AS win_rate,
           round(((CAST(wins AS DOUBLE) / CAST(n_decided AS DOUBLE))
                  + 3.841458881296 / (2.0 * CAST(n_decided AS DOUBLE))
                  - 1.959964 * sqrt(
                      (CAST(wins AS DOUBLE) / CAST(n_decided AS DOUBLE))
                      * (1.0 - CAST(wins AS DOUBLE)
                              / CAST(n_decided AS DOUBLE))
                      / CAST(n_decided AS DOUBLE)
                      + 3.841458881296
                        / (4.0 * CAST(n_decided AS DOUBLE)
                               * CAST(n_decided AS DOUBLE))))
                 / (1.0 + 3.841458881296
                          / CAST(n_decided AS DOUBLE)), 6) AS wilson_lo,
           round(((CAST(wins AS DOUBLE) / CAST(n_decided AS DOUBLE))
                  + 3.841458881296 / (2.0 * CAST(n_decided AS DOUBLE))
                  + 1.959964 * sqrt(
                      (CAST(wins AS DOUBLE) / CAST(n_decided AS DOUBLE))
                      * (1.0 - CAST(wins AS DOUBLE)
                              / CAST(n_decided AS DOUBLE))
                      / CAST(n_decided AS DOUBLE)
                      + 3.841458881296
                        / (4.0 * CAST(n_decided AS DOUBLE)
                               * CAST(n_decided AS DOUBLE))))
                 / (1.0 + 3.841458881296
                          / CAST(n_decided AS DOUBLE)), 6) AS wilson_hi
    FROM per
    """


@register(
    "q251_win_rate_wilson",
    oracle=_q251_oracle,
    description="Win-rate leaderboard with Wilson 95% intervals "
    "(operators/preference.win_rate_wilson; Wilson 1927) over the "
    "q242 priority-duel record - the small-sample-honest ranking "
    "bound (sort by wilson_lo, not raw rate, so 3-of-3 cannot outrank "
    "95-of-100), the descriptive face of the preference family next "
    "to q242's model-based strengths. One |players|-bounded aggregate "
    "over the symmetrized win table; interval arithmetic is row-local "
    "double math with z and z^2 entering as shared 6-dp literals (no "
    "engine libm call), the shared-expression parity rule.",
    tags=("preference", "aggregate"),
)
def q251_win_rate_wilson(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.preference import (
        pairwise_wins,
        win_rate_wilson,
    )

    o = read_table(spark, sf_dir, "orders")
    m = pairwise_wins(o, "o_custkey", "o_orderpriority", "o_totalprice")
    return win_rate_wilson(m)


def _q252_oracle(sf_dir: str | None = None) -> str:
    return f"""
    WITH m AS ({_q242_matches_cte()}),
    oriented AS (
      SELECT CASE WHEN wins_a > wins_b THEN a ELSE b END AS u,
             CASE WHEN wins_a > wins_b THEN b ELSE a END AS v
      FROM m WHERE wins_a <> wins_b
    ),
    players AS (
      SELECT a AS p FROM m UNION SELECT b FROM m
    ),
    cyc AS (
      SELECT count(*) AS d
      FROM oriented e1
        JOIN oriented e2 ON e2.u = e1.v
        JOIN oriented e3 ON e3.u = e2.v AND e3.v = e1.u
      WHERE e1.u < e1.v AND e1.u < e2.v
    ),
    meta AS (
      SELECT CAST((SELECT count(*) FROM players) AS DOUBLE) AS k,
             (SELECT count(*) FROM oriented) AS mm
    )
    SELECT CAST(k AS BIGINT) AS n_players,
           CAST(mm AS BIGINT) AS n_oriented_pairs,
           CAST((SELECT d FROM cyc) AS BIGINT) AS n_cycles,
           round(CASE WHEN CAST(k AS BIGINT) % 2 = 1
                      THEN (k*k*k - k) / 24.0
                      ELSE (k*k*k - 4.0*k) / 24.0 END, 2) AS max_cycles,
           round(1.0 - CAST((SELECT d FROM cyc) AS DOUBLE)
                 / (CASE WHEN CAST(k AS BIGINT) % 2 = 1
                         THEN (k*k*k - k) / 24.0
                         ELSE (k*k*k - 4.0*k) / 24.0 END), 6) AS zeta
    FROM meta
    """


@register(
    "q252_preference_transitivity",
    oracle=_q252_oracle,
    description="Circular-triad transitivity audit (operators/"
    "preference.preference_cycles; Kendall & Babington Smith 1940) of "
    "the q242 priority-duel record: majority-orient each decided "
    "pair, count directed 3-cycles (a beats b beats c beats a) with "
    "the canonical-rotation join (each cycle has exactly one edge "
    "whose tail is the minimum corner - counted once, wedge volume "
    "Sum out-deg^2), and report Kendall's consistency zeta = 1 - "
    "d/d_max. Circular triads are exactly the comparisons NO "
    "Bradley-Terry ordering can explain - the data-quality gate a "
    "preference pipeline runs before fitting q242 (low zeta = "
    "annotator noise or true intransitivity the fit would paper "
    "over).",
    tags=("preference", "graph", "join"),
)
def q252_preference_transitivity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.preference import (
        pairwise_wins,
        preference_cycles,
    )

    o = read_table(spark, sf_dir, "orders")
    m = pairwise_wins(o, "o_custkey", "o_orderpriority", "o_totalprice")
    return preference_cycles(m)


def _q253_oracle(sf_dir: str | None = None) -> str:
    from bigdata_kafka_2_spark.operators.sampling import ipf_oracle_sql

    raked = ipf_oracle_sql(
        "orders", "o_orderpriority", "o_orderstatus", iterations=3
    )
    return f"""
    WITH raked AS ({raked}),
    rowsums AS (
      SELECT sum(CAST(n AS BIGINT)) AS nrows,
             sum(CAST(n AS DECIMAL(38,0))
                 * CAST(round(raked_weight / CAST(n AS DOUBLE), 6)
                        AS DECIMAL(38,6))) AS s,
             sum(CAST(n AS DECIMAL(38,0))
                 * CAST(round(round(raked_weight / CAST(n AS DOUBLE), 6)
                              * round(raked_weight / CAST(n AS DOUBLE),
                                      6), 12)
                        AS DECIMAL(38,12))) AS q
      FROM raked WHERE raked_weight / CAST(n AS DOUBLE) > 0
    )
    SELECT CAST(nrows AS BIGINT) AS n,
           round(CAST(s AS DOUBLE), 6) AS sum_w,
           round(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                 / CAST(q AS DOUBLE), 6) AS ess,
           round(CAST(nrows AS DOUBLE)
                 / (CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                    / CAST(q AS DOUBLE)), 6) AS deff
    FROM rowsums
    """


@register(
    "q253_raking_ess",
    oracle=_q253_oracle,
    description="Kish effective sample size of the q243 raked "
    "weights (operators/sampling.kish_ess; Kish 1965): ESS = "
    "(sum w)^2 / sum w^2 and the design effect n/ESS over the "
    "per-row weights the raking implies - the statistical COST meter "
    "of any reweighting (raking, importance weights, IPW all trade "
    "bias for variance; deff >> 1 flags weights too skewed to use), "
    "composed directly on q243's fitted cell table via one broadcast "
    "join back to the rows it weights. Row-level weight sums "
    "accumulate as cell-count x 6-dp-rounded-weight products in "
    "exact DECIMAL - transcribed identically by the oracle, so the "
    "composition is hash-checked end to end.",
    tags=("sampling", "aggregate", "composed"),
)
def q253_raking_ess(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.sampling import (
        ipf_raking,
        kish_ess,
    )

    o = read_table(spark, sf_dir, "orders")
    raked = ipf_raking(o, "o_orderpriority", "o_orderstatus", iterations=3)
    per_row = o.join(
        F.broadcast(raked), on=["o_orderpriority", "o_orderstatus"]
    ).select(
        (F.col("raked_weight") / F.col("n").cast("double")).alias("w")
    )
    return kish_ess(per_row, "w")


@register(
    "q254_mantel_haenszel",
    oracle="""
    WITH cells AS (
      SELECT o_orderstatus AS s,
             sum(CASE WHEN o_orderpriority = '1-URGENT'
                       AND o_totalprice > 150000 THEN 1 ELSE 0 END)
               AS a,
             sum(CASE WHEN o_orderpriority = '1-URGENT'
                       AND NOT o_totalprice > 150000 THEN 1 ELSE 0 END)
               AS b,
             sum(CASE WHEN o_orderpriority <> '1-URGENT'
                       AND o_totalprice > 150000 THEN 1 ELSE 0 END)
               AS c,
             sum(CASE WHEN o_orderpriority <> '1-URGENT'
                       AND NOT o_totalprice > 150000 THEN 1 ELSE 0 END)
               AS d
      FROM orders GROUP BY 1
    ),
    terms AS (
      SELECT a + b + c + d AS ns,
             round(CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
                   / CAST(a + b + c + d AS DOUBLE), 9) AS r,
             round(CAST(b AS DOUBLE) * CAST(c AS DOUBLE)
                   / CAST(a + b + c + d AS DOUBLE), 9) AS sterm,
             CAST(a + d AS DOUBLE) / CAST(a + b + c + d AS DOUBLE)
               AS p,
             CAST(b + c AS DOUBLE) / CAST(a + b + c + d AS DOUBLE)
               AS q
      FROM cells
    ),
    agg AS (
      SELECT count(*) AS k, sum(ns) AS n,
             sum(CAST(r AS DECIMAL(38,9))) AS R,
             sum(CAST(sterm AS DECIMAL(38,9))) AS S,
             sum(CAST(round(p * r, 9) AS DECIMAL(38,9))) AS pr,
             sum(CAST(round(p * sterm + q * r, 9) AS DECIMAL(38,9)))
               AS ps_qr,
             sum(CAST(round(q * sterm, 9) AS DECIMAL(38,9))) AS qs
      FROM terms
    )
    SELECT CAST(k AS BIGINT) AS n_strata, CAST(n AS BIGINT) AS n,
           round(CAST(R AS DOUBLE) / CAST(S AS DOUBLE), 6) AS or_mh,
           round(ln(CAST(R AS DOUBLE) / CAST(S AS DOUBLE)), 6)
             AS log_or,
           round(sqrt(CAST(pr AS DOUBLE)
                      / (2.0 * CAST(R AS DOUBLE) * CAST(R AS DOUBLE))
                      + CAST(ps_qr AS DOUBLE)
                        / (2.0 * CAST(R AS DOUBLE)
                               * CAST(S AS DOUBLE))
                      + CAST(qs AS DOUBLE)
                        / (2.0 * CAST(S AS DOUBLE)
                               * CAST(S AS DOUBLE))), 6) AS se_log
    FROM agg
    """,
    description="Mantel-Haenszel pooled odds ratio (operators/"
    "profile.mantel_haenszel_or; Mantel & Haenszel 1959, "
    "Robins-Breslow-Greenland SE): the association between URGENT "
    "priority and high order value, pooled across order-status "
    "strata - the confounder-adjusted binary-outcome member of the "
    "causal family (q244 adjusts a mean difference; this pools the "
    "odds ratio, the A/B-analysis form). One map-side-combined "
    "aggregate builds every stratum's 2x2; pooled sums accumulate "
    "9-dp-rounded per-stratum terms in exact DECIMAL(38,9); strata "
    "with an empty margin contribute zero to both sums (built-in "
    "continuity).",
    tags=("profile", "aggregate"),
)
def q254_mantel_haenszel(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.profile import (
        mantel_haenszel_or,
    )

    o = read_table(spark, sf_dir, "orders")
    return mantel_haenszel_or(
        o,
        "o_orderstatus",
        F.col("o_orderpriority") == "1-URGENT",
        F.col("o_totalprice") > 150000,
    )


def _q257_oracle(sf_dir: str | None = None) -> str:
    from bigdata_kafka_2_spark.operators.evalmetrics import (
        rbo_tail_weights,
    )

    p, k = 0.9, 10
    pw = rbo_tail_weights(p, k)
    w_case = "CASE " + " ".join(
        f"WHEN m = {d} THEN {pw[d]!r}" for d in range(1, k + 1)
    ) + " END"
    return f"""
    WITH srev AS (
      SELECT s.s_nationkey AS nat, l.l_suppkey AS sk,
             sum(CAST(round(l.l_extendedprice * (1 - l.l_discount), 4)
                      AS DECIMAL(18,4))) AS rev,
             count(DISTINCT l.l_partkey) AS breadth
      FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY 1, 2
    ),
    ra AS (
      SELECT nat, sk, row_number() OVER (
               PARTITION BY nat ORDER BY rev DESC, sk ASC) AS r1
      FROM srev
    ),
    rb AS (
      SELECT nat, sk, row_number() OVER (
               PARTITION BY nat ORDER BY breadth DESC, sk ASC) AS r2
      FROM srev
    ),
    common AS (
      SELECT ra.nat, greatest(r1, r2) AS m
      FROM ra JOIN rb ON ra.nat = rb.nat AND ra.sk = rb.sk
      WHERE r1 <= {k} AND r2 <= {k}
    ),
    per AS (
      SELECT nat, count(*) AS xk,
             sum(CAST(round({w_case}, 12) AS DECIMAL(38,12))) AS sw
      FROM common GROUP BY nat
    ),
    groups AS (
      SELECT DISTINCT nat FROM (
        SELECT nat FROM ra WHERE r1 <= {k}
        UNION ALL SELECT nat FROM rb WHERE r2 <= {k}
      )
    )
    SELECT CAST(groups.nat AS BIGINT) AS s_nationkey,
           CAST(coalesce(xk, 0) AS BIGINT) AS overlap_at_k,
           round(coalesce(CAST(xk AS DOUBLE) / {float(k)!r}
                          * {float(p ** k)!r}
                          + {((1.0 - p) / p)!r} * CAST(sw AS DOUBLE),
                          0.0), 6) AS rbo
    FROM groups LEFT JOIN per ON per.nat = groups.nat
    """


@register(
    "q257_rbo_rankings",
    oracle=_q257_oracle,
    description="Rank-biased overlap (operators/evalmetrics."
    "rbo_extrapolated; Webber, Moffat & Zobel 2010, extrapolated "
    "form) between each nation's top-10 suppliers BY REVENUE and BY "
    "PART BREADTH - the top-weighted ranker-agreement measure the "
    "eval family lacked: Kendall/Spearman need conjoint lists and "
    "weight all depths equally, while retrieval regression gates "
    "(old vs new scorer, BM25 vs dense) care about the head; p=0.9 "
    "puts ~86% of the mass on the top 10. No per-depth loop: a "
    "common item enters every prefix past m = max(r1, r2), so the "
    "depth sum collapses to precomputed tail-weight literals W(m) "
    "shared verbatim with the oracle (the discount-literal rule); "
    "one (group, item) equi-join + one map-side-combined aggregate.",
    tags=("evalmetrics", "join", "aggregate"),
)
def q257_rbo_rankings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from bigdata_kafka_2_spark.operators.evalmetrics import (
        rbo_extrapolated,
    )

    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    rev = F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 4
    ).cast("decimal(18,4)")
    srev = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .groupBy(
            F.col("s_nationkey").alias("nat"),
            F.col("l_suppkey").alias("sk"),
        )
        .agg(
            F.sum(rev).alias("rev"),
            F.countDistinct("l_partkey").alias("breadth"),
        )
    )
    wa = Window.partitionBy("nat").orderBy(
        F.col("rev").desc(), F.col("sk").asc()
    )
    wb = Window.partitionBy("nat").orderBy(
        F.col("breadth").desc(), F.col("sk").asc()
    )
    ra = srev.select("nat", "sk", F.row_number().over(wa).alias("rank"))
    rb = srev.select("nat", "sk", F.row_number().over(wb).alias("rank"))
    return rbo_extrapolated(
        ra, rb, "nat", "sk", "rank", p=0.9, k=10
    ).withColumnRenamed("nat", "s_nationkey").select(
        F.col("s_nationkey").cast("long").alias("s_nationkey"),
        "overlap_at_k",
        "rbo",
    )


@register(
    "q258_eb_shrunk_rates",
    oracle="""
    WITH g AS (
      SELECT o_orderpriority AS pri, o_orderstatus AS st, count(*) AS n,
             sum(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END)
               AS x
      FROM orders GROUP BY 1, 2
    ),
    mom AS (
      SELECT count(*) AS k,
             sum(CAST(round(CAST(x AS DOUBLE) / CAST(n AS DOUBLE), 9)
                      AS DECIMAL(38,9))) AS s1,
             sum(CAST(round(round(CAST(x AS DOUBLE)
                                  / CAST(n AS DOUBLE), 9)
                            * round(CAST(x AS DOUBLE)
                                    / CAST(n AS DOUBLE), 9), 12)
                      AS DECIMAL(38,12))) AS s2
      FROM g
    ),
    prior AS (
      SELECT m, v,
             CASE WHEN v > 0 AND v < m * (1.0 - m)
                   AND (m * (1.0 - m) / v - 1.0) > 0
                  THEN m * (m * (1.0 - m) / v - 1.0) ELSE 0.0 END
               AS alpha,
             CASE WHEN v > 0 AND v < m * (1.0 - m)
                   AND (m * (1.0 - m) / v - 1.0) > 0
                  THEN (1.0 - m) * (m * (1.0 - m) / v - 1.0)
                  ELSE 0.0 END AS beta
      FROM (
        SELECT CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE) AS m,
               CAST(s2 AS DOUBLE) / CAST(k AS DOUBLE)
               - (CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE))
                 * (CAST(s1 AS DOUBLE) / CAST(k AS DOUBLE)) AS v
        FROM mom
      )
    )
    SELECT pri AS o_orderpriority, st AS o_orderstatus,
           CAST(n AS BIGINT) AS n, CAST(x AS BIGINT) AS successes,
           round(CAST(x AS DOUBLE) / CAST(n AS DOUBLE), 6) AS raw_rate,
           round((CAST(x AS DOUBLE) + alpha)
                 / (CAST(n AS DOUBLE) + alpha + beta), 6)
             AS shrunk_rate
    FROM g, prior
    """,
    description="Empirical-Bayes shrunken high-value-order rates per "
    "(priority, status) cell (operators/profile.eb_shrunk_rates; "
    "Robbins 1956, the Efron-Morris estimator): a beta-binomial "
    "prior fitted by method of moments across groups pulls small-n "
    "rates toward the corpus prior while large-n rates barely move - "
    "what every leaderboard/quality dashboard needs when group sizes "
    "vary wildly, the Bayesian sibling of q251's Wilson bound "
    "(Wilson widens the interval; EB moves the point). Rate moments "
    "accumulate as exact DECIMAL of 9/12-dp terms; the prior lands "
    "as two bounded driver scalars computed through plain IEEE "
    "expressions the oracle transcribes verbatim (degenerate fits "
    "return raw rates with alpha=beta=0).",
    tags=("profile", "aggregate"),
)
def q258_eb_shrunk_rates(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.profile import eb_shrunk_rates

    o = read_table(spark, sf_dir, "orders")
    return eb_shrunk_rates(
        o,
        ["o_orderpriority", "o_orderstatus"],
        (F.col("o_totalprice") > 150000).cast("int"),
    )


def _q259_oracle(sf_dir: str | None = None) -> str:
    # chi-square survival for BOTH df parities via the shared
    # paired-builder (operators/mathfn.chi2_sf_sql) — identical
    # literals and IEEE op order to the Spark side's chi2_sf_col
    from bigdata_kafka_2_spark.operators.mathfn import chi2_sf_sql

    sf_expr = chi2_sf_sql("x2", "df", max_df=16)
    return f"""
    WITH cells AS (
      SELECT c_nationkey AS g, c_mktsegment AS c,
             CASE WHEN c_acctbal > 5000 THEN 1 ELSE 0 END AS f,
             count(*) AS o
      FROM customer GROUP BY 1, 2, 3
    ),
    rows_m AS (
      SELECT g, c, sum(o) AS rs FROM cells GROUP BY 1, 2
    ),
    cols_m AS (
      SELECT g, f, sum(o) AS cs FROM cells GROUP BY 1, 2
    ),
    tot AS (
      SELECT g, sum(o) AS n, count(DISTINCT c) AS kc,
             count(DISTINCT f) AS kf
      FROM cells GROUP BY 1
    ),
    grid AS (
      SELECT rows_m.g, rows_m.c, cols_m.f, rs, cs,
             coalesce(o, 0) AS o, n, kc, kf
      FROM rows_m
        JOIN cols_m ON cols_m.g = rows_m.g
        LEFT JOIN cells ON cells.g = rows_m.g AND cells.c = rows_m.c
                        AND cells.f = cols_m.f
        JOIN tot ON tot.g = rows_m.g
    ),
    per AS (
      SELECT g, max(n) AS n, max(kc) AS kc, max(kf) AS kf,
             sum(CAST(round(
               (CAST(o AS DOUBLE) - CAST(rs AS DOUBLE)
                  * CAST(cs AS DOUBLE) / CAST(n AS DOUBLE))
               * (CAST(o AS DOUBLE) - CAST(rs AS DOUBLE)
                  * CAST(cs AS DOUBLE) / CAST(n AS DOUBLE))
               / (CAST(rs AS DOUBLE) * CAST(cs AS DOUBLE)
                  / CAST(n AS DOUBLE)), 9) AS DECIMAL(38,9))) AS x2s
      FROM grid GROUP BY g
    ),
    tests AS (
      SELECT g, CAST(n AS BIGINT) AS n,
             round(CAST(x2s AS DOUBLE), 6) AS chi2,
             CAST(df AS BIGINT) AS df,
             round({sf_expr}, 9) AS p
      FROM (SELECT *, CAST(x2s AS DOUBLE) AS x2,
                   (kc - 1) * (kf - 1) AS df FROM per)
    ),
    ranked AS (
      SELECT *, row_number() OVER (
               ORDER BY p ASC NULLS LAST, g ASC) AS r
      FROM tests
    ),
    m_tests AS (
      SELECT sum(CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END) AS m
      FROM ranked
    ),
    cut AS (
      SELECT ranked.*, round(0.1 * CAST(r AS DOUBLE)
                             / CAST(m AS DOUBLE), 9) AS bh_cutoff
      FROM ranked, m_tests
    ),
    rstar AS (
      SELECT coalesce(max(CASE WHEN p IS NOT NULL AND p <= bh_cutoff
                                THEN r END), 0) AS rs
      FROM cut
    )
    SELECT CAST(g AS BIGINT) AS c_nationkey, n, chi2, df,
           p AS p_value, CAST(r AS BIGINT) AS p_rank, bh_cutoff,
           (p IS NOT NULL) AS tested,
           (p IS NOT NULL AND r <= (SELECT rs FROM rstar)) AS rejected
    FROM cut
    """


@register(
    "q259_fdr_chi2_gate",
    oracle=_q259_oracle,
    description="Per-nation chi-square segment-vs-balance tests with "
    "Benjamini-Hochberg FDR control across the family (operators/"
    "profile.groupwise_chi2_fdr; Benjamini & Hochberg 1995): the "
    "multiple-testing completion of the per-test statistics family - "
    "sweeping 25 nations at alpha=0.1 each yields ~2.5 false alarms "
    "per sweep, BH holds the expected false-discovery FRACTION at "
    "alpha, which is what a segment-sweep drift monitor ships. The "
    "chi-square p uses closed-form survival for BOTH df parities "
    "(operators/mathfn: even df exp-polynomial; odd df adds the "
    "shared literal-coefficient erfc, A&S 7.1.26) - no incomplete-"
    "gamma library call, both engines evaluate the same IEEE order; "
    "absent grid cells enter as O=0 (they contribute E, which a "
    "present-cells-only sum silently drops); r* is one bounded "
    "aggregate over the |tests|-row table. Groups with zero or "
    "oversized df carry NULL p and a FALSE 'tested' flag so any "
    "exclusion from the BH family is visible, never silent.",
    tags=("profile", "aggregate", "window"),
)
def q259_fdr_chi2_gate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.profile import (
        groupwise_chi2_fdr,
    )

    c = read_table(spark, sf_dir, "customer")
    return groupwise_chi2_fdr(
        c,
        "c_nationkey",
        "c_mktsegment",
        F.col("c_acctbal") > 5000,
        alpha=0.1,
    ).withColumn(
        "c_nationkey", F.col("c_nationkey").cast("long")
    )


@register(
    "q261_cochran_armitage",
    oracle="""
    WITH base AS (
      SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS w,
             CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END AS s
      FROM orders
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS N,
             CAST(sum(s) AS BIGINT) AS A,
             CAST(sum(w * s) AS BIGINT) AS wa,
             CAST(sum(w) AS BIGINT) AS wn,
             CAST(sum(w * w) AS BIGINT) AS w2n,
             CAST(count(DISTINCT w) AS BIGINT) AS k
      FROM base
    )
    SELECT N AS n, A AS n_success, k AS n_levels,
           round(CAST(wa AS DOUBLE)
                 - (CAST(A AS DOUBLE) / CAST(N AS DOUBLE))
                   * CAST(wn AS DOUBLE), 6) AS t_stat,
           round(CASE WHEN A > 0 AND A < N AND k > 1 THEN
             (CAST(A AS DOUBLE) / CAST(N AS DOUBLE))
             * (1.0 - CAST(A AS DOUBLE) / CAST(N AS DOUBLE))
             * (CAST(w2n AS DOUBLE)
                - CAST(wn AS DOUBLE) * CAST(wn AS DOUBLE)
                  / CAST(N AS DOUBLE)) END, 6) AS variance,
           round(CASE WHEN A > 0 AND A < N AND k > 1 THEN
             (CAST(wa AS DOUBLE)
              - (CAST(A AS DOUBLE) / CAST(N AS DOUBLE))
                * CAST(wn AS DOUBLE))
             * (CAST(wa AS DOUBLE)
                - (CAST(A AS DOUBLE) / CAST(N AS DOUBLE))
                  * CAST(wn AS DOUBLE))
             / ((CAST(A AS DOUBLE) / CAST(N AS DOUBLE))
                * (1.0 - CAST(A AS DOUBLE) / CAST(N AS DOUBLE))
                * (CAST(w2n AS DOUBLE)
                   - CAST(wn AS DOUBLE) * CAST(wn AS DOUBLE)
                     / CAST(N AS DOUBLE))) END, 6) AS z2,
           CASE WHEN A > 0 AND A < N AND k > 1 THEN
             (CAST(wa AS DOUBLE)
              - (CAST(A AS DOUBLE) / CAST(N AS DOUBLE))
                * CAST(wn AS DOUBLE))
             * (CAST(wa AS DOUBLE)
                - (CAST(A AS DOUBLE) / CAST(N AS DOUBLE))
                  * CAST(wn AS DOUBLE))
             / ((CAST(A AS DOUBLE) / CAST(N AS DOUBLE))
                * (1.0 - CAST(A AS DOUBLE) / CAST(N AS DOUBLE))
                * (CAST(w2n AS DOUBLE)
                   - CAST(wn AS DOUBLE) * CAST(wn AS DOUBLE)
                     / CAST(N AS DOUBLE)))
             > 3.841458820694124 END AS significant
    FROM agg
    """,
    description="Cochran-Armitage trend test (operators/profile."
    "cochran_armitage_trend; Cochran 1954, Armitage 1955): does the "
    "high-value-order rate trend MONOTONICALLY across the ordered "
    "priority tiers (scores from the priority's leading digit) - the "
    "1-df ordered-alternative test that beats the omnibus chi-square "
    "(q126/q259) exactly when the alternative is a trend; the "
    "omnibus spends df on every deviation pattern, this spends one "
    "on the monotone one. One map-side-combined aggregate of exact "
    "BIGINT sums; significance against the shared 95% chi2_1 "
    "literal, no normal-CDF library call on either engine.",
    tags=("profile", "aggregate"),
)
def q261_cochran_armitage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.profile import (
        cochran_armitage_trend,
    )

    o = read_table(spark, sf_dir, "orders")
    return cochran_armitage_trend(
        o.select(
            F.substring("o_orderpriority", 1, 1)
            .cast("long")
            .alias("score"),
            (F.col("o_totalprice") > 150000).alias("hv"),
        ),
        "score",
        "hv",
    )


@register(
    "q263_cuped_ate",
    oracle="""
    WITH base AS (
      SELECT (o_custkey % 2 = 0) AS arm,
             CAST(o_totalprice AS DOUBLE) AS y,
             CAST(c_acctbal AS DOUBLE) AS x
      FROM orders JOIN customer ON c_custkey = o_custkey
    ),
    agg AS (
      SELECT
        sum(CASE WHEN arm THEN 1 ELSE 0 END) AS nt,
        sum(CASE WHEN arm THEN 0 ELSE 1 END) AS nc,
        sum(CAST(round(x, 4) AS DECIMAL(38,4))) AS sx,
        sum(CAST(round(y, 4) AS DECIMAL(38,4))) AS sy,
        sum(CAST(round(x * y, 9) AS DECIMAL(38,9))) AS sxy,
        sum(CAST(round(x * x, 9) AS DECIMAL(38,9))) AS sxx,
        sum(CAST(round(y * y, 9) AS DECIMAL(38,9))) AS syy,
        sum(CASE WHEN arm THEN CAST(round(y, 4) AS DECIMAL(38,4)) END)
          AS syt,
        sum(CASE WHEN NOT arm THEN CAST(round(y, 4) AS DECIMAL(38,4)) END)
          AS syc,
        sum(CASE WHEN arm THEN CAST(round(x, 4) AS DECIMAL(38,4)) END)
          AS sxt,
        sum(CASE WHEN NOT arm THEN CAST(round(x, 4) AS DECIMAL(38,4)) END)
          AS sxc
      FROM base
    ),
    calc AS (
      SELECT CAST(nt AS BIGINT) AS n_t, CAST(nc AS BIGINT) AS n_c,
        CAST(nt AS DOUBLE) AS ntd, CAST(nc AS DOUBLE) AS ncd,
        CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
        CAST(sxy AS DOUBLE) AS sxyd, CAST(sxx AS DOUBLE) AS sxxd,
        CAST(syy AS DOUBLE) AS syyd,
        CAST(syt AS DOUBLE) AS sytd, CAST(syc AS DOUBLE) AS sycd,
        CAST(sxt AS DOUBLE) AS sxtd, CAST(sxc AS DOUBLE) AS sxcd
      FROM agg
    ),
    m AS (
      SELECT *,
        sxyd - sxd * syd / (ntd + ncd) AS cov,
        sxxd - sxd * sxd / (ntd + ncd) AS varx,
        syyd - syd * syd / (ntd + ncd) AS vary,
        sytd / ntd - sycd / ncd AS ate_raw_v
      FROM calc
    )
    SELECT n_t, n_c,
      round(cov / varx, 6) AS theta,
      round(ate_raw_v, 6) AS ate_raw,
      round(ate_raw_v - (cov / varx) * (sxtd / ntd - sxcd / ncd), 6)
        AS ate_cuped,
      round(cov * cov / (varx * vary), 6) AS var_reduction
    FROM m
    """,
    description="CUPED variance-reduced treatment effect (operators/"
    "profile.cuped_adjusted_ate; Deng, Xu, Kohavi & Walker WSDM 2013) "
    "over a deterministic customer-parity split, with account balance "
    "as the pre-experiment covariate for order value: theta = "
    "Cov(X,Y)/Var(X) pooled, adjusted means per arm, and the "
    "variance-reduction fraction rho^2 - the industry-standard "
    "experiment shortener next to the readout tests (q264 z-test, "
    "q244 stratified ATE). ONE map-side-combined moment aggregate "
    "(exact DECIMAL of 4/9-dp-rounded terms); all ratios are "
    "row-local double math on the 1-row result.",
    tags=("profile", "aggregate", "join"),
)
def q263_cuped_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.profile import (
        cuped_adjusted_ate,
    )

    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    base = o.join(c, o.o_custkey == c.c_custkey).select(
        (F.col("o_custkey") % 2 == 0).alias("arm"),
        F.col("o_totalprice").alias("y"),
        F.col("c_acctbal").alias("x"),
    )
    return cuped_adjusted_ate(base, "arm", "y", "x")


def _q264_oracle(sf_dir: str | None = None) -> str:
    import math

    from bigdata_kafka_2_spark.operators.mathfn import erfc_sql

    p_expr = erfc_sql(f"abs(z) / {math.sqrt(2.0)!r}")
    return f"""
    WITH agg AS (
      SELECT
        sum(CASE WHEN o_custkey % 2 = 0 THEN 1 ELSE 0 END) AS na,
        sum(CASE WHEN o_custkey % 2 = 0
                  AND o_totalprice > 150000 THEN 1 ELSE 0 END) AS xa,
        sum(CASE WHEN o_custkey % 2 = 0 THEN 0 ELSE 1 END) AS nb,
        sum(CASE WHEN o_custkey % 2 <> 0
                  AND o_totalprice > 150000 THEN 1 ELSE 0 END) AS xb
      FROM orders
    ),
    m AS (
      SELECT *,
        CAST(xa AS DOUBLE) / CAST(na AS DOUBLE) AS pa,
        CAST(xb AS DOUBLE) / CAST(nb AS DOUBLE) AS pb,
        (CAST(xa AS DOUBLE) + CAST(xb AS DOUBLE))
          / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)) AS pool
      FROM agg
    ),
    zc AS (
      SELECT *,
        (pa - pb) / sqrt(pool * (1.0 - pool)
                         * (1.0 / CAST(na AS DOUBLE)
                            + 1.0 / CAST(nb AS DOUBLE))) AS z
      FROM m
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(xa AS BIGINT) AS x_a,
           CAST(nb AS BIGINT) AS n_b, CAST(xb AS BIGINT) AS x_b,
           round(pa, 6) AS p_a, round(pb, 6) AS p_b,
           round(pa - pb, 6) AS diff,
           round(z, 6) AS z,
           round({p_expr}, 9) AS p_value
    FROM zc
    """


@register(
    "q264_ab_conversion_ztest",
    oracle=_q264_oracle,
    description="Two-proportion z-test (operators/profile."
    "two_proportion_ztest) of high-value-order conversion between a "
    "deterministic customer-parity split - the A/B-readout workhorse, "
    "and the repo's first normal-tail p-value through the oracle "
    "gate: p = erfc(|z|/sqrt(2)) via operators/mathfn's shared "
    "literal-coefficient A&S 7.1.26 polynomial, which Spark and "
    "DuckDB evaluate in the same IEEE order (neither engine has a "
    "builtin erf). ONE map-side-combined four-cell aggregate; pooled-"
    "variance z and the tail are row-local double math on the 1-row "
    "result.",
    tags=("profile", "aggregate"),
)
def q264_ab_conversion_ztest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.profile import (
        two_proportion_ztest,
    )

    o = read_table(spark, sf_dir, "orders")
    return two_proportion_ztest(
        o,
        F.col("o_custkey") % 2 == 0,
        F.col("o_totalprice") > 150000,
    )


def _q265_oracle(sf_dir: str | None = None) -> str:
    from bigdata_kafka_2_spark.operators.mathfn import chi2_sf_sql

    sf_expr = chi2_sf_sql("x2", "df", max_df=16)
    return f"""
    WITH per AS (
      SELECT CAST(o_custkey % 4 AS VARCHAR) AS arm,
             count(*) AS n, 0.25 AS expected_share
      FROM orders GROUP BY 1
    ),
    tot AS (SELECT sum(n) AS bigN FROM per),
    rows_t AS (
      SELECT arm, n, expected_share,
             expected_share * CAST(bigN AS DOUBLE) AS en,
             CAST(round(
               (CAST(n AS DOUBLE) - expected_share * CAST(bigN AS DOUBLE))
               * (CAST(n AS DOUBLE) - expected_share * CAST(bigN AS DOUBLE))
               / (expected_share * CAST(bigN AS DOUBLE)), 9)
             AS DECIMAL(38,9)) AS t
      FROM per, tot
    ),
    fam AS (
      SELECT CAST(sum(t) AS DOUBLE) AS x2,
             CAST(count(*) - 1 AS INT) AS df
      FROM rows_t
    ),
    famc AS (
      SELECT round(x2, 6) AS chi2, CAST(df AS BIGINT) AS df,
             round({sf_expr}, 9) AS p_value
      FROM fam
    )
    SELECT arm, CAST(n AS BIGINT) AS n,
           round(expected_share, 6) AS expected_share,
           round(en, 2) AS expected_n,
           round(CAST(t AS DOUBLE), 6) AS chi2_term,
           chi2, famc.df AS df, p_value,
           (p_value < 0.001) AS srm_flag
    FROM rows_t, famc
    """


@register(
    "q265_srm_gate",
    oracle=_q265_oracle,
    description="Sample-ratio-mismatch gate (operators/profile."
    "srm_check): observed traffic counts across a deterministic "
    "4-way customer split against equal expected shares - the "
    "first sanity check every experimentation platform runs; a "
    "significant chi-square means the ASSIGNMENT is broken and every "
    "downstream metric is invalid. Exercises the ODD-df chi-square "
    "survival (df=3) via operators/mathfn's paired closed form "
    "(erfc term + half-integer series, shared literals, same IEEE "
    "order on both engines) - a p-value the even-only closed form "
    "could never hash. One count aggregate; 9-dp DECIMAL terms; "
    "family scalars broadcast onto the |arms|-row output.",
    tags=("profile", "aggregate"),
)
def q265_srm_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.profile import srm_check

    o = read_table(spark, sf_dir, "orders")
    return srm_check(o, (F.col("o_custkey") % 4).cast("string"))


@register(
    "q266_isotonic_calibration",
    oracle="""
    WITH bins AS (
      SELECT l_discount AS score, count(*) AS n,
             sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS pos
      FROM lineitem GROUP BY 1
    ),
    ranked AS (
      SELECT score, n, pos,
             row_number() OVER (ORDER BY score) AS i,
             sum(n) OVER (ORDER BY score
               ROWS UNBOUNDED PRECEDING) AS cn,
             sum(pos) OVER (ORDER BY score
               ROWS UNBOUNDED PRECEDING) AS cp
      FROM bins
    ),
    intervals AS (
      SELECT lo.i AS a, hi.i AS b,
             round(CAST(hi.cp - (lo.cp - lo.pos) AS DOUBLE)
                   / CAST(hi.cn - (lo.cn - lo.n) AS DOUBLE), 9) AS m
      FROM ranked lo JOIN ranked hi ON lo.i <= hi.i
    ),
    inner_min AS (
      SELECT r.i AS pt, iv.a, min(iv.m) AS minm
      FROM ranked r JOIN intervals iv
        ON iv.a <= r.i AND r.i <= iv.b
      GROUP BY 1, 2
    ),
    iso AS (
      SELECT pt, max(minm) AS iso FROM inner_min GROUP BY 1
    )
    SELECT ranked.score, CAST(ranked.n AS BIGINT) AS n,
           CAST(ranked.pos AS BIGINT) AS pos,
           round(CAST(ranked.pos AS DOUBLE)
                 / CAST(ranked.n AS DOUBLE), 6) AS raw_rate,
           round(iso.iso, 6) AS iso_rate
    FROM ranked JOIN iso ON iso.pt = ranked.i
    """,
    description="Isotonic calibration of the discount level against "
    "return probability (operators/evalmetrics."
    "isotonic_binned_calibration; Zadrozny & Elkan 2002): the exact "
    "PAVA staircase via the max-min interval-mean representation "
    "g(i) = max_a<=i min_b>=i mean(a..b) - the monotone-calibration "
    "member of the eval family (q245's conformal threshold bounds "
    "error; q182's ECE measures miscalibration; this FIXES it). "
    "Data-sized work ends at one map-side-combined aggregate to the "
    "distinct-score bin table; the interval lattice is bins-bounded "
    "(asserted <= 64), broadcast-joined, with 9-dp DECIMAL interval "
    "means so max/min ties resolve identically cross-engine.",
    tags=("evalmetrics", "aggregate", "window"),
)
def q266_isotonic_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.evalmetrics import (
        isotonic_binned_calibration,
    )

    li = read_table(spark, sf_dir, "lineitem")
    return isotonic_binned_calibration(
        li, "l_discount", F.col("l_returnflag") == "R"
    )


@register(
    "q267_mde_by_segment",
    oracle="""
    WITH g AS (
      SELECT o_orderpriority,
             count(*) AS n,
             sum(CAST(round(CAST(o_totalprice AS DOUBLE), 4)
                      AS DECIMAL(38,4))) AS s,
             sum(CAST(round(CAST(o_totalprice AS DOUBLE)
                            * CAST(o_totalprice AS DOUBLE), 9)
                      AS DECIMAL(38,9))) AS s2
      FROM orders GROUP BY 1
    ),
    m AS (
      SELECT o_orderpriority, n,
        CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
        sqrt((CAST(s2 AS DOUBLE)
              - CAST(n AS DOUBLE)
                * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
             / (CAST(n AS DOUBLE) - 1.0)) AS sd,
        CAST(n AS DOUBLE) AS nd
      FROM g
    )
    SELECT o_orderpriority, CAST(n AS BIGINT) AS n,
           round(mean, 6) AS mean, round(sd, 6) AS sd,
           round(2.801585 * sd * sqrt(2.0 / (nd / 2.0)), 6) AS mde_abs,
           round(2.801585 * sd * sqrt(2.0 / (nd / 2.0)) / mean, 6)
             AS mde_rel
    FROM m
    """,
    description="Minimum detectable effect per order-priority segment "
    "(operators/profile.mde_by_group): the experiment POWER-planning "
    "face of the experimentation family - (z_a/2 + z_b) * sd * "
    "sqrt(2/(n/2)) at alpha=0.05 / power=0.8 with the z quantiles as "
    "shared double literals (no engine quantile call); segments whose "
    "MDE exceeds any plausible effect are not worth testing. One "
    "map-side-combined moment aggregate per segment (exact DECIMAL "
    "of 4/9-dp-rounded terms), sample-sd form.",
    tags=("profile", "aggregate"),
)
def q267_mde_by_segment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.profile import mde_by_group

    o = read_table(spark, sf_dir, "orders")
    return mde_by_group(o, ["o_orderpriority"], "o_totalprice")


@register(
    "q268_ucb_arm_ranking",
    oracle="""
    WITH per AS (
      SELECT o_orderpriority AS arm, count(*) AS n,
             sum(CAST(round(
               CASE WHEN o_totalprice > 150000 THEN 1.0 ELSE 0.0 END,
               6) AS DECIMAL(38,6))) AS s
      FROM orders GROUP BY 1
    ),
    tot AS (SELECT sum(n) AS bigN FROM per),
    scored AS (
      SELECT arm, CAST(n AS BIGINT) AS n,
             round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean,
             round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
                   + sqrt(2.0 * ln(CAST(bigN AS DOUBLE))
                          / CAST(n AS DOUBLE)), 6) AS ucb
      FROM per, tot
    )
    SELECT arm, n, mean, ucb,
           CAST(row_number() OVER (ORDER BY ucb DESC, arm ASC)
                AS BIGINT) AS rank
    FROM scored
    """,
    description="UCB1 arm ranking from logged history (operators/"
    "sampling.ucb_arm_ranking; Auer, Cesa-Bianchi & Fischer 2002) "
    "over order-priority arms with high-value conversion as the "
    "[0,1] reward - the deterministic adaptive-COLLECTION policy "
    "next to the experiment readouts (q263/q264 read an experiment "
    "out; UCB says which variant/prompt/source to sample next, "
    "exploration bonus sqrt(2 ln N / n)). One map-side-combined "
    "aggregate to |arms| rows, one broadcast total, rank window over "
    "the |arms|-row table only; ln evaluates engine-side on the "
    "identical integer N (the KM ln-parity rule), absorbed by 6-dp "
    "rounding.",
    tags=("sampling", "aggregate"),
)
def q268_ucb_arm_ranking(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.sampling import (
        ucb_arm_ranking,
    )

    o = read_table(spark, sf_dir, "orders")
    return ucb_arm_ranking(
        o,
        "o_orderpriority",
        F.when(F.col("o_totalprice") > 150000, 1.0).otherwise(0.0),
    )


def _q270_oracle(sf_dir: str | None = None) -> str:
    from bigdata_kafka_2_spark.operators.mathfn import chi2_sf_sql

    sf_expr = chi2_sf_sql("h_adj", "df", max_df=16)
    return f"""
    WITH gv AS (
      SELECT c_mktsegment AS g, CAST(c_acctbal AS DOUBLE) AS v,
             count(*) AS cjv
      FROM customer GROUP BY 1, 2
    ),
    vt AS (SELECT v, sum(cjv) AS c FROM gv GROUP BY 1),
    pre AS (
      SELECT v, c,
             CAST(coalesce(sum(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS DECIMAL(38,0)) AS before_c
      FROM vt
    ),
    rk AS (
      SELECT v,
             CAST(2 AS DECIMAL(38,0)) * before_c
               + CAST(c AS DECIMAL(38,0))
               + CAST(1 AS DECIMAL(38,0)) AS rk2,
             CAST(c AS DECIMAL(38,0)) * CAST(c AS DECIMAL(38,0))
               * CAST(c AS DECIMAL(38,0))
               - CAST(c AS DECIMAL(38,0)) AS tt
      FROM pre
    ),
    per AS (
      SELECT gv.g,
             sum(CAST(cjv AS DECIMAL(38,0))) AS nj,
             sum(CAST(cjv AS DECIMAL(38,0)) * rk.rk2) AS r2j
      FROM gv JOIN rk ON rk.v = gv.v
      GROUP BY 1
    ),
    ties AS (SELECT sum(tt) AS T FROM rk),
    fam AS (
      SELECT CAST(sum(nj) AS BIGINT) AS N,
             CAST(count(*) AS BIGINT) AS k,
             sum(CAST(round(CAST(r2j * r2j AS DOUBLE)
                            / CAST(nj AS DOUBLE), 9)
                      AS DECIMAL(38,9))) AS S
      FROM per
    ),
    calc AS (
      SELECT N, k,
        3.0 * CAST(S AS DOUBLE)
          / (CAST(N AS DOUBLE) * (CAST(N AS DOUBLE) + 1.0))
          - 3.0 * (CAST(N AS DOUBLE) + 1.0) AS h,
        1.0 - CAST(T AS DOUBLE)
          / (CAST(N AS DOUBLE) * CAST(N AS DOUBLE) * CAST(N AS DOUBLE)
             - CAST(N AS DOUBLE)) AS corr,
        CAST(k - 1 AS INT) AS df
      FROM fam, ties
    ),
    fin AS (
      SELECT N AS n, k, round(h, 6) AS h,
             round(h / corr, 6) AS h_adj_r,
             h / corr AS h_adj,
             CAST(df AS BIGINT) AS dfl, df
      FROM calc
    )
    SELECT n, k, h, h_adj_r AS h_adj, dfl AS df,
           round({sf_expr}, 9) AS p_value
    FROM fin
    """


@register(
    "q270_kruskal_wallis",
    oracle=_q270_oracle,
    description="Kruskal-Wallis H test (operators/profile."
    "kruskal_wallis; Kruskal & Wallis 1952) of account balance across "
    "the five market segments - the k-SAMPLE completion of the "
    "two-sample family (q225 Mann-Whitney is its k=2 case, q192 KS "
    "the max-gap face): tie-corrected H referred to chi-square with "
    "k-1 df through operators/mathfn's both-parity survival. Exact "
    "integer rank machinery: doubled tie-average ranks from the "
    "range-bucketed exclusive prefix count, per-group doubled "
    "rank-sums in DECIMAL(38,0), per-group quotients rounded 9 dp "
    "into an exact k-bounded DECIMAL sum; the shuffle carries one "
    "row per (group, distinct value).",
    tags=("profile", "aggregate"),
)
def q270_kruskal_wallis(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.profile import kruskal_wallis

    c = read_table(spark, sf_dir, "customer")
    return kruskal_wallis(c, "c_mktsegment", "c_acctbal")


@register(
    "q272_cronbach_alpha",
    oracle="""
    WITH norm AS (
      SELECT doc_id,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
      FROM documents
    ),
    items AS (
      SELECT doc_id,
             CAST(length(nt) AS BIGINT) AS i1,
             CAST(len(string_split(nt, ' ')) AS BIGINT) AS i2,
             (SELECT count(DISTINCT tok) FROM
               UNNEST(string_split(nt, ' ')) AS u(tok)) AS i3
      FROM norm
    ),
    agg AS (
      SELECT count(*) AS n,
        sum(CAST(i1 AS DECIMAL(38,0))) AS s1,
        sum(CAST(i1 AS DECIMAL(38,0)) * CAST(i1 AS DECIMAL(38,0))) AS q1,
        sum(CAST(i2 AS DECIMAL(38,0))) AS s2,
        sum(CAST(i2 AS DECIMAL(38,0)) * CAST(i2 AS DECIMAL(38,0))) AS q2,
        sum(CAST(i3 AS DECIMAL(38,0))) AS s3,
        sum(CAST(i3 AS DECIMAL(38,0)) * CAST(i3 AS DECIMAL(38,0))) AS q3,
        sum(CAST(i1 + i2 + i3 AS DECIMAL(38,0))) AS st,
        sum(CAST(i1 + i2 + i3 AS DECIMAL(38,0))
            * CAST(i1 + i2 + i3 AS DECIMAL(38,0))) AS qt
      FROM items
    )
    SELECT CAST(n AS BIGINT) AS n, CAST(3 AS BIGINT) AS k,
      round(1.5 * (1.0 -
        (CAST(CAST(n AS DECIMAL(38,0)) * q1 - s1 * s1 AS DOUBLE)
         + CAST(CAST(n AS DECIMAL(38,0)) * q2 - s2 * s2 AS DOUBLE)
         + CAST(CAST(n AS DECIMAL(38,0)) * q3 - s3 * s3 AS DOUBLE))
        / CAST(CAST(n AS DECIMAL(38,0)) * qt - st * st AS DOUBLE)), 6)
        AS alpha
    FROM agg
    """,
    description="Cronbach's alpha (operators/profile."
    "cronbach_alpha_int; Cronbach 1951) over three integer document "
    "quality items (normalized char length, token count, distinct "
    "token count) - the scale-reliability member of the "
    "annotation-quality family (q215 Krippendorff audits coders, "
    "q198 router kappa audits classifiers; alpha audits a COMPOSITE "
    "quality score: do its component signals measure one construct). "
    "Integer contract makes it exact end to end: with "
    "num = n*sum(x^2) - sum(x)^2 the sample-variance denominators "
    "cancel and alpha is ONE double division over DECIMAL(38,0) "
    "integer moments (scale-0 multiplies never lose digits under "
    "Spark's precision cap). One map-side-combined aggregate.",
    tags=("profile", "text", "aggregate"),
)
def q272_cronbach_alpha(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.profile import (
        cronbach_alpha_int,
    )
    from bigdata_kafka_2_spark.operators.text import normalize_text

    d = read_table(spark, sf_dir, "documents")
    nt = normalize_text("text")
    toks = F.split(nt, " ")
    items = d.select(
        F.length(nt).cast("long").alias("i1"),
        F.size(toks).cast("long").alias("i2"),
        F.size(F.array_distinct(toks)).cast("long").alias("i3"),
    )
    return cronbach_alpha_int(items, ["i1", "i2", "i3"])


def _q274_oracle(sf_dir: str | None = None) -> str:
    from bigdata_kafka_2_spark.operators.mathfn import ks_sf_sql

    p_expr = ks_sf_sql("lam")
    return f"""
    WITH gv AS (
      SELECT o_orderpriority AS g, CAST(o_totalprice AS DOUBLE) AS v,
             count(*) AS cgv
      FROM orders GROUP BY 1, 2
    ),
    vt AS (SELECT v, sum(cgv) AS cv FROM gv GROUP BY 1),
    pooled AS (
      SELECT v, CAST(sum(cv) OVER (ORDER BY v
               ROWS UNBOUNDED PRECEDING) AS DECIMAL(38,0)) AS cum_all
      FROM vt
    ),
    grp AS (
      SELECT g, CAST(sum(cgv) AS DECIMAL(38,0)) AS ng
      FROM gv GROUP BY 1
    ),
    grid AS (
      SELECT p.v, p.cum_all, gr.g, gr.ng,
             CAST(coalesce(gv.cgv, 0) AS DECIMAL(38,0)) AS c
      FROM pooled p CROSS JOIN grp gr
      LEFT JOIN gv ON gv.g = gr.g AND gv.v = p.v
    ),
    cums AS (
      SELECT g, ng, cum_all,
             sum(c) OVER (PARTITION BY g ORDER BY v
               ROWS UNBOUNDED PRECEDING) AS cg
      FROM grid
    ),
    tot AS (SELECT CAST(count(*) AS DECIMAL(38,0)) AS N FROM orders),
    per AS (
      SELECT g, max(ng) AS ng, max(N - ng) AS nr,
             max(abs(cg * (N - ng) - (cum_all - cg) * ng)) AS dmax
      FROM cums, tot GROUP BY g
    ),
    lamc AS (
      SELECT g, CAST(ng AS BIGINT) AS n,
        CAST(dmax AS DOUBLE)
          / (CAST(ng AS DOUBLE) * CAST(nr AS DOUBLE)) AS d_raw,
        CAST(ng AS DOUBLE) * CAST(nr AS DOUBLE)
          / (CAST(ng AS DOUBLE) + CAST(nr AS DOUBLE)) AS ne,
        (CAST(ng AS DECIMAL(38,0)) > 0
         AND CAST(nr AS DECIMAL(38,0)) > 0) AS ok
      FROM per
    ),
    tests AS (
      SELECT g, n, round(d_raw, 6) AS d_stat,
        CASE WHEN ok THEN round({p_expr}, 9) END AS p
      FROM (SELECT *, (sqrt(ne) + 0.12 + 0.11 / sqrt(ne)) * d_raw
                      AS lam FROM lamc)
    ),
    ranked AS (
      SELECT *, row_number() OVER (
               ORDER BY p ASC NULLS LAST, g ASC) AS r
      FROM tests
    ),
    m_tests AS (
      SELECT sum(CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END) AS m
      FROM ranked
    ),
    cut AS (
      SELECT ranked.*, round(0.05 * CAST(r AS DOUBLE)
                             / CAST(m AS DOUBLE), 9) AS bh_cutoff
      FROM ranked, m_tests
    ),
    rstar AS (
      SELECT coalesce(max(CASE WHEN p IS NOT NULL AND p <= bh_cutoff
                                THEN r END), 0) AS rs
      FROM cut
    )
    SELECT g AS o_orderpriority, n, d_stat,
           p AS p_value, CAST(r AS BIGINT) AS p_rank, bh_cutoff,
           (p IS NOT NULL AND r <= (SELECT rs FROM rstar)) AS rejected
    FROM cut
    """


@register(
    "q274_ks_drift_gate",
    oracle=_q274_oracle,
    description="Per-segment two-sample KS drift sweep with "
    "Benjamini-Hochberg FDR control (operators/profile."
    "groupwise_ks_fdr): each order-priority segment's price "
    "distribution against the REST of the table, the leave-one-out "
    "drift question a segment monitor asks - the continuous-metric "
    "sibling completing q259's categorical chi-square gate. Exact D "
    "as one integer max over DECIMAL(38,0) cross-products of "
    "inclusive cumulative counts on the pooled distinct-value grid "
    "(|groups| x |values| rows - LINEAR in values; the CDF gap can "
    "peak at another group's change point, so the full grid IS the "
    "exact form); asymptotic p via operators/mathfn.ks_sf (the "
    "Kolmogorov series as shared literals, Stephens 1970 ne "
    "correction); BH over the |groups|-row test table.",
    tags=("profile", "aggregate", "window"),
)
def q274_ks_drift_gate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.profile import (
        groupwise_ks_fdr,
    )

    o = read_table(spark, sf_dir, "orders")
    return groupwise_ks_fdr(
        o, "o_orderpriority", "o_totalprice", alpha=0.05
    )


@register(
    "q275_spearman_corr",
    oracle="""
    WITH rx AS (
      SELECT v, CAST(2 AS DECIMAL(38,0))
               * CAST(coalesce(sum(c) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) AS DECIMAL(38,0))
               + CAST(c AS DECIMAL(38,0))
               + CAST(1 AS DECIMAL(38,0)) AS r2
      FROM (SELECT CAST(l_quantity AS DOUBLE) AS v, count(*) AS c
            FROM lineitem GROUP BY 1)
    ),
    ry AS (
      SELECT v, CAST(2 AS DECIMAL(38,0))
               * CAST(coalesce(sum(c) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) AS DECIMAL(38,0))
               + CAST(c AS DECIMAL(38,0))
               + CAST(1 AS DECIMAL(38,0)) AS r2
      FROM (SELECT CAST(l_extendedprice AS DOUBLE) AS v, count(*) AS c
            FROM lineitem GROUP BY 1)
    ),
    rows_r AS (
      SELECT rx.r2 AS rxv, ry.r2 AS ryv
      FROM lineitem l
        JOIN rx ON rx.v = CAST(l.l_quantity AS DOUBLE)
        JOIN ry ON ry.v = CAST(l.l_extendedprice AS DOUBLE)
    ),
    agg AS (
      SELECT count(*) AS n,
             sum(rxv) AS sx, sum(ryv) AS sy,
             sum(rxv * rxv) AS sxx, sum(ryv * ryv) AS syy,
             sum(rxv * ryv) AS sxy
      FROM rows_r
    )
    SELECT CAST(n AS BIGINT) AS n,
      round((CAST(sxy AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
               / CAST(n AS DOUBLE))
            / sqrt((CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                      / CAST(n AS DOUBLE))
                   * (CAST(syy AS DOUBLE)
                      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                        / CAST(n AS DOUBLE))), 6) AS rho
    FROM agg
    """,
    description="Tie-corrected Spearman rank correlation (operators/"
    "profile.spearman_corr; Spearman 1904) of order quantity against "
    "extended price - the monotone-association member beside the "
    "mirror's Pearson (q98): it sees ANY monotone relationship and "
    "heavy tails cannot distort it; l_quantity's 50 distinct values "
    "exercise the mid-rank tie path hard. All-integer rank "
    "construction on the exact machinery (doubled mid-ranks from "
    "range-bucketed prefix counts, two value-keyed equi-joins, "
    "DECIMAL(38,0) Pearson moments - the doubling cancels in the "
    "ratio), one double expression at the end.",
    tags=("profile", "aggregate", "join"),
)
def q275_spearman_corr(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.profile import spearman_corr

    li = read_table(spark, sf_dir, "lineitem")
    return spearman_corr(li, "l_quantity", "l_extendedprice")


@register(
    "q276_weighted_kappa",
    oracle="""
    WITH r AS (
      SELECT least(4, CAST(floor(length(text) / 120) AS BIGINT)) AS a,
             least(4, CAST(floor(
               len(string_split_regex(trim(text), '\\s+')) / 20
             ) AS BIGINT)) AS b
      FROM documents
    ),
    agg AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             sum(CAST((a - b) * (a - b) AS HUGEINT)) AS so,
             sum(CAST(a AS HUGEINT)) AS sa,
             sum(CAST(b AS HUGEINT)) AS sb,
             sum(CAST(a * a AS HUGEINT)) AS saa,
             sum(CAST(b * b AS HUGEINT)) AS sbb
      FROM r
    )
    SELECT CAST(n AS BIGINT) AS n,
      CASE WHEN (n * saa - 2 * sa * sb + n * sbb) <> 0 THEN
        round(1.0 - CAST(n * so AS DOUBLE)
                    / CAST(n * saa - 2 * sa * sb + n * sbb AS DOUBLE),
              6)
      END AS kappa_w
    FROM agg
    """,
    description="Quadratic-weighted Cohen's kappa (operators/"
    "evalmetrics.cohens_kappa_weighted; Cohen 1968) between two "
    "ordinal 0-4 quality raters derived from documents (char-length "
    "bucket vs token-count bucket) - the ordinal member of the "
    "annotation-agreement family (q198 unweighted kappa, q215 "
    "Krippendorff): near-misses cost (i-j)^2, so a 3-vs-4 "
    "disagreement barely dents agreement while 0-vs-4 destroys it. "
    "EXACT integer arithmetic: the chance mass expands ALGEBRAICALLY "
    "(N*Si^2na - 2(Si na)(Sj nb) + N*Sj^2nb - never a k x k marginal "
    "join), so kappa is ONE double division over DECIMAL(38,0) "
    "integer moments from ONE map-side-combined aggregate.",
    tags=("evalmetrics", "text", "aggregate"),
)
def q276_weighted_kappa(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.evalmetrics import (
        cohens_kappa_weighted,
    )

    d = read_table(spark, sf_dir, "documents")
    rated = d.select(
        F.least(
            F.lit(4), F.floor(F.length("text") / F.lit(120))
        ).alias("ra"),
        F.least(
            F.lit(4),
            F.floor(
                F.size(F.split(F.trim(F.col("text")), r"\s+"))
                / F.lit(20)
            ),
        ).alias("rb"),
    )
    return cohens_kappa_weighted(rated, "ra", "rb", "quadratic")


@register(
    "q277_calibration_ece",
    oracle="""
    WITH base AS (
      SELECT CAST(o_totalprice AS DOUBLE)
               - floor(CAST(o_totalprice AS DOUBLE)) AS s,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      FROM orders
    ),
    b2 AS (
      SELECT least(9, CAST(floor(s * 10) AS INT)) AS bin,
             CAST(round(s, 4) AS DECIMAL(18,4)) AS sr, y
      FROM base
    ),
    per AS (
      SELECT bin, count(*) AS n, sum(sr) AS ss, sum(y) AS pos
      FROM b2 GROUP BY 1
    ),
    binned AS (
      SELECT CAST(bin AS BIGINT) AS bin, CAST(n AS BIGINT) AS n,
        round(CAST(ss AS DOUBLE) / n, 6) AS conf,
        round(CAST(pos AS DOUBLE) / n, 6) AS acc,
        round(CAST(pos AS DOUBLE) / n - CAST(ss AS DOUBLE) / n, 6)
          AS gap,
        CAST(round(n * abs(CAST(pos AS DOUBLE) / n
                           - CAST(ss AS DOUBLE) / n), 9)
             AS DECIMAL(38,9)) AS t
      FROM per
    ),
    fam AS (
      SELECT round(CAST(sum(t) AS DOUBLE) / CAST(sum(n) AS DOUBLE), 6)
               AS ece,
             CAST(sum(n) AS BIGINT) AS n_total
      FROM binned
    )
    SELECT bin, n, conf, acc, gap, ece, n_total FROM binned, fam
    """,
    description="Reliability table + expected calibration error "
    "(operators/evalmetrics.expected_calibration_error; Naeini et al. "
    "AAAI 2015) of a deterministic [0,1) score (the fractional part "
    "of order value) against fulfillment outcome - the one-number "
    "calibration gate a model card reports, next to q266's isotonic "
    "FIT (this one AUDITS a fixed scorer, PAVA refits it). Equal-"
    "width bins with the 1.0-to-top-bin clamp; 4-dp DECIMAL score "
    "sums per bin (the money rule), integer-ratio accuracies, "
    "per-bin n*|acc-conf| rounded 9 dp into DECIMAL(38,9), one "
    "division at the end. ONE map-side-combined aggregate; the "
    "family scalar broadcasts back onto the <=10 bin rows.",
    tags=("evalmetrics", "aggregate"),
)
def q277_calibration_ece(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.evalmetrics import (
        expected_calibration_error,
    )

    o = read_table(spark, sf_dir, "orders")
    p = F.col("o_totalprice").cast("double")
    base = o.select(
        (p - F.floor(p)).alias("s"),
        (F.col("o_orderstatus") == "F").alias("y"),
    )
    return expected_calibration_error(base, "s", "y", n_bins=10)


@register(
    "q278_trimmed_mean",
    oracle="""
    WITH g AS (
      SELECT CAST(CAST(round(CAST(o_totalprice AS DOUBLE), 2)
                       AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
             count(*) AS c
      FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1
    ),
    pre AS (
      SELECT v, c,
             sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - c AS b
      FROM g
    ),
    tot AS (SELECT sum(c) AS n FROM g),
    j AS (
      SELECT pre.v, pre.c, pre.b, tot.n,
             CAST(floor(0.1 * n) AS BIGINT) AS k
      FROM pre, tot
    ),
    agg AS (
      SELECT max(n) AS nv, max(k) AS kv,
        sum(CAST(v AS HUGEINT)
            * CAST(greatest(0, least(b + c, n - k) - greatest(b, k))
                   AS HUGEINT)) AS ts,
        sum(CAST(greatest(0, least(b + c, n - k) - greatest(b, k))
                 AS HUGEINT)) AS tn,
        min(CASE WHEN b + c >= k + 1 THEN v END) AS L,
        min(CASE WHEN b + c >= n - k THEN v END) AS U
      FROM j
    )
    SELECT CAST(nv AS BIGINT) AS n, CAST(kv AS BIGINT) AS k_trim,
      round(CASE WHEN tn > 0 THEN
        CAST(ts AS DOUBLE) / (CAST(tn AS DOUBLE) * 100.0) END, 4)
        AS trimmed_mean,
      round(CASE WHEN tn > 0 THEN
        (CAST(ts AS DOUBLE) + CAST(kv AS DOUBLE) * CAST(L AS DOUBLE)
         + CAST(kv AS DOUBLE) * CAST(U AS DOUBLE))
        / (CAST(nv AS DOUBLE) * 100.0) END, 4) AS winsorized_mean,
      round(CAST(L AS DOUBLE) / 100.0, 2) AS lo_bound,
      round(CAST(U AS DOUBLE) / 100.0, 2) AS hi_bound
    FROM agg
    """,
    description="10%-trimmed and winsorized mean of order value "
    "(operators/profile.trimmed_winsorized_mean; Tukey's robust "
    "location pair) - the heavy-tail-safe readout an experiment "
    "publishes when one whale order can flip the raw mean. EXACT "
    "selection arithmetic with NO global sort: cents-valued counts "
    "with range-bucketed exclusive prefix sums; each distinct value "
    "contributes max(0, min(C+c, n-k) - max(C, k)) occurrences to "
    "the trimmed interior (pure integer interval overlap - boundary "
    "ties resolve identically on both engines by construction); the "
    "winsorized tail mass is k*L + k*U with L/U order statistics "
    "from conditional mins over the same prefix table; HUGEINT/"
    "DECIMAL(38,0) cent sums, one double division at the end.",
    tags=("profile", "aggregate", "window"),
)
def q278_trimmed_mean(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.profile import (
        trimmed_winsorized_mean,
    )

    o = read_table(spark, sf_dir, "orders")
    return trimmed_winsorized_mean(o, "o_totalprice", alpha=0.1)


@register(
    "q279_ratio_delta_ci",
    oracle="""
    WITH units AS (
      SELECT o_orderpriority AS arm, o_custkey AS u,
        CAST(sum(CAST(round(CAST(o_totalprice AS DOUBLE), 4)
                      AS DECIMAL(18,4))) AS DECIMAL(19,4)) AS y,
        CAST(sum(CAST(1.0 AS DECIMAL(18,4))) AS DECIMAL(19,4)) AS x
      FROM orders GROUP BY 1, 2
    ),
    per AS (
      SELECT arm, count(*) AS n, sum(y) AS sy, sum(x) AS sx,
             sum(y * y) AS syy, sum(x * x) AS sxx, sum(y * x) AS sxy
      FROM units GROUP BY 1
    ),
    m AS (
      SELECT arm, CAST(n AS BIGINT) AS n_units,
        CAST(n AS DOUBLE) AS nd,
        CAST(sy AS DOUBLE) AS syd, CAST(sx AS DOUBLE) AS sxd,
        (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
           / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS vy,
        (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
           / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS vx,
        (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
           / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS cxy
      FROM per
    ),
    v AS (
      SELECT *, syd / sxd AS r, sxd / nd AS xbar,
        (vy - 2.0 * (syd / sxd) * cxy
         + (syd / sxd) * (syd / sxd) * vx)
          / (nd * (sxd / nd) * (sxd / nd)) AS var_r
      FROM m
    )
    SELECT arm, n_units,
      round(syd, 4) AS num, round(sxd, 4) AS den,
      round(CASE WHEN sxd <> 0 THEN r END, 6) AS ratio,
      round(CASE WHEN n_units >= 2 AND sxd <> 0 AND var_r >= 0
            THEN sqrt(var_r) END, 6) AS se,
      round(CASE WHEN n_units >= 2 AND sxd <> 0 AND var_r >= 0
            THEN r - 1.959963984540054 * sqrt(var_r) END, 6) AS ci_lo,
      round(CASE WHEN n_units >= 2 AND sxd <> 0 AND var_r >= 0
            THEN r + 1.959963984540054 * sqrt(var_r) END, 6) AS ci_hi
    FROM v
    """,
    description="Per-priority revenue-per-order ratio metric with a "
    "delta-method CI clustered at the CUSTOMER (operators/profile."
    "ratio_metric_delta_ci; Deng, Knoblich & Lu KDD 2018): the "
    "correct readout for Sy/Sx metrics where the randomization unit "
    "contributes many correlated rows, so the naive per-row variance "
    "is wrong. Rows aggregate to the unit FIRST (map-side-combined "
    "groupBy; per-row 4-dp DECIMAL(18,4) rounding so unit sums are "
    "exact); every square/cross-moment is an EXACT DECIMAL(37,8) "
    "product (ideal 18+18+1 precision fits under 38 - no "
    "allowPrecisionLoss scale reduction); Var(R) = (s2y - 2R*sxy + "
    "R^2*s2x)/(n*xbar^2) and the 95% z-CI are row-local doubles on "
    "the per-arm 1-row moments.",
    tags=("profile", "aggregate"),
)
def q279_ratio_delta_ci(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.profile import (
        ratio_metric_delta_ci,
    )

    o = read_table(spark, sf_dir, "orders")
    return ratio_metric_delta_ci(
        o, "o_orderpriority", "o_custkey", "o_totalprice", F.lit(1.0)
    )


@register(
    "q280_msprt_readout",
    oracle="""
    WITH base AS (
      SELECT (o_custkey % 2 = 0) AS a,
             CAST(round(CAST(o_totalprice AS DOUBLE), 4)
                  AS DECIMAL(19,4)) AS m
      FROM orders
    ),
    agg AS (
      SELECT
        sum(CASE WHEN a THEN 1 ELSE 0 END) AS na,
        sum(CASE WHEN NOT a THEN 1 ELSE 0 END) AS nb,
        sum(CASE WHEN a THEN m END) AS sa,
        sum(CASE WHEN NOT a THEN m END) AS sb,
        sum(CASE WHEN a THEN m * m END) AS saa,
        sum(CASE WHEN NOT a THEN m * m END) AS sbb
      FROM base
    ),
    c AS (
      SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        CAST(na AS DOUBLE) AS nad, CAST(nb AS DOUBLE) AS nbd,
        CAST(sa AS DOUBLE) AS sad, CAST(sb AS DOUBLE) AS sbd,
        CAST(saa AS DOUBLE) AS saad, CAST(sbb AS DOUBLE) AS sbbd
      FROM agg
    ),
    d AS (
      SELECT *,
        ((saad - sad * sad / nad) + (sbbd - sbd * sbd / nbd))
          / (nad + nbd - 2.0) AS s2,
        sad / nad - sbd / nbd AS diff_v
      FROM c
    ),
    e AS (
      SELECT *, s2 * (1.0 / nad + 1.0 / nbd) AS v FROM d
    ),
    f AS (
      SELECT *,
        sqrt(v / (v + 1.0))
          * exp(diff_v * diff_v * 1.0 / (2.0 * v * (v + 1.0))) AS lam_v,
        (n_a >= 2 AND n_b >= 2 AND s2 > 0) AS ok
      FROM e
    )
    SELECT n_a, n_b,
      round(diff_v, 6) AS diff,
      round(CASE WHEN ok THEN v END, 4) AS var_hat,
      round(CASE WHEN ok THEN lam_v END, 6) AS lam,
      round(CASE WHEN ok THEN least(1.0, 1.0 / lam_v) END, 9)
        AS p_always_valid,
      CASE WHEN ok THEN least(1.0, 1.0 / lam_v) < 0.05 END
        AS significant
    FROM f
    """,
    description="Mixture sequential probability ratio test readout "
    "(operators/profile.msprt_always_valid_p; Johari, Koomen, "
    "Pekelis & Walsh KDD 2017) on the customer-parity split of order "
    "value, tau=1 - the ALWAYS-VALID p-value that stays correct "
    "under continuous peeking, which the fixed-n z-test (q264) "
    "cannot offer; the natural batch companion of the streaming SRM "
    "monitor (q273). ONE map-side-combined aggregate of 4-dp "
    "DECIMAL(18,4) metrics with EXACT DECIMAL(37,8) squares (ideal "
    "precision under 38); the mixture likelihood ratio "
    "Lam = sqrt(V/(V+tau^2))*exp(theta^2 tau^2/(2V(V+tau^2))) and "
    "p = min(1, 1/Lam) are row-local doubles on the 1-row result "
    "(sqrt/exp on identical IEEE inputs both engines).",
    tags=("profile", "aggregate"),
)
def q280_msprt_readout(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.profile import (
        msprt_always_valid_p,
    )

    o = read_table(spark, sf_dir, "orders")
    return msprt_always_valid_p(
        o, (F.col("o_custkey") % 2 == 0), "o_totalprice", tau=1.0
    )


@register(
    "q283_gini_coefficient",
    oracle="""
    WITH g AS (
      SELECT CAST(CAST(round(CAST(o_totalprice AS DOUBLE), 2)
                       AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
             count(*) AS c
      FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1
    ),
    pre AS (
      SELECT v, c,
             sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - c AS b
      FROM g
    ),
    agg AS (
      SELECT sum(CAST(c AS HUGEINT)) AS n,
        sum(CAST(v AS HUGEINT) * CAST(c AS HUGEINT)) AS s,
        sum(CAST(v AS HUGEINT) * CAST(c AS HUGEINT)
            * (2 * CAST(b AS HUGEINT) + CAST(c AS HUGEINT) + 1))
          AS rs
      FROM pre
    )
    SELECT CAST(n AS BIGINT) AS n,
      round(CAST(s AS DOUBLE) / 100.0, 2) AS total,
      round(CASE WHEN n > 0 AND s > 0 THEN
        CAST(rs AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE))
        - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE) END, 6)
        AS gini
    FROM agg
    """,
    description="Gini coefficient of order value (operators/profile."
    "gini_coefficient; Gini 1912 via the tie-correct rank "
    "formulation) - the VALUE-level inequality number beside q226's "
    "per-KEY concentration profile (q226 asks which customers hold "
    "the mass; this asks how unequal the order sizes themselves "
    "are, the shuffle-skew early warning for the salting machinery). "
    "EXACT mid-rank construction on the q275 machinery: cents-"
    "valued counts, doubled tie-averaged rank 2C+c+1 from the range-"
    "bucketed exclusive prefix sum, G = Sum v*c*(2C+c+1)/(n*Sum v*c) "
    "- (n+1)/n with every product in DECIMAL(38,0)/HUGEINT and ONE "
    "double division rounded at the end.",
    tags=("profile", "aggregate", "window"),
)
def q283_gini_coefficient(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.profile import (
        gini_coefficient,
    )

    o = read_table(spark, sf_dir, "orders")
    return gini_coefficient(o, "o_totalprice")


@register(
    "q285_brier_decomposition",
    oracle="""
    WITH base AS (
      SELECT CAST(o_totalprice AS DOUBLE)
               - floor(CAST(o_totalprice AS DOUBLE)) AS s,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      FROM orders
    ),
    r2 AS (
      SELECT least(9, CAST(floor(s * 10) AS INT)) AS bin, s,
             CAST(round(s, 4) AS DECIMAL(18,4)) AS sr, y
      FROM base
    ),
    gstat AS (
      SELECT count(*) AS n, sum(y) AS pos,
        sum(CAST(round((s - y) * (s - y), 9) AS DECIMAL(38,9)))
          AS bsum
      FROM r2
    ),
    per AS (
      SELECT bin, count(*) AS nb, sum(sr) AS ss, sum(y) AS posb
      FROM r2 GROUP BY 1
    ),
    terms AS (
      SELECT per.nb, gstat.n, gstat.pos, gstat.bsum,
        CAST(per.ss AS DOUBLE) / per.nb AS conf,
        CAST(per.posb AS DOUBLE) / per.nb AS acc,
        CAST(gstat.pos AS DOUBLE) / gstat.n AS ybar
      FROM per, gstat
    ),
    agg AS (
      SELECT max(n) AS nv, max(pos) AS posv, max(bsum) AS bsumv,
        sum(CAST(round(nb * (conf - acc) * (conf - acc), 9)
                 AS DECIMAL(38,9))) AS rel,
        sum(CAST(round(nb * (acc - ybar) * (acc - ybar), 9)
                 AS DECIMAL(38,9))) AS res
      FROM terms
    )
    SELECT CAST(nv AS BIGINT) AS n,
      round(CAST(bsumv AS DOUBLE) / nv, 6) AS brier,
      round(CAST(rel AS DOUBLE) / nv, 6) AS reliability,
      round(CAST(res AS DOUBLE) / nv, 6) AS resolution,
      round((CAST(posv AS DOUBLE) / nv)
            * (1.0 - CAST(posv AS DOUBLE) / nv), 6) AS uncertainty
    FROM agg
    """,
    description="Murphy (1973) Brier-score decomposition (operators/"
    "evalmetrics.brier_decomposition) of the q277 scorer "
    "(fractional order value vs fulfillment) into reliability - "
    "resolution + uncertainty: WHY a probabilistic scorer is good "
    "or bad - miscalibration (reliability, q277's gap squared), "
    "outcome separation (resolution), and the irreducible base-rate "
    "floor ybar(1-ybar). Raw Brier as per-row (s-y)^2 rounded 9 dp "
    "into DECIMAL(38,9); binned terms on the q277 machinery "
    "(integer-ratio accuracies, 4-dp DECIMAL confidence sums) "
    "summed over <=10 bin rows; two map-side-combined aggregates "
    "and a broadcast 1-row base rate.",
    tags=("evalmetrics", "aggregate"),
)
def q285_brier_decomposition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.evalmetrics import (
        brier_decomposition,
    )

    o = read_table(spark, sf_dir, "orders")
    p = F.col("o_totalprice").cast("double")
    base = o.select(
        (p - F.floor(p)).alias("s"),
        (F.col("o_orderstatus") == "F").alias("y"),
    )
    return brier_decomposition(base, "s", "y", n_bins=10)


@register(
    "q289_theil_index",
    oracle="""
    WITH g AS (
      SELECT CAST(CAST(round(CAST(o_totalprice AS DOUBLE), 2)
                       AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
             count(*) AS c
      FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1
    ),
    tot AS (
      SELECT sum(CAST(c AS HUGEINT)) AS n,
             sum(CAST(v AS HUGEINT) * CAST(c AS HUGEINT)) AS s
      FROM g
    ),
    terms AS (
      SELECT g.v, g.c, tot.n, tot.s,
        CAST(tot.s AS DOUBLE) / CAST(tot.n AS DOUBLE) AS mu
      FROM g, tot
    ),
    agg AS (
      SELECT max(n) AS nv, max(s) AS sv,
        sum(CAST(round(CASE WHEN v > 0 THEN
              CAST(c AS DOUBLE) * (CAST(v AS DOUBLE) / mu)
              * ln(CAST(v AS DOUBLE) / mu)
            ELSE 0.0 END, 9) AS DECIMAL(38,9))) AS t
      FROM terms
    )
    SELECT CAST(nv AS BIGINT) AS n,
      round(CAST(sv AS DOUBLE) / 100.0, 2) AS total,
      round(CASE WHEN nv > 0 AND sv > 0 THEN
        CAST(t AS DOUBLE) / CAST(nv AS DOUBLE) END, 6) AS theil
    FROM agg
    """,
    description="Theil T inequality index of order value (operators/"
    "profile.theil_index; Theil 1967) - the entropy-based companion "
    "of q283's Gini: additively DECOMPOSABLE into between-group + "
    "within-group terms, which is why fairness and concentration "
    "audits needing per-segment attribution prefer it; 0 = even, "
    "ln(n) = one order holds everything. Cents-valued distinct-"
    "value counts end the data-sized work (one map-side-combined "
    "aggregate); mu is an exact HUGEINT/DECIMAL cent ratio on a "
    "1-row broadcast; per-value c*(v/mu)*ln(v/mu) terms round 9 dp "
    "into DECIMAL(38,9) (the KM ln-parity rule), one division at "
    "the end.",
    tags=("profile", "aggregate"),
)
def q289_theil_index(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.profile import theil_index

    o = read_table(spark, sf_dir, "orders")
    return theil_index(o, "o_totalprice")


@register(
    "q291_kendall_tau",
    oracle="""
    WITH r2 AS (
      SELECT l_quantity AS x, l_linenumber AS y
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_linenumber IS NOT NULL
    ),
    cells AS (SELECT x, y, count(*) AS c FROM r2 GROUP BY 1, 2),
    pq AS (
      SELECT
        sum(CASE WHEN b.y > a.y THEN
          CAST(a.c AS HUGEINT) * CAST(b.c AS HUGEINT) END) AS p,
        sum(CASE WHEN b.y < a.y THEN
          CAST(a.c AS HUGEINT) * CAST(b.c AS HUGEINT) END) AS q
      FROM cells a JOIN cells b ON b.x > a.x
    ),
    tx AS (
      SELECT sum(CAST(t AS HUGEINT)) AS n,
             sum(CAST(t AS HUGEINT) * (CAST(t AS HUGEINT) - 1))
               AS ttx
      FROM (SELECT sum(c) AS t FROM cells GROUP BY x)
    ),
    ty AS (
      SELECT sum(CAST(t AS HUGEINT) * (CAST(t AS HUGEINT) - 1))
               AS tty
      FROM (SELECT sum(c) AS t FROM cells GROUP BY y)
    ),
    f AS (
      SELECT coalesce(p, 0) AS p, coalesce(q, 0) AS q,
             tx.n, tx.ttx, ty.tty
      FROM pq, tx, ty
    )
    SELECT CAST(n AS BIGINT) AS n,
      CAST(p AS BIGINT) AS concordant,
      CAST(q AS BIGINT) AS discordant,
      round(CASE WHEN (n * (n - 1) - ttx) > 0
                  AND (n * (n - 1) - tty) > 0 THEN
        2.0 * CAST(p - q AS DOUBLE)
        / sqrt(CAST(n * (n - 1) - ttx AS DOUBLE)
               * CAST(n * (n - 1) - tty AS DOUBLE)) END, 6)
        AS tau_b
    FROM f
    """,
    description="Kendall's tau-b with tie correction (operators/"
    "profile.kendall_tau_b; Kendall 1945) between order quantity "
    "and line number - the third association member beside Pearson "
    "(q98, linear) and Spearman (q275, monotone ranks): pairwise "
    "order agreement, the natural statistic for ordinal scales. "
    "BOUNDED-cardinality contract: the fact table reduces to a "
    "50 x 7 contingency grid FIRST (one map-side-combined "
    "aggregate); concordant/discordant mass comes from the CELL-"
    "pair triangle join, bounded by the VALUE SPACE, never the row "
    "count. Doubled integer units (n(n-1), sum t(t-1)) keep every "
    "term exact DECIMAL(38,0)/HUGEINT; one sqrt-division at the "
    "end.",
    tags=("profile", "aggregate", "join"),
)
def q291_kendall_tau(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.profile import kendall_tau_b

    li = read_table(spark, sf_dir, "lineitem")
    return kendall_tau_b(li, "l_quantity", "l_linenumber")


def _q292_oracle(sf_dir: str | None = None) -> str:
    from bigdata_kafka_2_spark.operators.mathfn import chi2_sf_sql

    p_expr = chi2_sf_sql("chi2v", "dfv")
    return f"""
    WITH per AS (
      SELECT o_orderpriority AS g, count(*) AS n,
        sum(CAST(round(CAST(o_totalprice AS DOUBLE), 4)
                 AS DECIMAL(38,4))) AS s,
        sum(CAST(round(CAST(o_totalprice AS DOUBLE)
                       * CAST(o_totalprice AS DOUBLE), 9)
                 AS DECIMAL(38,9))) AS ss
      FROM orders
      WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL
      GROUP BY 1 HAVING count(*) >= 2
    ),
    v AS (
      SELECT n,
        (CAST(ss AS DOUBLE)
         - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / (n - 1.0)
          AS var_i
      FROM per
    ),
    t AS (
      SELECT n, var_i,
        CAST(round((n - 1.0) * ln(var_i), 9) AS DECIMAL(38,9))
          AS t1,
        CAST(round(1.0 / (n - 1.0), 9) AS DECIMAL(38,9)) AS t2v,
        CAST(round((n - 1.0) * var_i, 9) AS DECIMAL(38,9)) AS t3
      FROM v
    ),
    agg AS (
      SELECT count(*) AS k, sum(n) AS N, min(var_i) AS minvar,
        sum(t1) AS s1, sum(t2v) AS s2, sum(t3) AS s3
      FROM t
    ),
    c1 AS (
      SELECT CAST(k AS BIGINT) AS k, CAST(N AS BIGINT) AS n,
        CAST(k AS DOUBLE) AS kd, CAST(N AS DOUBLE) AS nd, minvar,
        CAST(s1 AS DOUBLE) AS s1d, CAST(s2 AS DOUBLE) AS s2d,
        CAST(s3 AS DOUBLE) AS s3d
      FROM agg
    ),
    c2 AS (
      SELECT *, s3d / (nd - kd) AS sp2,
        1.0 + (s2d - 1.0 / (nd - kd)) / (3.0 * (kd - 1.0)) AS cc
      FROM c1
    ),
    c3 AS (
      SELECT *, ((nd - kd) * ln(sp2) - s1d) / cc AS chi2v,
        CAST(k - 1 AS INT) AS dfv,
        (k >= 2 AND minvar > 0) AS ok
      FROM c2
    )
    SELECT k, n,
      round(CASE WHEN ok THEN sp2 END, 2) AS pooled_var,
      round(CASE WHEN ok THEN chi2v END, 6) AS chi2,
      round(CASE WHEN ok THEN {p_expr} END, 9) AS p_value
    FROM c3
    """


@register(
    "q292_bartlett_test",
    oracle=_q292_oracle,
    description="Bartlett's variance-homogeneity test (operators/"
    "profile.bartlett_test; Bartlett 1937) of order value across "
    "the five priorities - the equal-variance GATE the pooled "
    "readouts (q264 z-test, q280 mSPRT) assume; df = k-1 = 4 "
    "exercises the even branch of the shared chi-square survival. "
    "Per-group moments as exact DECIMAL of 4/9-dp-rounded values "
    "(the CUPED discipline), k-row ln terms rounded 9 dp into "
    "DECIMAL(38,9) (bounded, order-independent), the Bartlett "
    "correction C and the survival evaluated engine-side on "
    "identical doubles. ONE map-side-combined aggregate over the "
    "fact table.",
    tags=("profile", "aggregate"),
)
def q292_bartlett_test(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.profile import bartlett_test

    o = read_table(spark, sf_dir, "orders")
    return bartlett_test(o, "o_orderpriority", "o_totalprice")


def _q293_oracle(sf_dir: str | None = None) -> str:
    from bigdata_kafka_2_spark.operators.mathfn import chi2_sf_sql

    p_expr = chi2_sf_sql("chi2v", "dfv")
    return f"""
    WITH r2 AS (
      SELECT o_orderpriority AS a, o_orderstatus AS b
      FROM orders
      WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL
    ),
    cont AS (SELECT a, b, count(*) AS o FROM r2 GROUP BY 1, 2),
    ra AS (SELECT a, count(*) AS na FROM r2 GROUP BY 1),
    cb AS (SELECT b, count(*) AS nb FROM r2 GROUP BY 1),
    tot AS (SELECT count(*) AS N FROM r2),
    grid AS (
      SELECT ra.a, cb.b, ra.na, cb.nb, tot.N,
             coalesce(cont.o, 0) AS o
      FROM ra CROSS JOIN cb CROSS JOIN tot
      LEFT JOIN cont ON cont.a = ra.a AND cont.b = cb.b
    ),
    g2 AS (
      SELECT a, b, o, N,
        CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / CAST(N AS DOUBLE)
          AS e
      FROM grid
    ),
    terms AS (
      SELECT a, b, N,
        CAST(round((CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e)
                   / e, 9) AS DECIMAL(38,9)) AS t
      FROM g2
    ),
    agg AS (
      SELECT max(N) AS n, count(DISTINCT a) AS r,
             count(DISTINCT b) AS c, sum(t) AS chi2s
      FROM terms
    ),
    c1 AS (
      SELECT CAST(n AS BIGINT) AS n, CAST(r AS BIGINT) AS r,
        CAST(c AS BIGINT) AS c,
        CAST(chi2s AS DOUBLE) AS chi2v,
        CAST((r - 1) * (c - 1) AS INT) AS dfv,
        CAST(n AS DOUBLE) AS nd,
        CAST(least(r - 1, c - 1) AS DOUBLE) AS mindim,
        (r >= 2 AND c >= 2) AS ok
      FROM agg
    )
    SELECT n, r, c,
      round(CASE WHEN ok THEN chi2v END, 6) AS chi2,
      CASE WHEN ok THEN CAST(dfv AS BIGINT) END AS df,
      round(CASE WHEN ok THEN {p_expr} END, 9) AS p_value,
      round(CASE WHEN ok THEN sqrt(chi2v / (nd * mindim)) END, 6)
        AS cramers_v
    FROM c1
    """


@register(
    "q293_cramers_v",
    oracle=_q293_oracle,
    description="Chi-square test of independence + Cramer's V "
    "(operators/profile.cramers_v; Cramer 1946) between order "
    "priority and status - the nominal x nominal association member "
    "of the correlation family (Pearson numeric, Spearman/tau-b "
    "ordinal), the segment-dependence number a mix audit reads; "
    "5 x 3 grid, df = 8 exercises the even chi-square branch. The "
    "FULL grid including zero cells is built from the two bounded "
    "marginal tables (broadcast cross join - value-space-bounded, "
    "never data-sized) so absent cells contribute their whole "
    "(0-E)^2/E term (the q265 SRM densification discipline); "
    "per-cell terms round 9 dp into DECIMAL(38,9); "
    "V = sqrt(chi2/(N min(r-1,c-1))).",
    tags=("profile", "aggregate", "join"),
)
def q293_cramers_v(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.profile import cramers_v

    o = read_table(spark, sf_dir, "orders")
    return cramers_v(o, "o_orderpriority", "o_orderstatus")


