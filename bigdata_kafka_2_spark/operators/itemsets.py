"""Frequent-itemset mining (charter extension — co-occurrence
statistics over basket-shaped data).

The 2-itemset core of the a-priori family, Spark-first: the
monotonicity theorem (a pair can only be frequent if BOTH items are)
lets the per-basket pair explosion be pruned BEFORE it happens — at
100 TB the prune is the difference between Σ|basket|² over all
baskets and the same sum over frequent items only, typically orders
of magnitude. The oracle computes WITHOUT the prune (the theorem
says results are identical), so the hash gate checks the pruning is
in fact lossless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequent_pairs(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 3,
) -> DataFrame:
    """Frequent item PAIRS with association metrics: (item_a, item_b,
    support, conf_ab, lift), item_a < item_b, support >= min_support
    (support = number of distinct baskets containing both items).

    Plan: distinct (basket, item) → per-item support (map-side
    combined) → A-PRIORI PRUNE (semi join against items with support
    >= min_support — monotonicity makes this lossless) → per-basket
    self-join (pair volume bounded by Σ|pruned basket|²) → pair
    count → metrics. ``conf_ab = P(b | a)``; ``lift = P(a,b) /
    (P(a)·P(b))`` computed from exact integer counts in one double
    division (engine-portable). The total basket count rides in via
    a broadcast 1-row aggregate — no driver collect.
    """
    it = baskets.select(basket_col, item_col).distinct()
    isup = it.groupBy(item_col).agg(F.count(F.lit(1)).alias("__sup"))
    freq = isup.filter(F.col("__sup") >= min_support)
    pruned = it.join(freq.select(item_col), on=item_col, how="left_semi")
    a = pruned.select(
        F.col(basket_col).alias("__bk"), F.col(item_col).alias("item_a")
    )
    b = pruned.select(
        F.col(basket_col).alias("__bk"), F.col(item_col).alias("item_b")
    )
    pairs = (
        a.join(b, on="__bk")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
    )
    n_b = it.agg(
        F.countDistinct(basket_col).alias("__n_baskets")
    )
    sa = freq.select(
        F.col(item_col).alias("item_a"), F.col("__sup").alias("__sup_a")
    )
    sb = freq.select(
        F.col(item_col).alias("item_b"), F.col("__sup").alias("__sup_b")
    )
    out = (
        pairs.join(sa, "item_a")
        .join(sb, "item_b")
        .crossJoin(F.broadcast(n_b))
    )
    conf = F.col("support").cast("double") / F.col("__sup_a").cast("double")
    lift = (F.col("support") * F.col("__n_baskets")).cast("double") / (
        F.col("__sup_a") * F.col("__sup_b")
    ).cast("double")
    return out.select(
        "item_a",
        "item_b",
        "support",
        F.round(conf, 4).alias("conf_ab"),
        F.round(lift, 4).alias("lift"),
    )
