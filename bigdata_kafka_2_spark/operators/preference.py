"""Pairwise-preference analytics — the RLHF/preference-data family.

A preference dataset is a stream of comparisons "a beat b"; the
operators here aggregate raw comparisons into a canonical win table
and fit Bradley–Terry strengths (Bradley & Terry 1952) with Hunter's
MM updates (Hunter 2004, *MM algorithms for generalized Bradley-Terry
models*) — the standard model behind reward-model data curation,
annotator-quality auditing, and win-rate leaderboards. Everything is
declarative DataFrame composition on the engine's iterative-dataflow
discipline (fixed unrolled iterations, 12-dp rounding schedule, exact
DECIMAL sums of rounded terms), so the fit is bit-identical to the
unrolled-CTE SQL oracle at every round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: 12-dp strength arithmetic — same scale as the PageRank/HITS
#: induction (operators/graph._RANK_SCALE).
_SCALE = 12
_DEC = "decimal(38,12)"


def pairwise_wins(
    df: DataFrame,
    group_col: str,
    player_col: str,
    rank_col: str,
) -> DataFrame:
    """Canonical win table from WITHIN-GROUP comparisons: one row
    ``(a, b, wins_a, wins_b)`` per unordered player pair ``a < b``,
    where every two rows of one group with different players form a
    comparison won by the smaller ``rank_col`` (ties are dropped —
    they carry no preference signal in a Bradley–Terry likelihood).

    Plan shape: one group-keyed self-equi-join (pair volume bounded
    by Σ|group|² — groups are baskets/sessions, never the corpus),
    canonicalized by ``player_a < player_b`` so each comparison is
    generated exactly once, then one map-side-combined aggregate to
    |players|² rows at most. The comparison-mining front half of
    :func:`bradley_terry`.
    """
    left = df.select(
        F.col(group_col).alias("__g"),
        F.col(player_col).alias("a"),
        F.col(rank_col).alias("__ra"),
    )
    right = df.select(
        F.col(group_col).alias("__g"),
        F.col(player_col).alias("b"),
        F.col(rank_col).alias("__rb"),
    )
    pairs = left.join(right, on="__g").filter(F.col("a") < F.col("b"))
    return (
        pairs.groupBy("a", "b")
        .agg(
            F.sum(
                F.when(F.col("__ra") < F.col("__rb"), 1).otherwise(0)
            )
            .cast("long")
            .alias("wins_a"),
            F.sum(
                F.when(F.col("__rb") < F.col("__ra"), 1).otherwise(0)
            )
            .cast("long")
            .alias("wins_b"),
        )
        .filter((F.col("wins_a") + F.col("wins_b")) > 0)
    )


def bradley_terry(
    matches: DataFrame,
    iterations: int = 3,
    broadcast_players: int = 2_000_000,
) -> DataFrame:
    """Bradley–Terry strengths from a canonical win table
    ``(a, b, wins_a, wins_b)`` (``a < b``, from
    :func:`pairwise_wins`): ``(player, strength)`` with Σ strength =
    1 after ``iterations`` rounds of Hunter's MM update

        R_i = W_i / Σ_{j≠i} n_ij / (w_i + w_j)     (then normalize)

    where ``W_i`` is player i's total wins and ``n_ij`` the total
    decided comparisons between i and j. The model behind reward-data
    win rates: strengths are interval-scale preference scores
    (P(i beats j) = w_i/(w_i+w_j)), which raw win percentages are not
    when the comparison graph is unbalanced.

    Scale plan — the Pregel shape shared with
    :func:`~bigdata_kafka_2_spark.operators.graph.pagerank`: the
    symmetric match table (2 rows per pair) is the edge list,
    checkpointed once; per round ONE edge⋈strength join per side
    (strength vector broadcast below ``broadcast_players``, shuffle
    join above), one i-keyed aggregate, one broadcast 1-row
    normalization total. Iterations are FIXED and unrolled — the
    12-dp determinism induction: each pair term
    ``round(n_ij/(w_i+w_j), 12)`` and each round's strengths are
    12-dp rounded, per-player term sums and the normalization total
    accumulate as exact DECIMAL(38,12) of those rounded terms, so
    Spark and the unrolled-CTE oracle agree bit-for-bit at every
    round at any partitioning.

    Precondition (MLE existence, Ford 1957): every player needs at
    least one win — a zero-win player's update is 0 and a pair of
    zero-strength opponents would divide by zero in later rounds; the
    operator raises if any ``W_i = 0`` (one bounded 1-row aggregate,
    the pattern of pagerank's node count) rather than silently
    fitting a degenerate model. Full Ford connectivity (every
    partition of players has wins across the cut) is the caller's
    contract, as in every BT implementation.
    """
    if iterations < 1:
        raise ValueError(
            f"bradley_terry: iterations must be >= 1, got {iterations}"
        )
    n_tot = (F.col("wins_a") + F.col("wins_b")).alias("n")
    sym = (
        matches.select(
            F.col("a").alias("i"), F.col("b").alias("j"), n_tot
        )
        .unionAll(
            matches.select(
                F.col("b").alias("i"), F.col("a").alias("j"), n_tot
            )
        )
        .localCheckpoint()
    )
    wins = (
        matches.select(F.col("a").alias("i"), F.col("wins_a").alias("__w"))
        .unionAll(
            matches.select(
                F.col("b").alias("i"), F.col("wins_b").alias("__w")
            )
        )
        .groupBy("i")
        .agg(F.sum("__w").alias("__W"))
        .localCheckpoint()
    )
    zero = wins.filter(F.col("__W") <= 0).count()
    if zero:
        raise ValueError(
            f"bradley_terry: {zero} player(s) have zero wins — the "
            "MLE does not exist (Ford 1957); filter them out or merge "
            "sparse players before fitting"
        )
    k = wins.count()
    bc = F.broadcast if k <= broadcast_players else (lambda df: df)

    w = wins.select(
        "i", F.round(F.lit(1.0 / float(k)), _SCALE).alias("w")
    )
    for _ in range(iterations):
        wj = w.select(F.col("i").alias("j"), F.col("w").alias("__wj"))
        terms = (
            sym.join(bc(w), on="i")
            .join(bc(wj), on="j")
            .select(
                "i",
                F.round(
                    F.col("n").cast("double")
                    / (F.col("w") + F.col("__wj")),
                    _SCALE,
                ).cast(_DEC).alias("__t"),
            )
        )
        denom = terms.groupBy("i").agg(F.sum("__t").alias("__d"))
        raw = (
            wins.join(bc(denom), on="i")
            .select(
                "i",
                F.round(
                    F.col("__W").cast("double")
                    / F.col("__d").cast("double"),
                    _SCALE,
                ).alias("__r"),
            )
        )
        tot = raw.agg(
            F.sum(F.col("__r").cast(_DEC)).alias("__s")
        )
        w = (
            raw.crossJoin(F.broadcast(tot))
            .select(
                "i",
                F.round(
                    F.col("__r") / F.col("__s").cast("double"), _SCALE
                ).alias("w"),
            )
            .localCheckpoint()
        )
    return w.select(F.col("i").alias("player"), F.col("w").alias("strength"))


def bt_oracle_sql(
    matches_cte: str, iterations: int = 3
) -> str:
    """Unrolled-iteration DuckDB transcription of
    :func:`bradley_terry` (kept beside the operator so the rounding
    and normalization schedule stays in lockstep). ``matches_cte`` is
    SQL producing ``m(a, b, wins_a, wins_b)`` with ``a < b``; every
    round CTE is referenced ≥2× so ``plans.resolve_oracle``
    materializes it."""
    s = _SCALE
    parts = [
        f"""
    WITH m AS ({matches_cte}),
    sym AS (
      SELECT a AS i, b AS j, wins_a + wins_b AS n FROM m
      UNION ALL
      SELECT b AS i, a AS j, wins_a + wins_b AS n FROM m
    ),
    wins AS (
      SELECT i, CAST(sum(w) AS BIGINT) AS W FROM (
        SELECT a AS i, wins_a AS w FROM m
        UNION ALL SELECT b, wins_b FROM m
      ) GROUP BY i
    ),
    meta AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM wins),
    w0 AS (
      SELECT i, round(1.0 / (SELECT k FROM meta), {s}) AS w FROM wins
    )"""
    ]
    for r in range(1, iterations + 1):
        p = r - 1
        parts.append(
            f""",
    d{r} AS (
      SELECT sym.i,
             sum(CAST(round(CAST(n AS DOUBLE) / (wi.w + wj.w), {s})
                      AS DECIMAL(38,{s}))) AS d
      FROM sym
        JOIN w{p} wi ON wi.i = sym.i
        JOIN w{p} wj ON wj.i = sym.j
      GROUP BY sym.i
    ),
    r{r} AS (
      SELECT wins.i,
             round(CAST(W AS DOUBLE) / CAST(d AS DOUBLE), {s}) AS r
      FROM wins JOIN d{r} ON d{r}.i = wins.i
    ),
    w{r} AS (
      SELECT i, round(r / CAST((SELECT sum(CAST(r AS DECIMAL(38,{s})))
                                FROM r{r}) AS DOUBLE), {s}) AS w
      FROM r{r}
    )"""
        )
    parts.append(
        f"""
    SELECT i AS player, w AS strength FROM w{iterations}
    """
    )
    return "".join(parts)
