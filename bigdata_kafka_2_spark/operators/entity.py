"""Entity resolution: blocked fuzzy matching over name-like columns.

The record-linkage primitive a curation/master-data pipeline runs to
find the same real-world entity spelled slightly differently (typos,
OCR noise, vendor feeds). The 100 TB shape is the classic two-stage
blocking design: a cheap deterministic blocking key turns the O(n²)
all-pairs comparison into an equi-join (candidates only WITHIN a
block), and the expensive string distance runs only on candidates —
the same candidate-bounding discipline as the dedup family's
shingle/LSH joins (``operators/dedup.py``).

Reference parity note: the reference engine (kafka-python + Flask
glue; see SURVEY.md §2) has no fuzzy matching — this is a charter
extension alongside the dedup/similarity families.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdata_kafka_2_spark.operators.common import ensure_parallel


def blocked_fuzzy_matches(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block: Column | None = None,
    max_distance: int = 1,
    max_block_size: int | None = None,
) -> DataFrame:
    """Candidate entity matches within blocks:
    ``(id_a, id_b, name_a, name_b, distance)`` with ``id_a < id_b``
    and Levenshtein ``distance <= max_distance``, deterministic total
    content (every qualifying pair, no sampling).

    ``block`` is the blocking-key expression (default: the name minus
    its last character — the suffix-typo block; real deployments pass
    a domain key like soundex, zip code, or a name-prefix+length
    composite). Pairs are only compared within a block, so candidate
    volume is Σ_b |b|² over block sizes instead of n² — the blocking
    tradeoff: a pair whose names differ in the blocking key itself is
    never compared (standard record-linkage recall bound; choose the
    key so edits you care about preserve it).

    ``max_block_size`` guards the skew hazard every blocked join has
    (one degenerate key — empty names, a default value — makes one
    block quadratic): blocks larger than the cap are dropped from
    matching, the same heavy-hitter design and default-None oracle
    parity as ``ngram_jaccard_pairs``'s ``max_doc_freq``.

    Plan shape: one narrow projection (id, name, block key), an
    equi-join on the block key (both sides the same table — one
    shuffle each side, AQE handles block-count skew), the triangular
    ``id_a < id_b`` filter, then ``levenshtein`` only on candidate
    rows inside codegen. No window, no cross join, no UDF.
    """
    if block is None:
        block = F.expr(
            f"substring({name_col}, 1, length({name_col}) - 1)"
        )
    base = ensure_parallel(df).select(
        F.col(id_col), F.col(name_col), block.alias("__blk")
    )
    if max_block_size is not None:
        sizes = base.groupBy("__blk").agg(
            F.count(F.lit(1)).alias("__bn")
        )
        base = base.join(
            F.broadcast(sizes.filter(F.col("__bn") <= max_block_size)),
            on="__blk",
        ).drop("__bn")
    a = base.select(
        F.col("__blk"),
        F.col(id_col).alias("id_a"),
        F.col(name_col).alias("name_a"),
    )
    b = base.select(
        F.col("__blk"),
        F.col(id_col).alias("id_b"),
        F.col(name_col).alias("name_b"),
    )
    return (
        a.join(b, on="__blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "distance", F.levenshtein(F.col("name_a"), F.col("name_b"))
        )
        .filter(F.col("distance") <= max_distance)
        .select("id_a", "id_b", "name_a", "name_b", "distance")
    )
