"""Similarity-search queries over ``embeddings`` (charter extension;
Spark-native KNN per SURVEY.md §2.8 — cosine, exact top-k, ascending
distance, reproducing api.py:119 semantics without the driver collect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_kafka_2_spark.io import read_table
from bigdata_kafka_2_spark.operators import similarity as SIM
from bigdata_kafka_2_spark.plans import register


@register(
    "q50_cosine_topk",
    oracle="""
    SELECT e.vec_id,
           round(CAST((CASE WHEN (sqrt(list_reduce(list_prepend(0.0, list_transform(e.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(p.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) = 0.0 THEN 0.0 ELSE list_reduce(list_prepend(0.0, list_transform(list_zip(e.embedding, p.embedding), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (acc, t) -> acc + t) / (sqrt(list_reduce(list_prepend(0.0, list_transform(e.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(p.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) END) AS DOUBLE), 4)
             AS similarity
    FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) p
    WHERE e.vec_id <> 0
    ORDER BY similarity DESC, e.vec_id ASC
    LIMIT 5
    """,
    description="Exact cosine top-5 neighbors of probe vec_id=0 "
    "(broadcast probe + codegen'd zip_with/aggregate dot "
    "product + TakeOrderedAndProject; table never shuffles). "
    "Spark-native KNN of SURVEY §2.8 (k=5 cosine, api.py:119).",
    tags=("similarity", "flagship"),
)
def q50_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "embeddings")
    probe = e.filter(F.col("vec_id") == 0)
    return SIM.cosine_topk(e, probe, k=5)


@register(
    "q51_cosine_topk_many",
    oracle="""
    SELECT p.vec_id AS probe_id, e.vec_id,
           round(CAST((CASE WHEN (sqrt(list_reduce(list_prepend(0.0, list_transform(e.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(p.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) = 0.0 THEN 0.0 ELSE list_reduce(list_prepend(0.0, list_transform(list_zip(e.embedding, p.embedding), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (acc, t) -> acc + t) / (sqrt(list_reduce(list_prepend(0.0, list_transform(e.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(p.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) END) AS DOUBLE), 4)
             AS similarity,
           rank
    FROM (
      SELECT p.vec_id AS p_id, e.vec_id AS e_id,
             row_number() OVER (
               PARTITION BY p.vec_id
               ORDER BY round(CAST((CASE WHEN (sqrt(list_reduce(list_prepend(0.0, list_transform(e.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(p.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) = 0.0 THEN 0.0 ELSE list_reduce(list_prepend(0.0, list_transform(list_zip(e.embedding, p.embedding), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (acc, t) -> acc + t) / (sqrt(list_reduce(list_prepend(0.0, list_transform(e.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(p.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) END) AS DOUBLE), 4) DESC,
                        e.vec_id ASC
             ) AS rank
      FROM embeddings e, embeddings p
      WHERE p.vec_id < 5 AND e.vec_id <> p.vec_id
    ) r
    JOIN embeddings e ON e.vec_id = r.e_id
    JOIN embeddings p ON p.vec_id = r.p_id
    WHERE rank <= 3
    """,
    description="Batch KNN: exact cosine top-3 per probe (probes = "
    "vec_id < 5) via broadcast nest-loop + per-probe window "
    "top-k — the many-probe serving shape.",
    tags=("similarity", "window"),
)
def q51_cosine_topk_many(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < 5)
    out = SIM.cosine_topk_many(e, probes, k=3)
    # bigint rank: row_number is int32 in Spark, int64 in DuckDB
    return out.withColumn("rank", F.col("rank").cast("long"))


#: Near-dup cosine threshold for q52/q53. The driver embeddings carry
#: no planted duplicates (max pairwise cosine ≈ 0.51 at the graded
#: scale factors), so a "real" near-dup threshold like 0.9 would pass
#: vacuously on an empty result; 0.4 yields a non-empty, value-checked
#: pair set at every sf (66 / 59 pairs at sf0.001 / sf0.01). True
#: near-dup recall of the LSH path is asserted separately on a
#: planted-duplicates fixture in tests/test_extensions.py.
_NEAR_DUP_THRESHOLD = 0.4


@register(
    "q52_embedding_near_dup",
    oracle=f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(CAST((CASE WHEN (sqrt(list_reduce(list_prepend(0.0, list_transform(a.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(b.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) = 0.0 THEN 0.0 ELSE list_reduce(list_prepend(0.0, list_transform(list_zip(a.embedding, b.embedding), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (acc, t) -> acc + t) / (sqrt(list_reduce(list_prepend(0.0, list_transform(a.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(b.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) END) AS DOUBLE), 4)
             AS similarity
    FROM embeddings a, embeddings b
    WHERE a.vec_id < b.vec_id
      AND round(CAST((CASE WHEN (sqrt(list_reduce(list_prepend(0.0, list_transform(a.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(b.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) = 0.0 THEN 0.0 ELSE list_reduce(list_prepend(0.0, list_transform(list_zip(a.embedding, b.embedding), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (acc, t) -> acc + t) / (sqrt(list_reduce(list_prepend(0.0, list_transform(a.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(b.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) END) AS DOUBLE), 4)
            >= {_NEAR_DUP_THRESHOLD}
    """,
    description="Embedding near-duplicate pairs (cosine ≥ 0.4 — chosen "
    "non-vacuous for the fixture, see _NEAR_DUP_THRESHOLD), "
    "exact all-pairs baseline. Deliberately quadratic — the "
    "recall anchor for the LSH scale path (q53) — and therefore "
    "kept OUT of the graded surface (extended registry + test "
    "mirror only, see plans/__init__.CURATED).",
    tags=("similarity", "dedup"),
)
def q52_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "embeddings")
    return SIM.cosine_pairs(e, threshold=_NEAR_DUP_THRESHOLD)


def _lsh_pairs_oracle(
    threshold: float,
    bands: int,
    planes_per_band: int,
    seed: int,
    dim: int = 64,
) -> str:
    """DuckDB oracle for the ENTIRE multi-band hyperplane-LSH pipeline —
    banding, candidate equi-join, exact-cosine verify.

    The hyperplanes are deterministic literals (operators.similarity._mix
    of the seed), so the same plane arrays are inlined here and the sign
    buckets recompute exactly: both engines evaluate the projection as a
    left-to-right double-precision dot product (verified bit-identical
    bucket ids across engines on the driver data). This makes q53
    hash-checkable WITHOUT requiring LSH recall to be 1 — the oracle is
    the LSH algorithm itself, not the all-pairs answer.
    """
    from bigdata_kafka_2_spark.operators.similarity import _mix

    band_selects = []
    for b in range(bands):
        band_seed = seed * 1_000_003 + b * 97
        terms = []
        for p in range(planes_per_band):
            plane = [
                _mix(band_seed * 1_000_003 + p * 64 + d) for d in range(dim)
            ]
            arr = "[" + ", ".join(repr(v) for v in plane) + "]"
            terms.append(
                f"(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]),\n"
                f"        {arr}) > 0 THEN {1 << p} ELSE 0 END)"
            )
        band_selects.append(
            f"SELECT vec_id, {b} AS band_idx,\n"
            + "\n + ".join(terms)
            + " AS bucket FROM embeddings"
        )
    banded = "\n      UNION ALL\n      ".join(band_selects)
    return f"""
    WITH banded AS (
      {banded}
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM banded a JOIN banded b
        ON a.band_idx = b.band_idx AND a.bucket = b.bucket
      WHERE a.vec_id < b.vec_id
    )
    SELECT c.id_a, c.id_b,
           round(CAST((CASE WHEN (sqrt(list_reduce(list_prepend(0.0, list_transform(ea.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(eb.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) = 0.0 THEN 0.0 ELSE list_reduce(list_prepend(0.0, list_transform(list_zip(ea.embedding, eb.embedding), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (acc, t) -> acc + t) / (sqrt(list_reduce(list_prepend(0.0, list_transform(ea.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(eb.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) END) AS DOUBLE), 4)
             AS similarity
    FROM cand c
    JOIN embeddings ea ON ea.vec_id = c.id_a
    JOIN embeddings eb ON eb.vec_id = c.id_b
    WHERE round(CAST((CASE WHEN (sqrt(list_reduce(list_prepend(0.0, list_transform(ea.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(eb.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) = 0.0 THEN 0.0 ELSE list_reduce(list_prepend(0.0, list_transform(list_zip(ea.embedding, eb.embedding), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (acc, t) -> acc + t) / (sqrt(list_reduce(list_prepend(0.0, list_transform(ea.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(eb.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) END) AS DOUBLE), 4)
            >= {threshold}
    """


def _q53_oracle(sf_dir: str) -> str:
    """Dataset-parameterized q53 oracle: derive the SAME auto-sized
    plane count the Spark operator uses (from the same parquet-footer
    row count — no Spark job, no data read), then transcribe those
    literal planes. Graded plan ≡ production plan at every sf."""
    from bigdata_kafka_2_spark.io import parquet_row_count
    from bigdata_kafka_2_spark.operators.similarity import auto_planes_per_band

    n = parquet_row_count(sf_dir, "embeddings")
    return _lsh_pairs_oracle(
        _NEAR_DUP_THRESHOLD,
        bands=8,
        planes_per_band=auto_planes_per_band(n),
        seed=42,
    )


@register(
    "q53_lsh_bucketed_near_dup",
    oracle=_q53_oracle,
    description="Cosine-LSH near-dup, multi-band OR-construction: 8 "
    "independent sign-bucket bands (seed 42), candidate = collision "
    "in ANY band (equi-join on (band, bucket) — the no-cross-join "
    "100 TB path), then exact cosine verify ≥ 0.4. Multi-band is the "
    "recall lever AND-only bucketing lacks (planted near-dups at "
    "cos≥0.99 survive with p≈0.9999); recall floors vs the exact q52 "
    "pair set are asserted in tests. The plane count per band is "
    "AUTO-SIZED from the table's parquet-footer row count "
    "(auto_planes_per_band: r = log2(n/16), so expected bucket "
    "occupancy — and with it candidate volume per row — stays "
    "constant as n grows; any PINNED r is O(n²) asymptotically, the "
    "r5/r6 scale-probe finding). The graded instance now RUNS this "
    "production configuration: the oracle is generated per-dataset "
    "from the same row count, transcribing the same auto-chosen "
    "literal planes (banding + candidate join + verify — see "
    "_q53_oracle/_lsh_pairs_oracle).",
    tags=("similarity", "dedup"),
)
def q53_lsh_bucketed_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.io import parquet_row_count

    e = read_table(spark, sf_dir, "embeddings")
    return SIM.hyperplane_lsh_pairs(
        e,
        threshold=_NEAR_DUP_THRESHOLD,
        bands=8,
        seed=42,
        n_rows=parquet_row_count(sf_dir, "embeddings"),
    )


def _pq_lists_cte(
    n_sub: int,
    n_cent: int,
    sub_dim: int,
    seed: int,
    source: str = "embeddings",
    vec: str = "embedding",
    books: list[list[list[float]]] | None = None,
) -> str:
    """Shared CTE: per-subspace SHIFTED-distance lists (⟨x,−2c⟩+‖c‖²,
    `similarity._pq_partial_sql`) and ‖x_m‖² terms over ``source``'s
    ``vec`` column, generated from the SAME codebooks and the SAME
    left-associative chains as the Spark encode — summation order and
    therefore the argmin are bit-identical across engines."""
    from bigdata_kafka_2_spark.operators.similarity import (
        _pq_partial_sql,
        _pq_xx_sql,
        pq_codebooks,
    )

    if books is None:
        books = pq_codebooks(n_sub, n_cent, sub_dim, seed)
    lists = []
    for m in range(n_sub):
        dists = ",\n         ".join(
            _pq_partial_sql(vec, m * sub_dim, books[m][k], one_based=True)
            for k in range(n_cent)
        )
        lists.append(f"[{dists}] AS l{m + 1}")
        lists.append(
            _pq_xx_sql(vec, m * sub_dim, sub_dim, one_based=True)
            + f" AS xx{m + 1}"
        )
    return (
        "pq_lists AS (\n      SELECT vec_id,\n        "
        + ",\n        ".join(lists)
        + f"\n      FROM {source}\n    )"
    )


def _normalized_cte(
    dim: int = 64,
    name: str = "nv",
    out: str = "nemb",
    source: str = "embeddings",
) -> str:
    """DuckDB transcription of `similarity.normalize_vectors`: staged
    left-associative ‖x‖ column, then per-element division — the same
    chains the Spark projection parses, so normalized components are
    bit-identical across engines."""
    from bigdata_kafka_2_spark.operators.similarity import _pq_xx_sql

    xx = _pq_xx_sql("embedding", 0, dim, one_based=True)
    elems = ", ".join(
        f"(CAST(embedding[{i + 1}] AS DOUBLE) / vnorm)" for i in range(dim)
    )
    return (
        f"{name} AS (\n      SELECT vec_id, [{elems}] AS {out}\n"
        f"      FROM (SELECT vec_id, embedding, sqrt({xx}) AS vnorm\n"
        f"            FROM {source})\n    )"
    )


def _pq_profile_oracle(
    n_sub: int = 8, n_cent: int = 16, sub_dim: int = 8, seed: int = 7
) -> str:
    codes = ",\n           ".join(
        f"CAST(list_position(l{m + 1}, list_min(l{m + 1})) AS INT) AS code_{m + 1}"
        for m in range(n_sub)
    )
    err = " + ".join(f"(xx{m + 1} + list_min(l{m + 1}))" for m in range(n_sub))
    return f"""
    WITH {_pq_lists_cte(n_sub, n_cent, sub_dim, seed)}
    SELECT vec_id,
           {codes},
           round({err}, 4) AS pq_err
    FROM pq_lists
    """


def _pq_adc_oracle(
    probe_id: int = 0,
    k: int = 5,
    n_sub: int = 8,
    n_cent: int = 16,
    sub_dim: int = 8,
    seed: int = 7,
) -> str:
    """ADC search oracle: re-encode (the same pq_lists CTE), build the
    probe's distance lists, estimate each vector's distance by code
    lookup, rank."""
    from bigdata_kafka_2_spark.operators.similarity import (
        _pq_partial_sql,
        _pq_xx_sql,
        pq_codebooks,
    )

    books = pq_codebooks(n_sub, n_cent, sub_dim, seed)
    lut = " + ".join(
        "("
        + _pq_xx_sql("p.embedding", m * sub_dim, sub_dim, one_based=True)
        + " + list_extract(["
        + ", ".join(
            _pq_partial_sql("p.embedding", m * sub_dim, books[m][kk], one_based=True)
            for kk in range(n_cent)
        )
        + f"], c.code_{m + 1}))"
        for m in range(n_sub)
    )
    codes = ", ".join(
        f"CAST(list_position(l{m + 1}, list_min(l{m + 1})) AS INT) AS code_{m + 1}"
        for m in range(n_sub)
    )
    return f"""
    WITH {_pq_lists_cte(n_sub, n_cent, sub_dim, seed)},
    codes AS (SELECT vec_id, {codes} FROM pq_lists),
    probe AS (SELECT vec_id AS probe_id, embedding FROM embeddings
              WHERE vec_id = {probe_id})
    SELECT probe_id, vec_id, est_dist, rank FROM (
      SELECT p.probe_id, c.vec_id,
             round({lut}, 4) AS est_dist,
             row_number() OVER (
               PARTITION BY p.probe_id
               ORDER BY round({lut}, 4) ASC, c.vec_id ASC
             ) AS rank
      FROM codes c CROSS JOIN probe p
    ) WHERE rank <= {k}
    """


@register(
    "q47_pq_encode",
    oracle=_pq_profile_oracle(),
    description="Product-quantization encode (operators/similarity."
    "pq_encode): 8 subspaces x 16 seeded centroids -> 4-bit code per "
    "subspace + total squared reconstruction error. The memory half "
    "of the FAISS-style IVF+PQ ANN architecture: 64x compression "
    "(256 B float vector -> 4 B of codes), row-local codegen'd "
    "arithmetic over literal codebooks, zero shuffle, one parsed SQL "
    "projection. Hash-checked against a DuckDB transcription "
    "generated from the same codebooks and the same left-associative "
    "distance chains, so the argmin assignment is bit-identical.",
    tags=("similarity", "compression"),
)
def q47_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "embeddings")
    return SIM.pq_encode(e)


@register(
    "q48_pq_adc_topk",
    oracle=_pq_adc_oracle(),
    description="PQ asymmetric-distance (ADC) top-5 for probe vec_id=0 "
    "(operators/similarity.pq_adc_topk): per-probe centroid-distance "
    "lookup tables over the broadcast probe, candidate distance = 8 "
    "array lookups by stored code — the codes table scans at 4 "
    "B/vector, raw vectors never read. Rank-window top-k, "
    "deterministic (est_dist, vec_id) tie-break. Recall vs exact "
    "cosine top-k asserted in tests; hash-checked against the full "
    "SQL transcription of encode + LUT + rank.",
    tags=("similarity", "compression", "limit"),
)
def q48_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "embeddings")
    probe = e.filter(F.col("vec_id") == 0)
    return SIM.pq_adc_topk(e, probe, k=5)


def _pq_rerank_oracle(
    probe_id: int = 0,
    k: int = 5,
    m: int = 250,
    n_sub: int = 16,
    n_cent: int = 16,
    sub_dim: int = 4,
    seed: int = 7,
    ivf: tuple[tuple[int, ...], int] | None = None,
) -> str:
    """ADC + exact-rerank oracle, cosine-metric configuration: the
    normalize CTE, the ADC pipeline (over normalized vectors and the
    PINNED production codebooks) truncated at top-m, then exact cosine
    over ONLY the m candidate ids, final top-k — the same two-tier
    plan the Spark operator runs.

    ``ivf=(centroid_ids, n_probe)`` prepends the q57 IVF tier: assign
    every vector to its nearest fixed centroid, keep only the
    ``n_probe`` cells nearest the probe, and run the whole ADC+rerank
    pipeline on that pruned subset — the q69 three-tier transcription."""
    from bigdata_kafka_2_spark.operators.pq_books import PQ_COSINE_BOOKS
    from bigdata_kafka_2_spark.operators.similarity import (
        _pq_partial_sql,
        _pq_xx_sql,
    )

    books = PQ_COSINE_BOOKS
    lut = " + ".join(
        "("
        + _pq_xx_sql("p.nemb", m_ * sub_dim, sub_dim, one_based=True)
        + " + list_extract(["
        + ", ".join(
            _pq_partial_sql("p.nemb", m_ * sub_dim, books[m_][kk], one_based=True)
            for kk in range(n_cent)
        )
        + f"], c.code_{m_ + 1}))"
        for m_ in range(n_sub)
    )
    codes = ", ".join(
        f"CAST(list_position(l{m_ + 1}, list_min(l{m_ + 1})) AS INT) AS code_{m_ + 1}"
        for m_ in range(n_sub)
    )
    if ivf is None:
        prefix = ""
        source = "embeddings"
        probe_src = "nv"
    else:
        centroid_ids, n_probe = ivf
        prefix = f"""cents AS (
      SELECT vec_id AS centroid_id, embedding AS centroid
      FROM embeddings WHERE vec_id IN {tuple(centroid_ids)}
    ),
    assigned AS (
      SELECT vec_id, embedding, centroid_id FROM (
        SELECT e.vec_id, e.embedding, c.centroid_id,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY CAST((CASE WHEN (sqrt(list_reduce(list_prepend(0.0, list_transform(e.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(c.centroid, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) = 0.0 THEN 0.0 ELSE list_reduce(list_prepend(0.0, list_transform(list_zip(e.embedding, c.centroid), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (acc, t) -> acc + t) / (sqrt(list_reduce(list_prepend(0.0, list_transform(e.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(c.centroid, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) END)
                               AS DOUBLE) DESC,
                          c.centroid_id ASC
               ) AS rn
        FROM embeddings e, cents c
      ) WHERE rn = 1
    ),
    probe_cells AS (
      SELECT c.centroid_id
      FROM (SELECT embedding FROM embeddings WHERE vec_id = {probe_id}) p,
           cents c
      ORDER BY CAST((CASE WHEN (sqrt(list_reduce(list_prepend(0.0, list_transform(p.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(c.centroid, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) = 0.0 THEN 0.0 ELSE list_reduce(list_prepend(0.0, list_transform(list_zip(p.embedding, c.centroid), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (acc, t) -> acc + t) / (sqrt(list_reduce(list_prepend(0.0, list_transform(p.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(c.centroid, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) END) AS DOUBLE)
                 DESC,
               c.centroid_id ASC
      LIMIT {n_probe}
    ),
    pruned AS (
      SELECT a.vec_id, a.embedding
      FROM assigned a JOIN probe_cells pc ON a.centroid_id = pc.centroid_id
    ),
    """
        source = "pruned"
        # the probe row normalizes from the FULL table (its own cell
        # need not be probed), mirroring the Spark operator's
        # normalize_vectors(probe) over the unpruned probe frame
        probe_src = "probe_nv"
    probe_nv = (
        "" if ivf is None
        else "\n    " + _normalized_cte(
            name="probe_nv", source=f"(SELECT * FROM embeddings WHERE vec_id = {probe_id})"
        ) + ","
    )
    return f"""
    WITH {prefix}{_normalized_cte(source=source)},{probe_nv}
    {_pq_lists_cte(n_sub, n_cent, sub_dim, seed, source="nv", vec="nemb",
                   books=books)},
    codes AS (SELECT vec_id, {codes} FROM pq_lists),
    probe AS (SELECT vec_id AS probe_id, nemb FROM {probe_src}
              WHERE vec_id = {probe_id}),
    probe_raw AS (SELECT vec_id AS probe_id, embedding FROM embeddings
                  WHERE vec_id = {probe_id}),
    adc AS (
      SELECT probe_id, vec_id FROM (
        SELECT p.probe_id, c.vec_id,
               row_number() OVER (
                 PARTITION BY p.probe_id
                 ORDER BY round({lut}, 4) ASC, c.vec_id ASC
               ) AS adc_rank
        FROM codes c CROSS JOIN probe p
      ) WHERE adc_rank <= {m}
    )
    SELECT probe_id, vec_id, similarity, rank FROM (
      SELECT a.probe_id, a.vec_id,
             round(CAST((CASE WHEN (sqrt(list_reduce(list_prepend(0.0, list_transform(e.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(p.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) = 0.0 THEN 0.0 ELSE list_reduce(list_prepend(0.0, list_transform(list_zip(e.embedding, p.embedding), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (acc, t) -> acc + t) / (sqrt(list_reduce(list_prepend(0.0, list_transform(e.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(p.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) END)
                        AS DOUBLE), 4) AS similarity,
             row_number() OVER (
               PARTITION BY a.probe_id
               ORDER BY round(CAST((CASE WHEN (sqrt(list_reduce(list_prepend(0.0, list_transform(e.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(p.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) = 0.0 THEN 0.0 ELSE list_reduce(list_prepend(0.0, list_transform(list_zip(e.embedding, p.embedding), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (acc, t) -> acc + t) / (sqrt(list_reduce(list_prepend(0.0, list_transform(e.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(p.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) END)
                                   AS DOUBLE), 4) DESC, a.vec_id ASC
             ) AS rank
      FROM adc a
      JOIN embeddings e ON e.vec_id = a.vec_id
      JOIN probe_raw p ON p.probe_id = a.probe_id
      WHERE a.vec_id <> a.probe_id
    ) WHERE rank <= {k}
    """


@register(
    "q68_pq_rerank_topk",
    oracle=_pq_rerank_oracle(),
    description="PQ ADC search + exact rerank tier, cosine metric "
    "(operators/similarity.pq_adc_rerank_topk): L2-normalize (ADC over "
    "unit vectors ranks by cosine), encode with the PINNED "
    "KMeans-fitted production codebooks (pq_books.PQ_COSINE_BOOKS — "
    "fit once, pin, serve; 16 subspaces x 16 centroids), ADC top-250 "
    "candidates from the code-width scan, then exact cosine re-score "
    "of ONLY those rows per probe via a broadcast candidate join, keep "
    "top-5 — the FAISS-style accuracy-recovery stage. recall@5 = 1.0 "
    "vs exact cosine_topk on the driver table (asserted in tests; raw "
    "ADC@5 ~0.5). m is a constant, not a fraction of n — at 10^8 rows "
    "the rerank reads 2.5e-6 of the table. Hash-checked against the "
    "full SQL transcription of normalize + encode + LUT + top-m + "
    "exact rerank.",
    tags=("similarity", "compression", "limit"),
)
def q68_pq_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "embeddings")
    probe = e.filter(F.col("vec_id") == 0)
    out = SIM.pq_adc_rerank_topk(e, probe, k=5, m=250)
    # bigint rank: row_number is int32 in Spark, int64 in DuckDB
    return out.withColumn("rank", F.col("rank").cast("long"))


#: q57's fixed IVF centroids: existing vectors doubling as cell centers.
_IVF_CENTROID_IDS = (10, 20, 30, 40, 50, 60, 70, 80)


@register(
    "q57_ivf_topk",
    oracle=f"""
    WITH cents AS (
      SELECT vec_id AS centroid_id, embedding AS centroid
      FROM embeddings WHERE vec_id IN {_IVF_CENTROID_IDS}
    ),
    assigned AS (
      SELECT vec_id, embedding, centroid_id FROM (
        SELECT e.vec_id, e.embedding, c.centroid_id,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY CAST((CASE WHEN (sqrt(list_reduce(list_prepend(0.0, list_transform(e.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(c.centroid, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) = 0.0 THEN 0.0 ELSE list_reduce(list_prepend(0.0, list_transform(list_zip(e.embedding, c.centroid), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (acc, t) -> acc + t) / (sqrt(list_reduce(list_prepend(0.0, list_transform(e.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(c.centroid, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) END)
                               AS DOUBLE) DESC,
                          c.centroid_id ASC
               ) AS rn
        FROM embeddings e, cents c
      ) WHERE rn = 1
    ),
    probe AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id = 0),
    probe_cells AS (
      SELECT p.vec_id AS probe_id, p.embedding AS probe_vec, c.centroid_id
      FROM probe p, cents c
      ORDER BY CAST((CASE WHEN (sqrt(list_reduce(list_prepend(0.0, list_transform(p.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(c.centroid, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) = 0.0 THEN 0.0 ELSE list_reduce(list_prepend(0.0, list_transform(list_zip(p.embedding, c.centroid), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (acc, t) -> acc + t) / (sqrt(list_reduce(list_prepend(0.0, list_transform(p.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(c.centroid, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) END) AS DOUBLE)
                 DESC,
               c.centroid_id ASC
      LIMIT 3
    )
    SELECT a.vec_id,
           round(CAST((CASE WHEN (sqrt(list_reduce(list_prepend(0.0, list_transform(a.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(pc.probe_vec, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) = 0.0 THEN 0.0 ELSE list_reduce(list_prepend(0.0, list_transform(list_zip(a.embedding, pc.probe_vec), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (acc, t) -> acc + t) / (sqrt(list_reduce(list_prepend(0.0, list_transform(a.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(pc.probe_vec, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) END)
                      AS DOUBLE), 4) AS similarity
    FROM assigned a JOIN probe_cells pc ON a.centroid_id = pc.centroid_id
    WHERE a.vec_id <> pc.probe_id
    ORDER BY similarity DESC, a.vec_id ASC
    LIMIT 5
    """,
    description="IVF approximate nearest-neighbor: vectors assigned to "
    "their nearest of 8 fixed centroids (broadcast argmax), "
    "probe vec_id=0 scans only the n_probe=3 nearest cells — "
    "the scan-pruning ANN scale path (on a partitioned-by-"
    "centroid layout the pruning happens at the file level; "
    "plan asserted in tests). Recall vs exact q50 asserted in "
    "tests. With fixed centroids the whole pipeline (argmax "
    "assignment, cell pruning, in-cell exact top-5) is SQL-"
    "expressible, so q57 is hash-checked end-to-end.",
    tags=("similarity",),
)
def q57_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "embeddings")
    cents = (
        e.filter(F.col("vec_id").isin(list(_IVF_CENTROID_IDS)))
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").cast("array<double>").alias("centroid"),
        )
    )
    probe = e.filter(F.col("vec_id") == 0)
    assigned = SIM.assign_centroids(e, cents)
    return SIM.ivf_topk(assigned, probe, cents, k=5, n_probe=3)


@register(
    "q69_ivf_pq_rerank_topk",
    oracle=_pq_rerank_oracle(m=100, ivf=(_IVF_CENTROID_IDS, 3)),
    description="The COMPLETE FAISS-style ANN architecture as one plan "
    "(operators/similarity.ivf_pq_rerank_topk): IVF cell pruning "
    "(q57's 8 fixed centroids, n_probe=3 — at scale a partitioned-by-"
    "centroid layout prunes at the FILE level) × PQ-compressed scan "
    "within the probed cells (normalized encodings, pinned "
    "KMeans-fitted codebooks, code columns only) × exact cosine "
    "rerank of the ADC top-100 — each tier cuts what the next "
    "touches: ~3/8 of files read, of those only codes, and exactly "
    "100 raw vectors. Mirror-registered (the graded board is full); "
    "hash-checked in the test mirror against the full three-tier SQL "
    "transcription, recall floor + pruning-identity asserted in "
    "tests.",
    tags=("similarity", "compression", "limit"),
)
def q69_ivf_pq_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "embeddings")
    cents = (
        e.filter(F.col("vec_id").isin(list(_IVF_CENTROID_IDS)))
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").cast("array<double>").alias("centroid"),
        )
    )
    probe = e.filter(F.col("vec_id") == 0)
    assigned = SIM.assign_centroids(e, cents)
    out = SIM.ivf_pq_rerank_topk(assigned, probe, cents, k=5, m=100, n_probe=3)
    # bigint rank: row_number is int32 in Spark, int64 in DuckDB
    return out.withColumn("rank", F.col("rank").cast("long"))


def _q75_oracle(sf_dir: str) -> str:
    """Dataset-parameterized q75 oracle: derive the SAME auto-sized
    centroid count the Spark query uses (from the same parquet-footer
    row count — no Spark job), then transcribe the whole
    assign→within-cluster-pairs pipeline. Query plan ≡ production
    plan at every sf (the q53 resolution, applied to SemDeDup) —
    INCLUDING the assignment-stage switch: past
    ``SEMANTIC_COARSE_FINE_K`` centroids the operator assigns
    coarse-then-fine (r7's worst 10× probe ratio was the flat n·k
    assign), and the oracle branches on the same count to transcribe
    the identical deterministic two-tier argmax."""
    from bigdata_kafka_2_spark.io import parquet_row_count
    from bigdata_kafka_2_spark.operators.similarity import (
        SEMANTIC_COARSE_FINE_K,
        auto_centroid_count,
    )

    k = auto_centroid_count(parquet_row_count(sf_dir, "embeddings"))
    return _q75_sql(k, SEMANTIC_COARSE_FINE_K)


def _q75_sql(k: int, coarse_fine_k: int) -> str:
    """SQL transcription of semantic_dedup_pairs with ``k`` centroids
    and the given assignment switch (factored out so tests can force
    the coarse-fine branch at small k and hash-check it too)."""
    import math

    if k > coarse_fine_k:
        n_coarse = max(1, math.isqrt(k))
        assigned = f"""
    coarse AS (
      SELECT centroid_id AS coarse_id, centroid AS coarse_vec
      FROM cents ORDER BY centroid_id ASC LIMIT {n_coarse}
    ),
    groups AS (
      SELECT centroid_id, centroid, coarse_id FROM (
        SELECT c.centroid_id, c.centroid, co.coarse_id,
               row_number() OVER (
                 PARTITION BY c.centroid_id
                 ORDER BY CAST((CASE WHEN (sqrt(list_reduce(list_prepend(0.0, list_transform(c.centroid, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(co.coarse_vec, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) = 0.0 THEN 0.0 ELSE list_reduce(list_prepend(0.0, list_transform(list_zip(c.centroid, co.coarse_vec), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (acc, t) -> acc + t) / (sqrt(list_reduce(list_prepend(0.0, list_transform(c.centroid, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(co.coarse_vec, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) END)
                               AS DOUBLE) DESC,
                          co.coarse_id ASC
               ) AS rn
        FROM cents c, coarse co
      ) WHERE rn = 1
    ),
    to_coarse AS (
      SELECT vec_id, embedding, coarse_id FROM (
        SELECT e.vec_id, e.embedding, co.coarse_id,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY CAST((CASE WHEN (sqrt(list_reduce(list_prepend(0.0, list_transform(e.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(co.coarse_vec, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) = 0.0 THEN 0.0 ELSE list_reduce(list_prepend(0.0, list_transform(list_zip(e.embedding, co.coarse_vec), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (acc, t) -> acc + t) / (sqrt(list_reduce(list_prepend(0.0, list_transform(e.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(co.coarse_vec, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) END)
                               AS DOUBLE) DESC,
                          co.coarse_id ASC
               ) AS rn
        FROM embeddings e, coarse co
      ) WHERE rn = 1
    ),
    assigned AS (
      SELECT vec_id, embedding, centroid_id FROM (
        SELECT t.vec_id, t.embedding, g.centroid_id,
               row_number() OVER (
                 PARTITION BY t.vec_id
                 ORDER BY CAST((CASE WHEN (sqrt(list_reduce(list_prepend(0.0, list_transform(t.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(g.centroid, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) = 0.0 THEN 0.0 ELSE list_reduce(list_prepend(0.0, list_transform(list_zip(t.embedding, g.centroid), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (acc, t) -> acc + t) / (sqrt(list_reduce(list_prepend(0.0, list_transform(t.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(g.centroid, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) END)
                               AS DOUBLE) DESC,
                          g.centroid_id ASC
               ) AS rn
        FROM to_coarse t JOIN groups g ON t.coarse_id = g.coarse_id
      ) WHERE rn = 1
    )"""
    else:
        assigned = """
    assigned AS (
      SELECT vec_id, embedding, centroid_id FROM (
        SELECT e.vec_id, e.embedding, c.centroid_id,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY CAST((CASE WHEN (sqrt(list_reduce(list_prepend(0.0, list_transform(e.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(c.centroid, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) = 0.0 THEN 0.0 ELSE list_reduce(list_prepend(0.0, list_transform(list_zip(e.embedding, c.centroid), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (acc, t) -> acc + t) / (sqrt(list_reduce(list_prepend(0.0, list_transform(e.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(c.centroid, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) END)
                               AS DOUBLE) DESC,
                          c.centroid_id ASC
               ) AS rn
        FROM embeddings e, cents c
      ) WHERE rn = 1
    )"""
    return f"""
    WITH cents AS (
      SELECT vec_id AS centroid_id, embedding AS centroid
      FROM embeddings WHERE vec_id < {k}
    ),{assigned}
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(CAST((CASE WHEN (sqrt(list_reduce(list_prepend(0.0, list_transform(a.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(b.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) = 0.0 THEN 0.0 ELSE list_reduce(list_prepend(0.0, list_transform(list_zip(a.embedding, b.embedding), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (acc, t) -> acc + t) / (sqrt(list_reduce(list_prepend(0.0, list_transform(a.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(b.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) END)
                      AS DOUBLE), 4) AS similarity
    FROM assigned a
      JOIN assigned b
        ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
    WHERE round(CAST((CASE WHEN (sqrt(list_reduce(list_prepend(0.0, list_transform(a.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(b.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) = 0.0 THEN 0.0 ELSE list_reduce(list_prepend(0.0, list_transform(list_zip(a.embedding, b.embedding), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (acc, t) -> acc + t) / (sqrt(list_reduce(list_prepend(0.0, list_transform(a.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(b.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) END)
                     AS DOUBLE), 4) >= {_NEAR_DUP_THRESHOLD}
    """


@register(
    "q75_semantic_dedup_pairs",
    oracle=_q75_oracle,
    description="SemDeDup-style semantic near-dup pairs "
    "(operators/similarity.semantic_dedup_pairs): embeddings "
    "assigned to their nearest centroid (q57's IVF machinery), "
    "cosine pairs generated only WITHIN clusters — the clustering "
    "turns quadratic all-pairs into Σ|cluster|², each cluster an "
    "independent equi-join task on the centroid_id shuffle key. The "
    "centroid count is AUTO-SIZED from the table's parquet-footer "
    "row count (auto_centroid_count: k = ceil(n/64), so expected "
    "cluster occupancy — and with it pair volume per row — stays "
    "constant as n grows; the initial pinned-8-centroid draft of "
    "this query measured 59× on 10× data in the scale probe, the "
    "same O(n²/k) trap as pinned-grid LSH). Since r8 the ASSIGNMENT "
    "stage auto-switches too: past SEMANTIC_COARSE_FINE_K centroids "
    "the flat broadcast argmax (n·k evals — r7's worst 10× probe "
    "ratio, 7.54×) is replaced by the coarse-then-fine two-tier "
    "argmax (≈2√k evals/row). The oracle is generated per-dataset "
    "from the same row count AND branches on the same switch, so "
    "query plan ≡ production plan at every sf. Threshold 0.4 per "
    "q52's non-vacuity note; recall, the keep-one removal rule, and "
    "forced-coarse-fine oracle parity are asserted in tests on "
    "planted duplicates.",
    tags=("similarity", "dedup"),
)
def q75_semantic_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.io import parquet_row_count

    e = read_table(spark, sf_dir, "embeddings")
    k = SIM.auto_centroid_count(parquet_row_count(sf_dir, "embeddings"))
    cents = e.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").cast("array<double>").alias("centroid"),
    )
    # n_centroids=k: the footer count already sized the set — no eager
    # centroids.count() at plan-build; past SEMANTIC_COARSE_FINE_K the
    # operator auto-switches to the coarse-fine assignment (the oracle
    # branches on the same k).
    return SIM.semantic_dedup_pairs(
        e, cents, threshold=_NEAR_DUP_THRESHOLD, n_centroids=k
    )


@register(
    "q100_truncated_rerank_topk",
    oracle="""
    WITH tr AS (
      SELECT vec_id,
             CAST((CASE WHEN (sqrt(list_reduce(list_prepend(0.0, list_transform(e.embedding[1:16], t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(p.embedding[1:16], t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) = 0.0 THEN 0.0 ELSE list_reduce(list_prepend(0.0, list_transform(list_zip(e.embedding[1:16], p.embedding[1:16]), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (acc, t) -> acc + t) / (sqrt(list_reduce(list_prepend(0.0, list_transform(e.embedding[1:16], t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(p.embedding[1:16], t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) END) AS DOUBLE)
               AS ts
      FROM embeddings e, (SELECT embedding FROM embeddings
                          WHERE vec_id = 0) p
      WHERE e.vec_id <> 0
    ),
    cand AS (
      SELECT vec_id FROM (
        SELECT vec_id,
               row_number() OVER (ORDER BY round(ts, 4) DESC,
                                  vec_id ASC) AS r
        FROM tr
      ) WHERE r <= 50
    )
    SELECT 0 AS probe_id, e.vec_id,
           round(CAST((CASE WHEN (sqrt(list_reduce(list_prepend(0.0, list_transform(e.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(p.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) = 0.0 THEN 0.0 ELSE list_reduce(list_prepend(0.0, list_transform(list_zip(e.embedding, p.embedding), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (acc, t) -> acc + t) / (sqrt(list_reduce(list_prepend(0.0, list_transform(e.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(p.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) END)
                      AS DOUBLE), 4) AS similarity,
           CAST(row_number() OVER (
             ORDER BY round(CAST((CASE WHEN (sqrt(list_reduce(list_prepend(0.0, list_transform(e.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(p.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) = 0.0 THEN 0.0 ELSE list_reduce(list_prepend(0.0, list_transform(list_zip(e.embedding, p.embedding), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (acc, t) -> acc + t) / (sqrt(list_reduce(list_prepend(0.0, list_transform(e.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(p.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) END) AS DOUBLE), 4) DESC,
                      e.vec_id ASC) AS BIGINT) AS rank
    FROM embeddings e
      JOIN cand USING (vec_id),
      (SELECT embedding FROM embeddings WHERE vec_id = 0) p
    QUALIFY rank <= 5
    """,
    description="Matryoshka-style truncated-dimension ANN "
    "(operators/similarity.truncated_rerank_topk): candidates ranked "
    "by cosine over only the FIRST 16 of 64 dimensions — a "
    "quarter-width scan; with MRL-trained embeddings the leading "
    "dims carry most of the signal, the modern alternative to PQ for "
    "the candidate tier — then exact full-dimension rerank of the "
    "top-50. Both tiers are plain column expressions, so the whole "
    "pipeline is SQL-expressible and hash-checked; recall vs exact "
    "q50 asserted in tests.",
    tags=("similarity", "limit"),
)
def q100_truncated_rerank_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = read_table(spark, sf_dir, "embeddings")
    probe = e.filter(F.col("vec_id") == 0)
    out = SIM.truncated_rerank_topk(e, probe, k=5, m=50, d_prefix=16)
    return out.withColumn("rank", F.col("rank").cast("long"))


@register(
    "q102_negative_samples",
    oracle="""
    WITH anchors AS (SELECT vec_id FROM embeddings WHERE vec_id < 3),
    nbr AS (
      SELECT p_id AS anchor_id, e_id FROM (
        SELECT a.vec_id AS p_id, e.vec_id AS e_id,
               row_number() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY round(CAST((CASE WHEN (sqrt(list_reduce(list_prepend(0.0, list_transform(e.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(p.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) = 0.0 THEN 0.0 ELSE list_reduce(list_prepend(0.0, list_transform(list_zip(e.embedding, p.embedding), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (acc, t) -> acc + t) / (sqrt(list_reduce(list_prepend(0.0, list_transform(e.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(p.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) END) AS DOUBLE), 4) DESC,
                          e.vec_id ASC
               ) AS r
        FROM embeddings e, anchors a
          JOIN embeddings p ON p.vec_id = a.vec_id
        WHERE e.vec_id <> a.vec_id
      ) WHERE r <= 10
    ),
    cand AS (
      SELECT a.vec_id AS anchor_id, e.vec_id
      FROM embeddings e, anchors a
      WHERE e.vec_id <> a.vec_id
        AND NOT EXISTS (
          SELECT 1 FROM nbr
          WHERE nbr.anchor_id = a.vec_id AND nbr.e_id = e.vec_id
        )
    )
    SELECT anchor_id, vec_id AS neg_id, CAST(rank AS BIGINT) AS rank
    FROM (
      SELECT anchor_id, vec_id,
             row_number() OVER (
               PARTITION BY anchor_id
               ORDER BY (anchor_id * 2654435761 + vec_id * 40503)
                          % 999999937 ASC,
                        vec_id ASC
             ) AS rank
      FROM cand
    ) WHERE rank <= 5
    """,
    description="Deterministic contrastive negative sampling "
    "(operators/similarity.negative_samples): per anchor (vec_id<3), "
    "5 uniform negatives drawn in a multiplicative-hash order, "
    "excluding the anchor's 10 exact nearest neighbors — the "
    "false-negative guard of contrastive training-pair construction. "
    "The anchor set broadcasts against the table (nest-loop, table "
    "never shuffles), the exclusion is a broadcast anti join of the "
    "tiny neighbor list, the per-anchor top-k a window on the anchor "
    "key; the pure-integer order hash makes the draw reproducible "
    "across partitionings AND fully SQL-transcribable, so the query "
    "is hash-checked end-to-end.",
    tags=("similarity", "sampling"),
)
def q102_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "embeddings")
    anchors = e.filter(F.col("vec_id") < 3)
    out = SIM.negative_samples(e, anchors, k=5, exclude_top=10)
    return out.withColumn("rank", F.col("rank").cast("long"))


@register(
    "q109_ivf_topk_many",
    oracle=f"""
    WITH cents AS (
      SELECT vec_id AS centroid_id, embedding AS centroid
      FROM embeddings
      WHERE vec_id IN ({", ".join(str(i) for i in _IVF_CENTROID_IDS)})
    ),
    assigned AS (
      SELECT vec_id, embedding, centroid_id FROM (
        SELECT e.vec_id, e.embedding, c.centroid_id,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY CAST((CASE WHEN (sqrt(list_reduce(list_prepend(0.0, list_transform(e.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(c.centroid, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) = 0.0 THEN 0.0 ELSE list_reduce(list_prepend(0.0, list_transform(list_zip(e.embedding, c.centroid), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (acc, t) -> acc + t) / (sqrt(list_reduce(list_prepend(0.0, list_transform(e.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(c.centroid, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) END)
                               AS DOUBLE) DESC,
                          c.centroid_id ASC
               ) AS rn
        FROM embeddings e, cents c
      ) WHERE rn = 1
    ),
    probes AS (
      SELECT vec_id AS probe_id, embedding AS probe_vec
      FROM embeddings WHERE vec_id IN (0, 1, 2)
    ),
    cells AS (
      SELECT probe_id, probe_vec, centroid_id FROM (
        SELECT p.probe_id, p.probe_vec, c.centroid_id,
               row_number() OVER (
                 PARTITION BY p.probe_id
                 ORDER BY CAST((CASE WHEN (sqrt(list_reduce(list_prepend(0.0, list_transform(p.probe_vec, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(c.centroid, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) = 0.0 THEN 0.0 ELSE list_reduce(list_prepend(0.0, list_transform(list_zip(p.probe_vec, c.centroid), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (acc, t) -> acc + t) / (sqrt(list_reduce(list_prepend(0.0, list_transform(p.probe_vec, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(c.centroid, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) END)
                               AS DOUBLE) DESC,
                          c.centroid_id ASC
               ) AS rn
        FROM probes p, cents c
      ) WHERE rn <= 3
    )
    SELECT probe_id, vec_id, similarity,
           CAST(rank AS BIGINT) AS rank
    FROM (
      SELECT cl.probe_id, a.vec_id,
             round(CAST((CASE WHEN (sqrt(list_reduce(list_prepend(0.0, list_transform(a.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(cl.probe_vec, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) = 0.0 THEN 0.0 ELSE list_reduce(list_prepend(0.0, list_transform(list_zip(a.embedding, cl.probe_vec), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (acc, t) -> acc + t) / (sqrt(list_reduce(list_prepend(0.0, list_transform(a.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(cl.probe_vec, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) END)
                        AS DOUBLE), 4) AS similarity,
             row_number() OVER (
               PARTITION BY cl.probe_id
               ORDER BY round(CAST((CASE WHEN (sqrt(list_reduce(list_prepend(0.0, list_transform(a.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(cl.probe_vec, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) = 0.0 THEN 0.0 ELSE list_reduce(list_prepend(0.0, list_transform(list_zip(a.embedding, cl.probe_vec), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (acc, t) -> acc + t) / (sqrt(list_reduce(list_prepend(0.0, list_transform(a.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(cl.probe_vec, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) END)
                                   AS DOUBLE), 4) DESC,
                        a.vec_id ASC
             ) AS rank
      FROM assigned a JOIN cells cl ON a.centroid_id = cl.centroid_id
      WHERE a.vec_id <> cl.probe_id
    ) WHERE rank <= 5
    """,
    description="BATCH IVF approximate nearest-neighbor "
    "(operators/similarity.ivf_topk_many): three probes, each "
    "scanning only ITS OWN n_probe=3 nearest of the 8 fixed centroid "
    "cells (ivf_probe_cells ranks per probe since r8 — the advice "
    "fix: a global cell limit let one probe's cells evict another's "
    "and silently prune its true candidates; this query is the "
    "regression lock, since per-probe and global-limit plans give "
    "DIFFERENT answers for these probes) — then an exact per-probe "
    "window top-5 inside the pruned cells. The batch-serving shape "
    "of q57; hash-checked end-to-end.",
    tags=("similarity", "limit", "window"),
)
def q109_ivf_topk_many(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "embeddings")
    cents = (
        e.filter(F.col("vec_id").isin(list(_IVF_CENTROID_IDS)))
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").cast("array<double>").alias("centroid"),
        )
    )
    probes = e.filter(F.col("vec_id").isin([0, 1, 2]))
    assigned = SIM.assign_centroids(e, cents)
    out = SIM.ivf_topk_many(assigned, probes, cents, k=5, n_probe=3)
    return out.withColumn("rank", F.col("rank").cast("long"))


def _q138_oracle(sf_dir: str) -> str:
    """q138 = q75's dataset-parameterized pair transcription wrapped in
    the keep-one removal + a per-label survivor profile (norms via the
    q54-parity list_dot_product, averaged with integer rounding)."""
    from bigdata_kafka_2_spark.io import parquet_row_count
    from bigdata_kafka_2_spark.operators.similarity import (
        SEMANTIC_COARSE_FINE_K,
        auto_centroid_count,
    )

    k = auto_centroid_count(parquet_row_count(sf_dir, "embeddings"))
    pairs_sql = _q75_sql(k, SEMANTIC_COARSE_FINE_K)
    return f"""
    WITH pairs AS ({pairs_sql}),
    surv AS (
      SELECT * FROM embeddings
      WHERE vec_id NOT IN (SELECT DISTINCT id_b FROM pairs)
    ),
    agg AS (
      SELECT label,
             CAST(count(*) AS BIGINT) AS n_vecs,
             CAST(sum(CAST(round(sqrt(list_dot_product(embedding,
                                                       embedding)), 4)
                           AS DECIMAL(18,4))) * 10000 AS BIGINT) AS s4
      FROM surv GROUP BY label
    )
    SELECT label, n_vecs,
           ((2 * s4 + n_vecs) // (2 * n_vecs)) / 10000.0 AS avg_norm
    FROM agg
    """


@register(
    "q138_vector_curation",
    oracle=_q138_oracle,
    description="The vector-modality curation composition: SemDeDup "
    "removal at the q75 production configuration (auto-sized "
    "centroids, coarse-fine assignment switch, keep-one sweep — the "
    "dropped-id set is a broadcast anti join, the table scans once) "
    "→ per-label survivor profile with exact-DECIMAL norm averages. "
    "The embedding-side counterpart of the q127 text flagship: one "
    "hash-checked plan from raw vectors to the curated store's "
    "acceptance profile, oracle generated per-dataset so graded plan "
    "≡ production plan at every sf.",
    tags=("similarity", "dedup", "profile", "flagship"),
)
def q138_vector_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.functions import l2_norm
    from bigdata_kafka_2_spark.io import parquet_row_count

    e = read_table(spark, sf_dir, "embeddings")
    k = SIM.auto_centroid_count(parquet_row_count(sf_dir, "embeddings"))
    cents = e.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").cast("array<double>").alias("centroid"),
    )
    surv = SIM.semantic_dedup(
        e, cents, threshold=_NEAR_DUP_THRESHOLD, n_centroids=k
    )
    return (
        surv.withColumn(
            "__n4", F.round(l2_norm("embedding"), 4).cast("decimal(18,4)")
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            (F.sum("__n4") * 10000).cast("long").alias("__s4"),
        )
        .select(
            "label",
            "n_vecs",
            (
                F.expr("(2 * __s4 + n_vecs) div (2 * n_vecs)")
                / F.lit(10000.0)
            ).alias("avg_norm"),
        )
    )


def _q139_oracle(sf_dir: str) -> str:
    """Dataset-parameterized multi-probe LSH top-k transcription: the
    SAME auto-sized plane count and literal planes as the operator
    (q53's parity), probe buckets expanded with every one-bit flip,
    then the exact-cosine rerank."""
    from bigdata_kafka_2_spark.io import parquet_row_count
    from bigdata_kafka_2_spark.operators.similarity import (
        _mix,
        auto_planes_per_band,
    )

    bands, seed, dim = 8, 42, 64
    r = auto_planes_per_band(parquet_row_count(sf_dir, "embeddings"))
    band_selects = []
    for b in range(bands):
        band_seed = seed * 1_000_003 + b * 97
        terms = []
        for p in range(r):
            plane = [
                _mix(band_seed * 1_000_003 + p * 64 + d) for d in range(dim)
            ]
            arr = "[" + ", ".join(repr(v) for v in plane) + "]"
            terms.append(
                f"(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]),\n"
                f"        {arr}) > 0 THEN {1 << p} ELSE 0 END)"
            )
        band_selects.append(
            f"SELECT vec_id, {b} AS band_idx,\n"
            + "\n + ".join(terms)
            + " AS bucket FROM embeddings"
        )
    banded = "\n      UNION ALL\n      ".join(band_selects)
    return f"""
    WITH banded AS (
      {banded}
    ),
    pb AS (SELECT band_idx, bucket FROM banded WHERE vec_id = 0),
    pexp AS (
      SELECT band_idx, bucket FROM pb
      UNION
      SELECT band_idx, CAST(xor(bucket, 1 << j) AS INT) AS bucket
      FROM pb, generate_series(0, {r - 1}) g(j)
    ),
    cand AS (
      SELECT DISTINCT t.vec_id
      FROM banded t JOIN pexp USING (band_idx, bucket)
      WHERE t.vec_id <> 0
    ),
    scored AS (
      SELECT c.vec_id,
             round(CAST((CASE WHEN (sqrt(list_reduce(list_prepend(0.0, list_transform(e.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(p.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) = 0.0 THEN 0.0 ELSE list_reduce(list_prepend(0.0, list_transform(list_zip(e.embedding, p.embedding), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (acc, t) -> acc + t) / (sqrt(list_reduce(list_prepend(0.0, list_transform(e.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(p.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) END)
                        AS DOUBLE), 4) AS similarity
      FROM cand c
        JOIN embeddings e ON e.vec_id = c.vec_id,
        (SELECT embedding FROM embeddings WHERE vec_id = 0) p
    )
    SELECT CAST(0 AS BIGINT) AS probe_id, vec_id, similarity, rank
    FROM (
      SELECT *, row_number() OVER (
        ORDER BY similarity DESC, vec_id ASC
      ) AS rank
      FROM scored
    ) WHERE rank <= 5
    """


@register(
    "q139_lsh_multiprobe_topk",
    oracle=_q139_oracle,
    description="Multi-probe LSH ANN serving "
    "(operators/similarity.lsh_multiprobe_topk, Lv et al. 2007): "
    "top-5 cosine neighbors from each band's exact sign-bucket PLUS "
    "every one-bit-flip neighbor bucket — the recall lever that "
    "leaves the stored layout untouched (more probes, not more "
    "bands). The table is banded once with q53's generated-SQL "
    "hyperplanes (auto-sized from the parquet footer, occupancy "
    "invariant); the probe expands to bands x (r+1) bucket keys and "
    "is BROADCAST, so the table never shuffles for candidates; only "
    "candidates reach the exact rerank. Oracle transcribes the same "
    "literal planes, flips, and rerank per-dataset — graded plan ≡ "
    "production plan at every sf.",
    tags=("similarity",),
)
def q139_lsh_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.io import parquet_row_count

    e = read_table(spark, sf_dir, "embeddings")
    probe = e.filter(F.col("vec_id") == 0)
    return SIM.lsh_multiprobe_topk(
        e, probe, k=5, bands=8,
        n_rows=parquet_row_count(sf_dir, "embeddings"),
    )


#: Auditing budget: the silhouette scores a deterministic SAMPLE of
#: vectors once n·k (k auto-sized = n/64, so n²/64 total) would pass
#: this many similarity evaluations — the measured-budget auto-cap
#: discipline (weighted-jaccard/adamic-adar): a cluster-quality AUDIT
#: needs a representative sample, not every member, and the stride is
#: derived from the parquet-footer row count on BOTH engine sides so
#: graded plan ≡ production plan at every sf (stride 1 — the full
#: table — at the graded scales).
_SILHOUETTE_EVAL_BUDGET = 2_000_000


def _silhouette_params(sf_dir: str) -> tuple[int, int]:
    import math

    from bigdata_kafka_2_spark.io import parquet_row_count
    from bigdata_kafka_2_spark.operators.similarity import (
        auto_centroid_count,
    )

    n = parquet_row_count(sf_dir, "embeddings")
    k = auto_centroid_count(n)
    stride = max(1, math.ceil(n * k / _SILHOUETTE_EVAL_BUDGET))
    return k, stride


def _q271_oracle(sf_dir: str) -> str:
    """Dataset-parameterized: same auto-sized centroid count as q75
    and the same eval-budget sample stride (parquet-footer row count,
    no Spark job)."""
    k, stride = _silhouette_params(sf_dir)
    return f"""
    WITH cents AS (
      SELECT vec_id AS cid, embedding AS cv
      FROM embeddings WHERE vec_id < {k}
    ),
    scored AS (
      SELECT e.vec_id AS vid, c.cid,
             round(CAST((CASE WHEN (sqrt(list_reduce(list_prepend(0.0, list_transform(e.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(c.cv, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) = 0.0 THEN 0.0 ELSE list_reduce(list_prepend(0.0, list_transform(list_zip(e.embedding, c.cv), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (acc, t) -> acc + t) / (sqrt(list_reduce(list_prepend(0.0, list_transform(e.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(c.cv, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) END)
                        AS DOUBLE), 4) AS sim
      FROM embeddings e, cents c
      WHERE e.vec_id % {stride} = 0
    ),
    top2 AS (
      SELECT vid, cid, sim,
             row_number() OVER (
               PARTITION BY vid ORDER BY sim DESC, cid ASC) AS r
      FROM scored
    ),
    pv AS (
      SELECT vid,
             max(CASE WHEN r = 1 THEN cid END) AS own,
             max(CASE WHEN r = 1 THEN sim END) AS s1,
             max(CASE WHEN r = 2 THEN sim END) AS s2
      FROM top2 WHERE r <= 2 GROUP BY vid
    ),
    rows_s AS (
      SELECT own,
             CAST(CASE WHEN greatest(1.0 - s1, 1.0 - s2) > 0
               THEN round(((1.0 - s2) - (1.0 - s1))
                          / greatest(1.0 - s1, 1.0 - s2), 6)
               ELSE 0.0 END AS DECIMAL(28,6)) AS sil
      FROM pv
    )
    SELECT CAST(own AS BIGINT) AS centroid_id,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(sil) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 6) AS mean_silhouette
    FROM rows_s GROUP BY 1
    """


@register(
    "q271_cluster_silhouette",
    oracle=_q271_oracle,
    description="Simplified (centroid-based) silhouette per cluster "
    "(operators/similarity.simplified_silhouette; Rousseeuw 1987, "
    "Hruschka's O(n*k) centroid form) over q75's auto-sized SemDeDup "
    "centroids - the cluster-QUALITY audit the similarity family "
    "lacked: q75/q57 USE the clustering to bound pair volume, this "
    "measures whether each cluster is actually tight and separated "
    "(mean s near 0 = members equidistant to a neighbor cluster, "
    "doing nothing for the sum-of-squares bound; near 1 = tight). "
    "One broadcast nest-loop with hoisted norms, per-vector "
    "best/runner-up by a vector-partitioned window (state = k rows), "
    "6-dp row silhouettes averaged per cluster in exact DECIMAL; "
    "4-dp similarities make assignment and ties engine-identical. "
    "Past _SILHOUETTE_EVAL_BUDGET n*k similarity evals (k auto-sizes "
    "with n, so the flat form is n^2/64 - the 30x probe measured "
    "40x before the cap) the audit scores a deterministic "
    "vec_id-stride SAMPLE, stride derived from the parquet-footer "
    "row count on both engine sides; stride 1 at the graded scales.",
    tags=("similarity", "aggregate", "window"),
)
def q271_cluster_silhouette(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = read_table(spark, sf_dir, "embeddings")
    k, stride = _silhouette_params(sf_dir)
    cents = e.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").cast("array<double>").alias("centroid"),
    )
    sampled = e.filter(F.col("vec_id") % stride == 0)
    return SIM.simplified_silhouette(sampled, cents)
