"""Vector-math queries over ``embeddings`` (array-function surface +
range join)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_kafka_2_spark.functions import l2_norm
from bigdata_kafka_2_spark.io import read_table
from bigdata_kafka_2_spark.plans import register


@register(
    "q54_embedding_norms",
    oracle="""
    SELECT vec_id, label,
           round(sqrt(list_reduce(list_prepend(0.0, list_transform(embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)), 4) AS l2,
           len(embedding) AS dim
    FROM embeddings
    """,
    description="Per-vector L2 norm + dimensionality (array math via "
    "zip_with/aggregate, all codegen).",
    tags=("similarity", "array"),
)
def q54_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        "label",
        F.round(l2_norm("embedding"), 4).alias("l2"),
        F.size("embedding").cast("long").alias("dim"),
    )


@register(
    "q55_mean_pool_by_label",
    oracle="""
    SELECT label, i AS dim_idx, round(avg(v), 4) AS mean_val
    FROM (
      SELECT label,
             unnest(embedding) AS v,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    )
    WHERE i <= 4
    GROUP BY label, i
    """,
    description="Element-wise mean pooling of embeddings per label "
    "(first 4 dims): posexplode + grouped avg — the "
    "centroid-computation shape used by IVF training.",
    tags=("similarity", "array", "aggregate"),
)
def q55_mean_pool_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("pos", "v"))
        .filter(F.col("pos") < 4)
        .groupBy("label", (F.col("pos") + 1).cast("long").alias("dim_idx"))
        .agg(F.round(F.avg("v"), 4).alias("mean_val"))
    )


@register(
    "q56_range_join_bands",
    oracle="""
    SELECT b.band, count(*) AS n_events, round(sum(e.value), 2) AS total
    FROM events e
    JOIN (VALUES ('low', 0.0, 25.0), ('mid', 25.0, 50.0),
                 ('high', 50.0, 75.0), ('top', 75.0, 1e9)) b(band, lo, hi)
      ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.band
    """,
    description="Range (interval) join: events matched to value bands "
    "via a non-equi broadcast join. Scale path for dense band "
    "tables: bucketize the range key (width_bucket) and "
    "equi-join on the bucket.",
    tags=("join", "range"),
)
def q56_range_join_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    bands = spark.createDataFrame(
        [("low", 0.0, 25.0), ("mid", 25.0, 50.0), ("high", 50.0, 75.0),
         ("top", 75.0, 1e9)],
        ["band", "lo", "hi"],
    )
    joined = e.join(
        F.broadcast(bands),
        (e.value >= bands.lo) & (e.value < bands.hi),
    )
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total"),
    )

@register(
    "q59_quantization_profile",
    oracle="""
    SELECT vec_id,
           round(q_min, 4) AS qmin,
           round(q_scale, 6) AS qscale,
           CAST(list_sum(q_codes) AS BIGINT) AS code_sum,
           list_max(q_codes) AS code_max,
           list_min(q_codes) AS code_min
    FROM (
      SELECT vec_id,
             CAST(list_min(embedding) AS DOUBLE) AS q_min,
             (CAST(list_max(embedding) AS DOUBLE)
              - CAST(list_min(embedding) AS DOUBLE)) / 255.0 AS q_scale,
             list_transform(embedding, x ->
               CAST(round((CAST(x AS DOUBLE)
                           - CAST(list_min(embedding) AS DOUBLE))
                          / ((CAST(list_max(embedding) AS DOUBLE)
                              - CAST(list_min(embedding) AS DOUBLE)) / 255.0),
                          0) AS BIGINT)) AS q_codes
      FROM embeddings
    )
    """,
    description="Int8 scalar quantization of the embedding store "
    "(operators/similarity.quantize_int8): per-vector affine params + "
    "code summary, all row-local codegen'd array math (zero shuffle) — "
    "the 4x compression pass before indexing at corpus scale. The "
    "whole quantizer (min/max, scale, every rounded code) is "
    "hash-checked against DuckDB list arithmetic; reconstruction-error "
    "bound and round-trip are property-tested.",
    tags=("similarity", "array", "sketch"),
)
def q59_quantization_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.similarity import quantize_int8

    e = read_table(spark, sf_dir, "embeddings")
    q = quantize_int8(e)
    return q.select(
        "vec_id",
        F.round("q_min", 4).alias("qmin"),
        F.round("q_scale", 6).alias("qscale"),
        F.aggregate(
            "q_codes", F.lit(0).cast("long"), lambda a, c: a + c.cast("long")
        ).alias("code_sum"),
        F.array_max("q_codes").cast("long").alias("code_max"),
        F.array_min("q_codes").cast("long").alias("code_min"),
    )


@register(
    "q136_embedding_profile",
    oracle="""
    WITH ex AS (
      SELECT i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS v
      FROM embeddings,
           UNNEST(generate_series(1, len(embedding))) AS g(i)
    ),
    agg AS (
      SELECT dim,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(v, 6) AS DECIMAL(28,6))) * 1000000
                  AS BIGINT) AS num,
             round(min(v), 6) AS min_val,
             round(max(v), 6) AS max_val
      FROM ex GROUP BY dim
    )
    SELECT dim, n,
           (CASE WHEN num < 0 THEN -1 ELSE 1 END)
             * ((abs(num) * 10000 * 2 + n * 1000000)
                // (n * 1000000 * 2)) / 10000.0 AS mean_val,
           min_val, max_val
    FROM agg
    """,
    description="Per-dimension embedding-space profile "
    "(operators/profile.embedding_dim_profile): mean/min/max of each "
    "of the 64 dimensions — the drift gate for embedding columns (an "
    "encoder/version change shifts per-dimension means long before "
    "any row-level check fires, and ANN recall quietly degrades when "
    "serving and index vectors come from different encoders; feed "
    "two snapshots through profile_diff to alarm). One posexplode + "
    "one dim-keyed map-side-combined aggregate — rows x dims values "
    "through a 64-key shuffle. Mean is an exact-DECIMAL sum with "
    "integer half-away-from-zero rounding (the q117 tie rule).",
    tags=("profile", "vector"),
)
def q136_embedding_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.profile import embedding_dim_profile

    e = read_table(spark, sf_dir, "embeddings")
    return embedding_dim_profile(e)


@register(
    "q167_pca_spectrum",
    oracle=None,  # eigendecomposition: numerically iterative, rows-only
    description="PCA variance spectrum of the embedding column "
    "(operators/decomp.fit_pca, k=16): per-component explained "
    "variance and cumulative share — the profiling step that decides "
    "whether a reduced-dimension serving tier is viable at all (the "
    "driver embeddings are near-isotropic: top-8/64 carry ~20%, so "
    "the honest answer here is 'no tier'; anisotropic real "
    "embeddings answer differently, and pca_rerank_topk is the "
    "normalize-then-reduce two-tier search for that case — planted "
    "anisotropic recall test in tests/test_pca.py). Fit is ONE pass: "
    "per-partition (n, Σx, Σxxᵀ) sufficient statistics via "
    "mapInPandas (bounded state), driver-side d×d eigh (O(d³), "
    "data-volume independent, the bounded-driver-decision rule). "
    "Rows-only by design: float-parallel moment sums vary at 1e-12 "
    "with partitioning (the q143 Jenks precedent).",
    tags=("vector", "ml-eval"),
)
def q167_pca_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.decomp import fit_pca

    e = read_table(spark, sf_dir, "embeddings")
    # fit the FULL spectrum (k = d) so cum_share is a share of the
    # true total variance, then report the first 16 components
    _, _, ev = fit_pca(e, "embedding", k=64)
    total = sum(ev) if ev else 1.0
    rows = []
    cum = 0.0
    for i, v in enumerate(ev[:16]):
        cum += v
        rows.append((i, float(v), float(cum / max(total, 1e-12))))
    return spark.createDataFrame(
        rows, "component int, variance double, cum_share double"
    )


@register(
    "q203_centroid_drift",
    oracle="""
    WITH r AS (
      SELECT embedding AS e FROM embeddings WHERE vec_id % 2 = 0
    ),
    c AS (
      SELECT embedding AS e FROM embeddings WHERE vec_id % 2 = 1
    ),
    rd AS (
      SELECT i AS dim, avg(CAST(e[i] AS DOUBLE)) AS m
      FROM r, UNNEST(generate_series(1, len(e))) AS g(i)
      GROUP BY 1
    ),
    cd AS (
      SELECT i AS dim, avg(CAST(e[i] AS DOUBLE)) AS m
      FROM c, UNNEST(generate_series(1, len(e))) AS g(i)
      GROUP BY 1
    )
    SELECT CAST(dim AS BIGINT) AS dim,
           round(rd.m, 6) AS mean_ref,
           round(cd.m, 6) AS mean_cur,
           round(abs(rd.m - cd.m), 6) AS drift
    FROM rd JOIN cd USING (dim)
    """,
    description="Per-dimension embedding centroid drift between two "
    "snapshots (operators/profile.embedding_centroid_drift; here the "
    "even/odd vec_id halves stand in for index-time vs serving-time "
    "embeddings): |mean_ref - mean_cur| per dimension, 1-based — "
    "the vector-space member of the drift family (PSI/KS/KL read "
    "scalar and token distributions; an embedding-model version "
    "change shifts per-dimension means long before any row-level "
    "check fires, quietly degrading ANN recall). One posexplode + "
    "dim-keyed average per side with map-side partials, one D-row "
    "dim join — nothing scales with corpus size but the scan.",
    tags=("vector", "profile", "aggregate"),
)
def q203_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.profile import (
        embedding_centroid_drift,
    )

    e = read_table(spark, sf_dir, "embeddings")
    ref = e.filter(F.col("vec_id") % 2 == 0)
    cur = e.filter(F.col("vec_id") % 2 == 1)
    return embedding_centroid_drift(ref, cur)


@register(
    "q206_embedding_outliers",
    oracle="""
    WITH dims AS (
      SELECT vec_id, i - 1 AS d, CAST(e[i] AS DOUBLE) AS v
      FROM (SELECT vec_id, embedding AS e FROM embeddings),
           UNNEST(generate_series(1, len(e))) AS g(i)
    ),
    stats AS (
      SELECT d, round(avg(v), 6) AS m, round(stddev_pop(v), 6) AS s
      FROM dims GROUP BY 1
    ),
    terms AS (
      SELECT vec_id,
             CAST(CASE WHEN s > 0 THEN
               round(((v - m) / s) * ((v - m) / s), 6)
             ELSE 0.0 END AS DECIMAL(28,6)) AS t
      FROM dims JOIN stats USING (d)
    )
    SELECT vec_id, CAST(sum(t) AS DOUBLE) AS score
    FROM terms GROUP BY 1
    ORDER BY score DESC, vec_id ASC LIMIT 20
    """,
    description="Top-20 anomalous embeddings by diagonal Mahalanobis "
    "distance (operators/profile.embedding_outliers): sum of "
    "per-dimension z-scores squared against the snapshot's own "
    "per-dim mean/stddev — the vector-space cleaning pass that "
    "catches corrupt decodes, zero vectors, and wrong-model strays "
    "before they poison an ANN index. Per-dim stats rounded to 6 dp "
    "before the z-scores, z-squared terms 6-dp DECIMAL-summed "
    "(order-independent), deterministic (score desc, id) cut. One "
    "posexplode + D-row broadcast stats, one id-keyed sum, one "
    "TakeOrdered(20).",
    tags=("vector", "profile", "quality"),
)
def q206_embedding_outliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.profile import (
        embedding_outliers,
    )

    e = read_table(spark, sf_dir, "embeddings")
    return embedding_outliers(e, top_k=20)
