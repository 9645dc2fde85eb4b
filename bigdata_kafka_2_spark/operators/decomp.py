"""Distributed PCA for embedding columns (charter extension — the
dimensionality-reduction tier of the similarity stack, for embeddings
WITHOUT Matryoshka structure where prefix truncation
(``similarity.truncated_rerank_topk``) would be lossy in arbitrary
directions).

The classic one-pass construction: sufficient statistics (n, Σx,
Σxxᵀ) accumulate per Arrow batch in a ``mapInPandas`` fold — state is
one (d, d²) row per partition regardless of row count — the driver
combines ≤ partitions rows, eigendecomposes the d×d covariance
(d = 64 here; the driver-side eigh is O(d³), independent of data
volume — the same bounded-driver-decision rule as the BPE argmax and
LSH plane sizing), and the top-k components broadcast back as plain
literals for a row-local Arrow-vectorized projection. Like any
float-parallel reduction the moments depend on partition boundaries
at the ~1e-12 level, so PCA queries register ROWS-ONLY (the honest
check for numerically-iterative operators, the q143 Jenks precedent);
component signs are fixed (largest-|loading| coordinate positive) so
the decomposition is stable up to that float noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType


def fit_pca(
    df: DataFrame, vec_col: str = "embedding", k: int = 8
) -> tuple[list[float], list[list[float]], list[float]]:
    """Fit PCA on an ``array<float>`` column: returns (mean,
    components, explained_variance) with ``components`` the top-k
    eigenvectors of the covariance (rows, length d, orthonormal,
    sign-fixed), eigenvalues descending.

    One pass: per-partition (n, Σx, Σxxᵀ) via mapInPandas (bounded
    state), driver combine + eigh on the d×d covariance.
    """
    import numpy as np

    d_len = len(
        df.select(vec_col).filter(F.col(vec_col).isNotNull()).first()[0]
    )

    def moments(batches):
        import numpy as np
        import pandas as pd

        n = 0
        s = np.zeros(d_len)
        g = np.zeros((d_len, d_len))
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray(
                [v for v in pdf["v"] if v is not None], dtype=np.float64
            )
            if not len(x):
                continue
            n += x.shape[0]
            s += x.sum(axis=0)
            g += x.T @ x
        if n:
            yield pd.DataFrame(
                {
                    "n": [n],
                    "s": [s.tolist()],
                    "g": [g.reshape(-1).tolist()],
                }
            )

    parts = (
        df.select(F.col(vec_col).alias("v"))
        .mapInPandas(
            moments, "n long, s array<double>, g array<double>"
        )
        .collect()
    )
    n = sum(r["n"] for r in parts)
    s = np.sum([np.asarray(r["s"]) for r in parts], axis=0)
    g = np.sum(
        [np.asarray(r["g"]).reshape(d_len, d_len) for r in parts], axis=0
    )
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = []
    ev = []
    for idx in order:
        v = vecs[:, idx]
        j = int(np.argmax(np.abs(v)))
        if v[j] < 0:  # sign fix: largest-|loading| coordinate positive
            v = -v
        comps.append([float(x) for x in v])
        ev.append(float(max(vals[idx], 0.0)))
    return [float(x) for x in mean], comps, ev


def project_pca(
    df: DataFrame,
    mean: list[float],
    components: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Row-local Arrow-vectorized projection onto fitted components:
    adds ``out_col`` = Wᵀ(x − μ) as ``array<float>``. The fitted
    (μ, W) ride as plain broadcast literals inside the UDF closure —
    no join, scan-speed."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    mu = np.asarray(mean)
    w = np.asarray(components)  # (k, d)

    @pandas_udf(ArrayType(FloatType()))
    def proj(col):
        import pandas as pd

        x = np.asarray([v for v in col], dtype=np.float64)
        if x.ndim == 1:  # all-null batch
            return pd.Series([None] * len(col))
        y = (x - mu) @ w.T
        return pd.Series([row.astype(np.float32).tolist() for row in y])

    return df.withColumn(out_col, proj(F.col(vec_col)))


def pca_rerank_topk(
    table: DataFrame,
    probe_vec: list[float],
    mean: list[float],
    components: list[list[float]],
    k: int = 5,
    m: int = 50,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Two-tier ANN with a PCA candidate tier: rank by distance in
    the k'-dim projected space (cheap, the reduced column is what a
    serving layer stores), take top-m candidates, exact-cosine rerank
    of only those m in the ORIGINAL space — m constant, the q68
    accuracy-tier shape with PCA instead of PQ.

    NORMALIZE-THEN-REDUCE (the engine's PQ-on-cosine rule, r7): the
    candidate metric is Euclidean in the projected space, which only
    tracks cosine if the vectors were L2-normalized BEFORE the fit
    and the projection — on unnormalized vectors the norm dimension
    dominates and recall collapses (measured 2/5 vs 5/5 at m=50 on
    the driver embeddings). Fit ``mean``/``components`` on the
    normalized column; this function normalizes the table rows and
    the probe before projecting."""
    import numpy as np

    mu = np.asarray(mean)
    w = np.asarray(components)
    pv = np.asarray(probe_vec, dtype=np.float64)
    pv = pv / np.linalg.norm(pv)
    p = ((pv - mu) @ w.T).astype(float).tolist()
    sq = F.aggregate(
        F.transform(F.col(vec_col), lambda a: a * a),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # norm staged as a REAL column: an expression subtree referenced
    # inside a HOF lambda re-evaluates per element (the shingles rule)
    table = table.withColumn("__nrm", F.sqrt(sq)).withColumn(
        "__nvec",
        F.transform(F.col(vec_col), lambda a: a / F.col("__nrm")),
    )
    proj = project_pca(table, mean, components, "__nvec", "__pca")
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col("__pca"),
                F.array(*[F.lit(float(x)) for x in p]),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    cand = (
        proj.withColumn("__d", dist)
        .orderBy(F.col("__d").asc(), F.col(id_col).asc())
        .limit(m)
    )
    q = F.array(*[F.lit(float(x)) for x in probe_vec])
    dot = F.aggregate(
        F.zip_with(F.col(vec_col), q, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = F.sqrt(
        F.aggregate(
            F.transform(F.col(vec_col), lambda a: a * a),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    qn = float(sum(x * x for x in probe_vec) ** 0.5)
    cos = dot / (nrm * F.lit(qn))
    return (
        cand.withColumn("cosine", F.round(cos, 6))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "cosine")
    )
