"""Distributed PCA over the ``embeddings`` table: covariance from
sufficient statistics plus a fixed-round power iteration for the top
principal component — the whitening/compression primitive next to PQ
(operators/pq.py) in an embedding-pipeline toolbox.

Extension surface (the reference has no counterpart). Fourth user of the
iterative-parity playbook (kmeans, PQ, PageRank before it): fixed
PCA_ITERS power-iteration rounds unrolled as oracle CTEs, exact-decimal
sums everywhere, state re-quantized (rnd 12) every round so both engines
carry bit-identical vectors into the next iteration.

Scale shape — the part that matters at 100 TB: the ONLY pass over the
corpus computes sufficient statistics with map-side partial aggregation:
per-dimension sums (64 groups) and raw second moments S_ij = sum(x_i*x_j)
(DIMS^2 = 4096 groups after an in-row (i, j) pair expansion — no join, no
second scan). Covariance derives exactly as C = (S - n*m*m^T)/(n-1).
Everything after — the power iteration — runs on DIMS^2-row frames,
independent of corpus size. This is the textbook "aggregate sufficient
statistics, then solve small" decomposition (e.g. Spark MLlib's own
RowMatrix.computeCovariance does the same reduction).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_tpch_spark.functions import rnd
from dbt_tpch_spark.models.oracle import oracle, rnd_sql
from dbt_tpch_spark.plans import model

DIMS = 64
PCA_ITERS = 5

#: exact accumulation type for moment sums (products of O(1) floats)
_MOM_DECIMAL = "decimal(38,18)"


def _msum(col):
    return F.sum(col.cast(_MOM_DECIMAL)).cast("double")


def _msum_sql(expr: str) -> str:
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,18))) AS DOUBLE)"


def _covariance(ctx):
    """(n, means-broadcast, C) — C has one row per (i, j), 1-based dims."""
    e = ctx.source("embeddings").select("embedding")
    n = e.count()
    # single corpus pass: per-dim first moments + raw second moments, both
    # map-side-combinable aggregations over the in-row pair expansion
    xi = e.select(F.posexplode("embedding").alias("i0", "x"))
    means = (
        xi.groupBy((F.col("i0") + 1).alias("i"))
        .agg((_msum(F.col("x").cast("double")) / F.lit(float(n))).alias("m"))
    )
    pairs = e.select(
        F.posexplode("embedding").alias("i0", "xi"), "embedding"
    ).select(
        (F.col("i0") + 1).alias("i"),
        F.col("xi").cast("double").alias("xi"),
        F.posexplode("embedding").alias("j0", "xj"),
    )
    s = pairs.groupBy("i", (F.col("j0") + 1).alias("j")).agg(
        _msum(F.col("xi") * F.col("xj").cast("double")).alias("s")
    )
    mi = means.select(F.col("i"), F.col("m").alias("mi"))
    mj = means.select(F.col("i").alias("j"), F.col("m").alias("mj"))
    c = (
        s.join(F.broadcast(mi), "i")
        .join(F.broadcast(mj), "j")
        .select(
            "i",
            "j",
            rnd(
                (F.col("s") - F.lit(float(n)) * F.col("mi") * F.col("mj"))
                / F.lit(float(n - 1)),
                12,
            ).alias("c"),
        )
        .localCheckpoint(eager=True)
    )
    return n, c


@model("embeddings_pca_variance", layer="operators", materialization="view")
def embeddings_pca_variance(ctx):
    """Top principal component of the embedding corpus: per-dimension
    loading, the dominant eigenvalue (Rayleigh quotient), total variance
    (trace of the covariance), and the explained-variance ratio.

    Power iteration from the exact uniform start v0 = 1/8 (= 1/sqrt(DIMS),
    exactly representable): each round is one join of the DIMS^2-row C with
    the DIMS-row v, a DIMS-group exact-decimal matvec, and an IEEE
    normalize — corpus-size-independent, tiny, checkpointed per round to
    keep the plan shallow."""
    n, c = _covariance(ctx)
    spark = ctx.spark
    v = spark.range(1, DIMS + 1).select(
        F.col("id").alias("j"), F.lit(0.125).alias("v")
    )
    for _ in range(PCA_ITERS):
        w = (
            c.join(F.broadcast(v), "j")
            .groupBy("i")
            .agg(_msum(F.col("c") * F.col("v")).alias("w"))
        )
        norm = w.agg(F.sqrt(_msum(F.col("w") * F.col("w"))).alias("nrm"))
        v = (
            w.crossJoin(F.broadcast(norm))
            .select(
                F.col("i").alias("j"),
                rnd(F.col("w") / F.col("nrm"), 12).alias("v"),
            )
            .localCheckpoint(eager=True)
        )
    vi = v.select(F.col("j").alias("i"), F.col("v").alias("vi"))
    lam = (
        c.join(F.broadcast(vi), "i")
        .join(F.broadcast(v), "j")
        .agg(rnd(_msum(F.col("vi") * F.col("c") * F.col("v")), 8).alias("eigenvalue"))
    )
    trace = c.filter(F.col("i") == F.col("j")).agg(
        rnd(_msum(F.col("c")), 8).alias("total_variance")
    )
    return (
        v.crossJoin(F.broadcast(lam))
        .crossJoin(F.broadcast(trace))
        .select(
            F.col("j").cast("long").alias("dim"),
            F.col("v").alias("loading"),
            "eigenvalue",
            "total_variance",
            rnd(F.col("eigenvalue") / F.col("total_variance"), 8).alias(
                "explained_ratio"
            ),
        )
    )


def _pca_prelude() -> str:
    parts = [
        f"""dims AS (SELECT UNNEST(range(1, {DIMS + 1})) AS i)""",
        """nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM embeddings)""",
        f"""means AS (
    SELECT d.i,
           {_msum_sql('CAST(embedding[d.i] AS DOUBLE)')} / ANY_VALUE(nn.n) AS m
    FROM embeddings CROSS JOIN dims d CROSS JOIN nn
    GROUP BY d.i
)""",
        f"""smom AS (
    SELECT di.i, dj.i AS j,
           {_msum_sql('CAST(embedding[di.i] AS DOUBLE) * CAST(embedding[dj.i] AS DOUBLE)')} AS s
    FROM embeddings CROSS JOIN dims di CROSS JOIN dims dj
    GROUP BY di.i, dj.i
)""",
        f"""cov AS (
    SELECT s.i, s.j,
           {rnd_sql('(s.s - nn.n * mi.m * mj.m) / (nn.n - 1.0)', 12)} AS c
    FROM smom s
    JOIN means mi ON s.i = mi.i
    JOIN means mj ON s.j = mj.i
    CROSS JOIN nn
)""",
        f"""v0 AS (SELECT i AS j, 0.125 AS v FROM dims)""",
    ]
    for t in range(1, PCA_ITERS + 1):
        parts.append(
            f"""w{t} AS (
    SELECT c.i, {_msum_sql('c.c * v.v')} AS w
    FROM cov c JOIN v{t - 1} v ON c.j = v.j
    GROUP BY c.i
)"""
        )
        parts.append(
            f"""n{t} AS (SELECT sqrt({_msum_sql('w * w')}) AS nrm FROM w{t})"""
        )
        parts.append(
            f"""v{t} AS (
    SELECT w.i AS j, {rnd_sql('w.w / n.nrm', 12)} AS v
    FROM w{t} w CROSS JOIN n{t} n
)"""
        )
    parts.append(
        f"""lam AS (
    SELECT {rnd_sql(_msum_sql('vi.v * c.c * vj.v'), 8)} AS eigenvalue
    FROM cov c
    JOIN v{PCA_ITERS} vi ON c.i = vi.j
    JOIN v{PCA_ITERS} vj ON c.j = vj.j
)"""
    )
    parts.append(
        f"""tr AS (
    SELECT {rnd_sql(_msum_sql('c'), 8)} AS total_variance
    FROM cov WHERE i = j
)"""
    )
    return ",\n".join(parts)


oracle(
    "embeddings_pca_variance",
    ("embeddings",),
    f"""WITH {_pca_prelude()}
SELECT
    CAST(v.j AS BIGINT) AS dim,
    v.v AS loading,
    lam.eigenvalue,
    tr.total_variance,
    {rnd_sql('lam.eigenvalue / tr.total_variance', 8)} AS explained_ratio
FROM v{PCA_ITERS} v CROSS JOIN lam CROSS JOIN tr""",
)
