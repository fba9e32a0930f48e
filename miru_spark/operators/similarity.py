"""Similarity search over embedding columns (array<float>).

Brute-force cosine is the exact baseline (Catalyst-only: zip_with +
ordered-fold aggregate, so float results are deterministic and match a SQL
oracle op-for-op). The scale paths are random-hyperplane LSH bucketing and a
coarse-quantizer IVF: both turn the all-pairs/all-docs scan into a bucketed
join, which is the only shape that survives 10^9+ vectors.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    """Deterministic index-ordered fold — matches DuckDB's list_sum over
    list_transform(list_zip(...)) op-for-op."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_scores(emb: DataFrame, id_col: str, vec_col: str, query_vec: list[float]) -> DataFrame:
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = float(np.sqrt(np.sum(np.asarray(query_vec, dtype=np.float64) ** 2)))
    return emb.select(
        F.col(id_col).alias("vec"),
        F.round(_dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * F.lit(qn)), 6).alias("cosine"),
    )


def cosine_topk(
    emb: DataFrame, id_col: str, vec_col: str, query_vec: list[float], k: int = 50
) -> DataFrame:
    """Exact brute-force top-k by cosine (desc), id desc tie-break."""
    return (
        cosine_scores(emb, id_col, vec_col, query_vec)
        .orderBy(F.desc("cosine"), F.desc("vec"))
        .limit(k)
    )


def cosine_pairs(emb: DataFrame, id_col: str, vec_col: str, threshold: float) -> DataFrame:
    """Exact near-dup pairs by cosine ≥ threshold (id_a < id_b).

    All-pairs join — correct at test SF, the oracle for the LSH path below;
    at corpus scale use lsh_cosine_pairs.
    """
    a = emb.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("ea"))
    b = emb.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("eb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(
                _dot(F.col("ea"), F.col("eb")) / (_norm(F.col("ea")) * _norm(F.col("eb"))), 6
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal((n_planes, dim))


def lsh_bucket_col(vec_col, planes: np.ndarray):
    """Sign-bit bucket id from random hyperplanes — Catalyst-only: one dot
    product per plane via ordered fold, bits assembled into a long."""
    acc = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        lit_p = F.array(*[F.lit(float(x)) for x in p])
        acc = acc + F.when(_dot(vec_col, lit_p) > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0)
        )
    return acc


def lsh_cosine_pairs(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """LSH-bucketed near-dup pairs, exact-verified.

    n_tables independent sign-LSH tables; candidates = pairs sharing a bucket
    in any table; every candidate re-scored exactly. Recall < 1 (tested
    against cosine_pairs in the suite); precision exact.
    """
    tables = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + t)
        tables.append(
            F.struct(
                F.lit(t).alias("table"), lsh_bucket_col(F.col(vec_col), planes).alias("bucket")
            )
        )
    bucketed = emb.select(
        F.col(id_col).alias("vec"), F.col(vec_col).alias("e"), F.explode(F.array(*tables)).alias("tb")
    ).select("vec", "e", "tb.table", "tb.bucket")
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec") < F.col("b.vec")),
        )
        .select(
            F.col("a.vec").alias("vec_a"),
            F.col("b.vec").alias("vec_b"),
            F.col("a.e").alias("ea"),
            F.col("b.e").alias("eb"),
        )
        .dropDuplicates(["vec_a", "vec_b"])
    )
    return (
        cand.select(
            "vec_a",
            "vec_b",
            F.round(
                _dot(F.col("ea"), F.col("eb")) / (_norm(F.col("ea")) * _norm(F.col("eb"))), 6
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
