"""Similarity search over embedding columns (north-rule addition).

Brute-force cosine top-k is the correctness baseline; the bucketed
variant is the scale path (IVF-style: restrict the scan to the query's
coarse cell — here the ``label`` column stands in for the quantizer cell,
which at 100 TB becomes a partition column → partition pruning instead of
a full scan).

Arithmetic: all dot products/norms in double via ``F.aggregate`` over
``F.zip_with`` — sequential left-to-right fold, JVM-side, no UDF. Scores
are rounded to 4 decimals before ranking so results are stable across
summation orders and engines (the DuckDB oracle sums via unnest+SUM).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import round4


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_scores(
    df: DataFrame,
    query_vec: list[float],
    vec_col: str = "embedding",
    out_col: str = "cos",
) -> DataFrame:
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return df.withColumn(
        out_col,
        round4((_dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * _norm(q)))),
    )


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k: (id, cos) ordered by (cos desc, id)."""
    scored = cosine_scores(df, query_vec, vec_col)
    return (
        scored.select(F.col(id_col), F.col("cos"))
        .orderBy(F.col("cos").desc(), F.col(id_col))
        .limit(k)
    )


def cosine_topk_bucketed(
    df: DataFrame,
    query_vec: list[float],
    query_bucket,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str = "label",
) -> DataFrame:
    """IVF-style top-k: scan only the query's coarse cell. At scale the
    bucket is a partition column → the filter prunes files, not rows."""
    return cosine_topk(
        df.filter(F.col(bucket_col) == query_bucket),
        query_vec,
        k,
        id_col,
        vec_col,
    )


def neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str = "label",
) -> DataFrame:
    """Embedding near-duplicates: same-bucket pairs with cosine ≥ t.
    The bucket join bounds the pair explosion to O(Σ cell²) instead of
    O(n²) — LSH-bucketed near-dup in the same shape the text MinHash
    pipeline uses."""
    left = df.select(
        F.col(id_col).alias("a"),
        F.col(bucket_col).alias("bucket"),
        F.col(vec_col).alias("va"),
    )
    right = df.select(
        F.col(id_col).alias("b"),
        F.col(bucket_col).alias("bucket"),
        F.col(vec_col).alias("vb"),
    )
    pairs = left.join(right, "bucket").filter(F.col("a") < F.col("b"))
    scored = pairs.select(
        "a",
        "b",
        round4((_dot(F.col("va"), F.col("vb"))
            / (_norm(F.col("va")) * _norm(F.col("vb"))))).alias("cos"),
    )
    return scored.filter(F.col("cos") >= threshold)
