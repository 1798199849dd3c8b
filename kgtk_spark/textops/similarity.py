"""Similarity search over an embedding column (array<float>).

- brute_force_topk: exact cosine top-k — the correctness baseline.
  The dot product is a JVM-side ``aggregate(zip_with(...))`` against a
  literal query vector: no Python, no shuffle except the final top-k.
- lsh_bucketed_topk: the scale path — random-hyperplane LSH signs
  bucket the corpus; only the query's bucket (plus optional probes of
  neighboring buckets) is scanned. At 10^10 vectors the bucket scan is
  1/2^bits of the corpus.
- cosine_pairs: all-pairs above a threshold via LSH buckets (near-dup
  by embedding).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_to_literal(vec_col: Column, query: list[float]) -> Column:
    q = F.array(*[F.lit(float(v)) for v in query])
    return _dot(vec_col, q) / (_norm(vec_col) * F.lit(float(np.linalg.norm(query))))


def brute_force_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_ids: list | None = None,
) -> DataFrame:
    """Exact cosine top-k: one scan + a k-row ordered limit."""
    out = df.select(
        F.col(id_col),
        F.round(cosine_to_literal(F.col(vec_col), query), 6).alias("score"),
    )
    if exclude_ids:
        out = out.filter(~F.col(id_col).isin(exclude_ids))
    return out.orderBy(F.desc("score"), F.col(id_col)).limit(k)


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randn(bits, dim)


def lsh_signature(vec_col: Column, planes: np.ndarray) -> Column:
    """Random-hyperplane sign bits packed into a long (JVM-side)."""
    bits = []
    for i, p in enumerate(planes):
        q = F.array(*[F.lit(float(v)) for v in p])
        bits.append(F.when(_dot(vec_col, q) >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_bucketed_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    bits: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    probe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k: scan only buckets within ``probe_hamming`` of
    the query's bucket. Recall/latency trade via bits and probes."""
    planes = _hyperplanes(len(query), bits, seed)
    qsig = 0
    for i, p in enumerate(planes):
        if float(np.dot(p, query)) >= 0:
            qsig |= 1 << i
    probe_sigs = {qsig}
    if probe_hamming >= 1:
        for i in range(bits):
            probe_sigs.add(qsig ^ (1 << i))
    if probe_hamming >= 2:
        for i in range(bits):
            for j in range(i + 1, bits):
                probe_sigs.add(qsig ^ (1 << i) ^ (1 << j))

    bucketed = df.withColumn("__sig__", lsh_signature(F.col(vec_col), planes))
    cand = bucketed.filter(F.col("__sig__").isin(list(probe_sigs)))
    return (
        cand.select(
            F.col(id_col),
            F.round(cosine_to_literal(F.col(vec_col), query), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def cosine_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    bits: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
    seed: int = 42,
    bucket_cap: int = 2000,
) -> DataFrame:
    """Embedding near-duplicate pairs: same LSH bucket + exact verify.

    The self-join is keyed on the signature; a degenerate bucket (e.g.
    a zero-vector pileup) would square, so buckets over ``bucket_cap``
    vectors are dropped before the join — at scale raise ``bits`` (or
    re-run the dropped residue at higher bits) instead of the cap.
    """
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes = _hyperplanes(dim, bits, seed)
    b = df.select(
        F.col(id_col), F.col(vec_col), lsh_signature(F.col(vec_col), planes).alias("__sig__")
    )
    if bucket_cap is not None:
        ok = (
            b.groupBy("__sig__")
            .agg(F.count(F.lit(1)).alias("__bsz__"))
            .filter(F.col("__bsz__") <= bucket_cap)
            .select("__sig__")
        )
        b = b.join(ok, "__sig__", "left_semi")
    pairs = (
        b.alias("a")
        .join(
            b.alias("b"),
            (F.col("a.__sig__") == F.col("b.__sig__"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("u"),
            F.col(f"b.{id_col}").alias("v"),
            F.round(
                _dot(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
                / (_norm(F.col(f"a.{vec_col}")) * _norm(F.col(f"b.{vec_col}"))),
                6,
            ).alias("score"),
        )
    )
    return pairs.filter(F.col("score") >= threshold)
