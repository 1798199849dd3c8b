"""Deduplication family: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design:
- exact: one hash aggregation on the dedup key (map-side partial agg);
- MinHash+LSH: signatures are a vectorized numpy pandas UDF (one pass
  over text); banding turns the O(n²) pair problem into a groupBy on
  (band, band_hash) — only same-bucket docs ever meet; candidate pairs
  are verified with real Jaccard and clustered with the
  connected-components fixpoint so transitive duplicates collapse;
- SimHash: 64-bit signature; near-dup = identical signature (or
  bucket by rotation for hamming>0 — v0 uses exact signature match);
- n-gram Jaccard: explicit shingle-set semi-join for small candidate
  sets (the LSH path is the scale path; this is the exact verifier).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Deterministic 64-bit mixing (splitmix64) — stable across executors/runs.
_MASK = (1 << 64) - 1


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + 0x9E3779B97F4A7C15) & _MASK
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _MASK
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _MASK
    return x ^ (x >> 31)


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Hashes of the k-word shingles of ``text`` (uint64, deduped)."""
    toks = text.split()
    if len(toks) < k:
        shingles = [" ".join(toks)] if toks else []
    else:
        shingles = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    if not shingles:
        return np.array([], dtype=np.uint64)
    h = np.array([hash_bytes(s.encode()) for s in shingles], dtype=np.uint64)
    return np.unique(h)


def hash_bytes(b: bytes) -> int:
    """FNV-1a 64-bit — deterministic, no PYTHONHASHSEED dependence."""
    h = 0xCBF29CE484222325
    for byte in b:
        h = ((h ^ byte) * 0x100000001B3) & _MASK
    return h


def exact_dedup(
    df: DataFrame, key_cols: list[str], id_col: str = "doc_id"
) -> DataFrame:
    """Keep one row per distinct key (the minimum id) — one shuffle."""
    keep = df.groupBy(*key_cols).agg(F.min(id_col).alias(id_col))
    return df.join(keep, [*key_cols, id_col], "left_semi")


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_k: int = 3,
) -> DataFrame:
    """(id, sig: array<long>) MinHash signatures, numpy-vectorized."""
    seeds = _splitmix64(np.arange(1, num_hashes + 1, dtype=np.uint64))

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig_udf(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            sh = _shingle_hashes(t or "", shingle_k)
            if sh.size == 0:
                out.append([0] * num_hashes)
                continue
            # permuted = splitmix64(shingle ^ seed) per hash function
            m = _splitmix64(sh[None, :] ^ seeds[:, None])
            out.append([int(v) for v in m.min(axis=1).astype(np.int64)])
        return pd.Series(out)

    return df.select(F.col(id_col), sig_udf(F.col(text_col)).alias("sig"))


def minhash_near_dup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """Near-duplicate clusters via MinHash banding + Jaccard verify.

    Returns (doc_id, cluster_id) where cluster_id = min doc_id of the
    duplicate cluster; singletons map to themselves.
    """
    if num_hashes % bands != 0:
        raise ValueError("bands must divide num_hashes")
    rows_per_band = num_hashes // bands

    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_k).cache()

    # band → bucket hash → candidate pairs within a bucket
    banded = sigs.select(
        id_col,
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.lit(b),
                        F.concat_ws(
                            ",", *[F.col("sig")[b * rows_per_band + r].cast("string")
                                   for r in range(rows_per_band)]
                        ),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    pairs = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("u"), F.col(f"b.{id_col}").alias("v"))
        .distinct()
    )

    # Verify candidates with estimated Jaccard from full signatures.
    sa = sigs.select(F.col(id_col).alias("u"), F.col("sig").alias("sig_u"))
    sb = sigs.select(F.col(id_col).alias("v"), F.col("sig").alias("sig_v"))
    matches = F.aggregate(
        F.zip_with("sig_u", "sig_v", lambda a, b: F.when(a == b, 1).otherwise(0)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    verified = (
        pairs.join(sa, "u")
        .join(sb, "v")
        .withColumn("est_jaccard", matches / F.lit(float(num_hashes)))
        .filter(F.col("est_jaccard") >= jaccard_threshold)
        .select("u", "v")
    )

    from kgtk_spark.graph.connected_components import _components_fixpoint

    ids = df.select(F.col(id_col))
    if verified.isEmpty():
        return ids.withColumn("cluster_id", F.col(id_col))
    assign = _components_fixpoint(
        verified.select(F.col("u").cast("string").alias("u"), F.col("v").cast("string").alias("v"))
    )
    assign = assign.select(
        F.col("node").cast("long").alias(id_col),
        F.col("component").cast("long").alias("cluster_id"),
    )
    return (
        ids.join(assign, id_col, "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", F.col(id_col)))
    )


def simhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, simhash: long) — 64-bit SimHash over word tokens."""

    @F.pandas_udf(T.LongType())
    def sim_udf(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = (t or "").split()
            if not toks:
                out.append(0)
                continue
            hs = np.array([hash_bytes(w.encode()) for w in toks], dtype=np.uint64)
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
            v = np.where(bits.sum(axis=0) * 2 >= len(toks), 1, 0).astype(np.uint64)
            sig = np.uint64(0)
            for i in range(64):
                if v[i]:
                    sig |= np.uint64(1) << np.uint64(i)
            out.append(int(sig.astype(np.int64)))
        return pd.Series(out, dtype="int64")

    return df.select(F.col(id_col), sim_udf(F.col(text_col)).alias("simhash"))


def simhash_near_dup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, cluster_id) — cluster = min id sharing the signature."""
    sigs = simhash_signatures(df, text_col, id_col)
    reps = sigs.groupBy("simhash").agg(F.min(id_col).alias("cluster_id"))
    return sigs.join(reps, "simhash").select(id_col, "cluster_id")


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    hashed: bool = True,
) -> DataFrame:
    """Exact n-gram Jaccard over an inverted shingle index.

    explode(shingles) → self-join on shingle → count common per pair →
    |A∩B| / (|A|+|B|−|A∩B|). The inverted index keeps the join keyed on
    shingle hash, so only docs sharing at least one shingle ever pair.

    ``hashed=False`` shingles on the raw n-gram STRING (JVM-only,
    SQL-reproducible — used by the DuckDB oracle); the default hashes
    shingles to longs for smaller shuffles at scale.
    """
    if not hashed:
        # Pure Column expressions: tokens → distinct n-gram strings.
        toks = F.split(F.trim(F.col(text_col)), r"\s+")
        grams = F.array_distinct(
            F.when(
                F.size(toks) >= n,
                F.transform(
                    F.sequence(F.lit(0), F.size(toks) - n),
                    lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
                ),
            ).otherwise(F.array(F.array_join(toks, " ")))
        )
        sh = df.select(F.col(id_col), grams.alias("sh"))
        return _jaccard_from_shingles(sh, id_col, threshold)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def shingles_udf(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [
                [int(np.int64(np.uint64(h).astype(np.int64))) for h in _shingle_hashes(t or "", n)]
                for t in texts
            ]
        )

    sh = df.select(F.col(id_col), shingles_udf(F.col(text_col)).alias("sh"))
    return _jaccard_from_shingles(sh, id_col, threshold)


def _jaccard_from_shingles(sh: DataFrame, id_col: str, threshold: float) -> DataFrame:
    sizes = sh.select(id_col, F.size("sh").alias("sz"))
    inv = sh.select(id_col, F.explode("sh").alias("g"))
    common = (
        inv.alias("a")
        .join(inv.alias("b"), (F.col("a.g") == F.col("b.g")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("u"), F.col(f"b.{id_col}").alias("v"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return (
        common.join(sizes.select(F.col(id_col).alias("u"), F.col("sz").alias("su")), "u")
        .join(sizes.select(F.col(id_col).alias("v"), F.col("sz").alias("sv")), "v")
        .withColumn("jaccard", F.col("common") / (F.col("su") + F.col("sv") - F.col("common")))
        .filter(F.col("jaccard") >= threshold)
        .select("u", "v", "jaccard")
    )
