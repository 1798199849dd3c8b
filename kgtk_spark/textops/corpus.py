"""End-to-end training-corpus cleaning: the composed pipeline a 100 TB
web-text corpus runs before tokenization.

Stages (each one of this package's oracled primitives):

1. quality gates — minimum token count, maximum punctuation ratio,
   maximum top-word token mass (repetition), language allow-list;
2. exact dedup — one survivor (minimum doc_id) per normalized-text
   fingerprint;
3. near-dup removal — MinHash LSH candidates, exact-Jaccard verify,
   connected-components clustering; one survivor (minimum doc_id)
   per cluster.

Stage order matters and is part of the contract: near-dup clustering
runs on the exact-dedup survivors, so the SQL oracle replays the same
sequence. Everything distributes: gates are Catalyst predicates over
one scan, both dedups are the existing one-shuffle formulations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgtk_spark.textops.dedup import exact_dedup, minhash_near_dup
from kgtk_spark.textops.quality import language_id, quality_score, repetition_signals


def clean_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 5,
    max_punct_ratio: float = 0.2,
    max_top_word_frac: float = 0.5,
    languages: tuple[str, ...] = ("en",),
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """Returns the surviving documents: (doc_id, n_tokens, lang_pred)."""
    q = quality_score(docs)
    q = language_id(q)
    rep = repetition_signals(docs, text_col, id_col).select(
        id_col, "n_tokens", "top_word_frac"
    )
    gated = (
        q.join(rep, id_col)
        .filter(
            (F.col("n_tokens") >= min_tokens)
            & (F.col("punct_ratio") <= max_punct_ratio)
            & (F.col("top_word_frac") <= max_top_word_frac)
            & F.col("lang_pred").isin(list(languages))
        )
        .select(id_col, text_col, "n_tokens", "lang_pred")
    )

    deduped = exact_dedup(gated, [text_col], id_col)

    clusters = minhash_near_dup(
        deduped, text_col=text_col, id_col=id_col, jaccard_threshold=jaccard_threshold
    )
    survivors = clusters.filter(F.col("cluster_id") == F.col(id_col)).select(id_col)
    return deduped.join(survivors, id_col, "left_semi").select(
        id_col, F.col("n_tokens").cast("long").alias("n_tokens"), "lang_pred"
    )
