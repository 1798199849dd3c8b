"""Text analysis: language-id, quality scoring, token counts, fingerprints.

All four are pure Column expressions (whole-stage codegen, no Python) and
each has an exact ANSI-SQL twin in ``__spark_entry__.oracle_sql`` — the
formulas below are written to be reproducible verbatim in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram heuristic.
LANG_MARKERS = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " et ", " les "],
    "es": [" el ", " y ", " los "],
}

_PUNCT = ".,;:!?"


def _count_occurrences(col: Column, needle: str) -> Column:
    # (len(s) - len(replace(s, needle, ''))) / len(needle) — portable SQL.
    return (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit("")))) / F.lit(
        len(needle)
    )


# GPT-2-style pre-tokenizer pieces, RE2/Java-portable (no lookarounds):
# contractions, letter runs, digit runs, punctuation runs — each with an
# optional leading space — then residual whitespace runs. Counting these
# pieces approximates BPE token counts well enough for length gating.
BPE_PIECE_RE = (
    r"'(?:s|t|re|ve|m|ll|d)"
    r"| ?[A-Za-z]+"
    r"| ?[0-9]+"
    r"| ?[^\sA-Za-z0-9]+"
    r"|\s+"
)


def token_count(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "n_tokens",
    method: str = "whitespace",
) -> DataFrame:
    """Token count (empty text → 0).

    ``method="whitespace"`` splits on runs of whitespace;
    ``method="bpe_regex"`` counts GPT-2-style pre-tokenizer pieces
    (BPE_PIECE_RE) — the cheap JVM-side stand-in for a real BPE
    vocabulary when gating documents by token budget.
    """
    df = _spread(df)
    c = F.trim(F.col(text_col))
    if method == "whitespace":
        n = F.when(c == "", F.lit(0)).otherwise(F.size(F.split(c, r"\s+")))
    elif method == "bpe_regex":
        n = F.size(F.regexp_extract_all(c, F.lit(BPE_PIECE_RE), 0))
    else:
        raise ValueError(f"unknown token_count method {method!r}")
    return df.withColumn(out_col, n)


def _spread(df):
    from kgtk_spark.indexing import spread_to_parallelism

    return spread_to_parallelism(df)


def language_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Marker-n-gram language heuristic: argmax of per-language marker
    hit counts; 'und' (undetermined) when nothing fires."""
    df = _spread(df)
    padded = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    scores = {
        lang: sum(
            (_count_occurrences(padded, m) for m in markers[1:]),
            _count_occurrences(padded, markers[0]),
        )
        for lang, markers in LANG_MARKERS.items()
    }
    best = F.lit("und")
    best_score = F.lit(0.0)
    for lang in sorted(scores):  # deterministic tie-break by language code
        s = scores[lang]
        better = s > best_score
        best = F.when(better, F.lit(lang)).otherwise(best)
        best_score = F.when(better, s).otherwise(best_score)
    return df.withColumn(out_col, best)


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation-ratio / mean-word-length heuristics.

    Adds: n_chars_q, punct_ratio, word_count, mean_word_len, quality
    (1.0 minus penalties; clamped to [0,1]). Formula mirrors the
    classic Gopher-style length and symbol-ratio rules.
    """
    df = _spread(df)
    c = F.col(text_col)
    n_chars = F.length(c)
    punct = sum(
        (_count_occurrences(c, ch) for ch in _PUNCT[1:]),
        _count_occurrences(c, _PUNCT[0]),
    )
    trimmed = F.trim(c)
    words = F.when(trimmed == "", F.lit(0)).otherwise(F.size(F.split(trimmed, r"\s+")))
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    mean_word = F.when(words > 0, (n_chars - words + 1) / words).otherwise(F.lit(0.0))
    quality = (
        F.lit(1.0)
        - F.when(n_chars < 20, 0.5).otherwise(0.0)
        - F.when(punct_ratio > 0.1, 0.3).otherwise(0.0)
        - F.when((mean_word < 2) | (mean_word > 15), 0.2).otherwise(0.0)
    )
    return (
        df.withColumn("n_chars_q", n_chars)
        .withColumn("punct_ratio", F.round(punct_ratio, 6))
        .withColumn("word_count", words)
        .withColumn("mean_word_len", F.round(mean_word, 6))
        .withColumn("quality", F.greatest(F.round(quality, 6), F.lit(0.0)))
    )


def doc_fingerprint(
    df: DataFrame, text_col: str = "text", out_col: str = "fingerprint"
) -> DataFrame:
    """Deterministic content fingerprint: md5 of whitespace-normalized,
    lowercased text — the cross-engine-stable normalize+hash."""
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return _spread(df).withColumn(out_col, F.md5(norm))


def repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition quality signals per document.

    Returns (id, n_tokens, top_word_frac, dup_word_frac,
    top_bigram_frac): the token mass of the most frequent word, of all
    words occurring more than once, and of the most frequent bigram —
    the standard repetitious-text filters for web training corpora
    (Rae et al. 2021 "Scaling Language Models", table A1).

    Shape: ONE token explode, ONE exchange. The exploded stream is
    hash-repartitioned by doc id; both aggregation branches and the
    final join then run without further exchanges (partitioning on
    [id] satisfies every downstream clustering on [id, ...], and the
    two branches reuse the same shuffle — guide §2.4 "two operations
    keyed the same way can share one exchange"). Bigrams pair each
    token with its successor via lead() over (id, pos) instead of the
    old positional self-join (two more exchanges + a join of every
    token occurrence). Docs with fewer than 2 tokens are excluded (no
    bigram denominator).
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    t = _spread(df).select(
        F.col(id_col), F.posexplode(toks).alias("pos", "w")
    ).repartition(F.col(id_col))
    words = (
        t.groupBy(id_col, "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_tokens"),
            F.max("c").alias("top_w"),
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias("dup_w"),
        )
    )
    from pyspark.sql import Window

    w_next = Window.partitionBy(id_col).orderBy("pos")
    bigrams = (
        t.withColumn("w2", F.lead("w").over(w_next))
        .filter(F.col("w2").isNotNull())
        .select(id_col, F.concat_ws(" ", "w", "w2").alias("bg"))
        .groupBy(id_col, "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(F.max("c").alias("top_bg"), F.sum("c").alias("n_bg"))
    )
    return (
        words.join(bigrams, id_col)
        .filter(F.col("n_tokens") >= 2)
        .select(
            id_col,
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.round(F.col("top_w") / F.col("n_tokens"), 6).alias("top_word_frac"),
            F.round(F.col("dup_w") / F.col("n_tokens"), 6).alias("dup_word_frac"),
            F.round(F.col("top_bg") / F.col("n_bg"), 6).alias("top_bigram_frac"),
        )
    )


# PII patterns chosen to parse identically in Java regex (Spark) and
# RE2 (DuckDB oracle): no lookarounds, no backrefs.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (
        r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
        "<IP>",
    ),
    "phone": (
        # +1 555 123 4567 / (555) 123-4567 / 555-123-4567
        r"\+?[0-9]{1,3}[ .-]?\(?[0-9]{3}\)?[ .-][0-9]{3}[ .-][0-9]{4}\b",
        "<PHONE>",
    ),
}


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    kinds: tuple[str, ...] = ("email", "ipv4", "phone"),
    count: bool = True,
) -> DataFrame:
    """Replace common PII (emails, IPv4 addresses, phone numbers) with
    typed placeholder tokens — the standard redaction pass an LLM
    training pipeline runs before tokenization. Pure JVM
    ``regexp_replace`` chain (one projection, no shuffle, no Python);
    ``count=True`` adds a ``pii_<kind>`` hit-count column per kind so
    heavily-contaminated documents can be gated downstream.
    """
    out = df
    scrubbed = F.col(text_col)
    for kind in kinds:
        pattern, token = PII_PATTERNS[kind]
        if count:
            out = out.withColumn(
                f"pii_{kind}",
                F.coalesce(
                    F.size(F.regexp_extract_all(F.col(text_col), F.lit(pattern), 0)),
                    F.lit(0),
                ).cast("int"),
            )
        scrubbed = F.regexp_replace(scrubbed, pattern, token)
    return out.withColumn(text_col, scrubbed)


def token_df(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """(token, df, total_tf) — document frequency and total term
    frequency per whitespace token, the raw material for stopword
    lists, IDF weighting, and vocabulary pruning at corpus scale.

    Plan: explode tokens (JVM split, no Python), ONE hash aggregation
    on (token) computing count(distinct doc) + count(*). The distinct
    runs inside the aggregate (partial per-partition distinct maps),
    not as a separate shuffle of (token, doc) pairs per occurrence.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    t = F.explode(toks).alias("token")
    exploded = docs.select(F.col(id_col), t)
    if lowercase:
        exploded = exploded.withColumn("token", F.lower(F.col("token")))
    exploded = exploded.filter(F.col("token") != "")
    return exploded.groupBy("token").agg(
        F.countDistinct(id_col).alias("df"),
        F.count(F.lit(1)).alias("total_tf"),
    )


def _tokens(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, token): lowercased nonempty whitespace tokens, JVM-side."""
    return (
        docs.select(
            F.col(id_col),
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("token"),
        )
        .withColumn("token", F.lower(F.col("token")))
        .filter(F.col("token") != "")
    )


def unigram_cross_entropy(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    tf_weighted: bool = False,
) -> DataFrame:
    """CCNet-style cheap LM quality proxy: score each doc by the
    cross-entropy of its tokens under the CORPUS unigram distribution
    — ``unigram_xent = -mean log2 p(token)``, where p is the token's
    corpus frequency. Gibberish and boilerplate-stuffed docs sit at
    the distribution tails exactly as with the real 5-gram LM CCNet
    uses, at a fraction of the cost (no model artifact to ship).

    Returns (id, n_tokens, unigram_xent); empty docs drop out.

    Default plan: one token explode feeding ONE frequency aggregation
    (map-side partial), the corpus total as a 1-row broadcast (no
    driver action, stays lazy), a token-keyed join back, and a per-doc
    average. The join's dimension side is vocabulary-sized, so the
    planner broadcasts it whenever it fits — hot tokens then never
    cross a shuffle at all. No Python anywhere.

    ``tf_weighted=True`` is the skew-proof variant for corpora whose
    VOCABULARY is too big to broadcast (the r5 review's stop-word
    concern): tokens are first collapsed to per-doc (token, tf) rows
    — uniform keys, map-side partial agg — so a stop-word appearing
    10^12 times corpus-wide crosses the shuffle join as one row per
    doc, and the per-doc mean is tf-weighted (sum(tf·log2 p)/sum(tf),
    same value as the occurrence average up to float addition order,
    which the ROUND(...,6) contract absorbs). Measured at sf1.0 the
    default is ~25% faster (short docs repeat few tokens, so the
    pre-aggregation does not pay locally); at 100 TB with a shuffle
    join the weighted path is the one that survives.
    """
    toks = _tokens(docs, text_col, id_col)
    if tf_weighted:
        tf = (
            toks.groupBy(id_col, "token")
            .agg(F.count(F.lit(1)).alias("__tf__"))
            .localCheckpoint()
        )
        freq = tf.groupBy("token").agg(F.sum("__tf__").alias("__cnt__"))
        total = freq.agg(F.sum("__cnt__").cast("double").alias("__total__"))
        scored = tf.join(freq, "token").crossJoin(F.broadcast(total))
        return scored.groupBy(id_col).agg(
            F.sum("__tf__").cast("long").alias("n_tokens"),
            F.round(
                -F.sum(
                    F.col("__tf__")
                    * F.log2(F.col("__cnt__") / F.col("__total__"))
                )
                / F.sum("__tf__"),
                6,
            ).alias("unigram_xent"),
        )
    freq = toks.groupBy("token").agg(F.count(F.lit(1)).alias("__cnt__"))
    total = freq.agg(F.sum("__cnt__").cast("double").alias("__total__"))
    scored = toks.join(freq, "token").crossJoin(F.broadcast(total))
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.round(
            -F.avg(F.log2(F.col("__cnt__") / F.col("__total__"))), 6
        ).alias("unigram_xent"),
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed tf-idf
    (``tf * (ln((N+1)/(df+1)) + 1)``, the scikit-learn smoothing) —
    keyword extraction / topic fingerprinting over a corpus.

    Returns (id, token, tf, score, rank), rank 1..k per doc, ties
    broken by token so ranks are deterministic cross-engine.

    Plan: token explode -> (doc, token) tf aggregation -> token df
    aggregation derived FROM the tf frame (no second pass over the
    text), doc count as a 1-row broadcast, and a per-doc window for
    the top-k. The window partitions on doc id — per-partition state
    is one doc's vocabulary, never corpus-scale. tf is
    localCheckpoint-ed: it feeds both the df aggregation and the join,
    and without the checkpoint Catalyst re-executes the whole
    explode + aggregate subtree for each consumer (two full scans in
    the r5 plan).
    """
    toks = _tokens(docs, text_col, id_col)
    tf = (
        toks.groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint()
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("__df__"))
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("__n__"))
    score = F.round(
        F.col("tf")
        * (F.log((F.col("__n__") + 1.0) / (F.col("__df__") + 1.0)) + 1.0),
        6,
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.col("token"))
    return (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score", score)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "token", "tf", "score", "rank")
    )


GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_flags(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stopwords: int = 2,
) -> DataFrame:
    """The Gopher quality rules (Rae et al. 2021, Table A1) as per-rule
    flags + an overall ``gopher_pass`` — the standard pre-filter of a
    web-scale LLM corpus. Pure Catalyst expressions (every rule is also
    expressible verbatim in ANSI SQL for verification):

    - word count within [min_words, max_words];
    - mean word length within [min, max];
    - symbol-to-word ratio ('#' and '...') at most ``max_symbol_ratio``;
    - at most ``max_bullet_frac`` of lines starting with a bullet and
      ``max_ellipsis_frac`` ending with an ellipsis;
    - at least ``min_alpha_frac`` of words containing a letter;
    - at least ``min_stopwords`` distinct common stopwords present.
    """
    c = F.trim(F.col(text_col))
    toks = F.split(c, r"\s+")
    n_words = F.when(c == "", F.lit(0)).otherwise(F.size(toks))
    # mean token length = chars-without-whitespace / word count
    mean_wl = F.when(
        n_words > 0,
        F.length(F.regexp_replace(c, r"\s+", "")) / n_words,
    ).otherwise(F.lit(0.0))
    symbols = _count_occurrences(c, "#") + _count_occurrences(c, "...")
    sym_ratio = F.when(n_words > 0, symbols / n_words).otherwise(F.lit(0.0))
    lines = F.split(F.col(text_col), r"\n")
    n_lines = F.size(lines)
    bullet_frac = F.when(
        n_lines > 0,
        F.size(F.filter(lines, lambda l: F.trim(l).rlike(r"^[-*•]")))
        / n_lines,
    ).otherwise(F.lit(0.0))
    ellipsis_frac = F.when(
        n_lines > 0,
        F.size(F.filter(lines, lambda l: F.trim(l).rlike(r"\.\.\.$"))) / n_lines,
    ).otherwise(F.lit(0.0))
    alpha_frac = F.when(
        n_words > 0,
        F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))) / n_words,
    ).otherwise(F.lit(0.0))
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(F.transform(toks, F.lower)),
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
        )
    )
    flags = {
        "pass_word_count": (n_words >= min_words) & (n_words <= max_words),
        "pass_mean_word_len": (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len),
        "pass_symbol_ratio": sym_ratio <= max_symbol_ratio,
        "pass_bullets": (bullet_frac <= max_bullet_frac)
        & (ellipsis_frac <= max_ellipsis_frac),
        "pass_alpha": alpha_frac >= min_alpha_frac,
        "pass_stopwords": n_stop >= min_stopwords,
    }
    out = (
        df.withColumn("g_word_count", n_words)
        .withColumn("g_mean_word_len", F.round(mean_wl, 6))
        .withColumn("g_symbol_ratio", F.round(sym_ratio, 6))
        .withColumn("g_alpha_frac", F.round(alpha_frac, 6))
        .withColumn("g_n_stopwords", n_stop)
    )
    overall = None
    for name, expr in flags.items():
        out = out.withColumn(name, expr)
        overall = expr if overall is None else (overall & expr)
    return out.withColumn("gopher_pass", overall)


def c4_filters(
    df: DataFrame,
    text_col: str = "text",
    min_words_per_line: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """The C4 cleaning rules (Raffel et al. 2020 §2.2) as line-level
    cleanup + document flags — the other canonical web-corpus filter
    set beside Gopher:

    - keep only lines that end in terminal punctuation (. ! ? ")
      AND carry at least ``min_words_per_line`` words (paper default 5);
    - ``clean_text`` = surviving lines rejoined;
    - drop flags: fewer than ``min_sentences`` sentences in the cleaned
      text (paper default 3), a "lorem ipsum" occurrence, or a ``{``
      (code marker);
    - ``c4_keep`` = all three pass.

    Pure Catalyst (array filter + regex — no Python); every rule is
    replayed verbatim in the SQL oracle.
    """
    lines = F.split(F.col(text_col), r"\n")
    good_line = lambda l: (  # noqa: E731
        F.trim(l).rlike(r'[.!?"]$')
        & (F.size(F.split(F.trim(l), r"\s+")) >= min_words_per_line)
    )
    kept = F.filter(lines, good_line)
    clean = F.array_join(F.transform(kept, F.trim), "\n")
    n_sentences = F.size(
        F.filter(F.split(clean, r"[.!?]"), lambda s: F.trim(s) != "")
    )
    has_lorem = F.lower(F.col(text_col)).contains("lorem ipsum")
    has_brace = F.col(text_col).contains("{")
    keep = (n_sentences >= min_sentences) & ~has_lorem & ~has_brace
    return (
        df.withColumn("clean_text", clean)
        .withColumn("n_kept_lines", F.size(kept))
        .withColumn("n_sentences", n_sentences)
        .withColumn("has_lorem_ipsum", has_lorem)
        .withColumn("has_curly_brace", has_brace)
        .withColumn("c4_keep", keep)
    )


def line_repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The line-level half of Gopher's repetition filters (Rae et al.
    2021 Table A1, complementing ``repetition_signals``'s word/bigram
    half): per doc, the fraction of LINES that are duplicates of
    another line in the same doc, and the fraction of CHARACTERS
    sitting in those duplicated lines. Two hash aggregations keyed on
    (doc, line) then (doc) — no window, no self-join.
    """
    lines = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), r"\n")).alias("__l__")
    ).withColumn("__l__", F.trim(F.col("__l__")))
    lines = lines.filter(F.col("__l__") != "")
    per = lines.groupBy(id_col, "__l__").agg(
        F.count(F.lit(1)).alias("c"), F.length("__l__").alias("len")
    )
    agg = per.groupBy(id_col).agg(
        F.sum("c").alias("n_lines"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias("dup_lines"),
        F.sum(F.col("c") * F.col("len")).alias("n_line_chars"),
        F.sum(
            F.when(F.col("c") > 1, F.col("c") * F.col("len")).otherwise(0)
        ).alias("dup_line_chars"),
    )
    return agg.select(
        id_col,
        F.col("n_lines").cast("long").alias("n_lines"),
        F.round(F.col("dup_lines") / F.col("n_lines"), 6).alias("dup_line_frac"),
        F.round(
            F.col("dup_line_chars") / F.col("n_line_chars"), 6
        ).alias("dup_line_char_frac"),
    )
