"""Text-analysis operators for document corpora (north-star extension):
language ID (stopword-hit heuristic), quality scoring, token counting,
document fingerprinting. Built-ins only — the whole module stays in
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword heuristic
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "se", "del", "las"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "du", "est"],
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "im"],
}


def _tokens(text_col):
    return F.split(F.trim(F.lower(text_col)), r"\s+")


def token_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token counting: whitespace tokens plus a BPE-ish subword estimate
    (ceil(chars/4) heuristic used by LLM data pipelines for budgeting)."""
    toks = _tokens(F.col(text_col))
    n_chars = F.length(text_col).cast("long")
    return docs.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        F.when(F.length(F.trim(F.col(text_col))) == 0, 0)
        .otherwise(F.size(toks))
        .cast("long")
        .alias("n_tokens"),
        F.ceil(n_chars / 4.0).cast("long").alias("n_tokens_bpe_est"),
    )


def quality_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: list[str] | None = None,
) -> DataFrame:
    """Per-doc quality features: length, mean word length, punctuation
    ratio, digit ratio, uppercase ratio, stopword ratio, and a composite
    0..1 quality score (heuristics standard in pretraining-data filters)."""
    sw = stopwords or LANG_STOPWORDS["en"]
    text = F.col(text_col)
    toks = _tokens(text)
    n_chars = F.length(text).cast("double")
    n_tokens = F.size(toks).cast("double")
    punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", "")).cast("double")
    digits = F.length(F.regexp_replace(text, r"[^0-9]", "")).cast("double")
    uppers = F.length(F.regexp_replace(text, r"[^A-Z]", "")).cast("double")
    sw_arr = F.array(*[F.lit(s) for s in sw])
    sw_hits = F.size(F.filter(toks, lambda t: F.array_contains(sw_arr, t))).cast(
        "double"
    )

    out = docs.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        (n_chars / F.greatest(n_tokens, F.lit(1.0))).alias("mean_word_len"),
        (punct / F.greatest(n_chars, F.lit(1.0))).alias("punct_ratio"),
        (digits / F.greatest(n_chars, F.lit(1.0))).alias("digit_ratio"),
        (uppers / F.greatest(n_chars, F.lit(1.0))).alias("upper_ratio"),
        (sw_hits / F.greatest(n_tokens, F.lit(1.0))).alias("stopword_ratio"),
    )
    score = (
        F.when(F.col("n_tokens") < 5, 0.0)
        .otherwise(
            F.least(F.col("n_tokens") / 100.0, F.lit(1.0)) * 0.4
            + F.least(F.col("stopword_ratio") * 4.0, F.lit(1.0)) * 0.4
            + (1.0 - F.least(F.col("digit_ratio") * 5.0, F.lit(1.0))) * 0.2
        )
    )
    return out.withColumn("quality_score", score)


def language_id(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Stopword-hit language ID: count hits per language list, argmax with
    deterministic tie-break (language name asc); 'und' when no hits."""
    toks = _tokens(F.col(text_col))
    df = docs.select(F.col(id_col), toks.alias("_toks"))
    hit_cols = []
    for lang, words in sorted(LANG_STOPWORDS.items()):
        arr = F.array(*[F.lit(w) for w in words])
        hit_cols.append(
            F.size(F.filter(F.col("_toks"), lambda t: F.array_contains(arr, t))).alias(
                f"hits_{lang}"
            )
        )
    df = df.select(F.col(id_col), *hit_cols)
    # argmax over the small fixed language set, tie-break lexicographic
    langs = sorted(LANG_STOPWORDS)
    struct_arr = F.array(
        *[
            F.struct(
                F.col(f"hits_{lang}").alias("hits"), F.lit(lang).alias("lang")
            )
            for lang in langs
        ]
    )
    best = F.array_max(struct_arr)
    return df.select(
        F.col(id_col),
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias(
            "predicted_lang"
        ),
    )


def fingerprint(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Document fingerprint: md5 of normalized text (content address) plus
    xxhash64 (cheap 64-bit rolling-hash equivalent for join keys)."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return docs.select(
        F.col(id_col),
        F.md5(norm).alias("fingerprint_md5"),
        F.xxhash64(norm).alias("fingerprint_64"),
    )


def strip_html(text):
    """HTML → text extraction (the step in front of every web-crawl
    quality filter), as one chain of codegen regexp/replace expressions
    — RE2-compatible (no backreferences), so the q126 oracle runs the
    IDENTICAL rule chain in DuckDB:

    1. drop ``<script>…</script>`` and ``<style>…</style>`` blocks
       (case-insensitive, dotall, non-greedy);
    2. drop HTML comments;
    3. every remaining tag → one space;
    4. unescape the common entities (``&lt; &gt; &quot; &#39; &nbsp;``
       first, ``&amp;`` LAST so ``&amp;lt;`` single-unescapes to
       ``&lt;``, not ``<``);
    5. collapse whitespace runs to single spaces and trim.

    ``text`` is a Column; returns the extracted text Column.
    """
    t = F.regexp_replace(text, r"(?is)<script\b[^>]*>.*?</script>", " ")
    t = F.regexp_replace(t, r"(?is)<style\b[^>]*>.*?</style>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, r"(?s)<[^>]+>", " ")
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"),
    ):
        t = F.replace(t, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


# Gopher (Rae et al. 2021, Table A1) repetition-free quality rules that
# are expressible per-row; thresholds as published.
GOPHER_REQUIRED_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_required_hits: int = 2,
) -> DataFrame:
    """Gopher-style document quality rules: word-count bounds, mean word
    length bounds, symbol-to-word ratio (``#`` / ``...``), bullet-line
    and ellipsis-line fractions, and the ≥2-of-8 required-stopword rule.
    Emits each measured feature, each rule verdict, and the composite
    ``gopher_pass`` — row-local expressions only, zero shuffle (the
    filter runs in the scan stage of whatever plan consumes it).
    """
    text = F.col(text_col)
    # per-WORD quantities avoid lambdas entirely (HOF lambdas run
    # interpreted per element — the probe-established rule): word count
    # is the number of \S+ runs, and the summed word length is the
    # text's non-whitespace character count — both native regex
    # expressions, exactly equal to the filtered-split formulation
    n_words = F.size(F.expr(f"regexp_extract_all({text_col}, '\\\\S+', 0)")).cast(
        "long"
    )
    mean_wl = F.length(
        F.regexp_replace(text, r"\s", "")
    ).cast("double") / F.greatest(n_words.cast("double"), F.lit(1.0))
    n_hash = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    n_ellipsis = F.floor(
        (F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit(""))))
        / 3
    )
    symbol_ratio = (n_hash + n_ellipsis) / F.greatest(
        n_words.cast("double"), F.lit(1.0)
    )
    lines = F.split(text, r"\n")
    n_lines = F.size(lines).cast("double")
    bullet_ratio = (
        F.size(
            F.filter(
                lines,
                lambda l: F.trim(l).startswith("- ")
                | F.trim(l).startswith("* "),
            )
        )
        / F.greatest(n_lines, F.lit(1.0))
    )
    ellipsis_ratio = (
        F.size(F.filter(lines, lambda l: F.trim(l).endswith("...")))
        / F.greatest(n_lines, F.lit(1.0))
    )
    # 8 static whitespace-bounded regex probes on the lowered text ==
    # membership in the lowered \S+ token set, with no per-word lambda
    lt = F.lower(text)
    req_hits = None
    for w in GOPHER_REQUIRED_WORDS:
        hit = lt.rlike(rf"(^|\s){w}(\s|$)").cast("long")
        req_hits = hit if req_hits is None else req_hits + hit

    out = docs.select(
        F.col(id_col),
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_ratio.alias("bullet_ratio"),
        ellipsis_ratio.alias("ellipsis_ratio"),
        req_hits.alias("required_hits"),
    )
    checks = {
        "ok_word_count": (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words),
        "ok_mean_word_len": (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len),
        "ok_symbols": F.col("symbol_ratio") <= max_symbol_ratio,
        "ok_bullets": F.col("bullet_ratio") <= max_bullet_ratio,
        "ok_ellipsis": F.col("ellipsis_ratio") <= max_ellipsis_ratio,
        "ok_stopwords": F.col("required_hits") >= min_required_hits,
    }
    for name, c in checks.items():
        out = out.withColumn(name, c)
    gate = None
    for name in checks:
        gate = F.col(name) if gate is None else gate & F.col(name)
    return out.withColumn("gopher_pass", gate)


def bm25_index(
    docs: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Build the query-INDEPENDENT BM25 inverted index: every factor of
    the Okapi score except the query itself folds into one precomputed
    per-(term, doc) contribution,

        c(t, d) = idf(t) * tf * (k1+1)
                  / (tf + k1 * (1 - b + b * dl/avgdl)),
        idf(t) = ln((N - df + 0.5) / (df + 0.5) + 1),

    so search is just broadcast-join + integer sum + top-k. At corpus
    scale this is the expensive pass (one (doc, term)-keyed agg over
    every token, with map-side combine — round-7 probe at 1M docs x 60
    tokens: 48.8 s to build + materialize the 60M-posting index, then
    7.5 s to serve 100 queries from it, vs 68 s per query set when
    rebuilt inline); build it ONCE, persist it (parquet /
    localCheckpoint), and serve every query set from it.

    Determinism contract (the q143 recipe): the contribution is
    fixed-pointed to a LONG (1e-6 ticks) at INDEX time, so every later
    per-(query, doc) score is an integer sum — order-independent across
    partitionings and engines.

    Output: (term, id_col, contrib_fp) — one row per posting.
    """
    from solar_data_tools_spark.operators.dedup import normalize_text

    tok = docs.select(
        F.col(id_col),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias(
            "term"
        ),
    ).where(F.length("term") > 0)
    tf = tok.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dl = tok.groupBy(id_col).agg(F.count("*").alias("dl"))
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    contrib = (
        idf
        * (F.col("tf") * F.lit(k1 + 1.0))
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
    )
    return (
        tf.join(df_t, "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .select(
            "term",
            id_col,
            F.floor(contrib * F.lit(1e6) + F.lit(0.5))
            .cast("long")
            .alias("contrib_fp"),
        )
    )


def bm25_search(
    index: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_term_col: str = "term",
) -> DataFrame:
    """Search a prebuilt ``bm25_index``: broadcast the query terms onto
    the postings (only docs sharing a query term are ever touched —
    inverted-index semantics, no corpus scan), integer-sum the
    fixed-point contributions per (query, doc), rank top-k.

    Output: (query_id, id_col, score, rank), rank 1..k, ties on doc id.
    """
    q = queries.select(
        F.col(query_id_col), F.col(query_term_col).alias("term")
    ).distinct()
    scored = (
        index.join(F.broadcast(q), "term")
        .groupBy(query_id_col, id_col)
        .agg(F.sum("contrib_fp").alias("_s_fp"))
        .select(
            query_id_col,
            id_col,
            (F.col("_s_fp") / F.lit(1e6)).alias("score"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("score"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(k))
        .select(query_id_col, id_col, "score", "rank")
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_term_col: str = "term",
) -> DataFrame:
    """BM25 lexical retrieval: top-k documents per query under the
    Okapi BM25 ranking function — the sparse-retrieval counterpart of
    the embedding ANN tier (hybrid RAG pipelines run both),

        score(q, d) = sum_{t in q} idf(t) * tf * (k1+1)
                      / (tf + k1 * (1 - b + b * dl/avgdl)),
        idf(t) = ln((N - df + 0.5) / (df + 0.5) + 1).

    ``queries`` is a long (query_id, term) table (terms are matched
    against the same normalization as the postings).

    One-shot convenience composing :func:`bm25_index` +
    :func:`bm25_search`; for repeated query sets build the index once
    and persist it — the index pass dominates end-to-end cost (round-7
    probe at 1M docs: 48.8 s build vs 7.5 s per 100-query search).

    Output: (query_id, doc_id, score, rank), rank 1..k.
    """
    idx = bm25_index(docs, k1=k1, b=b, id_col=id_col, text_col=text_col)
    return bm25_search(
        idx,
        queries,
        k=k,
        id_col=id_col,
        query_id_col=query_id_col,
        query_term_col=query_term_col,
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    k: int = 10,
    rrf_k: int = 60,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank fusion of two ranked retrieval lists (Cormack et
    al. 2009) — the standard hybrid-retrieval combiner (BM25 + dense ANN
    in a RAG stack): ``rrf(d) = sum_systems 1 / (rrf_k + rank_s(d))``,
    summed over the systems that returned ``d``.

    Inputs are (query_id, id, rank) tables (e.g. ``bm25_topk`` and
    ``brute_force_topk`` outputs). Plan: one (query, doc)-keyed
    full-outer join + a per-query window — candidate lists are
    k-bounded per query, so every stage is tiny regardless of corpus
    size. The fused score is ONE binary IEEE addition of the two
    systems' terms BY CONSTRUCTION (join, not union+sum — r9 verdict
    item 4): commutative-exact, hence engine- and partitioning-stable
    without a fixed-point step, and structurally immune to a caller
    passing lists with duplicate (query, doc) rows (those would have
    silently grown a >2-term order-dependent float sum under the old
    union+sum shape; here they surface as duplicated join rows the
    oracle would catch).

    Output: (query_id, id, rrf_score, rank).
    """
    from pyspark.sql import Window

    term = F.lit(1.0) / (F.lit(float(rrf_k)) + F.col("rank"))
    a = ranked_a.select(query_id_col, id_col, term.alias("_ca"))
    b = ranked_b.select(query_id_col, id_col, term.alias("_cb"))
    fused = a.join(b, [query_id_col, id_col], "full_outer").select(
        query_id_col,
        id_col,
        (
            F.coalesce("_ca", F.lit(0.0)) + F.coalesce("_cb", F.lit(0.0))
        ).alias("rrf_score"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("rrf_score"), F.asc(id_col)
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(k))
        .select(query_id_col, id_col, "rrf_score", "rank")
    )


def novelty_scores(
    docs: DataFrame,
    n: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document novelty vs the REST of the corpus: the fraction of a
    doc's distinct word n-grams that appear in at least one OTHER
    document (``word_ngrams`` emits distinct grams per doc, so corpus
    doc-frequency >= 2 means shared). ``dup_frac`` near 1 marks
    boilerplate/templated docs; the per-source mean is the standard
    data-card diversity statistic. The within-corpus counterpart of
    ``decontaminate``'s eval-overlap fraction.

    Scale shape: one shingle explode + a gram-keyed doc-frequency agg
    (bounded by |distinct grams|, map-side combined) joined back onto
    the postings by gram — the same cost class as the n-gram Jaccard
    index's first pass, no pairwise term anywhere.

    Output: (id_col, n_grams_distinct, n_shared, dup_frac).
    """
    from solar_data_tools_spark.operators.dedup import word_ngrams

    grams = word_ngrams(docs, n=n, id_col=id_col, text_col=text_col)
    dfreq = grams.groupBy("shingle").agg(F.count("*").alias("_df"))
    return (
        grams.join(dfreq, "shingle")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams_distinct"),
            F.sum((F.col("_df") >= 2).cast("long")).alias("n_shared"),
        )
        .select(
            id_col,
            "n_grams_distinct",
            "n_shared",
            (F.col("n_shared") / F.col("n_grams_distinct")).alias(
                "dup_frac"
            ),
        )
    )


def source_overlap(
    docs: DataFrame,
    n: int = 3,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pairwise n-gram Jaccard overlap BETWEEN sources — the
    dataset-overlap report run before mixing corpora (two "different"
    dumps sharing 60 % of their shingle space should be mixed as one):

        J(A, B) = |grams(A) ∩ grams(B)| / |grams(A) ∪ grams(B)|

    over each source's distinct shingle SET.

    Scale shape: distinct (source, gram) pairs (one agg), a gram-keyed
    self-join whose per-gram fan-out is bounded by the SOURCE count
    squared (a handful — never doc-pairs), and a source-pair aggregate
    of at most |sources|^2 rows. Output: (source_a, source_b,
    n_common, n_a, n_b, jaccard) for source_a < source_b.
    """
    from solar_data_tools_spark.operators.dedup import word_ngrams

    sg = (
        word_ngrams(
            docs, n=n, id_col=id_col, text_col=text_col,
            carry_cols=[source_col],
        )
        .select(source_col, "shingle")
        .distinct()
    )
    sizes = sg.groupBy(source_col).agg(F.count("*").alias("n_grams"))
    a = sg.select(F.col(source_col).alias("source_a"), "shingle")
    b = sg.select(F.col(source_col).alias("source_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        common.join(
            F.broadcast(
                sizes.select(
                    F.col(source_col).alias("source_a"),
                    F.col("n_grams").alias("n_a"),
                )
            ),
            "source_a",
        )
        .join(
            F.broadcast(
                sizes.select(
                    F.col(source_col).alias("source_b"),
                    F.col("n_grams").alias("n_b"),
                )
            ),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "n_common",
            "n_a",
            "n_b",
            (
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )
