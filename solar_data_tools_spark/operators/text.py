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
