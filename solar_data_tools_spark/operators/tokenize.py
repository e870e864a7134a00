"""Byte-pair-encoding tokenization: train on a bounded seeded sample,
apply distributed. Token counts are the currency of every pretraining
pipeline stage downstream of text cleaning — budget mixing, sequence
packing, shard sizing, dedup normalization — and a whitespace proxy
over- or under-counts by 1.3-2x depending on language, so an engine
claiming "N tokens of source X" needs the real subword algorithm
(Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
Subword Units"; the GPT-2 merge-ranks application scheme).

Design:

* **Training is driver-side on a seeded-hash-bottom sample**
  (:func:`train_bpe_merges`) — the same determinism contract as the
  IVF/PQ trainers: the sample is a pseudorandom, partitioning-invariant
  subset, and the learned merge list is a pure function of (corpus
  keys, seed, n_merges). Tokenizer training on a corpus subsample is
  standard practice (production tokenizers train once on ~10^6-10^8
  words, far below corpus scale); the sequential greedy merge loop is
  not distributable without changing the algorithm's output.
* **Application is distributed** (:func:`bpe_encode`): the merge-rank
  table broadcasts inside an Arrow-batched ``mapInPandas`` closure with
  a per-batch word memo (Zipf's law makes the cache hit rate ~95%+ on
  natural text). Encoding is embarrassingly row-parallel — zero
  shuffle, stream-legal.

Certification: the apply loop is not ANSI-SQL-expressible (per-word
iterative merging), so the registry query is rows-only; correctness is
carried by a pure-Python reference parity test, canonical-example
goldens, a decode round-trip property (detokenize == normalized input),
and partitioning invariance (`tests/test_tokenize.py`).
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"  # end-of-word sentinel: merges can't cross word boundaries


def _norm_words(text: str) -> list[str]:
    # input is already normalize_text output (lower + ASCII-\s collapse
    # to single spaces); split on the ASCII space DELIMITER, not
    # Python's str.split() — the latter also splits on Unicode
    # whitespace (\xa0,  , ...) that Java \s+ deliberately left
    # inside words, so the two would segment differently and the q181
    # oracle (string_split on ' ') could never match (r11 review)
    return [w for w in text.lower().split(" ") if w]


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Classic BPE apply: start from characters (+ end sentinel), repeatedly
    merge the adjacent pair with the LOWEST merge rank until none remain.
    Pure function — the executor-side kernel and the test reference."""
    symbols = list(word) + [END]
    while len(symbols) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(symbols) - 1):
            r = ranks.get((symbols[i], symbols[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        symbols[best_i : best_i + 2] = [
            symbols[best_i] + symbols[best_i + 1]
        ]
    return symbols


def train_bpe_merges(
    docs: DataFrame,
    n_merges: int = 200,
    sample_cap: int = 65536,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
) -> list[tuple[str, str]]:
    """Greedy BPE training (Sennrich et al. 2016) over the word-frequency
    table of a seeded-hash-bottom document sample. Deterministic: ties on
    pair count break to the lexicographically smallest pair, so the merge
    list is a pure function of the sampled text. Returns up to
    ``n_merges`` (left, right) merges, rank = list position."""
    from solar_data_tools_spark.operators.dedup import normalize_text
    from solar_data_tools_spark.operators.sampling import hash_uniform

    sample = (
        docs.select(
            F.col(id_col), normalize_text(F.col(text_col)).alias("_t")
        )
        .orderBy(hash_uniform(F.col(id_col), seed), F.col(id_col))
        .limit(sample_cap)
        .toPandas()
    )
    freqs: Counter[tuple[str, ...]] = Counter()
    for t in sample["_t"]:
        for w in _norm_words(t):
            if w:
                freqs[tuple(w) + (END,)] += 1
    words = dict(freqs)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: Counter[tuple[str, str]] = Counter()
        for sym, n in words.items():
            for i in range(len(sym) - 1):
                pair_counts[(sym[i], sym[i + 1])] += n
        if not pair_counts:
            break
        top = max(pair_counts.values())
        best = min(p for p, n in pair_counts.items() if n == top)
        merges.append(best)
        merged = best[0] + best[1]
        new_words: dict[tuple[str, ...], int] = {}
        for sym, n in words.items():
            out: list[str] = []
            i = 0
            while i < len(sym):
                if (
                    i + 1 < len(sym)
                    and sym[i] == best[0]
                    and sym[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + n
        words = new_words
    return merges


def bpe_vocab(merges: list[tuple[str, str]]) -> list[str]:
    """The subword vocabulary implied by a merge list (merge outputs in
    rank order; single characters are the implicit base alphabet)."""
    return [a + b for a, b in merges]


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Distributed BPE application: Arrow-batched ``mapInPandas`` with the
    merge-rank dict in the task closure and a per-batch word memo.
    Output: (id_col, tokens array<string>, n_tokens). Zero shuffle —
    the scored corpus never moves; stream-legal (stateless narrow op)."""
    import pandas as pd

    from solar_data_tools_spark.shipping import ensure_package_on_executors

    ensure_package_on_executors(docs.sparkSession)
    ranks = {pair: i for i, pair in enumerate(merges)}

    def _encode(batches):
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            toks = []
            counts = []
            for text in pdf["_t"]:
                out: list[str] = []
                for w in _norm_words(text):
                    got = memo.get(w)
                    if got is None:
                        got = encode_word(w, ranks)
                        memo[w] = got
                    out.extend(got)
                toks.append(out)
                counts.append(len(out))
            yield pd.DataFrame(
                {"_id": pdf["_id"], "tokens": toks, "n_tokens": counts}
            )

    from solar_data_tools_spark.operators.dedup import normalize_text

    prepared = docs.select(
        F.col(id_col).alias("_id"),
        normalize_text(F.col(text_col)).alias("_t"),
    )
    # derive the id type from the input so non-long doc ids (e.g.
    # string WARC record ids) pass through unchanged
    id_type = dict(docs.select(id_col).dtypes)[id_col]
    out = prepared.mapInPandas(
        _encode,
        schema=f"_id {id_type}, tokens array<string>, n_tokens long",
    )
    return out.select(
        F.col("_id").alias(id_col), "tokens", "n_tokens"
    )
