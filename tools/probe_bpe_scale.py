#!/usr/bin/env python
"""Probe: BPE APPLY at a production-size merge table (VERDICT r11 item
4). q181 certifies the merge-loop SEMANTICS with a pinned 40-merge
list; this probe measures the distributed apply path
(``tokenize.bpe_encode`` — memoized mapInPandas, zero shuffle) at
30k-50k merges over ~1M docs, the size a real tokenizer carries.

Corpus: Zipf-sampled words from a synthetic lexicon (default 60k
distinct words, exponent-1 inverse-CDF on a per-(doc,pos) hash — fully
deterministic). Merge table: the frequency-ordered left-to-right merge
chains of the lexicon's words, truncated at --merges — the structure a
trained table has (frequent words merge to single tokens; rare words
stay multi-token), without paying the O(merges x vocab) greedy
training loop, which is not what this probe measures.

Reports, as JSON:
  * wall seconds for the REAL ``bpe_encode`` at --merges and at a
    200-merge control on the SAME corpus (isolates |merges| scaling
    from corpus costs);
  * memo hit rate measured inside an instrumented copy of the kernel
    loop (same ``encode_word``, same per-task memo discipline) — the
    Zipf hit rate is the whole reason apply is I/O-bound;
  * tokens/sec and docs/sec at the big table.

Usage:
    python tools/probe_bpe_scale.py --docs 1000000 --merges 50000
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import os

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402


def build_lexicon(n_words: int) -> list[str]:
    """Deterministic pseudo-natural lexicon: lowercase words, lengths
    3-12, letters from a multiplicative hash of (word_ix, pos)."""
    words = []
    seen = set()
    i = 0
    while len(words) < n_words:
        h = (i * 2654435761) & 0xFFFFFFFF
        length = 3 + (h % 10)
        chars = []
        for p in range(length):
            hp = ((i * 40503 + p * 2654435761 + 17) ^ (i >> 3)) & 0xFFFFFFFF
            chars.append(chr(ord("a") + (hp % 26)))
        w = "".join(chars)
        if w not in seen:
            seen.add(w)
            words.append(w)
        i += 1
    return words


def chain_merges(lexicon: list[str], n_merges: int) -> list:
    """Frequency-ordered left-to-right merge chains: word i (more
    frequent = lower i under Zipf) contributes (c0+c1), (c0c1+c2), ...
    plus the final +END merge — the shape of a trained table."""
    from solar_data_tools_spark.operators.tokenize import END

    merges = []
    seen = set()
    for w in lexicon:
        acc = w[0]
        for c in w[1:]:
            pair = (acc, c)
            if pair not in seen:
                seen.add(pair)
                merges.append(pair)
                if len(merges) >= n_merges:
                    return merges
            acc += c
        pair = (acc, END)
        if pair not in seen:
            seen.add(pair)
            merges.append(pair)
            if len(merges) >= n_merges:
                return merges
    return merges


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--merges", type=int, default=50_000)
    ap.add_argument("--lexicon", type=int, default=60_000)
    ap.add_argument("--doc-len", type=int, default=60)
    args = ap.parse_args()

    from solar_data_tools_spark.operators import tokenize as tkz
    from solar_data_tools_spark.session import get_spark
    from solar_data_tools_spark.shipping import (
        ensure_package_on_executors,
    )

    spark = get_spark(app_name="sdt-bpe-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    ensure_package_on_executors(spark)

    lex = build_lexicon(args.lexicon)
    merges = chain_merges(lex, args.merges)
    print(
        f"lexicon {len(lex)} words, merge table {len(merges)} entries",
        file=sys.stderr, flush=True,
    )

    # Zipf(1) inverse-CDF over the lexicon via a per-(doc,pos) integer
    # hash: ix = floor(N^u) - 1 biases low indices ~1/x — the word
    # distribution that gives BPE apply its real memo hit rate. The
    # lexicon is too big for an inline array literal (60k strings blow
    # codegen budgets), so text assembly is an Arrow-batched numpy
    # kernel with the lexicon in the closure; deterministic (pure
    # function of doc_id), and localCheckpoint keeps generation out of
    # every timing below.
    import numpy as np
    import pandas as pd

    lex_arr = np.array(lex)
    n = len(lex)
    dl = args.doc_len

    def _gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.uint64)
            pos = np.arange(dl, dtype=np.uint64)
            h = (ids[:, None] * np.uint64(dl) + pos[None, :]) * np.uint64(
                2654435761
            )
            h ^= h >> np.uint64(16)
            h *= np.uint64(0x45D9F3B)
            h ^= h >> np.uint64(16)
            u = (h % np.uint64(1_000_000)).astype(np.float64) / 1e6
            ix = np.minimum(
                np.power(float(n), u).astype(np.int64), n
            ) - 1
            words = lex_arr[ix]
            texts = [" ".join(row) for row in words]
            yield pd.DataFrame({"doc_id": pdf["id"], "text": texts})

    docs = spark.range(args.docs).mapInPandas(
        _gen, schema="doc_id long, text string"
    )
    docs = docs.localCheckpoint(eager=True)  # generation out of timings

    timings: dict[str, float] = {}
    stats: dict[str, float] = {}

    for label, table in (("apply_200", merges[:200]),
                         (f"apply_{len(merges)}", merges)):
        t0 = time.perf_counter()
        out = tkz.bpe_encode(docs, table)
        total_tokens = out.agg(F.sum("n_tokens")).collect()[0][0]
        timings[label] = round(time.perf_counter() - t0, 2)
        stats[f"{label}_tokens"] = int(total_tokens)
        print(f"  {label}: {timings[label]} s, {total_tokens} tokens",
              file=sys.stderr, flush=True)

    # instrumented pass: same encode_word + per-task memo discipline,
    # counting hits/misses (the real kernel, plus two counters)
    import pandas as pd

    ranks = {pair: i for i, pair in enumerate(merges)}

    def _instrumented(batches):
        memo: dict = {}
        hits = misses = 0
        for pdf in batches:
            for text in pdf["_t"]:
                for w in tkz._norm_words(text):
                    if w in memo:
                        hits += 1
                    else:
                        misses += 1
                        memo[w] = tkz.encode_word(w, ranks)
        yield pd.DataFrame({"hits": [hits], "misses": [misses]})

    from solar_data_tools_spark.operators.dedup import normalize_text

    prepared = docs.select(normalize_text(F.col("text")).alias("_t"))
    t0 = time.perf_counter()
    agg = (
        prepared.mapInPandas(
            _instrumented, schema="hits long, misses long"
        )
        .agg(F.sum("hits").alias("h"), F.sum("misses").alias("m"))
        .collect()[0]
    )
    timings["instrumented"] = round(time.perf_counter() - t0, 2)
    stats["memo_hit_rate"] = round(agg["h"] / (agg["h"] + agg["m"]), 4)
    stats["distinct_word_encodes"] = int(agg["m"])

    big = f"apply_{len(merges)}"
    print(json.dumps({
        "probe": "bpe_scale",
        "docs": args.docs,
        "merges": len(merges),
        "timings_sec": timings,
        "stats": stats,
        "docs_per_sec": round(args.docs / timings[big], 0),
        "tokens_per_sec": round(stats[f"{big}_tokens"] / timings[big], 0),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
