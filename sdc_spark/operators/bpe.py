"""Byte-pair-encoding subword tokenizer, Spark-first.

The reference ships only regex token *counting*; real training pipelines
need the actual subword vocabulary. The classic BPE formulation (Sennrich
et al. 2016, "Neural Machine Translation of Rare Words with Subword
Units") trains on the WORD-FREQUENCY table, not the raw corpus — and that
is exactly what makes it Spark-friendly at 100 TB:

1. the corpus is scanned ONCE for a word-count aggregate (map-side
   combined; the shuffle carries (word, count) partials, never text);
2. the count table is truncated to the top ``max_words`` words by
   frequency (deterministic tie-break) — at web scale the top 50k words
   cover >99.9% of token mass, and the tail adds merges no corpus-level
   signal supports;
3. merge learning runs driver-side over that bounded dict (the standard
   incremental pair-count algorithm — O(merges · touched-words), seconds
   for 50k words / 1k merges) — this is a TINY-MODEL fit, like the IVF
   codebook: the data-parallel part is the aggregate, the model part is
   broadcast-sized by construction;
4. tokenization applies the learned merge ranks per word in an
   Arrow-batched pandas UDF with an LRU word cache (Zipf makes the cache
   hit rate ~= the top-words mass share), embarrassingly parallel.

Determinism: ties in pair frequency break on the lexicographically
smallest pair; word truncation ties break on the word string. Same corpus
-> same vocabulary, bit-identical, any partitioning.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sdc_spark.operators.dedup import normalized_text

EOW = "</w>"  # end-of-word marker, per the original BPE formulation


def word_counts(df: DataFrame, text_col: str, max_words: int = 50000) -> DataFrame:
    """Top-``max_words`` (word, n) by frequency, deterministic tie-break.
    One corpus scan, partial-aggregated; the result is the entire training
    input for merge learning."""
    return (
        df.select(F.explode(F.split(normalized_text(F.col(text_col)), " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "w")
        .limit(max_words)
    )


def learn_merges(counts: list[tuple[str, int]], num_merges: int = 200) -> list[tuple[str, str]]:
    """Classic BPE merge learning over a (word, count) list — incremental
    pair-count maintenance, deterministic argmax (count desc, pair asc).
    Pure driver-side model fit on the broadcast-sized dict."""
    words: list[list[str]] = [list(w) + [EOW] for w, _ in counts]
    freqs = [n for _, n in counts]
    pair_n: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for i, syms in enumerate(words):
        f = freqs[i]
        for a, b in zip(syms, syms[1:]):
            pair_n[(a, b)] = pair_n.get((a, b), 0) + f
            pair_words.setdefault((a, b), set()).add(i)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_n:
            break
        best = min(pair_n.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_n[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        for i in list(pair_words.get(best, ())):
            syms, f = words[i], freqs[i]
            # remove old pair contributions of this word, re-add after merge
            for a, b in zip(syms, syms[1:]):
                pair_n[(a, b)] -= f
                if pair_n[(a, b)] <= 0:
                    pair_n.pop((a, b), None)
                ws = pair_words.get((a, b))
                if ws is not None:
                    ws.discard(i)
                    if not ws:
                        pair_words.pop((a, b), None)
            out: list[str] = []
            j = 0
            while j < len(syms):
                if j + 1 < len(syms) and (syms[j], syms[j + 1]) == best:
                    out.append(merged)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = out
            for a, b in zip(out, out[1:]):
                pair_n[(a, b)] = pair_n.get((a, b), 0) + f
                pair_words.setdefault((a, b), set()).add(i)
    return merges


def train_bpe(
    df: DataFrame, text_col: str, num_merges: int = 200, max_words: int = 50000
) -> list[tuple[str, str]]:
    """End-to-end training: distributed word count -> driver-side merge
    learning. Returns the ordered merge list (the model)."""
    counts = [(r["w"], r["n"]) for r in word_counts(df, text_col, max_words).collect()]
    return learn_merges(counts, num_merges)


def bpe_tokenize(
    df: DataFrame,
    text_col: str,
    id_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Apply learned merges to every document — (id, tokens array<string>,
    n_tokens). Arrow-batched mapInPandas; the merge table rides the task
    closure (KBs). Per-word memoization exploits the Zipf distribution —
    the hot vocabulary tokenizes once per executor, not once per
    occurrence."""
    import pandas as pd

    ranks = {pair: i for i, pair in enumerate(merges)}
    out_schema = f"{id_col} long, tokens array<string>, n_tokens int"
    norm = df.select(
        F.col(id_col), F.split(normalized_text(F.col(text_col)), " ").alias("words")
    )

    def _encode_batches(it):
        @lru_cache(maxsize=65536)
        def encode_word(w: str) -> tuple[str, ...]:
            syms = list(w) + [EOW]
            while len(syms) > 1:
                cand = [
                    (ranks[(a, b)], j)
                    for j, (a, b) in enumerate(zip(syms, syms[1:]))
                    if (a, b) in ranks
                ]
                if not cand:
                    break
                _, j = min(cand)
                syms[j : j + 2] = [syms[j] + syms[j + 1]]
            return tuple(syms)

        for pdf in it:
            toks = [
                [t for w in ws if w for t in encode_word(w)]
                for ws in pdf["words"]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "tokens": toks,
                    "n_tokens": [len(t) for t in toks],
                }
            )

    return norm.mapInPandas(_encode_batches, out_schema)
