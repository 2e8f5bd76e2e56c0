"""Real byte-pair-encoding tokenizer: distributed train + encode.

The token budget of a training corpus is a first-class quantity in an
LLM data pipeline (mixture weighting, packing, cost estimation), and a
real BPE segmentation — not a whitespace proxy — is what determines
it. This module implements the classic BPE algorithm (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units"):

- :func:`bpe_train` — learn a merge table from the corpus. The word
  FREQUENCY table is computed distributed (explode → groupBy); the
  iterative pair-merge learning runs driver-side on the collected
  word-frequency dict, which is model-sized by construction (bounded
  ``max_words`` — the same train-on-a-bounded-sample shape as KMeans
  centroids in operators/similarity.py; HF/SentencePiece trainers work
  from exactly this word-count dict too).
- :func:`bpe_encode_words` / :func:`bpe_token_stats` /
  :func:`bpe_vocab_frequency` — apply a merge table. Scale shape:
  encoding cost is proportional to DISTINCT words, not corpus tokens —
  the corpus explodes to words, aggregates to (word, count) pairs,
  each distinct word is encoded ONCE inside an Arrow batch (with a
  per-batch memo), and results join back by word hash. At 100 TB the
  distinct-word table is orders of magnitude smaller than the corpus
  and the expensive Python step never touches the full token stream.

Apply semantics (identical in the SQL oracles, which replay them as a
recursive CTE): repeatedly find the adjacent token pair with the
LOWEST merge rank and fuse every non-overlapping occurrence
left-to-right, until no adjacent pair is in the merge table.

The reference pipeline (northflowlabs/mission-data-pipeline) has no
text tooling; this is part of the beyond-reference X4 text family.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

__all__ = [
    "DEFAULT_MERGES",
    "bpe_apply",
    "bpe_train",
    "bpe_encode_words",
    "bpe_token_stats",
    "bpe_vocab_frequency",
]

#: A small fixed English merge table (rank = list position) used by the
#: oracle-paired queries: every merge's sides are themselves reachable
#: (chars or earlier merges), as a trained table's would be.
DEFAULT_MERGES: tuple[tuple[str, str], ...] = (
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d"),
    ("e", "r"), ("o", "n"), ("r", "e"), ("a", "t"), ("e", "n"),
    ("o", "r"), ("e", "s"), ("t", "i"), ("s", "t"), ("l", "e"),
    ("in", "g"), ("th", "at"), ("er", "s"), ("o", "u"), ("a", "r"),
)


def bpe_apply(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy rank-order BPE segmentation of one word (pure function)."""
    toks = list(word)
    while len(toks) > 1:
        best_rank = None
        for i in range(len(toks) - 1):
            r = ranks.get((toks[i], toks[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
        if best_rank is None:
            break
        left, right = None, None
        for pair, r in ranks.items():
            if r == best_rank:
                left, right = pair
                break
        merged, out, i = left + right, [], 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == left and toks[i + 1] == right:
                out.append(merged)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out
    return toks


def _word_table(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, word) rows: lowercase alpha runs — the same
    pre-tokenization the SQL oracles express as
    ``string_split_regex(lower(text), '[^a-z]+')`` + empty filter."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.split(F.lower(F.col(text_col)), "[^a-z]+")
            ).alias("word"),
        )
        .filter(F.length("word") > 0)
    )


def bpe_train(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_merges: int = 100,
    max_words: int = 100_000,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus.

    Distributed part: word frequencies via explode → groupBy → top
    ``max_words`` by (count desc, word) — a bounded, model-sized
    collect. Driver part: classic pair-count/merge loop over the word
    dict; ties break on (count desc, pair lexicographic) so the table
    is deterministic for any corpus partitioning."""
    wc = (
        _word_table(docs, text_col, id_col)
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "word")
        .limit(max_words)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {
        tuple(r["word"]): r["cnt"] for r in wc
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for toks, cnt in vocab.items():
            for i in range(len(toks) - 1):
                pairs[toks[i], toks[i + 1]] = (
                    pairs.get((toks[i], toks[i + 1]), 0) + cnt
                )
        if not pairs:
            break
        (left, right), _cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merges.append((left, right))
        merged = left + right
        nxt: dict[tuple[str, ...], int] = {}
        for toks, cnt in vocab.items():
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == left and toks[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            key = tuple(out)
            nxt[key] = nxt.get(key, 0) + cnt
        vocab = nxt
    return merges


#: Per-distinct-word encoding — output of :func:`bpe_encode_words`.
_ENCODED_SCHEMA = T.StructType(
    [
        T.StructField("word", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.StringType()), False),
        T.StructField("n_tokens", T.IntegerType(), False),
    ]
)


def bpe_encode_words(
    words: DataFrame,
    merges: tuple[tuple[str, str], ...] | list[tuple[str, str]] = DEFAULT_MERGES,
    *,
    word_col: str = "word",
) -> DataFrame:
    """Encode each row's word → (word, tokens, n_tokens) with a
    per-batch memo (real corpora repeat words heavily even after
    distinct-by-partition). Arrow batches via ``mapInPandas``."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    cols = words.select(F.col(word_col).alias("word"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            toks_col = []
            for w in pdf["word"]:
                t = memo.get(w)
                if t is None:
                    t = bpe_apply(w, ranks)
                    memo[w] = t
                toks_col.append(t)
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "tokens": toks_col,
                    "n_tokens": [len(t) for t in toks_col],
                }
            )

    return cols.mapInPandas(run, schema=_ENCODED_SCHEMA)


def bpe_token_sequences(
    docs: DataFrame,
    merges: tuple[tuple[str, str], ...] | list[tuple[str, str]] = DEFAULT_MERGES,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Full per-document BPE token sequence in word order:
    ``(doc_id, toks array<string>)`` — the input shape for
    token-granularity span operators (ExactSubstr dedup over BPE ids,
    Lee et al. 2022 §4.1 run their dedup at exactly this granularity).

    Plan shape: ``posexplode`` the word split (positions pin word
    order), encode the DISTINCT vocabulary once (Arrow-batched,
    memoized — the Python step never touches the corpus-sized stream),
    join back on word, and flatten each doc's (wpos, tokens) structs in
    position order. One word-keyed join plus one doc-keyed partial agg;
    docs with zero alphabetic words yield no row (they have no token
    sequence — callers' ``>= k`` eligibility filters drop them anyway).
    """
    words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.split(F.lower(F.col(text_col)), "[^a-z]+")
        ).alias("wpos", "word"),
    ).filter(F.length("word") > 0)
    encoded = bpe_encode_words(
        words.select("word").distinct(), merges
    ).select("word", "tokens")
    return (
        words.join(encoded, "word")
        .groupBy("doc_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("wpos", "tokens"))
                    ),
                    lambda s: s["tokens"],
                )
            ).alias("toks")
        )
    )


def bpe_token_stats(
    docs: DataFrame,
    merges: tuple[tuple[str, str], ...] | list[tuple[str, str]] = DEFAULT_MERGES,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document token accounting under a real BPE segmentation:
    ``(doc_id, n_words, n_tokens)``.

    Plan shape: explode → (doc, word) counts → DISTINCT words encoded
    once (`bpe_encode_words`) → broadcast-or-hash join back on word →
    one aggregation. The Python encode step touches only the distinct
    vocabulary; everything corpus-sized stays JVM-side."""
    dw = _word_table(docs, text_col, id_col)
    per_doc_word = dw.groupBy("doc_id", "word").agg(
        F.count("*").alias("occurrences")
    )
    encoded = bpe_encode_words(
        per_doc_word.select("word").distinct(), merges
    ).select("word", "n_tokens")
    return (
        per_doc_word.join(encoded, "word")
        .groupBy("doc_id")
        .agg(
            F.sum("occurrences").cast("long").alias("n_words"),
            F.sum(F.col("occurrences") * F.col("n_tokens"))
            .cast("long")
            .alias("n_tokens"),
        )
    )


def bpe_vocab_frequency(
    docs: DataFrame,
    merges: tuple[tuple[str, str], ...] | list[tuple[str, str]] = DEFAULT_MERGES,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 25,
) -> DataFrame:
    """Corpus-level token frequencies under the BPE segmentation:
    top-``top_n`` ``(token, freq)`` — the vocabulary histogram a
    tokenizer-coverage audit reads. Distinct words encode once; token
    explosion happens on the distinct-word table (vocabulary-sized),
    then frequencies weight by word counts."""
    wc = (
        _word_table(docs, text_col, id_col)
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    encoded = bpe_encode_words(wc.select("word"), merges)
    return (
        wc.join(encoded, "word")
        .select("cnt", F.explode("tokens").alias("token"))
        .groupBy("token")
        .agg(F.sum("cnt").cast("long").alias("freq"))
        .orderBy(F.col("freq").desc(), "token")
        .limit(top_n)
    )
