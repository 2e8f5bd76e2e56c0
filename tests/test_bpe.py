"""Real BPE tokenizer (operators/bpe.py): train + distributed encode."""

from __future__ import annotations

import pytest

from mission_data_pipeline_spark.operators.bpe import (
    DEFAULT_MERGES,
    bpe_apply,
    bpe_encode_words,
    bpe_token_stats,
    bpe_train,
    bpe_vocab_frequency,
)


def _ranks(merges):
    return {pair: i for i, pair in enumerate(merges)}


def test_bpe_apply_greedy_rank_order():
    r = _ranks(DEFAULT_MERGES)
    assert bpe_apply("the", r) == ["the"]
    assert bpe_apply("then", r) == ["the", "n"]
    # 'that' outranks assembling 'th'+'at' separately only via earlier
    # merges: t+h -> th (rank 0) fires before a+t (rank 8), then th+at
    assert bpe_apply("that", r) == ["that"]
    assert bpe_apply("standers", r) == ["st", "and", "ers"]
    assert bpe_apply("thinking", r) == ["th", "in", "k", "ing"]
    assert bpe_apply("xyz", r) == ["x", "y", "z"]
    assert bpe_apply("a", r) == ["a"]
    assert bpe_apply("", r) == []


def _naive_train(word_counts: dict[str, int], num_merges: int):
    """Independent reference: textbook BPE learner over a word-count
    dict (list-of-symbols representation, no dict-keying tricks)."""
    corpus = [(list(w), c) for w, c in word_counts.items()]
    merges = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for toks, c in corpus:
            for a, b in zip(toks, toks[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + c
        if not counts:
            break
        pair = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(pair)
        new_corpus = []
        for toks, c in corpus:
            out, i = [], 0
            while i < len(toks):
                if (
                    i + 1 < len(toks)
                    and (toks[i], toks[i + 1]) == pair
                ):
                    out.append(toks[i] + toks[i + 1])
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            new_corpus.append((out, c))
        corpus = new_corpus
    return merges


def test_bpe_train_matches_independent_reference(spark):
    texts = [
        "the cat sat on the mat",
        "then the thin cat ran",
        "standing cats stand in the sand",
        "that thing is the thing that sings",
    ] * 3
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = bpe_train(docs, num_merges=12)
    wc: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    expected = _naive_train(wc, 12)
    assert got == expected
    # learned merges are usable by the encoder
    enc = bpe_apply("standing", _ranks(got))
    assert "".join(enc) == "standing"


def test_bpe_encode_words_memoized_dataframe(spark):
    words = spark.createDataFrame(
        [("the",), ("then",), ("standers",), ("the",)], "word string"
    )
    rows = bpe_encode_words(words).collect()
    by_word = {}
    for r in rows:
        by_word.setdefault(r["word"], []).append(r)
    assert [r["tokens"] for r in by_word["the"]] == [["the"], ["the"]]
    assert by_word["standers"][0]["tokens"] == ["st", "and", "ers"]
    assert by_word["then"][0]["n_tokens"] == 2


def test_bpe_token_stats_and_vocab(spark):
    docs = spark.createDataFrame(
        [
            (0, "The cat, the hat!"),
            (1, "THEN... then"),
            (2, "123 %%%"),  # no alpha words -> absent from output
        ],
        "doc_id long, text string",
    )
    stats = {r["doc_id"]: r for r in bpe_token_stats(docs).collect()}
    # doc 0: the(1) cat(c+at=2) the(1) hat(h+at=2) = 4 words, 6 tokens
    assert stats[0]["n_words"] == 4 and stats[0]["n_tokens"] == 6
    # doc 1: then(2) then(2) = 2 words, 4 tokens
    assert stats[1]["n_words"] == 2 and stats[1]["n_tokens"] == 4
    assert 2 not in stats

    vocab = bpe_vocab_frequency(docs, top_n=3).collect()
    assert vocab[0]["token"] == "the" and vocab[0]["freq"] == 4
    # deterministic tie-break by token name
    freqs = [r["freq"] for r in vocab]
    assert freqs == sorted(freqs, reverse=True)


def test_bpe_encode_plan_touches_only_distinct_words(spark):
    """The Arrow/Python stage must sit on the DISTINCT word table: the
    plan below the mapInPandas node contains the deduplicating
    aggregate, so encode cost scales with vocabulary, not corpus."""
    docs = spark.createDataFrame(
        [(i, "the the the cat") for i in range(50)],
        "doc_id long, text string",
    )
    plan = bpe_token_stats(docs)._jdf.queryExecution().optimizedPlan().toString()
    assert "mapInPandas" in plan or "MapInPandas" in plan
    pos_map = plan.find("MapInPandas")
    pos_agg = plan.find("Aggregate", pos_map)
    assert pos_agg != -1, plan  # distinct aggregate feeds the Python stage
