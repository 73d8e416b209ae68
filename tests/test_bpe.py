"""Distributed BPE merge learning (operators/bpe) vs a driver-side
reference implementation, including the greedy leftmost-first merge
semantics and deterministic tie-breaking."""

from __future__ import annotations

from collections import Counter

import pytest

from lakeflow.operators.bpe import (
    apply_merge,
    learn_bpe,
    pair_counts,
    segment_words,
    symbolize,
    word_counts,
)


def ref_bpe(texts: list[str], n: int):
    wc = Counter(w for t in texts for w in t.split())
    words = {w: list(w) for w in wc}
    merges = []
    for _ in range(n):
        pc: Counter = Counter()
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += wc[w]
        if not pc:
            break
        (a, b), cnt = sorted(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]
        if cnt < 2:
            break
        merges.append((a, b))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges, words


TEXTS = [
    "low low low lower lower newest newest newest newest widest widest",
    "low lower newest widest widest newest",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(list(enumerate(TEXTS)), ["id", "text"])


def test_learn_bpe_matches_reference(spark, docs):
    merges, words = learn_bpe(docs, "text", 6)
    ref_merges, ref_words = ref_bpe(TEXTS, 6)
    assert merges == ref_merges
    got = {r.word: r.syms for r in words.collect()}
    assert got == ref_words


def test_learn_bpe_stops_when_no_pair_repeats(spark):
    df = spark.createDataFrame([(1, "ab cd ef")], ["id", "text"])
    merges, _ = learn_bpe(df, "text", 10)
    assert merges == []  # every pair count is 1 — below the repeat bar


def test_apply_merge_leftmost_first(spark):
    words = symbolize(
        spark.createDataFrame([("aaa", 1), ("aab", 1)], ["word", "n"])
    )
    got = {r.word: r.syms for r in apply_merge(words, "a", "a").collect()}
    assert got["aaa"] == ["aa", "a"]  # first two fuse, third survives
    assert got["aab"] == ["aa", "b"]


def test_segment_words_applies_learned_merges_to_new_words(spark, docs):
    merges, _ = learn_bpe(docs, "text", 6)
    new = spark.createDataFrame([("lowest", 1)], ["word", "n"])
    seg = {r.word: r.syms for r in segment_words(new, merges).collect()}
    # merges learned: es, est, lo, low, ew, ewest -> lowest = low|est
    assert seg["lowest"] == ["low", "est"]


def test_pair_counts_weighted_by_word_frequency(spark):
    df = spark.createDataFrame([(1, "ab ab ab cd")], ["id", "text"])
    pc = {
        (r.left, r.right): r.pair_count
        for r in pair_counts(symbolize(word_counts(df, "text"))).collect()
    }
    assert pc[("a", "b")] == 3
    assert pc[("c", "d")] == 1
