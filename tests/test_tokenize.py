"""BPE tokenizer ops (datapipe.tokenize): greedy semantics, training
determinism, Spark apply parity, contract-query shape."""

import pytest
from pyspark.sql import functions as F

from rsyslog_spark.datapipe.tokenize import (
    _encode_word,
    bpe_apply,
    bpe_token_stats,
    bpe_train,
    bpe_vocab,
    pretokenize,
)

MERGES = [
    ("t", "a"), ("ta", "b"), ("l", "e"), ("tab", "le"),
    ("r", "o"), ("ro", "w"), ("s", "t"), ("a", "st"), ("f", "ast"),
    ("u", "e"), ("a", "n"), ("o", "w"),
]
RANKS = {m: i for i, m in enumerate(MERGES)}


# ---------------- greedy merge loop ----------------

def test_encode_word_depth():
    # t a b l e -> ta b l e -> tab l e -> tab le -> table
    assert _encode_word("table", RANKS) == ["table"]


def test_encode_word_rank_priority():
    # "row": (r,o)@4 beats (o,w)@11 even though (o,w) is also present;
    # then (ro,w)@5 completes. "slow" has only (o,w).
    assert _encode_word("row", RANKS) == ["row"]
    assert _encode_word("slow", RANKS) == ["s", "l", "ow"]


def test_encode_word_no_merge_and_single():
    assert _encode_word("x", RANKS) == ["x"]
    assert _encode_word("zzz", RANKS) == ["z", "z", "z"]


def test_encode_word_leftmost_on_tie():
    # rank (a,n) applies leftmost-first on "anan" -> an an
    assert _encode_word("anan", RANKS) == ["an", "an"]


# ---------------- training ----------------

def _train_df(spark, rows):
    return spark.createDataFrame([(t,) for t in rows], "text string")


def test_bpe_train_sennrich_corpus(spark):
    # low x5, lower x2, newest x6 (Sennrich et al. 2016 shape):
    # pair counts round 1: (w,e)=8 wins; round 2: (l,o)=7; round 3 is a
    # 6-6-6-6 tie broken lexicographically -> ('e','we')
    df = _train_df(
        spark,
        ["low " * 5, "lower lower", "newest " * 6],
    )
    merges = bpe_train(df, n_merges=3)
    assert merges == [("w", "e"), ("l", "o"), ("e", "we")]


def test_bpe_train_deterministic_and_consistent(spark):
    df = _train_df(spark, ["the cat sat on the mat", "the bat and the cat"])
    m1 = bpe_train(df, n_merges=8)
    m2 = bpe_train(df, n_merges=8)
    assert m1 == m2
    # operand consistency: any multi-char operand was itself merged earlier
    seen = set("abcdefghijklmnopqrstuvwxyz0123456789")
    for l, r in m1:
        assert l in seen and r in seen
        seen.add(l + r)


def test_bpe_train_stops_when_dry(spark):
    df = _train_df(spark, ["ab ab"])
    merges = bpe_train(df, n_merges=50)
    assert merges == [("a", "b")]  # only one pair ever repeats


# ---------------- Spark apply ----------------

def test_bpe_apply_matches_encode_word(spark):
    df = spark.createDataFrame(
        [(1, "Table ROW fast!"), (2, ""), (3, None), (4, "slow want")],
        "id long, text string",
    )
    got = {
        r["id"]: r["toks"]
        for r in bpe_apply(df, MERGES, out_col="toks").collect()
    }
    assert got[1] == ["table", "row", "fast"]
    assert got[2] == [] and got[3] == []
    assert got[4] == ["s", "l", "ow", "w", "an", "t"]


def test_bpe_apply_ids(spark):
    df = spark.createDataFrame([(1, "table a z")], "id long, text string")
    vocab = bpe_vocab(MERGES)
    [r] = bpe_apply(df, MERGES, out_col="toks", ids=True).collect()
    assert r["toks"] == [vocab["table"], vocab["a"], vocab["z"]]
    # base alphabet occupies 0..35, merges appended in rank order
    assert vocab["a"] == 0 and vocab["z"] == 25
    assert vocab["ta"] == 36


def test_bpe_apply_megaword_bounded(spark):
    # a 10k-char word is chunked, not O(n^2)-looped
    df = spark.createDataFrame([(1, "a" * 10_000)], "id long, text string")
    [r] = bpe_apply(df, MERGES, out_col="toks").collect()
    assert len(r["toks"]) == 10_000  # no (a,a) merge -> all singles


def test_bpe_token_stats_shape(spark):
    df = spark.createDataFrame(
        [(1, "table table row"), (2, "")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in bpe_token_stats(df, MERGES).collect()}
    assert rows[1]["n_words"] == 3 and rows[1]["n_bpe"] == 3
    # chars = 5+5+3 = 13 -> 1000*3//13 = 230
    assert rows[1]["compression_permille"] == 230
    assert rows[2]["n_words"] == 0 and rows[2]["compression_permille"] == -1


def test_pretokenize_null_and_punct(spark):
    df = spark.createDataFrame([(None,), ("A-b c99 !",)], "text string")
    got = [r["w"] for r in df.select(pretokenize("text").alias("w")).collect()]
    assert got[0] == [] and got[1] == ["a", "b", "c99"]


def test_trained_merges_compress(spark):
    text = "streaming streaming streaming tables tables"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    merges = bpe_train(df, n_merges=20)
    out = bpe_token_stats(df, merges).collect()[0]
    assert out["n_bpe"] < sum(len(w) for w in text.split())
