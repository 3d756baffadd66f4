"""Byte-pair-encoding tokenizer ops for training-data pipelines.

Beyond-reference operators (task mandate: the engine feeds a tokenized
training corpus — BASELINE.json north_star reads "10^12 pre-tokenized
training sequences"). Two halves:

- :func:`bpe_train` — learn a merge table from a corpus. Scale design:
  ONE distributed shuffle builds the word histogram (``explode`` →
  ``groupBy(word).count()``), optionally truncated to the top-K words
  (Zipf: top 50k words cover ~95+% of running text), and the classic
  driver-side merge loop (Sennrich et al. 2016, "Neural Machine
  Translation of Rare Words with Subword Units") runs over that small
  histogram — the corpus itself is touched exactly once, and never
  again per merge. This mirrors the sampled-codebook pattern used by
  IVF training (simsearch.ivf_train_centroids): bounded driver state,
  deterministic output.

- :func:`bpe_apply` — tokenize text with a fixed merge table. The
  ranks dict is closure-broadcast into an Arrow-batched pandas UDF;
  within each batch every DISTINCT word is encoded once (per-batch
  memo), so the per-row cost on natural text is a dict hit. No
  shuffle, partition-preserving — the 100 TB plan is "map-only".

Greedy application semantics (true BPE): repeatedly merge the
lowest-rank adjacent pair anywhere in the word, leftmost occurrence
first on rank ties, until no adjacent pair is a known merge. Because a
learned merge's operands always predate it (lower rank), this is also
what sequential full passes in rank order would produce — but we
implement the priority form directly so hand-written merge tables with
exotic rank orders (unit tests, the DuckDB oracle) agree too.

Pre-tokenization: ``[a-z0-9]+`` runs of lowercased text (word
boundaries are hard token boundaries — merges never cross them).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import ArrayType, IntegerType, StringType

_WORD_RE = re.compile(r"[a-z0-9]+")

# words longer than this are split into fixed chunks before BPE so a
# single adversarial megaword can't make the merge loop O(len^2) huge
_MAX_WORD = 256


def pretokenize(text_col) -> Column:
    """Lowercased ``[a-z0-9]+`` word runs as array<string> (the shared
    pre-tokenizer for train and apply — both sides and the DuckDB
    oracle mirror this exactly)."""
    c = text_col if isinstance(text_col, Column) else F.col(text_col)
    toks = F.regexp_extract_all(F.lower(c), F.lit("[a-z0-9]+"), F.lit(0))
    return F.coalesce(toks, F.array().cast("array<string>"))


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE for one word: merge the lowest-rank adjacent pair
    (leftmost on ties) until no pair has a rank."""
    toks = list(word)
    while len(toks) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(toks) - 1):
            r = ranks.get((toks[i], toks[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        toks[best_i: best_i + 2] = [toks[best_i] + toks[best_i + 1]]
    return toks


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 100,
    max_vocab_words: int = 50_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a corpus.

    One shuffle: word histogram, truncated to the ``max_vocab_words``
    most frequent words (ties broken by word for determinism) so the
    driver-side state is bounded regardless of corpus size. The merge
    loop then runs on (word, count) pairs only. Deterministic: pair
    tie-breaks are (count desc, pair lexicographic asc).
    """
    hist = (
        df.select(F.explode(pretokenize(text_col)).alias("w"))
        .groupBy("w").count()
        .orderBy(F.col("count").desc(), F.col("w"))
        .limit(max_vocab_words)
        .collect()
    )
    # word → (symbol tuple, count)
    words: list[tuple[list[str], int]] = [
        (list(r["w"])[:_MAX_WORD], int(r["count"])) for r in hist
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for toks, cnt in words:
            for i in range(len(toks) - 1):
                p = (toks[i], toks[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + cnt
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < 2:
            break  # nothing left worth merging
        merges.append(best)
        joined = best[0] + best[1]
        for toks, _cnt in words:
            i = 0
            while i < len(toks) - 1:
                if toks[i] == best[0] and toks[i + 1] == best[1]:
                    toks[i: i + 2] = [joined]
                else:
                    i += 1
    return merges


def bpe_vocab(merges: list[tuple[str, str]]) -> dict[str, int]:
    """token → id. Ids 0-35 are the base alphabet a-z0-9; each merge
    appends its joined token in rank order (stable across runs)."""
    base = "abcdefghijklmnopqrstuvwxyz0123456789"
    vocab = {ch: i for i, ch in enumerate(base)}
    for l, r in merges:
        joined = l + r
        if joined not in vocab:
            vocab[joined] = len(vocab)
    return vocab


def bpe_apply(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    ids: bool = False,
) -> DataFrame:
    """Append ``out_col``: the greedy-BPE token stream of ``text_col``
    (array<string>, or array<int> vocab ids when ``ids=True``).

    Arrow-batched pandas UDF; the merge-rank dict rides the closure
    (serialized once per executor), and a per-batch word memo means
    each distinct word in a batch is encoded once. Map-only: no
    shuffle, no driver round-trip.
    """
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    vocab = bpe_vocab(merges) if ids else None

    @F.pandas_udf(ArrayType(IntegerType()) if ids else ArrayType(StringType()))
    def _tok(s):  # pragma: no cover — exercised via Spark
        import pandas as pd

        memo: dict[str, list] = {}
        out = []
        for text in s:
            if text is None:
                out.append([])
                continue
            toks: list = []
            for w in _WORD_RE.findall(text.lower()):
                got = memo.get(w)
                if got is None:
                    if len(w) > _MAX_WORD:
                        got = []
                        for j in range(0, len(w), _MAX_WORD):
                            got.extend(
                                _encode_word(w[j: j + _MAX_WORD], ranks)
                            )
                    else:
                        got = _encode_word(w, ranks)
                    if ids:
                        # pre-tokenizer guarantees every char is in the
                        # base alphabet, so lookups can't miss
                        got = [vocab[t] for t in got]
                    memo[w] = got
                toks.extend(got)
            out.append(toks)
        return pd.Series(out)

    return df.withColumn(out_col, _tok(F.col(text_col)))


def bpe_token_stats(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc BPE stats: (id_col, n_words, n_bpe, compression_permille)
    — the contract-query shape (NULL-free longs; permille avoids
    float-hash drift in the driver compare).

    compression_permille = 1000 * n_bpe / n_chars_in_words (how far the
    merge table compresses the character stream), -1 when no words.
    """
    toked = bpe_apply(df, merges, text_col=text_col, out_col="_bpe")
    n_chars = F.aggregate(
        pretokenize(text_col),
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.length(w),
    )
    return toked.select(
        F.col(id_col),
        F.size(pretokenize(text_col)).cast("long").alias("n_words"),
        F.size("_bpe").cast("long").alias("n_bpe"),
        F.when(n_chars > 0, (F.lit(1000) * F.size("_bpe")) / n_chars)
        .otherwise(F.lit(-1)).cast("long").alias("compression_permille"),
    )


def chunk_sequences(
    df: DataFrame,
    chunk_len: int,
    stride: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Context-window chunking with overlap — the striding pass that
    turns variable-length documents into fixed-length training/eval
    windows (the GPT-2 style sliding-window evaluation; stride =
    chunk_len gives disjoint packing-input chunks, stride < chunk_len
    gives overlapping windows).

    Chunks start at 0, stride, 2·stride, … while start < n_tokens;
    each carries up to ``chunk_len`` tokens. Returns one row per chunk:
    (id, chunk_idx, start, n_tok, chunk_text, is_tail) where is_tail
    marks windows truncated by the document end. Empty documents emit
    no chunks.

    Tokens are the same ``[a-z0-9]+`` pre-tokenization the BPE ops
    use, so chunk boundaries agree with :func:`bpe_apply` inputs.

    Pure Column: one sequence() + posexplode + slice — map-side only,
    no shuffle, no UDF; at 100 TB this is free width-work fused into
    the scan."""
    if stride is None:
        stride = chunk_len
    if chunk_len <= 0 or stride <= 0:
        raise ValueError("chunk_len and stride must be positive")
    words = pretokenize(text_col)
    n = F.size(words)
    # sequence() rejects 0→-1 with a positive step, so empty docs get
    # an explicit empty starts array (and thus emit no chunk rows)
    starts = F.when(n == 0, F.array().cast("array<int>")).otherwise(
        F.sequence(F.lit(0), n - 1, F.lit(stride))
    )
    d = df.select(
        F.col(id_col),
        words.alias("_w"),
        n.alias("_n"),
        F.posexplode(starts).alias("chunk_idx", "start"),
    )
    chunk = F.slice(F.col("_w"), F.col("start") + 1, chunk_len)
    return d.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("start").cast("long").alias("start"),
        F.size(chunk).cast("long").alias("n_tok"),
        F.array_join(chunk, " ").alias("chunk_text"),
        (F.col("start") + chunk_len > F.col("_n")).alias("is_tail"),
    )
