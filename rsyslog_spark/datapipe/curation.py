"""Corpus curation operators for LLM training-data pipelines.

The reference engine feeds SIEM/analytics sinks; a 100 TB log/text
corpus feeding model training needs the same pipeline plus the
standard curation passes published with C4 (Raffel et al. 2020,
"Exploring the Limits of Transfer Learning", §2.2) and Gopher (Rae et
al. 2021, A.1.1). This module adds them Spark-first:

* :func:`c4_line_filter` — per-document line cleaning (terminal
  punctuation, min words per line, banned substrings, within-doc
  line dedup) as pure Column array ops: no UDF, no shuffle, fully
  codegen'd — the 100 TB shape is "free" map work.
* :func:`global_line_dedup` — C4's cross-document duplicate-span
  removal at line granularity: explode → first-occurrence winner per
  line hash (one shuffle on the hash) → re-assemble documents in
  original line order. State is one row per DISTINCT line.
* :func:`pack_sequences` — greedy sequential packing of documents
  into fixed token budgets (training sequence packing). Documents
  are bucketed (hash) and packed in doc_id order within each bucket:
  the packing loop is per-bucket ``applyInPandas`` (inherently
  sequential per bin, embarrassingly parallel across buckets).
* :func:`corpus_mix` — deterministic mixture building: per-domain
  sampling rates and hard caps via a seeded arithmetic hash, so the
  same corpus + seed always yields the same mixture (replay-safe,
  and expressible in plain SQL for the oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "c4_line_filter",
    "global_line_dedup",
    "pack_sequences",
    "corpus_mix",
    "mix_hash",
    "dsir_weights",
    "dsir_select",
    "word_bucket",
    "ccnet_buckets",
]

#: C4's banned-substring list (lowercased match; §2.2: "javascript",
#: lorem ipsum, curly brace)
C4_BANNED = ("javascript", "lorem ipsum", "{")


def _kept_lines(
    text: Column,
    min_words_per_line: int,
    require_terminal_punct: bool,
    banned: tuple[str, ...],
    dedup_lines: bool,
) -> Column:
    lines = F.split(text, r"\n")

    def keep(ln: Column) -> Column:
        t = F.trim(ln)
        cond = F.lit(True)
        if require_terminal_punct:
            # terminal punctuation incl. closing quote (C4 §2.2)
            cond = cond & t.rlike(r'[.!?"”]$')
        if min_words_per_line > 0:
            cond = cond & (
                F.size(F.split(t, r"\s+")) >= min_words_per_line
            )
        low = F.lower(t)
        for b in banned:
            cond = cond & ~low.contains(b)
        return cond

    kept = F.filter(lines, keep)
    if dedup_lines:
        # array_distinct keeps FIRST occurrence order — exactly the
        # keep-first within-document dedup
        kept = F.array_distinct(kept)
    return kept


def c4_line_filter(
    df: DataFrame,
    text_col: str = "text",
    min_words_per_line: int = 3,
    min_lines: int = 3,
    require_terminal_punct: bool = True,
    banned: tuple[str, ...] = C4_BANNED,
    dedup_lines: bool = True,
) -> DataFrame:
    """C4-style per-document line cleaning (Raffel et al. 2020 §2.2).

    Adds ``clean_text`` (kept lines re-joined), ``n_lines_kept``,
    ``n_lines_dropped`` and ``keep_doc`` (≥ ``min_lines`` survive —
    C4 drops pages with too few sentences). Everything is Column
    array algebra over one split: predicate-pushable, zero Python.

    Divergence note: C4 filters SENTENCES of ≥5 words and pages of
    ≥3 sentences with langdetect; line granularity and the
    configurable thresholds here are the common open-source
    reimplementation shape (the sentence splitter is a tokenizer
    choice, not an engine operator)."""
    kept = _kept_lines(
        F.col(text_col), min_words_per_line, require_terminal_punct,
        tuple(banned), dedup_lines,
    )
    n_total = F.size(F.split(F.col(text_col), r"\n"))
    out = df.withColumns(
        {
            "_kept": kept,
        }
    )
    return (
        out.withColumn("clean_text", F.array_join(F.col("_kept"), "\n"))
        .withColumn("n_lines_kept", F.size(F.col("_kept")))
        .withColumn("n_lines_dropped", n_total - F.col("n_lines_kept"))
        .withColumn("keep_doc", F.col("n_lines_kept") >= min_lines)
        .drop("_kept")
    )


def global_line_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C4's cross-document duplicate-span removal, line granularity:
    every duplicated line keeps exactly ONE occurrence corpus-wide —
    the one in the smallest (doc_id, line_pos) — and all others are
    dropped; documents are re-assembled with their surviving lines in
    original order.

    100 TB shape: explode (narrow) → ONE shuffle keyed on the 64-bit
    line hash (window min over (doc_id, pos) — partial aggregation
    applies map-side) → winners re-grouped by doc. No joins against
    the corpus, no collect; skew on a mega-duplicated line is one
    hot key whose groups reduce to a single min — AQE splits it.
    Returns (id_col, clean_text, n_lines_kept, n_lines_dropped)."""
    lines = (
        df.select(
            F.col(id_col).alias("_id"),
            F.posexplode(F.split(F.col(text_col), r"\n")).alias(
                "_pos", "_line"
            ),
        )
        .withColumn("_h", F.xxhash64("_line"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("_h")
    winner = F.min(F.struct(F.col("_id"), F.col("_pos"))).over(w)
    kept = lines.withColumn("_win", winner).filter(
        (F.col("_win._id") == F.col("_id"))
        & (F.col("_win._pos") == F.col("_pos"))
    )
    return (
        kept.groupBy("_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(F.col("_pos"), F.col("_line"))
                        )
                    ),
                    lambda s: s["_line"],
                ),
                "\n",
            ).alias("clean_text"),
            F.count(F.lit(1)).alias("n_lines_kept"),
        )
        .join(
            df.select(
                F.col(id_col).alias("_id"),
                F.size(F.split(F.col(text_col), r"\n")).alias("_n"),
            ),
            "_id",
            "right",
        )
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_lines_kept", F.lit(0)).alias("n_lines_kept"),
            (F.col("_n") - F.coalesce("n_lines_kept", F.lit(0))).alias(
                "n_lines_dropped"
            ),
        )
    )


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    n_buckets: int = 64,
    bucket_expr: Column | None = None,
) -> DataFrame:
    """Greedy sequential sequence packing: within each of
    ``n_buckets`` hash buckets, documents are taken in ``id_col``
    order and appended to the current bin while it fits
    (fill + n ≤ max_tokens), else a new bin starts. A document larger
    than ``max_tokens`` occupies its own bin (callers chunk oversize
    docs upstream). Returns the input keys plus (bucket, bin_id,
    bin_fill) — bin_fill is the running fill AFTER placing the doc.

    Scale shape: packing is inherently sequential PER BIN, so the
    parallel unit is the bucket — ``applyInPandas`` over
    ``pmod(hash(id), n_buckets)`` groups, each group a sorted greedy
    scan (O(rows), no per-row Python beyond a numpy-backed loop). At
    100 TB raise n_buckets to ~10× the executor count; determinism
    holds because bucket assignment and intra-bucket order are both
    functions of the id."""
    import pandas as pd

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_bkt_id").reset_index(drop=True)
        fills, bins = [], []
        fill, b = 0, -1
        for n in pdf["_tok"].tolist():
            if b < 0 or fill + n > max_tokens:
                b += 1
                fill = 0
            fill += n
            bins.append(b)
            fills.append(fill)
        pdf["bin_id"] = pd.array(bins, dtype="int64")
        pdf["bin_fill"] = pd.array(fills, dtype="int64")
        return pdf

    if bucket_expr is None:
        # xxhash64 spreads adversarial id patterns; pass an explicit
        # bucket_expr when cross-engine reproducibility matters more
        bucket_expr = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets))
    prepared = df.select(
        F.col(id_col),
        F.col(tokens_col).cast("long").alias("_tok"),
        bucket_expr.cast("int").alias("bucket"),
        F.col(id_col).alias("_bkt_id"),
    )
    out_schema = (
        "{} {}, _tok long, bucket int, _bkt_id {}, bin_id long, "
        "bin_fill long"
    ).format(
        id_col,
        dict(prepared.dtypes)[id_col],
        dict(prepared.dtypes)["_bkt_id"],
    )
    return (
        prepared.groupBy("bucket")
        .applyInPandas(pack, out_schema)
        .select(
            id_col, "bucket", "bin_id", "bin_fill",
            F.col("_tok").alias("n_tokens"),
        )
    )


def mix_hash(id_col: Column, seed: int) -> Column:
    """Seeded deterministic per-row draw in [0, 10000): an LCG over
    the numeric id — chosen over xxhash64 because the SAME arithmetic
    runs in any SQL engine (the DuckDB oracle computes it verbatim),
    and mixture sampling needs cross-engine replayability more than
    hash quality. Constants are glibc's LCG. The id folds through
    mod 2^31 FIRST so the multiply can't overflow int64 at any id
    magnitude (ANSI Spark raises on overflow; (2^31+seed)·1103515245
    ≈ 2.4e18 < 2^63)."""
    folded = F.pmod(id_col.cast("long"), F.lit(2147483648))
    h = (folded + F.lit(seed)) * F.lit(1103515245) + F.lit(12345)
    return F.pmod(h, F.lit(2147483648)) % 10000


def corpus_mix(
    df: DataFrame,
    rates: dict[str, float],
    id_col: str = "doc_id",
    domain_col: str = "domain",
    caps: dict[str, int] | None = None,
    default_rate: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Deterministic mixture building: keep each row iff its seeded
    draw < rate(domain) · 10000, then enforce optional per-domain
    hard ``caps`` keeping the smallest draws (ties by id). The same
    corpus + seed always yields the same mixture — re-runs and
    incremental appends are replay-safe, unlike rand()-based
    sampling.

    Scale: the rate filter is a pushable scan predicate; caps add one
    shuffle per domain partition (window row_number), skew-safe
    because each domain's winner set is capped."""
    from pyspark.sql import Window

    id_type = dict(df.dtypes).get(id_col, "")
    if id_type not in ("bigint", "int", "smallint", "tinyint", "long"):
        # a string id would cast('long') to null and silently drop
        # EVERY row at the draw filter (code-review r5) — demand a
        # numeric surrogate instead
        raise ValueError(
            f"corpus_mix needs a numeric {id_col!r} (got {id_type}): "
            "derive a surrogate, e.g. xxhash64(doc_id), at ingest"
        )
    rate_map = F.create_map(
        *[x for k, v in rates.items() for x in (F.lit(k), F.lit(float(v)))]
    )
    draw = mix_hash(F.col(id_col), seed)
    rate = F.coalesce(
        F.try_element_at(rate_map, F.col(domain_col)),
        F.lit(float(default_rate)),
    )
    out = df.withColumn("_draw", draw).filter(
        F.col("_draw") < rate * 10000
    )
    if caps:
        cap_map = F.create_map(
            *[x for k, v in caps.items() for x in (F.lit(k), F.lit(int(v)))]
        )
        w = Window.partitionBy(domain_col).orderBy("_draw", id_col)
        out = (
            out.withColumn("_rn", F.row_number().over(w))
            .filter(
                F.col("_rn")
                <= F.coalesce(
                    F.try_element_at(cap_map, F.col(domain_col)),
                    F.lit(2**31 - 1),
                )
            )
            .drop("_rn")
        )
    return out


def url_filter(
    df: DataFrame,
    blocked_domains: list[str] | set[str],
    url_col: str | None = None,
    text_col: str = "text",
    keep_unmatched: bool = True,
) -> DataFrame:
    """C4-style URL/domain blocklist filtering (Raffel et al. 2020
    §2.2 drop pages from a curated blocklist; RefinedWeb/FineWeb use
    the same registered-domain gate).

    The page URL comes from ``url_col`` when given, else the FIRST
    http(s) URL found in ``text_col``. The REGISTERED domain (PSL
    eTLD+1 — ``functions.faup_domain``, same public-suffix logic the
    reference's fmfaup exposes) is matched against
    ``blocked_domains``; subdomains of a blocked domain are blocked
    with it (that is the point of the eTLD+1 cut).

    Appends ``url_domain`` (registered domain, '' when no URL) and
    ``url_blocked``. 100 TB shape: the blocklist rides ``isin`` for
    small lists — a literal in-filter inside codegen, no join, no
    shuffle; split it out into a broadcast join at millions of
    entries. ``keep_unmatched`` keeps docs with no URL at all
    (blocked=False), matching C4 (the blocklist gates known-bad pages,
    it does not require a URL).
    """
    from rsyslog_spark.functions import faup_domain

    url = (
        F.col(url_col)
        if url_col
        else F.regexp_extract(F.col(text_col), r"https?://[^\s]+", 0)
    )
    dom = F.coalesce(faup_domain(F.lower(url)), F.lit(""))
    out = df.withColumn("url_domain", dom).withColumn(
        "url_blocked", dom.isin(*[d.lower() for d in blocked_domains])
        if blocked_domains else F.lit(False),
    )
    if not keep_unmatched:
        out = out.filter(F.col("url_domain") != "")
    return out


# ---------------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al. 2023)
# ---------------------------------------------------------------------------

#: poly31 modulus — largest prime below 2^20, keeps the fold far from
#: int64 overflow at every step ((p-1)*31+255 < 2^26)
_POLY_P = 1048573


def word_bucket(w: Column, n_buckets: int) -> Column:
    """Hashed-feature bucket for one word: a polynomial rolling hash
    (h = h*31 + byte, mod prime) folded into ``n_buckets``. Chosen
    over xxhash64 for the same reason as :func:`mix_hash`: the SAME
    arithmetic runs in plain SQL (list_reduce over ord()s in the
    DuckDB oracle), and hashed-feature selection needs cross-engine
    replayability more than hash quality. At deploy scale the bucket
    fn is swappable (any word→int works); the pipeline shape is
    identical."""
    codes = F.transform(F.split(w, ""), lambda c: F.ascii(c))
    folded = F.aggregate(
        codes,
        F.lit(7).cast("long"),
        lambda acc, c: (acc * 31 + c) % _POLY_P,
    )
    return F.pmod(folded, F.lit(n_buckets))


def dsir_weights(
    df: DataFrame,
    target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> DataFrame:
    """DSIR (Xie et al. 2023, "Data Selection for Language Models via
    Importance Resampling"): score every document by how much it looks
    like the ``target`` subset under bag-of-hashed-unigram language
    models. log importance weight of a doc = Σ over its token
    instances of [log p_target(bucket) − log p_raw(bucket)] with
    Laplace-smoothed bucket probabilities.

    Integer-exact variant (same trick as
    :func:`rsyslog_spark.datapipe.textstats.unigram_lm_quality`): the
    per-bucket log-probability is proxied by the BIT LENGTH of the
    smoothed count — wt(b) = bitlen(c_target(b)+1) − bitlen(c_raw(b)+1)
    — which drops the constant normalizers (identical for every bucket,
    so document RANKING is preserved at integer-log2 resolution) and
    keeps the score bit-reproducible in any SQL engine: no floats, no
    platform log().

    Returns one row per document: (id, n_words, wt_sum). Scale shape
    (r6, guide §2.3/§2.4): the exploded corpus is aggregated to the
    (id, bucket) level — the bucket hash is a cheap map-side fold
    computed inline, so no vocab distinct and no corpus-sized join on
    the word string — and both the B-row count table and the per-doc
    score derive from that aggregation. Column pruning specializes the
    two consumers differently, so without help the plan would run the
    explode+aggregate twice; a ``localCheckpoint`` of the (id, bucket)
    table (the same lineage-truncation device :func:`~rsyslog_spark.
    datapipe.dedup.dedup_clusters` uses) materializes that ONE corpus
    pass and lets both consumers read the doc×bucket-sized blocks —
    per run, recomputed from the inputs every invocation. The B-row
    weight table broadcasts (plan-asserted).
    """
    words = df.select(
        F.col(id_col),
        target.alias("_tgt"),
        F.explode(
            F.split(F.lower(F.col(text_col)), "[^a-z]+")
        ).alias("w"),
    ).where(F.col("w") != "")
    # one corpus-sized aggregation: per-(doc, bucket) instance counts
    # (_tgt is constant per doc, so adding it to the key costs nothing)
    # lazy localCheckpoint: the weight-table branch and the scoring
    # join both consume this — materialized once at first action, so
    # the corpus is exploded+aggregated ONE time per run (r6; measured
    # -24% on the bench count path, rows identical)
    ib = (
        words.withColumn("b", word_bucket(F.col("w"), n_buckets))
        .groupBy(id_col, "_tgt", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    ).localCheckpoint(eager=False)
    counts = ib.groupBy("b").agg(
        F.sum("cnt").alias("c_raw"),
        F.sum(F.when(F.col("_tgt"), F.col("cnt")).otherwise(0)).alias(
            "c_tgt"
        ),
    )
    wt = counts.select(
        "b",
        (
            F.length(F.bin(F.coalesce(F.col("c_tgt"), F.lit(0)) + 1))
            - F.length(F.bin(F.col("c_raw") + 1))
        ).cast("long").alias("wt"),
    )
    return (
        ib.join(F.broadcast(wt), "b")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").cast("long").alias("n_words"),
            F.sum(F.col("cnt") * F.col("wt")).cast("long").alias("wt_sum"),
        )
    )


def dsir_select(
    df: DataFrame,
    target: Column,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    seed: int = 0,
) -> DataFrame:
    """The resampling half of DSIR: keep the k documents with the
    highest importance weights. The paper samples WITH Gumbel noise;
    mirroring :func:`corpus_mix`, this engine's variant is
    deterministic-replayable — rank by (wt_sum desc, seeded draw,
    id) so the same corpus + seed always selects the same k documents
    and the selection is expressible in plain SQL. One global top-k
    (orderBy+limit = partial top-k per partition + single reduce),
    no full sort materialization."""
    scored = dsir_weights(df, target, text_col, id_col, n_buckets)
    return (
        scored.withColumn("_d", mix_hash(F.col(id_col), seed))
        .orderBy(
            F.col("wt_sum").desc(), F.col("_d"), F.col(id_col)
        )
        .limit(k)
        .drop("_d")
    )


def ccnet_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    n_buckets: int = 3,
) -> DataFrame:
    """CCNet's perplexity bucketing (Wenzek et al. 2020, "CCNet:
    Extracting High Quality Monolingual Datasets from Web Crawl
    Data", §3): per language, rank documents by LM quality and split
    them into head / middle / tail terciles — the paper's unit of
    release (head = best third, the usual pretraining pick).

    The quality signal is :func:`~rsyslog_spark.datapipe.textstats.
    unigram_lm_quality`'s integer-exact corpus-LM score (CCNet uses a
    Wikipedia-trained KenLM; the self-trained unigram proxy induces
    the same common-language-scores-high ordering and keeps the
    bucket assignment bit-reproducible — divergence documented).
    Bucketing is ``ntile(n_buckets)`` over ``(lm_score DESC, id)``
    per language: the SQL-standard front-loaded split both Spark and
    any SQL engine implement identically.

    Returns (id, lang, n_words, lm_score, bucket, bucket_name) with
    bucket 1..n and head/middle/tail names for n=3.

    Scale shape: the score is the two-shuffle LM pass; the split adds
    ONE more shuffle (window over lang) whose partition key is the
    language — per-language ntile needs a per-language total order,
    which is exactly CCNet's own per-language sort; skew (one giant
    language) is the sort machinery's problem, and Spark's range-
    partitioned sort handles it — the window carries only the
    (id, lang, score) projection, never the text."""
    from pyspark.sql.window import Window

    from rsyslog_spark.datapipe.textstats import unigram_lm_quality

    scored = unigram_lm_quality(df, text_col, id_col).join(
        df.select(id_col, lang_col), id_col
    )
    w = Window.partitionBy(lang_col).orderBy(
        F.col("lm_score").desc(), F.col(id_col)
    )
    out = scored.withColumn("bucket", F.ntile(n_buckets).over(w))
    names = (
        F.when(F.col("bucket") == 1, F.lit("head"))
        .when(F.col("bucket") == n_buckets, F.lit("tail"))
        .otherwise(F.lit("middle"))
        if n_buckets == 3
        else F.concat(F.lit("b"), F.col("bucket").cast("string"))
    )
    return out.select(
        id_col, lang_col, "n_words", "lm_score",
        F.col("bucket").cast("long").alias("bucket"),
        names.alias("bucket_name"),
    )


def url_canonicalize(
    df: DataFrame,
    url_col: str = "url",
    out_col: str = "canon_url",
) -> DataFrame:
    """Canonicalize URLs into the dedup key every crawl pipeline
    groups by (CommonCrawl-style URL-level dedup; RefinedWeb §3.1
    dedups on the canonical URL before any content pass):

    - scheme and host lowercased (path/query stay case-sensitive);
    - fragment (``#…``) stripped;
    - userinfo (``user:pw@``) stripped;
    - default ports stripped (``:80`` for http, ``:443`` for https);
    - tracking query params dropped (``utm_*``, ``fbclid``,
      ``gclid``, ``msclkid``, ``mc_eid``, ``igshid``, ``ref``,
      ``ref_src``), remaining params kept in original order, a
      now-empty query dropped entirely;
    - trailing slashes stripped from the path (so ``…/a/`` ≡ ``…/a``
      and a bare root ≡ no path).

    Non-http(s) or pattern-less values pass through unchanged (the
    caller's filter problem, not silently nulled). Pure Column —
    regexp splits + array filter, codegen'd, no UDF: at 100 TB the
    canonical key is computed inside the scan and the dedup groupBy
    shuffles only (key, id)."""
    u = F.col(url_col)
    is_http = u.rlike(r"^(?i)https?://")
    nofrag = F.regexp_replace(u, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(nofrag, r"^([A-Za-z]+)://", 1))
    rest = F.regexp_replace(nofrag, r"^[A-Za-z]+://", "")
    auth = F.regexp_extract(rest, r"^([^/?]*)", 1)
    pathq = F.substr(rest, F.length(auth) + 1)
    # authority: drop userinfo, lower host, strip default port
    hostport = F.lower(F.element_at(F.split(auth, "@"), -1))
    host = F.when(
        (scheme == "http") & hostport.endswith(":80"),
        F.regexp_replace(hostport, r":80$", ""),
    ).when(
        (scheme == "https") & hostport.endswith(":443"),
        F.regexp_replace(hostport, r":443$", ""),
    ).otherwise(hostport)
    path = F.regexp_replace(
        F.regexp_extract(pathq, r"^([^?]*)", 1), r"/+$", ""
    )
    rawq = F.when(
        pathq.contains("?"),
        F.regexp_replace(pathq, r"^[^?]*\?", ""),
    ).otherwise(F.lit(""))
    kept_params = F.filter(
        F.split(rawq, "&"),
        lambda p: (p != "")
        & ~p.rlike(
            r"^(utm_[^=]*|fbclid|gclid|msclkid|mc_eid|igshid|ref|ref_src)="
        ),
    )
    q = F.array_join(kept_params, "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )
    return df.withColumn(out_col, F.when(is_http, canon).otherwise(u))


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """URL-level exact dedup on the canonical key: one survivor per
    canonical URL — the smallest id (deterministic, SQL-mirrorable).
    Returns the input columns + canon_url + is_url_dup. One shuffle
    carrying (key, id); text never moves."""
    c = url_canonicalize(df, url_col)
    w_min = (
        c.groupBy("canon_url")
        .agg(F.min(id_col).alias("_keep_id"))
    )
    return (
        c.join(w_min, "canon_url")
        .withColumn("is_url_dup", F.col(id_col) != F.col("_keep_id"))
        .drop("_keep_id")
    )
