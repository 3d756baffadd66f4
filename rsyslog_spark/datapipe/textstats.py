"""Text analysis: language-ID, quality scoring, token counting,
document fingerprinting. Pure Column expressions (SQL-oracle-friendly
and whole-stage-codegen'd)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language marker-word lists (n-gram heuristic stand-in); the
# real corpus is synthetic so the *mechanism* is what matters here
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "es": ["el", "la", "de", "que", "y", "los", "en", "un"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "de", "et", "est", "un", "une"],
}


def token_count(col: Column) -> Column:
    """Whitespace token count (0 for empty/blank)."""
    t = F.trim(col)
    return F.when(t == "", F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-ish regex token count: words, numbers, and single
    punctuation marks counted separately (a cheap proxy for subword
    tokenizers)."""
    return F.size(
        F.regexp_extract_all(col, F.lit(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"), F.lit(0))
    )


def _marker_hits(words: Column, markers: list[str]) -> Column:
    return F.size(F.filter(words, lambda w: w.isin(markers)))


def language_id(
    df: DataFrame, text_col: str = "text", out_col: str = "lang_pred"
) -> DataFrame:
    """Marker-word language ID: argmax over per-language hit ratios;
    'und' when nothing matches. Adds ``lang_pred`` and ``lang_score``."""
    words = F.split(F.lower(F.col(text_col)), r"\s+")
    n = F.greatest(F.size(words), F.lit(1))
    scores = [
        (_marker_hits(words, m) / n).alias(f"score_{lang}")
        for lang, m in LANG_MARKERS.items()
    ]
    df = df.select("*", *scores)
    langs = list(LANG_MARKERS)
    best_score = F.greatest(*[F.col(f"score_{x}") for x in langs])
    pred = F.lit("und")
    for lang in reversed(langs):  # earlier language wins ties
        pred = F.when(
            (F.col(f"score_{lang}") == best_score) & (best_score > 0),
            F.lit(lang),
        ).otherwise(pred)
    return df.withColumn(out_col, pred).withColumn("lang_score", best_score)


def quality_score(
    df: DataFrame, text_col: str = "text", out_col: str = "quality"
) -> DataFrame:
    """Heuristic document quality in [0,1] from length, alpha ratio,
    punctuation density, mean word length, and stopword presence —
    the standard cheap pre-filter for training corpora. Also emits the
    raw component columns for downstream thresholds."""
    t = F.col(text_col)
    n_chars = F.length(t)
    words = F.split(F.trim(t), r"\s+")
    n_words = F.size(words)
    alpha_ratio = F.length(F.regexp_replace(t, r"[^A-Za-z]", "")) / F.greatest(
        n_chars, F.lit(1)
    )
    punct_ratio = F.length(
        F.regexp_replace(t, r"[^!-/:-@\[-`{-~]", "")
    ) / F.greatest(n_chars, F.lit(1))
    mean_word_len = n_chars / F.greatest(n_words, F.lit(1))
    stop_ratio = _marker_hits(words, LANG_MARKERS["en"]) / F.greatest(
        n_words, F.lit(1)
    )
    # piecewise scores, each in [0,1]
    len_score = F.least(n_words / F.lit(20.0), F.lit(1.0))
    wlen_score = F.when(
        (mean_word_len >= 3) & (mean_word_len <= 12), F.lit(1.0)
    ).otherwise(F.lit(0.3))
    punct_score = F.when(punct_ratio <= 0.2, F.lit(1.0)).otherwise(
        F.greatest(F.lit(0.0), F.lit(1.0) - (punct_ratio - 0.2) * 4)
    )
    q = (
        len_score * 0.3
        + alpha_ratio * 0.25
        + wlen_score * 0.2
        + punct_score * 0.15
        + F.least(stop_ratio * 5, F.lit(1.0)) * 0.1
    )
    return (
        df.withColumn("n_words", n_words)
        .withColumn("alpha_ratio", alpha_ratio)
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("mean_word_len", mean_word_len)
        .withColumn("stop_ratio", stop_ratio)
        .withColumn(out_col, q)
    )


def doc_fingerprint(col: Column, rolling_k: int = 8) -> Column:
    """Document fingerprint: xxhash64 over the k-gram winnowing-style
    minimum — min over rolling word-k-gram hashes (one stable 64-bit id
    robust to small appends). Falls back to whole-text hash for short
    docs."""
    words = F.split(F.trim(F.lower(col)), r"\s+")
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - rolling_k, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.xxhash64(F.array_join(F.slice(words, i + 1, rolling_k), " "))
    )
    return F.when(n >= rolling_k, F.array_min(grams)).otherwise(
        F.xxhash64(F.array_join(words, " "))
    )


def corpus_filter(
    df: DataFrame,
    text_col: str = "text",
    lang: str = "en",
    min_words: int = 5,
    max_words: int = 100_000,
    min_alpha_ratio: float = 0.5,
    max_punct_ratio: float = 0.2,
) -> DataFrame:
    """Training-corpus quality gate (the C4/Gopher-style rule stack):
    language match, word-count band, alphabetic ratio floor, and
    punctuation-density ceiling, applied in that order. Adds ``keep``
    and ``reason`` (the FIRST failing rule, or 'ok') on top of the
    language_id/quality_score component columns — all pure Column
    expressions, so the whole gate rides one codegen'd projection and
    the filter pushes into the scan when used as a predicate."""
    out = quality_score(language_id(df, text_col), text_col)
    reason = (
        F.when(F.col("lang_pred") != lang, F.lit("lang"))
        .when(F.col("n_words") < min_words, F.lit("too_short"))
        .when(F.col("n_words") > max_words, F.lit("too_long"))
        .when(F.col("alpha_ratio") < min_alpha_ratio, F.lit("low_alpha"))
        .when(F.col("punct_ratio") > max_punct_ratio, F.lit("high_punct"))
        .otherwise(F.lit("ok"))
    )
    return out.withColumn("reason", reason).withColumn(
        "keep", F.col("reason") == "ok"
    )


def log_templates(
    df: DataFrame,
    msg_col: str = "msg",
    id_col: str | None = None,
) -> DataFrame:
    """Log template mining (Drain-style, simplified): mask the variable
    parts of each message — digit runs → <N>, hex runs → <X>, IPv4s →
    <IP> — and group by the masked TEMPLATE. The classic first step of
    log analytics over a parse→route pipeline: the template set is the
    'schema' of the stream, counts are its distribution, and rare
    templates are anomaly candidates.

    Masking order matters (IP before digits, hex before digits so
    '0x3E7' doesn't half-mask); all three rewrites are codegen'd
    regexp_replace passes, then ONE hash-partial groupBy — scales like
    any count-by-key (the template count is bounded by message shapes,
    thousands, not rows)."""
    m = F.col(msg_col)
    m = F.regexp_replace(m, r"\b\d{1,3}(?:\.\d{1,3}){3}\b", "<IP>")
    m = F.regexp_replace(m, r"\b0[xX][0-9A-Fa-f]+\b", "<X>")
    m = F.regexp_replace(m, r"\d+", "<N>")
    agg = [F.count(F.lit(1)).alias("n")]
    if id_col is not None:
        agg.append(F.min(id_col).alias("first_id"))
    return df.groupBy(m.alias("template")).agg(*agg)


# Phone requires at least one grouping char ((, ), -) so bare
# space-separated digit runs ('2019 2020 2021') survive; card-length
# digit runs (13-19) are masked unconditionally — a conservative
# scrubber masks some long ids/epochs rather than leak a card number.
# PII patterns in APPLICATION ORDER — email first (would survive later
# digit masking anyway), then dotted IPs (dots break the phone class),
# then SSN/card (the phone pattern would otherwise swallow their digit
# runs), phone last. Patterns stay in the RE2 ∩ Java-regex dialect so
# the DuckDB oracle can run them verbatim.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}(?:\.\d{1,3}){3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("card", r"\b\d{13,19}\b", "<CARD>"),
    ("phone", r"\+?\d[\d ()]*[()-][\d ()-]{6,}\d", "<PHONE>"),
)


def pii_scrub(
    df: DataFrame, text_col: str = "text", out_col: str = "scrubbed"
) -> DataFrame:
    """Training-corpus PII scrubbing: mask emails, IPv4s, SSNs,
    card-length digit runs, and phone-shaped sequences with typed
    placeholder tokens — the redaction pass a pretraining pipeline
    runs before tokenization. Five codegen'd regexp_replace passes,
    pure Column (same execution shape as log_templates' masking);
    adds ``out_col`` plus ``pii_found`` (did anything change)."""
    c = F.col(text_col)
    for _, rx, repl in PII_PATTERNS:
        c = F.regexp_replace(c, rx, repl)
    return df.withColumn(out_col, c).withColumn(
        # null text -> scrubbed null, but the FLAG must stay boolean
        # (a null pii_found poisons ~keep predicates under ANSI nulls)
        "pii_found",
        F.coalesce(F.col(out_col) != F.col(text_col), F.lit(False)),
    )


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style intra-document repetition signals: the fraction of
    duplicate lines and duplicate words (the rules that catch boiler-
    plate/spam pages a length-and-punctuation gate misses). Emitted as
    permille LONGS (repetition thresholds are coarse — integer output
    keeps the metrics exactly comparable across engines). Pure Column:
    two splits + array_distinct, one codegen'd projection; compose with
    corpus_filter's rule stack as an extra keep-predicate."""
    lines = F.split(F.col(text_col), r"\n")
    words = F.split(
        F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")), " "
    )

    def permille(arr: Column) -> Column:
        n = F.size(arr)
        d = F.size(F.array_distinct(arr))
        return F.when(
            n > 0, F.round((n - d) * 1000 / n).cast("long")
        ).otherwise(F.lit(0).cast("long"))

    return (
        df.withColumn("n_lines", F.size(lines).cast("long"))
        .withColumn("dup_line_permille", permille(lines))
        .withColumn("dup_word_permille", permille(words))
    )


def _run_fold(sorted_grams: Column) -> Column:
    """Fold a SORTED array of n-gram strings into
    struct(top_chars, dup_chars):

    - ``top_chars`` = occurrences x characters of the single most
      frequent gram (ties: longer gram, then lexicographically
      smallest — fully deterministic so a SQL mirror can reproduce
      it with ORDER BY cnt DESC, len DESC, gram ASC).
    - ``dup_chars`` = sum over grams occurring >1 time of
      occurrences x characters (all occurrences counted; overlap
      between different duplicated grams is NOT deduplicated — the
      coarse form of Gopher's dup-n-gram signal).

    Sorting groups equal grams into adjacent runs, so one O(L)
    aggregate() pass with a 5-field accumulator (current run +
    best-so-far + dup sum) computes both — no shuffle, no UDF."""
    zero = F.lit(0).cast("long")

    def acc(prev, run, bc, bl, dup):
        return F.struct(
            prev.alias("prev"), run.cast("long").alias("run"),
            bc.cast("long").alias("bc"), bl.cast("long").alias("bl"),
            dup.cast("long").alias("dup"),
        )

    def close_run(a):
        """Fold the open run into best/dup (run==0 → no-op)."""
        clen = F.length(a["prev"]).cast("long")
        better = (a["run"] > a["bc"]) | (
            (a["run"] == a["bc"]) & (clen > a["bl"])
        )
        has = a["run"] > 0
        return (
            F.when(has & better, a["run"]).otherwise(a["bc"]),
            F.when(has & better, clen).otherwise(a["bl"]),
            a["dup"]
            + F.when(a["run"] > 1, a["run"] * clen).otherwise(zero),
        )

    def merge(a, g):
        same = (a["run"] > 0) & (a["prev"] == g)
        bc, bl, dup = close_run(a)
        return F.when(
            same, acc(g, a["run"] + 1, a["bc"], a["bl"], a["dup"])
        ).otherwise(acc(g, F.lit(1), bc, bl, dup))

    def finish(a):
        bc, bl, dup = close_run(a)
        return F.struct(
            (bc * bl).alias("top_chars"), dup.alias("dup_chars")
        )

    return F.aggregate(
        sorted_grams, acc(F.lit(""), zero, zero, zero, zero),
        merge, finish,
    )


def ngram_repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    top_ns: tuple = (2, 3, 4),
    dup_ns: tuple = (5, 6, 7, 8, 9, 10),
) -> DataFrame:
    """The rest of the Gopher repetition rule set (Rae et al. 2021,
    Table A1), complementing :func:`repetition_stats`' dup-line/word
    fractions: per document,

    - ``top_{n}gram_permille`` (n in ``top_ns``): fraction of
      normalized characters covered by the most frequent word
      n-gram (count x gram length / total chars) — even a
      once-occurring gram counts, per the paper.
    - ``dup_{n}gram_permille`` (n in ``dup_ns``): fraction covered
      by word n-grams occurring more than once.

    Fractions are permille LONGS via floor() (coarse thresholds;
    integer output is exactly comparable across engines, and floor
    dodges round()-dialect differences). Gram characters include the
    single joining spaces; the denominator is the single-spaced
    normalized text length.

    Scale shape: ZERO exchanges and zero Python — per-doc stats need
    no cross-row grouping, so each n is sort_array + one O(L)
    aggregate() fold (see :func:`_run_fold`) inside one projection;
    the whole stack is embarrassingly parallel over input splits.
    The per-n folds live in ONE struct column whose field
    extractions are unconditional copies → codegen CSE evaluates the
    struct once (see functions._bind's notes on CSE scope)."""
    t = F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))
    words = F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, " ")
    )

    def stats_struct(w: Column) -> Column:
        total = F.length(F.array_join(w, " ")).cast("long")

        def grams(n: int) -> Column:
            return F.when(
                F.size(w) >= n,
                F.transform(
                    F.sequence(F.lit(1), F.size(w) - n + 1),
                    lambda i: F.array_join(F.slice(w, i, n), " "),
                ),
            ).otherwise(F.array().cast("array<string>"))

        def permille(chars: Column) -> Column:
            return F.when(
                total > 0, F.floor(chars * 1000 / total)
            ).otherwise(F.lit(0)).cast("long")

        fields = []
        for n in top_ns:
            fields.append(
                permille(
                    _run_fold(F.sort_array(grams(n)))["top_chars"]
                ).alias(f"top_{n}gram_permille")
            )
        for n in dup_ns:
            fields.append(
                permille(
                    _run_fold(F.sort_array(grams(n)))["dup_chars"]
                ).alias(f"dup_{n}gram_permille")
            )
        return F.struct(*fields)

    from rsyslog_spark.functions import _bind

    st = _bind(words, stats_struct)
    out = df.withColumn("_ngram_stats", st)
    for n in top_ns:
        out = out.withColumn(
            f"top_{n}gram_permille",
            F.col("_ngram_stats")[f"top_{n}gram_permille"],
        )
    for n in dup_ns:
        out = out.withColumn(
            f"dup_{n}gram_permille",
            F.col("_ngram_stats")[f"dup_{n}gram_permille"],
        )
    return out.drop("_ngram_stats")


def drain_templates(
    df: DataFrame,
    msg_col: str = "msg",
    threshold: float = 0.8,
) -> DataFrame:
    """True-Drain template mining (He et al., ICWS'17): the masked
    templates from :func:`log_templates` are grouped the way Drain's
    parse tree groups logs — by token count and first token — and
    within each group templates whose token-position similarity meets
    ``threshold`` merge into one template with ``<*>`` at the differing
    positions. Returns (template, n) with n summed over merged members.

    Similarity = matching positions / length; an already-wildcarded
    ``<*>`` position counts as a match (the cluster has declared that
    position variable). Templates are folded in sorted order, so
    cluster formation is deterministic.

    Scale shape: the expensive pass is log_templates' single
    count-by-key over the corpus; this second stage runs on the
    AGGREGATED template table (bounded by message shapes — thousands of
    rows, not corpus rows) via applyInPandas keyed on (n_tok,
    first_token): groups process in parallel, each group is small, and
    no corpus-sized data ever reaches Python."""
    import pandas as pd

    t = log_templates(df, msg_col)
    keyed = t.select(
        "template", "n",
        F.split("template", " ").alias("_toks"),
    ).select(
        "template", "n",
        F.size("_toks").alias("n_tok"),
        F.try_element_at("_toks", F.lit(1)).alias("first_tok"),
    )

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("template")
        clusters: list[list] = []  # [tokens, n]
        for tmpl, n in zip(pdf["template"], pdf["n"]):
            toks = tmpl.split(" ")
            for c in clusters:
                ct = c[0]
                sim = sum(
                    1 for a, b in zip(ct, toks) if a == b or a == "<*>"
                ) / len(toks)
                if sim >= threshold:
                    c[0] = [
                        a if (a == b or a == "<*>") else "<*>"
                        for a, b in zip(ct, toks)
                    ]
                    c[1] += n
                    break
            else:
                clusters.append([list(toks), int(n)])
        return pd.DataFrame(
            {
                "template": [" ".join(c[0]) for c in clusters],
                "n": [c[1] for c in clusters],
            }
        )

    merged = keyed.groupBy("n_tok", "first_tok").applyInPandas(
        merge, "template string, n long"
    )
    # two passes over one group can leave duplicate merged templates
    # only across groups with different keys — impossible — but a late
    # member can widen a cluster to a template an earlier cluster
    # already emitted; fold those together
    return merged.groupBy("template").agg(F.sum("n").alias("n"))


# ---------------------------------------------------------------------------
# unigram LM quality (CCNet-style frequency scoring, integer-exact)
# ---------------------------------------------------------------------------

def unigram_lm_quality(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """CCNet-style language-model quality signal computed from the
    corpus itself: train unigram counts over all documents, then score
    each document by its tokens' corpus frequency. Documents made of
    common words score high, gibberish/rare-token docs score low —
    the same ordering a real LM-perplexity filter induces, but with
    an INTEGER-EXACT weight so the score is bit-reproducible across
    engines: weight(w) = bit_length(count(w)) = floor(log2 count)+1
    (F.bin length — exact in both Spark and any SQL with bin()),
    score = (sum(weight) * 1000) div n_words.

    Two shuffles total at any scale: one groupBy to train the vocab,
    one groupBy to score docs; the vocab join auto-broadcasts when
    small and sort-merges otherwise. No floats anywhere — log-prob
    proxies via bit lengths keep the oracle comparison exact.
    """
    words = df.select(
        F.col(id_col),
        F.explode(
            F.split(F.lower(F.col(text_col)), "[^a-z]+")
        ).alias("w"),
    ).where(F.col("w") != "")
    vocab = words.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    weighted = words.join(vocab, "w").select(
        id_col, F.length(F.bin("c")).cast("long").alias("wt")
    )
    return weighted.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum("wt").alias("wt_sum"),
    ).select(
        id_col,
        "n_words",
        F.expr("(wt_sum * 1000) div n_words").alias("lm_score"),
    )


# ---------------------------------------------------------------------------
# multinomial Naive Bayes doc classifier (fastText-classifier analog,
# integer-exact)
# ---------------------------------------------------------------------------

def nb_classify(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    scale_bits: int = 20,
) -> DataFrame:
    """Multinomial Naive Bayes document classifier — the engine's
    stand-in for the fastText-style quality/domain classifiers the
    published curation pipelines gate on (CCNet's LM filter, LLaMA's
    Wikipedia-reference classifier, FineWeb-Edu's educational scorer):
    train on the rows whose ``label_col`` is non-null, score and
    argmax EVERY row.

    Integer-exact scoring so the result is bit-reproducible in plain
    SQL (same family as :func:`unigram_lm_quality`): each
    Laplace-smoothed probability p = (c+1)/(N_c+V) is scaled to
    r = ((c+1) << scale_bits) div (N_c+V) and contributes
    bitlen(r*r) — an integer proxy of 2·log2 p at half-bit resolution.
    No floats: argmax ties (rare, but possible at half-bit
    resolution) break on the LEXICOGRAPHICALLY SMALLEST class in both
    engines, so prediction is deterministic everywhere.

    Returns (id, n_words, pred_class, score). Scale shape: training =
    two groupBys over (word,class)/(class); the dense weight table is
    vocab×K rows joined to the corpus on the word key (co-partitioned
    shuffle join, broadcast when small); scoring = one corpus groupBy
    per surviving (doc,class) pair — K is the class count (single
    digits), so the explode factor is a constant, not a data term.
    """
    S = 1 << scale_bits

    words = df.select(
        F.col(id_col),
        F.col(label_col).alias("_lab"),
        F.explode(
            F.split(F.lower(F.col(text_col)), "[^a-z]+")
        ).alias("w"),
    ).where(F.col("w") != "")
    labeled = words.where(F.col("_lab").isNotNull())

    vocab = words.select("w").distinct()
    v_size = vocab.count()
    wc = labeled.groupBy("w", "_lab").agg(
        F.count(F.lit(1)).alias("c_wc")
    )
    totals = labeled.groupBy("_lab").agg(
        F.count(F.lit(1)).alias("n_c")
    )

    def wt_of(r: Column) -> Column:
        # bitlen(r*r) = integer proxy of 2*log2(p) at half-bit
        # resolution; r <= 2^scale_bits so r*r <= 2^40 — no overflow
        return F.length(F.bin(r * r)).cast("long")

    # dense per-(word, class) weight: vocab x K rows; unseen pairs get
    # the pure-smoothing weight
    dense = (
        vocab.crossJoin(totals)
        .join(wc, ["w", "_lab"], "left")
        .select(
            "w",
            "_lab",
            wt_of(
                F.expr(
                    f"((coalesce(c_wc, 0) + 1) * {S})"
                    f" div (n_c + {v_size})"
                )
            ).alias("wt"),
        )
    )

    # document-count prior with Laplace over the K classes
    docs = df.where(F.col(label_col).isNotNull())
    n_docs = docs.count()
    k_classes = totals.count()
    prior = (
        docs.groupBy(F.col(label_col).alias("_lab"))
        .agg(F.count(F.lit(1)).alias("d_c"))
        .select(
            "_lab",
            wt_of(
                F.expr(f"((d_c + 1) * {S}) div {n_docs + k_classes}")
            ).alias("p_wt"),
        )
    )

    scored = (
        words.drop("_lab")
        .join(dense, "w")
        .groupBy(id_col, "_lab")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("wt").cast("long").alias("wt_sum"),
        )
        .join(F.broadcast(prior), "_lab")
        .select(
            id_col,
            "_lab",
            "n_words",
            (F.col("wt_sum") + F.col("p_wt")).alias("score"),
        )
    )
    # argmax(score) with lexicographic tie-break: min of
    # (-score, class) picks the highest score, smallest class on ties
    best = scored.groupBy(id_col).agg(
        F.min(
            F.struct(
                (F.lit(0) - F.col("score")).alias("neg"),
                F.col("_lab").alias("c"),
                F.col("n_words").alias("nw"),
            )
        ).alias("b")
    )
    return best.select(
        id_col,
        F.col("b.nw").alias("n_words"),
        F.col("b.c").alias("pred_class"),
        (F.lit(0) - F.col("b.neg")).cast("long").alias("score"),
    )


def corpus_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    percentiles: tuple[float, ...] = (0.5, 0.95),
) -> DataFrame:
    """Per-group corpus report — the analysis pass every curation
    pipeline runs before/after filtering (Dolma's analysis tooling,
    CCNet's per-shard stats): document count, token sum/min/max,
    nearest-rank token-count percentiles, vocabulary size (distinct
    words) and type-token ratio (vocab*1000 div tokens, permille).

    Scale shape: token percentiles use a per-group sort + row_number
    window and pick rows at rank ceil(p*n) — nearest-rank semantics
    (identical to aggregates.perctile) WITHOUT collecting a group
    into one array, so a group with a billion documents is handled
    by the sort machinery, not executor memory. Vocab is one
    distinct-aggregate over exploded words. Three shuffles total,
    all on the (few) group keys + word/doc projections — the text
    column never shuffles."""
    from pyspark.sql.window import Window

    d = df.select(
        F.col(group_col).alias("g"),
        F.col(id_col).alias("_id"),
        token_count(F.col(text_col)).cast("long").alias("n_tok"),
        F.lower(F.col(text_col)).alias("_lt"),
    )
    base = d.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("tok_sum"),
        F.min("n_tok").cast("long").alias("tok_min"),
        F.max("n_tok").cast("long").alias("tok_max"),
    )
    w = Window.partitionBy("g").orderBy("n_tok", "_id")
    ranked = (
        d.select("g", "_id", "n_tok")
        .withColumn("_rn", F.row_number().over(w))
        .join(base.select("g", "n_docs"), "g")
    )
    pcols = []
    picked = ranked
    for p in percentiles:
        name = f"tok_p{int(p * 100)}"
        picked = picked.withColumn(
            f"_{name}",
            F.when(
                F.col("_rn")
                == F.greatest(
                    F.lit(1), F.ceil(F.col("n_docs") * F.lit(p))
                ),
                F.col("n_tok"),
            ),
        )
        pcols.append(name)
    pct = picked.groupBy("g").agg(
        *[F.max(f"_{n}").cast("long").alias(n) for n in pcols]
    )
    vocab = (
        d.select("g", F.explode(F.split("_lt", "[^a-z]+")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("g")
        .agg(F.countDistinct("w").cast("long").alias("vocab"))
    )
    return (
        base.join(pct, "g")
        .join(vocab, "g", "left")
        .select(
            F.col("g").alias(group_col),
            "n_docs",
            "tok_sum",
            "tok_min",
            "tok_max",
            *pcols,
            F.coalesce(F.col("vocab"), F.lit(0)).alias("vocab"),
            F.when(F.col("tok_sum") > 0,
                   F.expr("vocab * 1000 div tok_sum"))
            .otherwise(F.lit(0)).cast("long").alias("ttr_permille"),
        )
    )


def badwords_filter(
    df: DataFrame,
    blocklist: list[str] | set[str],
    text_col: str = "text",
) -> DataFrame:
    """C4-style bad-words page filter (Raffel et al. 2020 §2.2: drop
    any page containing a word OR PHRASE from a blocklist — the real
    "Dirty, Naughty…" list contains multi-word phrases): page tokens
    are lowercased whitespace words with leading/trailing punctuation
    stripped; each blocklist entry is normalized THE SAME WAY
    (lowercase, per-word edge-punctuation strip) so punctuated
    entries still match, and multi-word entries match as contiguous
    token sequences. An entry that normalizes to nothing can never
    match and raises. Adds ``bad_hits`` (total occurrences, counted
    overlapping) and ``kept`` (bad_hits == 0).

    Scale: pure Column over the text — map-only, codegen'd, pushable;
    the blocklist bakes into the plan as literals (real lists are a
    few hundred entries — well inside expression-size limits; for
    100k-entry lists use a broadcast join on the exploded tokens
    instead)."""
    import re as _re

    def norm(entry: str) -> str:
        ws = [
            _re.sub(r"^[^a-z0-9]+|[^a-z0-9]+$", "", w)
            for w in entry.lower().split()
        ]
        ws = [w for w in ws if w]
        if not ws:
            raise ValueError(
                f"badwords_filter: entry {entry!r} normalizes to "
                "nothing and can never match"
            )
        return " ".join(ws)

    entries = sorted({norm(e) for e in blocklist})
    toks = F.transform(
        F.split(F.lower(F.col(text_col)), r"\s+"),
        lambda w: F.regexp_replace(w, "^[^a-z0-9]+|[^a-z0-9]+$", ""),
    )
    # single-space-joined, space-padded token string: every entry
    # (word or phrase) is an occurrence of ' entry ' — counted with a
    # zero-width lookahead so adjacent/overlapping repeats all count
    joined = F.concat(F.lit(" "), F.array_join(toks, " "), F.lit(" "))
    hits = None
    for e in entries:
        c = F.regexp_count(joined, F.lit("(?=" + _re.escape(f" {e} ") + ")"))
        hits = c if hits is None else hits + c
    return df.withColumn(
        "bad_hits", F.coalesce(hits, F.lit(0)).cast("long")
    ).withColumn("kept", F.col("bad_hits") == 0)


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 lexical top-k retrieval (Robertson & Zaragoza 2009) — the
    keyword-search counterpart to simsearch's embedding ANN, and the
    standard first-stage retriever for training-data search/audit
    ("which documents mention X").

    score(d) = Σ_t idf_t · tf·(k1+1) / (tf + k1·(1−b + b·|d|/avgdl))

    with the PRE-LOG idf variant idf_t = (N − df_t + 0.5)/(df_t + 0.5)
    — monotone in the classic ln(1+·) form but free of transcendental
    functions, so every arithmetic step is an IEEE +,−,×,÷ that any
    SQL engine reproduces bit-exactly (the oracle recipe; constants
    are Python-folded and emitted via repr on both sides).

    Scale shape: per-term tf is a pure-Column fold over the doc's own
    words (terms are literals — NO corpus explode, NO join); corpus
    stats (N, Σ|d|, df_t) are ONE map-side-combinable aggregate row
    broadcast back; the final top-k is orderBy+limit, which Spark
    executes as TakeOrderedAndProject (per-partition heap + driver
    merge of k rows, no global sort shuffle).
    """
    if not terms:
        raise ValueError("bm25_topk needs at least one query term")
    terms = [t.lower() for t in terms]
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")

    # single-arg closure factory: a `lambda w, t=t:` default makes the
    # lambda 2-ary and Spark feeds the ARRAY INDEX as the second arg
    # (sandbox quirk) — the term literal must be captured, not defaulted
    def _is_term(term):
        lit = F.lit(term)
        return lambda w: w == lit

    base = docs.select(
        F.col(id_col).cast("long").alias("_id"),
        F.size(words).alias("_dl"),
        *[
            F.size(F.filter(words, _is_term(t))).alias(f"_tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_dl").alias("_sdl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
            for i in range(len(terms))
        ],
    )
    from pyspark.sql.functions import broadcast

    j = base.crossJoin(broadcast(stats))
    avgdl = F.col("_sdl").cast("double") / F.col("_n")
    k1p1 = k1 + 1.0
    k1mb = k1 * (1.0 - b)
    k1b = k1 * b
    score = None
    for i in range(len(terms)):
        idf = ((F.col("_n") - F.col(f"_df{i}")) + F.lit(0.5)) / (
            F.col(f"_df{i}") + F.lit(0.5)
        )
        den = F.col(f"_tf{i}") + (
            F.lit(k1mb) + F.lit(k1b) * (F.col("_dl") / avgdl)
        )
        contrib = idf * ((F.col(f"_tf{i}") * F.lit(k1p1)) / den)
        score = contrib if score is None else score + contrib
    any_hit = None
    for i in range(len(terms)):
        h = F.col(f"_tf{i}") > 0
        any_hit = h if any_hit is None else any_hit | h
    from pyspark.sql import Window

    top = (
        j.where(any_hit)
        .select(F.col("_id").alias(id_col), score.alias("score"))
        .orderBy(F.desc("score"), id_col)
        .limit(k)
    )
    w = Window.orderBy(F.desc("score"), id_col)
    return top.select(
        id_col,
        "score",
        F.row_number().over(w).cast("long").alias("rank"),
    )


def gopher_quality(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_wl_permille: int = 3_000,
    max_mean_wl_permille: int = 10_000,
    max_symbol_permille: int = 100,
    max_bullet_permille: int = 900,
    max_ellipsis_permille: int = 300,
    min_alpha_permille: int = 800,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Gopher document-quality rules (Rae et al. 2021, appendix A1.1),
    integer-exact so a SQL oracle reproduces every component:

    * word count in [50, 100k]; mean word length in [3, 10] chars;
    * symbol-to-word ratio (``#`` or ``...`` occurrences) ≤ 0.1;
    * ≤ 90% of lines start with a bullet (``-``/``*``/``•``) and
      ≤ 30% end with an ellipsis;
    * ≥ 80% of words contain at least one alphabetic character;
    * at least 2 of the 8 English stop words
      the/be/to/of/and/that/have/with appear.

    Ratios are permille LONGS (floor), thresholds integer permille —
    no float crosses the comparison. Adds one column per component
    plus ``gopher_pass``. Pure Column: map-only, codegen'd, the
    predicate pushes into the scan when used as a filter."""
    text = F.col(text_col)
    words = F.filter(
        F.split(text, r"\s+"), lambda w: w != F.lit("")
    )
    n_words = F.size(words)
    sum_wl = F.aggregate(
        words, F.lit(0).cast("long"),
        lambda a, w: a + F.length(w),
    )
    mean_wl_pm = F.when(
        n_words > 0, sum_wl * 1000 / n_words
    ).otherwise(F.lit(0)).cast("long")

    n_hash = F.length(text) - F.length(F.replace(text, F.lit("#")))
    n_ellipsis = F.regexp_count(text, F.lit(r"\.\.\."))
    symbol_pm = F.when(
        n_words > 0, (n_hash + n_ellipsis) * 1000 / n_words
    ).otherwise(F.lit(0)).cast("long")

    lines = F.filter(
        F.split(text, "\n"), lambda ln: F.trim(ln) != F.lit("")
    )
    n_lines = F.size(lines)
    bullets = F.size(F.filter(
        lines, lambda ln: F.trim(ln).rlike(r"^[-*•]")
    ))
    ellipsis_ends = F.size(F.filter(
        lines, lambda ln: F.trim(ln).rlike(r"\.\.\.$")
    ))
    bullet_pm = F.when(
        n_lines > 0, bullets * 1000 / n_lines
    ).otherwise(F.lit(0)).cast("long")
    ell_pm = F.when(
        n_lines > 0, ellipsis_ends * 1000 / n_lines
    ).otherwise(F.lit(0)).cast("long")

    alpha_words = F.size(F.filter(
        words, lambda w: w.rlike("[A-Za-z]")
    ))
    alpha_pm = F.when(
        n_words > 0, alpha_words * 1000 / n_words
    ).otherwise(F.lit(0)).cast("long")

    stops = ["the", "be", "to", "of", "and", "that", "have", "with"]
    lower_words = F.transform(words, F.lower)
    stop_hits = None
    for s in stops:
        h = F.array_contains(lower_words, s).cast("long")
        stop_hits = h if stop_hits is None else stop_hits + h

    out = df.select(
        "*",
        n_words.cast("long").alias("g_n_words"),
        mean_wl_pm.alias("g_mean_wl_pm"),
        symbol_pm.alias("g_symbol_pm"),
        bullet_pm.alias("g_bullet_pm"),
        ell_pm.alias("g_ellipsis_pm"),
        alpha_pm.alias("g_alpha_pm"),
        stop_hits.cast("long").alias("g_stop_hits"),
    )
    passed = (
        (F.col("g_n_words") >= min_words)
        & (F.col("g_n_words") <= max_words)
        & (F.col("g_mean_wl_pm") >= min_mean_wl_permille)
        & (F.col("g_mean_wl_pm") <= max_mean_wl_permille)
        & (F.col("g_symbol_pm") <= max_symbol_permille)
        & (F.col("g_bullet_pm") <= max_bullet_permille)
        & (F.col("g_ellipsis_pm") <= max_ellipsis_permille)
        & (F.col("g_alpha_pm") >= min_alpha_permille)
        & (F.col("g_stop_hits") >= min_stopword_hits)
    )
    return out.withColumn("gopher_pass", passed)
