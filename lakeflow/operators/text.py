"""Text-analysis operators for LLM-data pipelines (north star).

Language-ID (stopword heuristic), quality scoring, token counting (whitespace
and BPE-ish regex), and document fingerprinting — all as pure Catalyst
expressions over the ``documents`` table. Every op is a narrow projection:
zero shuffles, embarrassingly parallel at 100 TB.

Regex patterns stay in the character-class subset that Java regex (Spark) and
RE2 (DuckDB/others) interpret identically, so the ops are oracle-replayable.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lakeflow.functions.rounding import rnd

from lakeflow.operators.dedup import normalize_text

# Tiny per-language stopword marker sets for the n-gram/stopword heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "das"],
    "es": ["el", "la", "de", "que", "es"],
    "fr": ["le", "la", "et", "est", "les"],
}


def token_count_ws(col: Column | str) -> Column:
    """Whitespace token count (bigint — counts are 64-bit at scale)."""
    return F.size(F.split(normalize_text(col), " ")).cast("bigint")


BPE_ISH = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def token_count_bpe(col: Column | str) -> Column:
    """BPE-ish token estimate: runs of letters, runs of digits, or single
    punctuation — a deterministic proxy for subword tokenizer counts."""
    return F.size(F.regexp_extract_all(normalize_text(col), F.lit(BPE_ISH), 0)).cast("bigint")


def _count_matches(col: Column, char_class: str) -> Column:
    """Occurrences of a single-char class: len - len(strip(class))."""
    return F.length(col) - F.length(F.regexp_replace(col, char_class, ""))


def quality_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality features + composite score.

    n_chars/n_tokens/avg token len/alpha ratio/digit ratio/stopword ratio and
    ``quality`` in [0,1] — the usual cheap pre-filter before expensive dedup.
    """
    t = normalize_text(text_col)
    n_chars = F.length(t)
    n_tokens = token_count_ws(t)
    alpha = _count_matches(t, "[a-z]")
    digits = _count_matches(t, "[0-9]")
    stop = F.size(
        F.filter(
            F.split(t, " "),
            lambda w: w.isin([w_ for ws in LANG_MARKERS.values() for w_ in ws]),
        )
    )
    alpha_ratio = rnd(alpha / n_chars, 6)
    digit_ratio = rnd(digits / n_chars, 6)
    stop_ratio = rnd(stop / n_tokens, 6)
    avg_tok_len = rnd(n_chars / n_tokens, 6)
    quality = rnd(
        F.least(
            F.lit(1.0),
            0.5 * alpha_ratio
            + 0.3 * F.least(stop_ratio * 5, F.lit(1.0))
            + 0.2 * F.least(n_tokens / 100.0, F.lit(1.0)),
        ),
        6,
    )
    return df.select(
        F.col(id_col),
        n_chars.cast("bigint").alias("n_chars_norm"),
        n_tokens.cast("bigint").alias("n_tokens"),
        avg_tok_len.alias("avg_tok_len"),
        alpha_ratio.alias("alpha_ratio"),
        digit_ratio.alias("digit_ratio"),
        stop_ratio.alias("stop_ratio"),
        quality.alias("quality"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-marker language ID: argmax over per-language marker hits with a
    deterministic preference order on ties; 'und' (undetermined) when no
    marker hits."""
    toks = F.split(normalize_text(text_col), " ")
    scores = {
        lang: F.size(F.filter(toks, lambda w: w.isin(markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    best = F.greatest(*[scores[lang] for lang in langs])
    pred = F.lit("und")
    # reversed: earlier languages win ties via later overwrite
    for lang in reversed(langs):
        pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best == 0, F.lit("und")).otherwise(pred)
    out = df.select(F.col(id_col), pred.alias("pred_lang"))
    return out


def doc_fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stable document fingerprint: md5 over normalized text (exact-dup key)
    plus a coarse locality key (first 8 hex chars) usable for sharding."""
    fp = F.md5(normalize_text(text_col))
    return df.select(
        F.col(id_col),
        fp.alias("fp"),
        F.substring(fp, 1, 8).alias("shard_key"),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into overlapping fixed-token-count chunks — the
    context-window preprocessing step of every embedding/RAG/training
    pipeline. Chunk i covers tokens [i·stride, i·stride + chunk_tokens) with
    stride = chunk_tokens − overlap; the final partial chunk is kept.

    Pure Catalyst: split → materialized token array → posexplode over the
    chunk index sequence → slice + array_join. The explode is narrow (no
    shuffle); at 100 TB chunking is scan-side and the only data growth is the
    overlap fraction.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    from lakeflow.operators.transforms import fan_out

    toked = fan_out(
        df.select(
            F.col(id_col),
            F.split(normalize_text(text_col), " ").alias("__toks"),
        ),
        barrier=True,
    )
    n_tok = F.size("__toks")
    # chunks = 1 + ceil(max(0, n_tok - chunk_tokens) / stride)
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(n_tok - chunk_tokens, F.lit(0)) / F.lit(stride)
    ).cast("int")
    idx = F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx")
    out = toked.select(F.col(id_col), "__toks", idx)
    chunk = F.slice("__toks", F.col("chunk_idx") * stride + 1, chunk_tokens)
    return out.select(
        F.col(id_col),
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).cast("bigint").alias("chunk_n_tokens"),
    )


def span_corruption(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    span_len: int = 2,
    window_pct: int = 60,
) -> DataFrame:
    """T5/UL2-style span-corruption preprocessing: deterministically mask
    token spans, emitting the sentinel-marked encoder input and the
    sentinel-keyed target sequence a denoising objective trains on.

    Tokens partition into fixed windows of ``window``; window ``w`` of a doc
    corrupts iff ``md5(doc_id:w) % 100 < window_pct``, and a corrupted
    window masks its FIRST ``span_len`` tokens. The window partition makes
    spans non-overlapping by construction (T5 samples geometric span
    lengths; the fixed-grid variant keeps the op a pure Catalyst
    expression), and the expected masked-token rate is
    ``window_pct/100 · span_len/window`` — the defaults give T5's 15%.
    Masked span k is replaced by ``<extra_id_k>`` in the input; the target
    is ``<extra_id_0> span0 <extra_id_1> span1 …``.

    Scan-side per-row arrays only — no explode, no shuffle, no Python; at
    100 TB this is a map stage like tokenization. The md5 window draw makes
    every (doc, window) decision engine-replayable, so the whole
    input/target rendering is oracle-checkable.

    Output: (id, n_tokens, n_spans, n_masked, input_text, target_text).
    """
    if not 1 <= span_len <= window:
        raise ValueError("need 1 <= span_len <= window")

    toked = df.select(
        F.col(id_col),
        F.split(normalize_text(text_col), " ").alias("__toks"),
    )
    n = F.size("__toks")
    n_windows = F.ceil(n / F.lit(window)).cast("int")

    def window_draw(w):
        h = F.md5(
            F.concat_ws(
                ":", F.col(id_col).cast("string"), w.cast("string")
            )
        )
        return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % 100

    corrupted = F.filter(
        F.sequence(F.lit(0), n_windows - 1),
        lambda w: window_draw(w) < window_pct,
    )
    staged = toked.select(
        F.col(id_col), "__toks", corrupted.alias("__cw")
    )

    def sentinel(k):  # k: 0-based span index column
        return F.concat(F.lit("<extra_id_"), k.cast("string"), F.lit(">"))

    def w_of(i):
        return (i / F.lit(window)).cast("int")

    masked = lambda i: F.array_contains(F.col("__cw"), w_of(i)) & (
        i % window < span_len
    )
    inp = F.transform(
        "__toks",
        lambda t, i: F.when(
            masked(i) & (i % window == 0),
            sentinel(F.array_position("__cw", w_of(i)) - 1),
        )
        .when(masked(i), F.lit(None))
        .otherwise(t),
    )
    tgt = F.transform(
        "__cw",
        lambda w: F.concat_ws(
            " ",
            sentinel(F.array_position("__cw", w) - 1),
            F.array_join(
                F.slice("__toks", w * window + 1, span_len), " "
            ),
        ),
    )
    n2 = F.size("__toks")
    return staged.select(
        F.col(id_col),
        n2.cast("bigint").alias("n_tokens"),
        F.size("__cw").cast("int").alias("n_spans"),
        F.aggregate(
            "__cw",
            F.lit(0).cast("bigint"),
            lambda acc, w: acc + F.least(F.lit(span_len), n2 - w * window),
        ).alias("n_masked"),
        F.array_join(
            F.filter(inp, lambda x: x.isNotNull()), " "
        ).alias("input_text"),
        F.array_join(tgt, " ").alias("target_text"),
    )


# Engine-portable patterns (no lookaround, POSIX classes only — valid in both
# Java regex and RE2, so the DuckDB oracle applies the identical expressions).
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\+?[0-9][0-9()\-\. ]{7,}[0-9]", "<PHONE>"),
    (r"https?://[^\s]+", "<URL>"),
]


def redact_pii(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Regex PII redaction (emails, phone-ish numbers, URLs) — the scrubbing
    pass before corpus release/training. Scan-side regexp_replace chain, no
    shuffle; output flags how many docs changed for audit."""
    redacted = F.col(text_col)
    for pat, repl in PII_PATTERNS:
        redacted = F.regexp_replace(redacted, pat, repl)
    return df.select(
        F.col(id_col),
        redacted.alias("clean_text"),
        (redacted != F.col(text_col)).alias("was_redacted"),
    )


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 20,
    min_alpha_ratio: float = 0.55,
    max_digit_ratio: float = 0.15,
    min_stop_ratio: float = 0.01,
) -> DataFrame:
    """Composite keep/drop verdict over the quality features — the gate stage
    of a training-data pipeline (quality_features scores; this one decides).

    Emits the doc id, the boolean verdict, and the FIRST failing rule as
    ``reason`` ('keep' when none fail) so downstream audits can histogram why
    the corpus shrank. Pure projection over one pass; zero shuffles.
    """
    feats = quality_features(df, text_col=text_col, id_col=id_col)
    reason = (
        F.when(F.col("n_tokens") < min_tokens, F.lit("too_short"))
        .when(F.col("alpha_ratio") < min_alpha_ratio, F.lit("low_alpha"))
        .when(F.col("digit_ratio") > max_digit_ratio, F.lit("too_numeric"))
        .when(F.col("stop_ratio") < min_stop_ratio, F.lit("no_stopwords"))
        .otherwise(F.lit("keep"))
    )
    return feats.select(
        F.col(id_col),
        reason.alias("reason"),
        (reason == "keep").alias("keep"),
    )


def token_budget_report(
    scored: DataFrame,
    score_col: str,
    weight_col: str,
    budget_frac: float,
    width: float = 0.05,
) -> DataFrame:
    """Token-budget selection WITHOUT a global sort: "fill X% of the corpus
    token budget with the best-scoring docs" is the final step of every
    curation pipeline, and the naive form (ORDER BY score DESC, running
    cumsum, stop at the budget) is a total order over the corpus — the one
    plan shape that cannot scale. Instead the score distribution folds into
    a fixed-width histogram (the same mergeable-partial shape as
    ``histogram_partials``, weighted by ``weight_col``), the cutoff bin is
    read off the tiny descending-cumulative frame, and selection becomes a
    scan-side ``score ≥ cutoff`` filter. Resolution is one bin width —
    the same accuracy/cost trade as the quantile sketch, and at 100 TB the
    per-shard histograms merge by summing, so the cutoff never rescans.

    Emits a one-row audit: total/budget tokens, the cutoff score, selected
    doc and token counts, ``within_budget`` (selection fits) and
    ``maximal`` (admitting one more bin would overflow — greedy-maximal at
    bin granularity). All integer/boolean or exact-double arithmetic, so
    the report is engine-reproducible."""
    from pyspark.sql import Window

    b = F.floor(F.col(score_col) / F.lit(width)).cast("bigint")
    hist = scored.groupBy(b.alias("bin")).agg(
        F.sum(weight_col).cast("bigint").alias("w"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    totals = scored.agg(
        F.sum(weight_col).cast("bigint").alias("total_tokens")
    ).select(
        "total_tokens",
        F.floor(F.lit(budget_frac) * F.col("total_tokens"))
        .cast("bigint")
        .alias("budget"),
    )
    w_desc = Window.orderBy(F.col("bin").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = hist.select(
        "bin", "w", "n", F.sum("w").over(w_desc).cast("bigint").alias("cum")
    ).crossJoin(totals)
    sel = cum.filter(F.col("cum") <= F.col("budget")).agg(
        F.min("bin").alias("__cutoff_bin"),
        F.sum("n").cast("bigint").alias("n_selected"),
        F.max("cum").cast("bigint").alias("tokens_selected"),
    )
    nxt = cum.filter(F.col("cum") > F.col("budget")).agg(
        F.min("cum").cast("bigint").alias("__next_cum")
    )
    return (
        totals.crossJoin(sel)
        .crossJoin(nxt)
        .select(
            "total_tokens",
            "budget",
            (F.col("__cutoff_bin") * F.lit(width)).alias("cutoff_score"),
            "n_selected",
            "tokens_selected",
            (F.col("tokens_selected") <= F.col("budget")).alias(
                "within_budget"
            ),
            F.coalesce(
                F.col("__next_cum") > F.col("budget"), F.lit(True)
            ).alias("maximal"),
        )
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    eager: bool = False,
) -> DataFrame:
    """BM25 keyword retrieval: top-``k`` docs for a bag of query terms.

    Cache lifetime (ADVICE r13): the skinny per-doc stats frame is
    persisted so the corpus is scanned/tokenized once for the constants
    aggregate and the scoring pass. Returned lazily, that cache entry is
    CALLER-owned — it lives in the session's CacheManager until
    ``spark.catalog.clearCache()`` (the bench clears between passes) or
    session end. Long-lived sessions calling this repeatedly should pass
    ``eager=True``: the (k-row) result is materialized via
    ``localCheckpoint`` and the working set unpersisted before return —
    the same convention as ``jaccard_verify``/``margin_knn_pairs``.

    Inverted-index plan shape: tokens explode scan-side (the posting list),
    term frequencies and doc lengths are algebraic aggregates with map-side
    combine, and only docs containing ≥1 query term are ever scored (the
    inner join on the term set IS the index probe). Global top-k is a
    TakeOrderedAndProject — no full sort. At 100 TB the tf/df relations are
    the precomputed index tables; the query-time work is |postings(terms)|.

    Determinism contract: per-term contributions are fixed to 6 decimals and
    summed as integer micro-units, so the total is addition-order-free and
    any SQL engine replays the exact score (ties broken by id).

    Plan shape (r13 rewrite, guide §2.3/§2.4): ONE corpus scan. The former
    relational form derived dl/tf/df/stats from a shared exploded-token
    frame, which Spark recomputed per consumer — four parquet scans and
    four tokenize passes of the same corpus per run (verified in the
    before-plan). Now per-doc term frequencies are array expressions on the
    token array (``dl = size(toks)``, ``tf_t = size(filter(toks, = t))``) in
    a single scan-side projection; the corpus-wide constants (N, Σdl, df_t)
    collapse into ONE single-row aggregate that broadcasts back via
    crossJoin. Per-term scores and the micro-unit sum then evaluate
    row-local — no groupBy at all; the only wide ops are the one-row
    aggregate and the final TakeOrdered(k). Scores are bit-identical: the
    same per-term expression evaluates on the same (tf, dl, df, N, Σdl)
    values, micro-rounded and summed in a fixed term order (term order in a
    doc's score sum was already immaterial — integer addition commutes).
    """
    from lakeflow.operators.transforms import fan_out

    # The old per-(id, tok) form scored each DISTINCT matching term once; a
    # duplicated entry in query_terms must not double-count.
    query_terms = list(dict.fromkeys(query_terms))
    toked = fan_out(
        df.select(F.col(id_col).alias("id"), F.col(text_col)), barrier=True
    ).select("id", F.split(normalize_text(text_col), " ").alias("__toks"))

    def tf_of(term: str) -> F.Column:
        # Closure factory: a two-arg lambda in F.filter would be treated as
        # (element, index), so bind the term via a one-arg closure.
        return F.size(F.filter("__toks", lambda x: x == F.lit(term)))

    # Skinny per-doc stats (id, dl, tf per term ≈ tens of bytes/doc) feed
    # both the constants aggregate and the scoring pass — persist so the
    # corpus is scanned and tokenized ONCE (cache lifetime caller-owned,
    # same convention as jaccard_verify's working set).
    per_doc = toked.select(
        "id",
        F.size("__toks").alias("dl"),
        *[tf_of(t).alias(f"__tf{i}") for i, t in enumerate(query_terms)],
    ).persist()
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"__tf{i}") > 0).cast("bigint")).alias(f"__df{i}")
            for i in range(len(query_terms))
        ],
    )
    avgdl = F.col("sum_dl") / F.col("n")

    def term_micro(i: int) -> F.Column:
        tf = F.col(f"__tf{i}").cast("bigint")
        dfreq = F.col(f"__df{i}")
        idf = F.log((F.col("n") - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
        term_score = idf * (
            tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * F.col("dl") / avgdl))
        )
        # A term absent from the doc contributed no row in the old per-
        # (id, tok) form; floor(0-score) is 0 micro-units, so gating on
        # tf > 0 keeps the sum identical while skipping the log/div work.
        return F.when(
            tf > 0,
            F.floor(term_score * 1_000_000.0 + 0.5).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint"))

    micro_sum: F.Column = F.lit(0).cast("bigint")
    for i in range(len(query_terms)):
        micro_sum = micro_sum + term_micro(i)
    any_hit = (
        F.expr(" OR ".join(f"__tf{i} > 0" for i in range(len(query_terms))))
        if query_terms
        else F.lit(False)
    )
    scored = (
        per_doc.filter(any_hit)
        .crossJoin(F.broadcast(stats))
        .select("id", (micro_sum / 1_000_000.0).alias("bm25"))
    )
    out = (
        scored.select(F.col("id").alias(id_col), "bm25")
        .orderBy(F.desc("bm25"), F.asc(id_col))
        .limit(k)
    )
    if eager:
        out = out.localCheckpoint(eager=True)
        per_doc.unpersist()
    return out


def winnow_fingerprints_jvm(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    window: int = 4,
) -> DataFrame:
    """Winnowing fingerprints as pure Catalyst window functions — the 100 TB
    path (no Python workers); result-identical to the UDTF form
    (:func:`winnow_fingerprints`, kept as the SURVEY §2.10 surface demo).

    The rightmost-minimum selection collapses into a single windowed
    aggregate: ``min(struct(h, -i))`` over a ``window``-wide row frame is
    lexicographic, so it picks the smallest hash and, among ties, the largest
    position — exactly Schleimer et al.'s tie-break. One shuffle for the
    per-doc window sort; the distinct reuses its hash(id) partitioning.
    """
    from pyspark.sql import Window

    from lakeflow.operators.dedup import normalize_text
    from lakeflow.operators.transforms import fan_out

    toks = F.split(normalize_text(text_col), " ")
    # Same materialization fence as word_shingles: the token array becomes a
    # bound column before the gram transform references it, instead of the
    # regex+split expression collapsing into the lambda (and the single scan
    # task of a small parquet file spreads across cores). Measured r13:
    # 1.09 s → 0.78 s warm for the full fingerprint pass at sf0.1.
    toked = fan_out(
        df.select(F.col(id_col), toks.alias("__toks")), barrier=True
    ).filter(
        F.size("__toks") >= k + window - 1  # UDTF guard: m >= window
    )
    # Hash every k-gram: one md5 per gram, positions 0..m-1.
    hs = F.transform(
        F.sequence(F.lit(0), F.size("__toks") - k),
        lambda i: F.conv(
            F.substring(F.md5(F.array_join(F.slice("__toks", i + 1, k), " ")), 1, 8),
            16,
            10,
        ).cast("bigint"),
    )
    grams = toked.select(F.col(id_col), F.posexplode(hs).alias("i", "h"))
    frame = (
        Window.partitionBy(id_col).orderBy("i").rowsBetween(0, window - 1)
    )
    sel = (
        grams.select(
            F.col(id_col),
            "i",
            F.count(F.lit(1)).over(Window.partitionBy(id_col)).alias("m"),
            F.min(F.struct(F.col("h"), (-F.col("i")).alias("neg_i")))
            .over(frame)
            .alias("ws"),
        )
        .filter(F.col("i") <= F.col("m") - window)
        .select(
            F.col(id_col),
            (-F.col("ws.neg_i")).cast("int").alias("pos"),
            F.col("ws.h").alias("h"),
        )
        .distinct()
    )
    return sel


def winnow_containment(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    window: int = 4,
) -> DataFrame:
    """Benchmark decontamination: flag corpus docs whose winnowing
    fingerprints substantially overlap a benchmark/eval set.

    The dominant leakage check in training-data pipelines: any shared
    passage of ≥ k+window−1 tokens between a training doc and an eval doc
    shares a fingerprint (the winnowing guarantee), so the contained-share
    of a doc's distinct fingerprint hashes is a passage-overlap score.
    Output: (id, n_fp, n_hits, containment, contaminated).

    Scale shape: fingerprints are computed scan-side per doc; the benchmark
    hash set is tiny relative to the corpus (eval sets are small) and
    broadcast into a semi-join-style membership count. No pairwise work.
    """
    corpus_fp = winnow_fingerprints_jvm(
        corpus, text_col=text_col, id_col=id_col, k=k, window=window
    ).select(F.col(id_col).alias("id"), "h").distinct()
    bench_h = (
        winnow_fingerprints_jvm(
            benchmark, text_col=text_col, id_col=id_col, k=k, window=window
        )
        .select("h")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    counts = (
        corpus_fp.join(F.broadcast(bench_h), "h", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_fp"),
            F.count("__hit").alias("n_hits"),
        )
    )
    return counts.select(
        F.col("id").alias(id_col),
        "n_fp",
        "n_hits",
        rnd(F.col("n_hits") / F.col("n_fp"), 6).alias("containment"),
        (F.col("n_hits") / F.col("n_fp") >= threshold).alias("contaminated"),
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    window: int = 4,
) -> DataFrame:
    """Winnowing fingerprints (Schleimer et al., SIGMOD 2003) via a Python
    UDTF — the SURVEY.md §2.10 UDTF surface.

    Hash every k-token gram (md5 → 32-bit int), slide a ``window``-wide
    window over the hash sequence and keep the rightmost minimum of each —
    the classic local-document-fingerprint guarantee (any shared substring of
    ≥ k+window−1 tokens shares a fingerprint). Per-window argmin with a
    rightmost tie-break is awkward to push through SQL windows but is a
    10-line generator in a UDTF; rows fan out lateral-join style, scan-side,
    no shuffle. Output: (id, pos, h) — one row per selected fingerprint.
    """
    import hashlib
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, h bigint")
    class _Winnow:
        def eval(self, text: str):  # noqa: ANN001 - UDTF contract
            if text is None:
                return
            toks = re.sub(r"\s+", " ", text.strip().lower()).split(" ")
            m = len(toks) - k + 1
            if m < window:
                return
            hs = [
                int(
                    hashlib.md5(" ".join(toks[i : i + k]).encode()).hexdigest()[:8],
                    16,
                )
                for i in range(m)
            ]
            seen: set[int] = set()
            for s in range(m - window + 1):
                win = hs[s : s + window]
                lo = min(win)
                pos = s + max(i for i, v in enumerate(win) if v == lo)
                if pos not in seen:
                    seen.add(pos)
                    yield (pos, hs[pos])

    name = f"lakeflow_winnow_{k}_{window}"
    df.sparkSession.udtf.register(name, _Winnow)
    df.select(id_col, text_col).createOrReplaceTempView(f"{name}_src")
    return df.sparkSession.sql(
        f"SELECT s.{id_col}, f.pos, f.h "
        f"FROM {name}_src s, LATERAL {name}(s.{text_col}) f"
    )


def repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc repetition/diversity signals (the Gopher-style repetition
    filters): token count, distinct-token count, type-token ratio, and the
    corpus-quality workhorse ``top_token_frac`` — the share of the document
    occupied by its single most frequent token. Boilerplate, keyword-stuffed,
    and generation-looped documents all light up on these before any
    expensive dedup runs.

    Shape: explode → two-stage aggregation. The first groupBy(doc, token)
    partially aggregates map-side, so shuffle rows are bounded by per-doc
    VOCABULARY, not token count — linear scan cost and shuffle ∝ distinct
    (doc, token) pairs at 100 TB. The per-row array-expression alternative
    (aggregate over array_distinct × filter) is quadratic in document length,
    which a 100k-token document turns into 10^10 ops — rejected.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(normalize_text(text_col), " ")).alias("tok"),
    )
    counts = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("c"))
    return counts.groupBy(id_col).agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        rnd(F.count(F.lit(1)) / F.sum("c"), 6).alias("type_token_ratio"),
        rnd(F.max("c") / F.sum("c"), 6).alias("top_token_frac"),
    )


def ngram_novelty(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    round_to: int = 6,
) -> DataFrame:
    """Per-doc n-gram novelty: the fraction of a document's DISTINCT word
    n-grams that appear in no other document. Boilerplate, templated pages,
    and quotation-heavy documents score low; original prose scores high —
    the between-doc complement of repetition_signals' within-doc ratios,
    and a standard pre-dedup curation signal (cheap to compute, catches
    near-boilerplate that exact dedup misses).

    Shape: distinct (doc, gram) pairs built scan-side from the token array
    (one transform, no self-join), then (1) groupBy(gram) counting the DOCS
    that contain it — map-side partial combine bounds shuffle rows by
    distinct grams — and (2) an equi-join back on gram plus a per-doc mean
    of the uniqueness bit. Both shuffles key on gram/doc; nothing is ever
    pairwise, so cost at 100 TB is two bounded shuffles, not doc².

    Output: (id, n_grams, novelty) — docs shorter than ``n`` tokens emit
    n_grams=0, novelty=NULL (no gram evidence either way).
    """
    toks = df.select(
        F.col(id_col), F.split(normalize_text(text_col), " ").alias("ts")
    )
    grams = toks.select(
        F.col(id_col),
        F.explode(
            # sequence(1, 0) DESCENDS in Spark, so short docs need an
            # explicit empty-array branch rather than a clamped bound.
            F.expr(
                f"CASE WHEN size(ts) >= {n} THEN "
                f"array_distinct(transform(sequence(1, size(ts) - {n - 1}), "
                f"i -> array_join(slice(ts, i, {n}), ' '))) "
                f"ELSE array() END"
            )
        ).alias("gram"),
    )
    doc_freq = grams.groupBy("gram").agg(
        F.count(F.lit(1)).alias("df")  # distinct per doc already
    )
    scored = grams.join(doc_freq, "gram").select(
        F.col(id_col), (F.col("df") == 1).cast("int").alias("uniq")
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_grams"),
        rnd(F.sum("uniq") / F.count(F.lit(1)), round_to).alias("novelty"),
    )
    # Short docs (< n tokens) have no grams; keep them with NULL novelty so
    # the report covers the whole corpus.
    base = df.select(F.col(id_col))
    return base.join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_grams", F.lit(0).cast("bigint")).alias("n_grams"),
        "novelty",
    )


def pack_budget_bins(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget: int = 512,
    n_shards: int = 32,
) -> DataFrame:
    """Deterministic sequence packing: group whole documents into contiguous
    token-budget bins — the batching step before LLM training, where each bin
    becomes one (padded/packed) training sequence group.

    Semantics: within shard ``id % n_shards``, documents are laid out in id
    order; a document belongs to the bin its STARTING token offset falls in
    (offset quantized by ``budget``). Every bin holds contiguous whole
    documents and overflows the budget by at most one document — the standard
    streaming-packing approximation, chosen over exact first-fit because it
    needs no per-bin running state (exact restart-sum packing is inherently
    sequential; this is one window cumsum).

    Scale shape: the cumsum windows over ``n_shards`` independent shards, so
    parallelism is a knob, not a bottleneck — no global sort ever happens.
    At 100 TB raise n_shards to O(cores); determinism holds because the
    shard key is ``id % n_shards``, not a hash.
    """
    binned = assign_budget_bins(df, text_col, id_col, budget, n_shards)
    return binned.groupBy("bin_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.min(id_col).alias("first_doc"),
        F.max(id_col).alias("last_doc"),
    )


def assign_budget_bins(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget: int = 512,
    n_shards: int = 32,
) -> DataFrame:
    """Per-document bin assignment underlying :func:`pack_budget_bins`:
    (id, n_tokens, shard, bin_id) with the original columns retained.
    Bin-id encoding: shard in the high bits (stride 2^40), bin offset in
    the low 40 bits. A shard overflows only past 2^40 bins ≈ 5.6e14 tokens
    per shard at budget=512 — far beyond the 100 TB corpus target even at
    n_shards=32 (the previous 1e9 stride collided at ~512 G tokens/shard,
    ADVICE r4).
    """
    from pyspark.sql import Window

    toks = df.withColumn("n_tokens", token_count_ws(text_col)).withColumn(
        "shard", F.col(id_col) % n_shards
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return toks.withColumn(
        "bin_id",
        (F.col("shard") * F.lit(1 << 40) + F.floor(start / budget)).cast(
            "bigint"
        ),
    )


def pack_texts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget: int = 512,
    n_shards: int = 32,
    separator: str = "<|eot|>",
) -> DataFrame:
    """Materialize the packed training sequences themselves: each token-budget
    bin's documents concatenated IN id ORDER with an end-of-text separator —
    the actual artifact a training job reads, where :func:`pack_budget_bins`
    reports only the bin statistics.

    Scale shape: the bin assignment's per-shard cumsum, then one groupBy(bin)
    whose payload is the bin's own documents (~budget tokens) — output rows
    are training sequences, so the shuffle volume IS the corpus, moved once.

    Output: (bin_id, n_docs, packed_text).
    """
    binned = assign_budget_bins(df, text_col, id_col, budget, n_shards)
    return binned.groupBy("bin_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.concat_ws(
            separator,
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col(id_col), F.col(text_col)))
                ),
                lambda s: s[text_col],
            ),
        ).alias("packed_text"),
    )


def unigram_logprob_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 6,
    min_count: int = 1,
) -> DataFrame:
    """Statistical-LM quality scoring, unigram form: each document scored by
    the mean log-probability of its tokens under the corpus's own unigram
    distribution — the simplified shape of a KenLM perplexity filter.
    Gibberish, rare-token spam, and wrong-language text score far below the
    corpus mode; the score feeds the same keep/drop gate as quality_features.

    Scale shape: the vocabulary is one groupBy(token) whose map-side partial
    combine bounds shuffle rows by vocabulary; it is persisted
    (MEMORY_AND_DISK — vocab-sized, spills rather than OOMs), and the corpus
    token total is a one-row aggregate over that cached frame, so deriving
    the scalar costs no second scan of the exploded tokens (the old shape
    paid a separate ``toks.count()`` pass, and ReuseExchange cannot dedup
    the two subtrees because column pruning diverges them). The scoring
    query then scans the corpus exactly once (the join probe); the build
    side comes from the cache, and the join strategy is left to AQE, which
    broadcasts when the cached vocab is small and shuffle-joins when it is
    not — a 100 TB web corpus has billions of distinct whitespace tokens,
    and the previous forced broadcast would OOM the driver exactly at the
    scale this operator targets.

    ``min_count`` is the KenLM-style frequency floor for that regime:
    tokens seen fewer than ``min_count`` times pool into one OOV bucket
    (scored by the pooled rare mass), so the joinable vocab shrinks to the
    head that real LM filters keep. The default 1 keeps every token and is
    the oracle-checked configuration.

    Determinism: per-token log-probs are quantized to exact integer
    micro-nats BEFORE the sum, so bigint accumulation is order-free and the
    distributed mean cannot drift an ulp however partitions combine. The
    residual cross-engine risk is ``ln`` itself (JVM Math.log is within 1
    ulp, not correctly-rounded); a flip needs the two engines' ln to
    straddle a 0.5-micro-nat boundary (~1e-10 per distinct count) AND the
    final 1e-6-rounded mean to sit on its own boundary —
    ``tests/test_operators.py`` pins Spark-vs-DuckDB agreement over the
    fixture's full distinct-count domain so any drift is caught at the
    operating point.

    Output: (id, n_tokens, avg_logprob) — natural log, rounded.
    """
    from pyspark import StorageLevel

    toks = df.select(
        F.col(id_col),
        F.explode(F.split(normalize_text(text_col), " ")).alias("tok"),
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("tc")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    stats_cols = [F.sum("tc").alias("n")]
    if min_count > 1:
        stats_cols.append(
            F.sum(
                F.when(F.col("tc") < min_count, F.col("tc")).otherwise(F.lit(0))
            ).alias("oov_mass")
        )
    # Control-plane scalars off the cached aggregate (this action also
    # materializes the cache the join below reuses). The cache lives until
    # LRU eviction or spark.catalog.clearCache(); it is the join build side,
    # so holding it is the point, not a leak.
    stats = vocab.agg(*stats_cols).collect()[0]
    total = stats["n"] or 1  # empty corpus: toks has no rows, value unused
    kept = (
        vocab.filter(F.col("tc") >= min_count) if min_count > 1 else vocab
    )
    joined = toks.join(kept, "tok", "left" if min_count > 1 else "inner")
    lp = F.log(F.col("tc") / F.lit(float(total)))
    if min_count > 1:
        # Pooled rare mass, floored at one count so an all-kept corpus
        # cannot produce log(0).
        lp = F.coalesce(
            lp, F.lit(math.log(max(stats["oov_mass"] or 0, 1) / float(total)))
        )
    scored = joined.select(
        F.col(id_col),
        F.floor(lp * 1e6 + 0.5).cast("bigint").alias("lp_micro"),
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        rnd(
            F.sum("lp_micro") / F.count(F.lit(1)) / 1e6, round_to
        ).alias("avg_logprob"),
    )


def leakage_safe_split(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    val_pct: int = 10,
    test_pct: int = 10,
) -> DataFrame:
    """Train/val/test assignment keyed on the DUPLICATE-GROUP fingerprint,
    not the row id: every doc whose normalized text collides lands in the
    same split, so an exact duplicate of a training document can never leak
    into eval — the contamination mode a naive per-row split invites the
    moment a corpus contains duplicates (most web corpora: ~30%).

    Deterministic (md5 of the content fingerprint), so incremental ingestion
    never reassigns an existing group, and engine-reproducible. Scan-side
    projection: the fingerprint is computed where the text already is; no
    shuffle, no state.

    Output: (id, fp, split) with split ∈ {train, val, test}.
    """
    from lakeflow.operators.dedup import normalize_text

    fp = F.md5(normalize_text(text_col))
    bucket = (
        F.conv(F.substring(fp, 1, 8), 16, 10).cast("bigint") % 100
    )
    train_hi = 100 - val_pct - test_pct
    split = (
        F.when(bucket < train_hi, F.lit("train"))
        .when(bucket < 100 - test_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.select(F.col(id_col), fp.alias("fp"), split.alias("split"))


def boilerplate_strip(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_tokens: int = 8,
    max_df: int = 3,
) -> DataFrame:
    """Segment-level dedup inside documents (the CCNet/RefinedWeb line-dedup
    pass): split each document into segments, drop every segment whose
    fingerprint appears in ``max_df`` or more DISTINCT documents (headers,
    footers, nav bars, license blurbs — boilerplate that whole-doc dedup
    can't touch because the surrounding text differs), and reassemble the
    survivors in order.

    Segmentation here is fixed ``seg_tokens``-token windows of the
    normalized text (the fixture corpus has no newline structure); on real
    web text swap the segmenter for a newline split — every downstream step
    is segmentation-agnostic.

    Scale shape: one explode, one fingerprint groupBy (shuffle bounded by
    distinct segments, map-side combined), one fp-keyed join back, one
    per-doc reassembly groupBy. No pairwise comparisons anywhere — the df
    threshold does the work a quadratic similarity pass would.

    Output: (id, clean_text, n_segs, n_dropped); a fully-boilerplate doc
    keeps an empty clean_text rather than vanishing.
    """
    from lakeflow.operators.dedup import normalize_text

    toks = F.split(normalize_text(text_col), " ")
    n = F.ceil(F.size(toks) / F.lit(float(seg_tokens))).cast("int")
    segs = F.when(n > 0, F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.array_join(
            F.slice(toks, i * seg_tokens + 1, seg_tokens), " "
        ),
    )).otherwise(F.array().cast("array<string>"))
    ex = df.select(
        F.col(id_col), F.posexplode(segs).alias("pos", "seg")
    ).withColumn("fp", F.md5("seg"))
    dfreq = ex.groupBy("fp").agg(
        F.countDistinct(id_col).alias("seg_df")
    )
    kept = ex.join(dfreq, "fp").filter(F.col("seg_df") < max_df)
    out = kept.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "seg"))),
                lambda s: s["seg"],
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).cast("bigint").alias("__n_kept"),
    )
    totals = ex.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_segs")
    )
    return totals.join(out, id_col, "left").select(
        id_col,
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        "n_segs",
        (F.col("n_segs") - F.coalesce("__n_kept", F.lit(0))).alias("n_dropped"),
    )


def bigram_logprob_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    backoff: float = 0.4,
    round_to: int = 6,
    counts_from: DataFrame | None = None,
) -> DataFrame:
    """Bigram-LM quality scoring with stupid backoff (Brants et al. 2007):
    each document scored by the mean log-probability of its token
    transitions under the corpus's own bigram counts —
    p(w2|w1) = c(w1 w2)/c(w1) when the bigram was seen, else
    ``backoff`` * c(w2)/N. One step up from the unigram filter: it also
    penalizes texts whose words are individually common but ordered
    implausibly (shuffled text, keyword stuffing, bad MT).

    Scale shape: bigram and unigram count aggregates are map-side combined
    (shuffle bounded by distinct n-grams); the scoring pass scans the
    corpus transitions once and joins the two count tables under AQE's
    strategy choice — nothing force-broadcasts a web-scale vocabulary
    (the unigram operator's r4 lesson). Per-transition log-probs quantize
    to integer micro-nats before the sum, so bigint accumulation is
    order-free; cross-engine ln agreement over the fixture's full
    count-ratio domain is pinned by test (same regime as the unigram op).

    ``counts_from`` scores against a DIFFERENT corpus's counts (the
    held-out regime, and the one where backoff actually fires — a corpus
    scored under its own counts has no unseen bigram by construction);
    default None self-scores.

    Output: (id, n_bigrams, avg_logprob) — docs with < 2 tokens emit
    n_bigrams=0, avg_logprob NULL. Smoothing floor: an unseen w2 scores
    as count 1 (closed vocabulary assumption would log(0) otherwise).
    """
    from pyspark.sql import Window

    from lakeflow.operators.dedup import normalize_text

    def transitions(frame: DataFrame):
        t = frame.select(
            F.col(id_col),
            F.posexplode(
                F.split(normalize_text(text_col), " ")
            ).alias("pos", "w2"),
        )
        w = Window.partitionBy(id_col).orderBy("pos")
        return t, t.withColumn("w1", F.lag("w2").over(w)).filter(
            F.col("w1").isNotNull()
        )

    toks, trans = transitions(df)
    c_toks, c_trans = (
        (toks, trans) if counts_from is None else transitions(counts_from)
    )
    cb = c_trans.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    cu = c_toks.groupBy("w2").agg(F.count(F.lit(1)).alias("cu")).persist()
    total = cu.agg(F.sum("cu")).collect()[0][0] or 1

    uni = cu.withColumnRenamed("w2", "u_tok")
    scored = (
        trans.join(cb, ["w1", "w2"], "left")
        .join(
            cu.withColumnRenamed("cu", "cu1").withColumnRenamed("w2", "w1"),
            "w1",
            "left",
        )
        .join(uni, F.col("w2") == F.col("u_tok"), "left")
        .select(
            F.col(id_col),
            F.when(
                F.col("cb").isNotNull() & F.col("cu1").isNotNull(),
                F.log(F.col("cb") / F.col("cu1").cast("double")),
            )
            .otherwise(
                F.log(
                    F.lit(backoff)
                    * F.coalesce(F.col("cu"), F.lit(1)).cast("double")
                    / F.lit(float(total))
                )
            )
            .alias("lp"),
        )
        .select(
            id_col,
            F.floor(F.col("lp") * 1e6 + 0.5).cast("bigint").alias("lp_micro"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        rnd(F.sum("lp_micro") / F.count(F.lit(1)) / 1e6, round_to).alias(
            "avg_logprob"
        ),
    )
    base = df.select(F.col(id_col))
    return base.join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_bigrams", F.lit(0).cast("bigint")).alias("n_bigrams"),
        "avg_logprob",
    )


def dsir_importance_weights(
    df: DataFrame,
    target_pred: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 6,
) -> DataFrame:
    """DSIR-style data-selection weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): every RAW document gets
    the mean per-token log-ratio between the TARGET domain's unigram
    distribution and the raw corpus's own — positive means target-like, the
    resampling signal that upweights domain-relevant web text. ``target_pred``
    is a boolean Column naming the in-domain rows; everything else is raw.

    Both distributions are Laplace-smoothed over the UNION vocabulary
    ((tc + 1) / (n + V)), so a token unseen in the target cannot produce
    log(0) and the ratio stays finite. The two vocab counts come from one
    full-outer token join of two combine-bounded aggregates (shuffle ∝
    vocabulary, same budget as unigram_logprob_scores); the three scalars
    (n_target, n_raw, V) are a one-row aggregate off that cached frame. The
    scoring pass probes the raw tokens against the vocab once, join
    strategy left to AQE — no forced broadcast of a web-scale vocabulary.

    Determinism: each token's log-ratio is the DIFFERENCE of two
    independently micro-nat-quantized log-probs, so bigint sums are
    addition-order-free and any SQL engine replays the score exactly.

    Output (raw docs only): (id, n_tokens, avg_logratio).
    """
    from pyspark import StorageLevel

    toks = df.select(
        F.col(id_col),
        target_pred.cast("boolean").alias("__is_t"),
        F.explode(F.split(normalize_text(text_col), " ")).alias("tok"),
    )
    vocab = (
        toks.groupBy("tok")
        .agg(
            F.sum(F.when(F.col("__is_t"), 1).otherwise(0)).alias("tc_t"),
            F.sum(F.when(F.col("__is_t"), 0).otherwise(1)).alias("tc_r"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    s = vocab.agg(
        F.sum("tc_t").alias("nt"),
        F.sum("tc_r").alias("nr"),
        F.count(F.lit(1)).alias("v"),
    ).collect()[0]
    nt, nr, v = float(s["nt"] or 0), float(s["nr"] or 0), float(s["v"] or 1)

    def micro(tc_col: str, n: float) -> Column:
        return F.floor(
            F.log((F.col(tc_col) + 1.0) / F.lit(n + v)) * 1e6 + 0.5
        ).cast("bigint")

    scored = (
        toks.filter(~F.col("__is_t"))
        .join(vocab, "tok")
        .select(
            F.col(id_col),
            (micro("tc_t", nt) - micro("tc_r", nr)).alias("lr_micro"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        rnd(F.sum("lr_micro") / F.count(F.lit(1)) / 1e6, round_to).alias(
            "avg_logratio"
        ),
    )


def word_freq_symbols(
    df: DataFrame, text_col: str = "text", eow: str = "</w>"
) -> DataFrame:
    """BPE training's working set: distinct word types with corpus
    frequencies and their initial symbol sequences (characters + an
    end-of-word marker). All BPE statistics derive from this frame, which is
    VOCABULARY-sized — the corpus is scanned once and never again, exactly
    how real BPE trainers operate (Sennrich et al. 2016 train on a word-count
    table, not the raw text).

    Output: (word, f bigint, syms array<string>).
    """
    words = df.select(
        F.explode(F.split(normalize_text(text_col), " ")).alias("word")
    ).filter(F.col("word") != "")
    wf = words.groupBy("word").agg(F.count(F.lit(1)).alias("f"))
    syms = F.concat(
        F.regexp_extract_all(F.col("word"), F.lit("."), 0),
        F.array(F.lit(eow)),
    )
    return wf.select("word", "f", syms.alias("syms"))


def bpe_pair_counts(
    df: DataFrame, text_col: str = "text", top_k: int = 20
) -> DataFrame:
    """The first BPE iteration's statistic: adjacent-symbol pair frequencies
    over the character-level tokenization, weighted by word frequency —
    the argmax of this table is the first learned merge. Deterministic
    (count DESC, pair ASC) tiebreak keeps the cut reproducible.

    Scale shape: one corpus scan to the word-frequency table, then all pair
    work runs on the vocabulary (Heaps'-law-sized, not corpus-sized); the
    pair aggregate is combine-bounded by distinct pairs and the top-k is a
    TakeOrdered, never a global sort.

    Output: (pair string "a|b", n bigint).
    """
    wf = word_freq_symbols(df, text_col)
    pair = F.explode(
        F.expr(
            "transform(sequence(1, size(syms) - 1),"
            " i -> concat(syms[i - 1], '|', syms[i]))"
        )
    ).alias("pair")
    # sequence(1, 0) DESCENDS in Spark, so a single-symbol word would index
    # out of bounds — words with fewer than two symbols have no pairs.
    pairs = wf.filter(F.size("syms") >= 2).select("f", pair)
    counted = pairs.groupBy("pair").agg(F.sum("f").alias("n"))
    return counted.orderBy(F.desc("n"), F.asc("pair")).limit(top_k)


def _merge_pair_expr(a: str, b: str) -> str:
    """SQL expression merging every left-to-right non-overlapping (a, b)
    adjacency in ``syms`` into one symbol — the BPE merge application as a
    single JVM-side fold (no Python in the loop)."""
    qa, qb = a.replace("'", "\\'"), b.replace("'", "\\'")
    return f"""
    aggregate(
        syms,
        struct(CAST(array() AS array<string>) AS out, CAST(NULL AS string) AS p),
        (acc, x) -> CASE
            WHEN acc.p = '{qa}' AND x = '{qb}'
                THEN struct(array_append(acc.out, '{qa}{qb}') AS out,
                            CAST(NULL AS string) AS p)
            WHEN acc.p IS NULL THEN struct(acc.out AS out, x AS p)
            ELSE struct(array_append(acc.out, acc.p) AS out, x AS p)
        END,
        acc -> CASE WHEN acc.p IS NULL THEN acc.out
                    ELSE array_append(acc.out, acc.p) END
    )
    """


def bpe_learn_merges(
    df: DataFrame, text_col: str = "text", n_merges: int = 8
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges over the corpus: iteratively count
    adjacent symbol pairs (weighted by word frequency), take the most
    frequent (ties broken lexicographically so training is deterministic),
    and fold that pair into one symbol everywhere.

    The driver holds only the merge table (n_merges rows — control plane);
    each iteration is one combine-bounded aggregate plus a TakeOrdered(1)
    over the persisted vocabulary frame, and the merge application is a
    Catalyst ``aggregate`` fold — no Python touches a row. Real trainers
    cap iterations in the thousands; the per-iteration cost here is
    O(vocab · word-length), independent of corpus size after the first scan.

    Returns [(left, right, weighted_count), ...] in merge order.
    """
    from pyspark import StorageLevel

    vocab = word_freq_symbols(df, text_col).select("f", "syms").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    merges: list[tuple[str, str, int]] = []
    current = vocab
    for _ in range(n_merges):
        pairs = current.filter(F.size("syms") >= 2).select(
            "f",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(syms) - 1),"
                    " i -> struct(syms[i - 1] AS a, syms[i] AS b))"
                )
            ).alias("pr"),
        )
        top = (
            pairs.groupBy("pr.a", "pr.b")
            .agg(F.sum("f").alias("n"))
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, n = top[0]["a"], top[0]["b"], top[0]["n"]
        merges.append((a, b, n))
        nxt = current.select(
            "f", F.expr(_merge_pair_expr(a, b)).alias("syms")
        ).persist(StorageLevel.MEMORY_AND_DISK)
        nxt.count()  # materialize before dropping the parent
        current.unpersist()
        current = nxt
    current.unpersist()
    return merges


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    eow: str = "</w>",
) -> DataFrame:
    """Apply a learned BPE merge table (from :func:`bpe_learn_merges`) to a
    corpus: each word starts as characters + the end-of-word marker, and the
    merges fold in, in training order — the same greedy left-to-right
    semantics as learning, so encode(train corpus) reproduces the trainer's
    final segmentation. Output: (id, n_tokens, tokens array<string>) where
    n_tokens counts subword units across the document.

    Scale shape: the merge table is a plan constant (Catalyst folds, one per
    merge — no join, no Python), so encoding is scan-side and
    embarrassingly parallel; plan depth grows with the merge count, which
    callers cap the way real tokenizers cap vocab size.
    """
    # posexplode, not explode: the word's position must ride along so the
    # final per-doc token array re-assembles in DOCUMENT order.
    # collect_list's arrival order after the groupBy shuffle is whatever
    # order the map outputs merge in — stable on a single local partition,
    # scrambled at partition boundaries on a real cluster (the same
    # determinism discipline every other collect_list here pays with
    # array_sort).
    words = df.select(
        F.col(id_col),
        F.posexplode(F.split(normalize_text(text_col), " ")).alias(
            "wpos", "word"
        ),
    ).filter(F.col("word") != "")
    syms = F.concat(
        F.regexp_extract_all(F.col("word"), F.lit("."), 0),
        F.array(F.lit(eow)),
    )
    out = words.select(F.col(id_col), "wpos", syms.alias("syms"))
    for m in merges:
        a, b = m[0], m[1]
        out = out.select(
            F.col(id_col), "wpos", F.expr(_merge_pair_expr(a, b)).alias("syms")
        )
    per_word = out.select(
        F.col(id_col), "wpos", F.size("syms").cast("bigint").alias("n"), "syms"
    )
    return per_word.groupBy(id_col).agg(
        F.sum("n").alias("n_tokens"),
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct("wpos", "syms"))),
                lambda s: s["syms"],
            )
        ).alias("tokens"),
    )


GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_flags(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_ratio: float = 0.9,
    max_ellipsis_line_ratio: float = 0.3,
    min_alpha_word_ratio: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """The published Gopher document-quality rules (Rae et al. 2021,
    *Scaling Language Models: Methods, Analysis & Insights from Training
    Gopher*, Appendix A) as one pure-Catalyst projection — the standard
    rule-based pre-filter that runs before any model-based scoring in a
    pretraining curation pipeline (MassiveText, RefinedWeb, Dolma all start
    here):

    * word count in [min_words, max_words];
    * mean word length in [min_mean_word_len, max_mean_word_len];
    * symbol-to-word ratio (``#`` or ``...``) below max_symbol_word_ratio;
    * fewer than max_bullet_line_ratio of lines starting with a bullet;
    * fewer than max_ellipsis_line_ratio of lines ending in an ellipsis;
    * at least min_alpha_word_ratio of words containing a letter;
    * at least min_stop_hits distinct hits from the 8-word stop list.

    Emits the measured features, one boolean per rule, and the conjunction
    ``passes_gopher``. Zero shuffles, zero Python rows — at 100 TB this is
    scan-speed and whole-stage-codegen'd, so it belongs BEFORE dedup in the
    funnel (cheapest filter first). Mean word length exploits the
    single-spaced normalized form: total word chars = len - (n_words - 1).
    Ratios round through ``rnd`` so an engine-parallel sum cannot flip a
    boundary comparison against a DuckDB oracle.
    """
    raw = F.col(text_col) if isinstance(text_col, str) else text_col
    t = normalize_text(text_col)
    words = F.split(t, " ")
    n_words = F.size(words).cast("bigint")
    mean_word_len = rnd((F.length(t) - (n_words - F.lit(1))) / n_words, 6)
    symbols = _count_matches(t, "#").cast("bigint") + F.floor(
        (F.length(t) - F.length(F.regexp_replace(t, r"\.\.\.", ""))) / F.lit(3)
    ).cast("bigint")
    symbol_word_ratio = rnd(symbols / n_words, 6)
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[a-z]"))).cast(
        "bigint"
    )
    alpha_word_ratio = rnd(alpha_words / n_words, 6)
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
            lambda s: F.array_contains(words, s),
        )
    ).cast("bigint")
    lines = F.split(raw, "\n")
    n_lines = F.size(lines)
    bullet_ratio = rnd(
        F.size(F.filter(lines, lambda l: F.trim(l).rlike("^[-*•]")))
        / n_lines,
        6,
    )
    ellipsis_ratio = rnd(
        F.size(F.filter(lines, lambda l: F.rtrim(l).rlike(r"\.\.\.$")))
        / n_lines,
        6,
    )
    checks = {
        "passes_word_count": (n_words >= min_words) & (n_words <= max_words),
        "passes_mean_word_len": (mean_word_len >= min_mean_word_len)
        & (mean_word_len <= max_mean_word_len),
        "passes_symbol_ratio": symbol_word_ratio < max_symbol_word_ratio,
        "passes_bullet_lines": bullet_ratio < max_bullet_line_ratio,
        "passes_ellipsis_lines": ellipsis_ratio < max_ellipsis_line_ratio,
        "passes_alpha_words": alpha_word_ratio >= min_alpha_word_ratio,
        "passes_stopwords": stop_hits >= min_stop_hits,
    }
    passes = None
    for c in checks.values():
        passes = c if passes is None else (passes & c)
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        symbol_word_ratio.alias("symbol_word_ratio"),
        alpha_word_ratio.alias("alpha_word_ratio"),
        stop_hits.alias("stop_hits"),
        *[v.alias(k) for k, v in checks.items()],
        passes.alias("passes_gopher"),
    )


def build_text_index(
    df: DataFrame,
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    include_positions: bool = False,
) -> None:
    """Materialize the inverted index ``bm25_topk`` otherwise rebuilds per
    query: postings (tok, id, tf, dl — doc length denormalized onto every
    posting, Lucene's norms trick, so query time never joins a doc-stats
    table) and the 1-row corpus stats (document frequency needs no table
    of its own — see the note at the write site).

    Postings are range-partitioned and sorted by token, so every file
    carries a tight min/max envelope on ``tok`` and a query's IN-filter
    prunes to the files that can contain its terms — the parquet-native
    posting-list seek. At 100 TB the build is the one-off O(corpus)
    tokenization job (incremental maintenance = rebuild of appended dirs'
    postings, a manifest-diff away); every query after it pays only
    |postings(query terms)|.
    """
    from lakeflow.operators.transforms import fan_out

    toks = fan_out(
        df.select(F.col(id_col).alias("id"), F.col(text_col))
    ).select(
        "id",
        F.posexplode(F.split(normalize_text(text_col), " ")).alias(
            "pos", "tok"
        ),
    )
    aggs = [F.count(F.lit(1)).alias("tf")]
    if include_positions:
        # Sorted for deterministic files; consumers treat it as a set.
        aggs.append(F.array_sort(F.collect_list("pos")).alias("positions"))
    # The index is THREE outputs (postings, term stats, corpus stats) off
    # ONE tokenization: cache the (id, tok, tf) frame so each write reuses
    # it instead of re-exploding the corpus per output (profiled 3x the
    # tokenize cost without it), and derive doc length as sum(tf) per id —
    # same total, one fewer corpus-shaped aggregation over raw tokens.
    tf = toks.groupBy("id", "tok").agg(*aggs)
    tf.persist()
    try:
        dl = tf.groupBy("id").agg(F.sum("tf").alias("dl"))
        cols = ["tok", "id", "tf", "dl"] + (
            ["positions"] if include_positions else []
        )
        postings = tf.join(dl, "id").select(*cols)
        (
            postings.repartitionByRange(8, "tok")
            .sortWithinPartitions("tok")
            .write.mode("overwrite")
            .parquet(f"{index_dir}/postings")
        )
        # No separate term-frequency (df) table: the probe reads EVERY
        # posting row of its query terms anyway (exhaustive-per-term
        # scoring, not WAND-style early exit), so df is a window count
        # over rows already scanned — a stats table would add one
        # corpus-shaped aggregation + write per build/append/micro-batch
        # and buy zero probe IO.
        dl.agg(
            F.count(F.lit(1)).alias("n"), F.sum("dl").alias("sum_dl")
        ).write.mode("overwrite").parquet(f"{index_dir}/corpus_stats")
    finally:
        tf.unpersist()


def phrase_match(
    spark,
    index_dir: str,
    phrase: list[str],
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact phrase search over a POSITIONAL index (build_text_index with
    include_positions=True): probe each phrase term's postings (IN-filter →
    envelope-pruned files), join them on the doc id, and count adjacency
    chains with pure array algebra — positions(t0) ∩ (positions(t1)−1) ∩
    (positions(t2)−2) … — no re-tokenization, no Python, no window. The
    n-way id join's inputs are each term's postings (|docs containing
    term|), the classic positional-postings merge; a stopword-heavy phrase
    costs its rarest term once AQE reorders, which is why real engines
    probe rarest-first. Duplicate phrase terms (e.g. "batch batch") work
    unchanged: the shifted self-intersection demands genuinely distinct
    adjacent occurrences. Returns (id, n_phrase) for docs with ≥1 match."""
    if not phrase:
        raise ValueError("phrase must have at least one term")
    probes = []
    postings = spark.read.parquet(f"{index_dir}/postings")

    def shift_by(off: int):
        # Single-arg lambda on purpose: a 2-arg callable makes F.transform
        # pass (element, array_index) and the shift silently becomes the
        # element's position in its own array.
        return lambda p: p - F.lit(off)

    for i, term in enumerate(phrase):
        probes.append(
            postings.filter(F.col("tok") == term).select(
                "id",
                F.transform(F.col("positions"), shift_by(i)).alias(f"p{i}"),
            )
        )
    joined = probes[0]
    for i in range(1, len(phrase)):
        joined = joined.join(probes[i], "id")
    chain = F.col("p0")
    for i in range(1, len(phrase)):
        chain = F.array_intersect(chain, F.col(f"p{i}"))
    return (
        joined.select(F.col("id").alias(id_col), F.size(chain).alias("n"))
        .filter(F.col("n") > 0)
        .select(id_col, F.col("n").cast("bigint").alias("n_phrase"))
    )


def append_to_text_index(
    df: DataFrame,
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    include_positions: bool = False,
) -> None:
    """Incremental index maintenance for appended documents: tokenize ONLY
    the new batch and append its postings plus PARTIAL term/corpus stats —
    df, n and sum_dl are associative sums, so maintenance is append-only
    (the mergeable-sketch pattern; no read-modify-write race on the stats
    files) and the probe aggregates partials at query time over the handful
    of rows its terms touch. At 100 TB each ingested dir costs O(batch)
    tokenization, exactly the manifest-diff increment every other
    incremental op here pays; compaction of stat partials happens at
    OPTIMIZE cadence. Contract: append-only — updates/deletes rebuild the
    affected dirs' postings (the CoW/MOR story, not this fast path).
    ``include_positions`` must match the build: appending tf-only rows to
    a positional index would leave the postings with mixed schemas and
    break phrase search on the appended documents — enforced below by
    checking the existing postings schema, not just documented (ADVICE
    r8: a docstring-only contract fails silently as null positions)."""
    from lakeflow.operators.transforms import fan_out

    # Path-missing precheck instead of catching the read error: a transient
    # IO failure or corrupt index footer must PROPAGATE, not be silently
    # treated as a first-build append that skips the mixed-schema check
    # (ADVICE r9). Only a genuinely absent postings dir acts as a build.
    existing = None
    if os.path.isdir(f"{index_dir}/postings"):
        existing = df.sparkSession.read.parquet(f"{index_dir}/postings")
    if existing is not None:
        built_positional = "positions" in existing.columns
        if built_positional != include_positions:
            raise ValueError(
                f"include_positions={include_positions} disagrees with the "
                f"built index at {index_dir}/postings (built with "
                f"include_positions={built_positional}); appending "
                f"mixed-schema postings would silently break "
                f"{'phrase search' if built_positional else 'the tf-only probe'} "
                f"on the appended documents"
            )

    toks = fan_out(
        df.select(F.col(id_col).alias("id"), F.col(text_col))
    ).select(
        "id",
        F.posexplode(F.split(normalize_text(text_col), " ")).alias(
            "pos", "tok"
        ),
    )
    # One tokenization feeds all three appended outputs (same caching
    # rationale as build_text_index); dl derives from the cached tf.
    aggs = [F.count(F.lit(1)).alias("tf")]
    if include_positions:
        aggs.append(F.array_sort(F.collect_list("pos")).alias("positions"))
    tf = toks.groupBy("id", "tok").agg(*aggs)
    tf.persist()
    try:
        dl = tf.groupBy("id").agg(F.sum("tf").alias("dl"))
        cols = ["tok", "id", "tf", "dl"] + (
            ["positions"] if include_positions else []
        )
        (
            tf.join(dl, "id")
            .select(*cols)
            .repartitionByRange(4, "tok")
            .sortWithinPartitions("tok")
            .write.mode("append")
            .parquet(f"{index_dir}/postings")
        )
        dl.agg(
            F.count(F.lit(1)).alias("n"), F.sum("dl").alias("sum_dl")
        ).write.mode("append").parquet(f"{index_dir}/corpus_stats")
    finally:
        tf.unpersist()


def bm25_indexed_topk(
    spark,
    index_dir: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 top-``k`` answered FROM the materialized index — no corpus
    scan, no tokenization: probe the postings files whose tok envelope
    admits the query terms (IN-filter pushed to parquet), broadcast the
    term and corpus stats, score in integer micro-units, global top-k as
    TakeOrderedAndProject. Bit-identical to ``bm25_topk`` (same arithmetic,
    same tie-break) — the only thing that changed is WHEN the index work
    happens."""
    postings = spark.read.parquet(f"{index_dir}/postings").filter(
        F.col("tok").isin(query_terms)
    )
    # Document frequency is derived from the postings the probe already
    # scans (one row per (tok, id), exhaustive per term), so no df stats
    # table exists to read or go stale. groupBy (map-side combine → ≤
    # |terms| rows per task, no hot-term skew) + broadcast join back,
    # NOT a count-over-window, which would shuffle every posting of a
    # stopword-frequency term onto one task. Corpus stats hold
    # associative PARTIALS (one row per ingest batch) folded here — a
    # handful of rows, never a corpus-shaped aggregate.
    dfreq = postings.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    stats = spark.read.parquet(f"{index_dir}/corpus_stats").agg(
        F.sum("n").alias("n"), F.sum("sum_dl").alias("sum_dl")
    )
    avgdl = F.col("sum_dl") / F.col("n")
    idf = F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    term_score = idf * (
        F.col("tf")
        * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / avgdl))
    )
    scored = (
        postings.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(stats))
        .select(
            "id",
            F.floor(term_score * 1_000_000.0 + 0.5)
            .cast("bigint")
            .alias("micro"),
        )
        .groupBy("id")
        .agg((F.sum("micro") / 1_000_000.0).alias("bm25"))
    )
    return (
        scored.select(F.col("id").alias(id_col), "bm25")
        .orderBy(F.desc("bm25"), F.asc(id_col))
        .limit(k)
    )


def compact_text_index(spark, index_dir: str) -> None:
    """OPTIMIZE for the inverted index: fold the accumulated batch shards
    (append_to_text_index / stream_index_ingest both leave one shard set
    per ingest) back into the one-shot layout — postings re-range-
    partitioned and sorted by token (restoring tight file envelopes for
    IN-probe pruning), corpus partials to one row. Rewrite-priced, so it
    runs at OPTIMIZE cadence; probes are answer-identical before and
    after (pinned by test), and a POSITIONAL index keeps its positions
    column through the rewrite, so phrase search survives compaction.

    The swap is crash-consistent the same way the streamed-index shard
    compactors are (streaming/compaction.py): fold to a "_"-prefixed tmp
    (invisible to Spark readers) → drop a plan marker → move the live
    parts aside → rename the fold in → drop trash + marker; a crashed
    swap rolls back (fold never renamed in) or forward (fold landed) on
    the next run instead of stranding the postings in an invisible dir.
    Run against a quiesced index: the swap is not atomic for a
    CONCURRENT probe."""
    import os
    import shutil

    tmp = f"{index_dir}/_compact"
    trash = f"{index_dir}/_compact.trash"
    plan = f"{index_dir}/_compact.plan"
    parts = ("postings", "corpus_stats")
    if os.path.exists(plan):
        if os.path.isdir(tmp):
            # Fold never swapped in: restore any parts set aside.
            if os.path.isdir(trash):
                for n in os.listdir(trash):
                    live = f"{index_dir}/{n}"
                    shutil.rmtree(live, ignore_errors=True)
                    os.rename(f"{trash}/{n}", live)
            shutil.rmtree(tmp)
        shutil.rmtree(trash, ignore_errors=True)
        os.remove(plan)

    raw = spark.read.parquet(f"{index_dir}/postings")
    cols = [c for c in ("tok", "id", "tf", "dl", "positions")
            if c in raw.columns]
    (
        raw.select(*cols)
        .repartitionByRange(8, "tok")
        .sortWithinPartitions("tok")
        .write.mode("overwrite")
        .parquet(f"{tmp}/postings")
    )
    spark.read.parquet(f"{index_dir}/corpus_stats").agg(
        F.sum("n").alias("n"), F.sum("sum_dl").alias("sum_dl")
    ).write.mode("overwrite").parquet(f"{tmp}/corpus_stats")
    with open(plan, "w"):
        pass
    os.makedirs(trash, exist_ok=True)
    for part in parts:
        os.rename(f"{index_dir}/{part}", f"{trash}/{part}")
    for part in parts:
        os.rename(f"{tmp}/{part}", f"{index_dir}/{part}")
    # Drop tmp the moment the fold is live: recovery keys "roll forward"
    # on the marker WITHOUT tmp, so a crash from here on finishes the
    # cleanup instead of rolling the completed swap back.
    shutil.rmtree(tmp, ignore_errors=True)
    # One-shot cleanup of the legacy layout: indexes built before document
    # frequency became probe-derived carried a term_stats shard set that
    # nothing reads anymore — drop it here so it cannot sit orphaned on
    # disk forever (ADVICE r7).
    shutil.rmtree(f"{index_dir}/term_stats", ignore_errors=True)
    shutil.rmtree(trash)
    os.remove(plan)


def phrase_snippets(
    spark,
    index_dir: str,
    docs: DataFrame,
    phrase: list[str],
    window: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Snippet/highlight generation for phrase hits: the positional index
    yields each match's start position, and ONLY matching docs join back
    to the corpus (broadcast of the match list — |hits|, not |corpus|) to
    slice ``window`` tokens of context around the phrase. The corpus is
    re-tokenized solely for the matched rows; everything else is pruned
    before the text column is ever read — the retrieval-display shape at
    100 TB, where hits are thousands and the corpus is not. Returns
    (id, pos, snippet), one row per occurrence, 0-based positions."""
    if not phrase:
        raise ValueError("phrase must have at least one term")
    postings = spark.read.parquet(f"{index_dir}/postings")

    def shift_by(off: int):
        return lambda p: p - F.lit(off)

    probes = []
    for i, term in enumerate(phrase):
        probes.append(
            postings.filter(F.col("tok") == term).select(
                "id",
                F.transform(F.col("positions"), shift_by(i)).alias(f"p{i}"),
            )
        )
    joined = probes[0]
    for i in range(1, len(phrase)):
        joined = joined.join(probes[i], "id")
    chain = F.col("p0")
    for i in range(1, len(phrase)):
        chain = F.array_intersect(chain, F.col(f"p{i}"))
    matches = joined.select(
        "id", F.explode(chain).alias("pos")
    )
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.split(normalize_text(text_col), " ").alias("w"),
    )
    start0 = F.greatest(F.lit(0), F.col("pos") - window)
    length = (F.col("pos") - start0) + len(phrase) + window
    return (
        toks.join(F.broadcast(matches), "id")
        .select(
            F.col("id").alias(id_col),
            F.col("pos").cast("bigint").alias("pos"),
            F.array_join(
                F.slice(F.col("w"), start0 + 1, length), " "
            ).alias("snippet"),
        )
    )


def boolean_search(
    spark,
    index_dir: str,
    must: list[str] | None = None,
    should: list[str] | None = None,
    must_not: list[str] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Boolean retrieval over the inverted index: AND = successive semi
    joins of posting id-sets, OR = union-distinct, NOT = one anti join —
    set algebra on postings only, the corpus is never read. Each probe is
    an envelope-pruned postings scan of exactly its term; at 100 TB the
    query costs the sum of its terms' posting lists, with AQE free to
    start the AND chain from the rarest term. Requires ``must`` or
    ``should``; returns distinct matching ids."""
    if not must and not should:
        raise ValueError("boolean_search needs at least must or should terms")
    postings = spark.read.parquet(f"{index_dir}/postings")

    def ids(term: str) -> DataFrame:
        return postings.filter(F.col("tok") == term).select("id")

    if should:
        base = ids(should[0])
        for t in should[1:]:
            base = base.unionByName(ids(t))
        base = base.distinct()
    else:
        base = ids(must[0]).distinct()
        must = must[1:]
    for t in must or []:
        base = base.join(ids(t), "id", "left_semi")
    for t in must_not or []:
        base = base.join(ids(t), "id", "left_anti")
    return base.select(F.col("id").alias(id_col))
