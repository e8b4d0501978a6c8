"""Text analysis operators: token counts, quality scores, language ID,
document fingerprints.  All built-in-function compositions (JVM-side,
whole-stage codegen) — no Python in the hot path.

Rebuild extensions for the training-data-pipeline surface (no reference
analog; the reference is a pure SQL engine)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.cache import persist_tracked
from ..functions.text import hash_column, normalize_text, tokens

# Tiny per-language marker vocabularies for the n-gram/stopword heuristic.
# Deterministic and intentionally simple: language ID at corpus scale is a
# scoring pass, not a model inference.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "se"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "zh": ["的", "是", "在", "了", "和", "有", "我", "不"],
}
# Languages written WITHOUT whitespace word boundaries: marker matching must
# be substring containment — whitespace tokens of Chinese text are whole
# phrases and never equal a single-character marker, so token-intersection
# scoring silently scores zh 0 on all real Chinese input (review r5).
LANG_CHAR_MODE: frozenset[str] = frozenset({"zh"})


def token_count(col: Column) -> Column:
    """Whitespace token count of the normalized text."""
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish token estimate: splits on whitespace AND punctuation
    boundaries, the usual cheap proxy for BPE token counts."""
    pieces = F.split(
        F.regexp_replace(F.lower(col), r"([^\w\s])", r" $1 "), r"\s+"
    )
    return F.size(F.filter(pieces, lambda p: p != ""))


def with_text_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document stats: char/token counts, mean token length,
    punctuation/digit/whitespace ratios, uppercase ratio."""
    t = F.col(text_col)
    n_chars = F.length(t)
    toks = token_count(t)
    non_space = F.length(F.regexp_replace(t, r"\s", ""))
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        toks.alias("n_tokens"),
        F.when(toks > 0, non_space / toks).otherwise(F.lit(0.0)).alias("mean_token_len"),
        (
            F.when(
                n_chars > 0,
                F.length(F.regexp_replace(t, r"[^\p{Punct}]", "")) / n_chars,
            ).otherwise(F.lit(0.0))
        ).alias("punct_ratio"),
        (
            F.when(
                n_chars > 0, F.length(F.regexp_replace(t, r"[^0-9]", "")) / n_chars
            ).otherwise(F.lit(0.0))
        ).alias("digit_ratio"),
        (
            F.when(
                n_chars > 0, F.length(F.regexp_replace(t, r"[^A-Z]", "")) / n_chars
            ).otherwise(F.lit(0.0))
        ).alias("upper_ratio"),
    )


def _quality_components(n_tokens, mean_token_len, punct_ratio, digit_ratio):
    """The quality recipe over its four signal expressions — ONE source of
    the formula shared by the stats-table path (quality_score) and the
    inline-expression path (quality_expr)."""
    length_component = F.least(n_tokens / F.lit(50.0), F.lit(1.0))
    token_len_ok = F.when(
        (mean_token_len >= 2.0) & (mean_token_len <= 12.0), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    noise_penalty = (
        F.lit(1.0)
        - F.least(punct_ratio * 2.0, F.lit(0.5))
        - F.least(digit_ratio, F.lit(0.5))
    )
    return F.round(
        length_component * 0.4 + token_len_ok * 0.3 + noise_penalty * 0.3, 6
    )


def quality_expr(t: Column) -> Column:
    """The quality score as ONE inline expression over the text column — for
    pipelines that want to ATTACH the score to existing rows as a narrow
    projection (no stats relation, no id re-join).  Identical values to
    ``quality_score``."""
    n_chars = F.length(t)
    n_toks = token_count(t)
    non_space = F.length(F.regexp_replace(t, r"\s", ""))
    mean_len = F.when(n_toks > 0, non_space / n_toks).otherwise(F.lit(0.0))
    punct = F.when(
        n_chars > 0, F.length(F.regexp_replace(t, r"[^\p{Punct}]", "")) / n_chars
    ).otherwise(F.lit(0.0))
    digit = F.when(
        n_chars > 0, F.length(F.regexp_replace(t, r"[^0-9]", "")) / n_chars
    ).otherwise(F.lit(0.0))
    return _quality_components(n_toks, mean_len, punct, digit)


def quality_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heuristic [0,1] quality score: length band + sane token length + low
    punctuation/digit noise.  The exact recipe is arbitrary by design (the
    pipelines that need it swap their own); what matters is that it runs as
    one codegen'd projection."""
    stats = with_text_stats(df, text_col, id_col)
    return stats.withColumn(
        "quality",
        _quality_components(
            F.col("n_tokens"),
            F.col("mean_token_len"),
            F.col("punct_ratio"),
            F.col("digit_ratio"),
        ),
    )


def language_id(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Marker-word language scores + argmax prediction.

    One pass: tokens → per-language overlap count → greatest score wins (ties
    broken by language code order, deterministic).  Unknown when no marker
    matches.  ``LANG_CHAR_MODE`` languages (no whitespace word boundaries)
    count distinct marker CHARACTERS contained in the text instead of token
    intersections."""
    # Distinct-token array and lowered text STAGED once (round 12): the
    # inline form re-ran tokenize+array_distinct per word-mode language and
    # re-lowered the text per char-mode marker (the contains lambda is
    # evaluated interpreted, per element) — see word_shingles_of.
    distinct_toks = F.col("_dt")
    lowered = F.col("_low")

    def score(lang: str, words: list[str]) -> Column:
        if lang in LANG_CHAR_MODE:
            return F.size(
                F.filter(
                    F.array(*[F.lit(w) for w in words]),
                    lambda m: F.contains(lowered, m),
                )
            )
        return F.size(
            F.array_intersect(
                distinct_toks, F.array(*[F.lit(w) for w in words])
            )
        )

    score_cols = [
        score(lang, words).alias(f"score_{lang}")
        for lang, words in LANG_MARKERS.items()
    ]
    scored = df.select(
        F.col(id_col),
        F.col(text_col),
        F.array_distinct(tokens(F.col(text_col))).alias("_dt"),
        F.lower(F.col(text_col)).alias("_low"),
    ).select(F.col(id_col), F.col(text_col), *score_cols)
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.lit("und")
    for lang in reversed(langs):  # earlier langs win ties (applied last)
        pred = F.when((best > 0) & (F.col(f"score_{lang}") == best), F.lit(lang)).otherwise(
            pred
        )
    return scored.withColumn("pred_lang", pred).drop(text_col)


def word_repetition(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document word-repetition stats — the standard near-gibberish /
    boilerplate signal in corpus cleaning: token count, distinct-token count,
    distinct ratio, and the frequency share of the single most repeated word.

    Shape: explode to (doc, word) then two keyed aggregations.  Both shuffles
    are keyed by doc_id (the second reuses the first's partitioning), and the
    (doc, word) aggregate partial-combines map-side, so the exploded relation
    never materializes through a shuffle at corpus scale.

    Zero-token documents (empty/whitespace-only text) emit NO output row —
    the explode produces nothing for them.  Callers that must keep every
    input document (e.g. to gate on these ratios) should left-join this
    result back on the id; ``lm_score`` shows the pattern."""
    exploded = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("word"))
    per_word = exploded.groupBy(id_col, "word").agg(F.count(F.lit(1)).alias("cnt"))
    return per_word.groupBy(id_col).agg(
        F.sum("cnt").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.round(F.count(F.lit(1)) / F.sum("cnt"), 6).alias("distinct_ratio"),
        F.round(F.max("cnt") / F.sum("cnt"), 6).alias("top_word_ratio"),
    )


def top_ngrams(
    df: DataFrame, n: int = 2, k: int = 20, text_col: str = "text"
) -> DataFrame:
    """Corpus-level top-k word n-grams by occurrence count (ties broken by
    n-gram text, deterministic).

    The n-gram expansion is a JVM-side array transform (no Python, no
    intermediate distinct — THE shared _word_ngrams_all expression, so the
    three gram-expansion call sites cannot drift), and the count
    partial-aggregates map-side; the final top-k is a TakeOrdered over the
    aggregated relation."""
    # token array staged below the explode — _word_ngrams_all's slice lambda
    # would re-tokenize per gram otherwise (round 12, see word_shingles_of)
    grams = _word_ngrams_all(F.col("_tk"), n)
    return (
        df.select(tokens(F.col(text_col)).alias("_tk"))
        .select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("ngram"))
        .limit(k)
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 relevance of every document against a fixed term set —
    the standard lexical ranking for corpus search / quality-targeted
    selection (idf is the Lucene ``ln(1 + (N - df + .5)/(df + .5))`` form,
    always positive).

    Output: one row per input document, ``(id, bm25)`` — zero for documents
    containing none of the terms.

    Scale shape: tokens are filtered to the query terms BEFORE the explode
    (``array_intersect`` is not enough — counts matter — but a ``filter``
    higher-order fn keeps only matching tokens), so the exploded relation is
    O(query-term occurrences), not O(corpus tokens); the per-term document
    frequencies aggregate from that same small relation and broadcast back.
    Corpus-wide N/avgdl is a one-row broadcast.  Everything is JVM
    expressions — no Python in the plan."""
    toks = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_t")
    ).select(
        id_col,
        F.size("_t").alias("_dl"),
        F.filter(
            "_t", make_contains(query_terms)
        ).alias("_qt"),
    )
    # three consumers (stats, tf, and through tf the join) — persist once
    toks = persist_tracked(toks)
    # corpus-wide N and avgdl: a bounded ONE-ROW collect off the persisted
    # relation, folded into the scoring expression as literals — a 1-row
    # crossJoin would plan as BroadcastNestedLoopJoin and trip the audit
    # for no benefit
    stats = toks.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.avg("_dl").alias("_avgdl"),
    ).first()
    n, avgdl = float(stats["_n"]), float(stats["_avgdl"] or 0.0)
    tf = (
        toks.select(id_col, "_dl", F.explode("_qt").alias("_term"))
        .groupBy(id_col, "_term")
        .agg(F.count(F.lit(1)).cast("double").alias("_f"), F.first("_dl").alias("_dl"))
    )
    dfreq = tf.groupBy("_term").agg(
        F.count(F.lit(1)).cast("double").alias("_df")
    )
    scored = (
        tf.join(F.broadcast(dfreq), on="_term")
        .withColumn(
            "_s",
            F.log(
                F.lit(1.0) + (F.lit(n) - F.col("_df") + 0.5) / (F.col("_df") + 0.5)
            )
            * F.col("_f")
            * (k1 + 1.0)
            / (
                F.col("_f")
                + k1 * (1.0 - b + b * F.col("_dl") / F.lit(max(avgdl, 1e-9)))
            ),
        )
        .groupBy(id_col)
        .agg(F.sum("_s").alias("_score"))
    )
    return (
        df.select(id_col)
        .join(scored, on=id_col, how="left")
        .select(
            id_col,
            F.round(F.coalesce("_score", F.lit(0.0)), 6).alias("bm25"),
        )
    )


def make_contains(terms: list[str]):
    """Factory returning a unary lambda testing membership in ``terms`` —
    a factory, not an inline closure, because pyspark treats a lambda with a
    second defaulted parameter as an (element, index) binary lambda."""
    arr = F.array(*[F.lit(t) for t in terms])
    return lambda x: F.array_contains(arr, x)


def fingerprint(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "fast",
) -> DataFrame:
    """Deterministic document fingerprint of the *normalized* text.

    ``fast`` = xxhash64 (production); ``poly`` = portable polynomial rolling
    hash (oracle-checkable in any engine with a list fold)."""
    return df.select(
        F.col(id_col),
        hash_column(normalize_text(F.col(text_col)), hash_fn).alias("fingerprint"),
    )


# order matters: '&amp;' must unescape LAST (and after the numeric pass),
# or correctly-escaped text like '&amp;lt;' double-unescapes to '<'
_HTML_ENTITIES: list[tuple[str, str]] = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&#x27;", "'"),
    ("&#8216;", "'"),
    ("&#8217;", "'"),
    ("&#8220;", '"'),
    ("&#8221;", '"'),
    ("&apos;", "'"),
]


def html_to_text(col: Column) -> Column:
    """Raw HTML → visible text, entirely in JVM ``regexp_replace`` chains
    (codegen; no Python, no parser dependency): drop ``<script>``/
    ``<style>``/comments, break lines at block-level closers, strip the
    remaining tags, unescape the common entities, and collapse whitespace
    runs (newlines preserved as line structure for the C4/Gopher line
    rules downstream).

    Deliberately heuristic, like the published C4/CCNet pipelines' first
    pass — at 100 TB the extraction must be a narrow map stage, and the
    quality/repetition gates downstream are what actually police the
    output."""
    t = F.regexp_replace(col, r"(?is)<(script|style)\b.*?</\1\s*>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    # block-level boundaries become newlines so line-based heuristics see
    # the page's visual structure, not one endless line
    t = F.regexp_replace(
        t,
        r"(?i)</(p|div|h[1-6]|li|tr|table|ul|ol|blockquote|section|article"
        r"|header|footer|pre)\s*>|<br\s*/?>",
        "\n",
    )
    t = F.regexp_replace(t, r"(?s)<[^>]*>", " ")
    for ent, rep in _HTML_ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(rep))
    # remaining numeric refs (decimal AND hex) → space, then bare &amp;
    t = F.regexp_replace(t, r"(?i)&#x?[0-9a-f]+;", " ")
    t = F.replace(t, F.lit("&amp;"), F.lit("&"))
    t = F.regexp_replace(t, r"[ \t\x0b\f\r]+", " ")
    t = F.regexp_replace(t, r" ?\n ?", "\n")
    t = F.regexp_replace(t, r"\n{3,}", "\n\n")
    # Spark trim() strips spaces only — newlines need the regex form
    return F.regexp_replace(t, r"^\s+|\s+$", "")


# --- PII scrubbing -----------------------------------------------------------

# Order matters: emails before phones (an email's digits must not be
# phone-matched), IPs before phones (dotted quads contain digit runs).
_PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[\w.+-]+@[\w-]+(\.[\w-]+)+", "<EMAIL>"),
    ("ip", r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (
        "phone",
        r"(\+?\d{1,3}[\s.-]?)?(\(?\d{3}\)?[\s.-]?)\d{3}[\s.-]?\d{4}\b",
        "<PHONE>",
    ),
]


def redact_pii(
    df: DataFrame, text_col: str = "text", counts: bool = True
) -> DataFrame:
    """Replace emails / IPv4s / phone-shaped digit runs with typed placeholder
    tokens — the standard scrub pass before corpus text leaves the pipeline.

    Pure ``regexp_replace`` chain (JVM, codegen) — one narrow map over the
    corpus, no shuffle, safe at any scale.  With ``counts=True`` each doc also
    gets ``n_<kind>_redacted`` columns (``regexp_count``, same scan) so a
    downstream audit can aggregate scrub totals without a second pass.

    Deliberately pattern-based, not model-based: at 100 TB the scrub must be
    cheap, deterministic, and re-runnable; precision tuning belongs in the
    pattern table."""
    out = df
    redacted = F.col(text_col)
    for kind, pattern, token in _PII_PATTERNS:
        if counts:
            out = out.withColumn(
                f"n_{kind}_redacted", F.regexp_count(redacted, F.lit(pattern))
            )
        redacted = F.regexp_replace(redacted, pattern, token)
    return out.withColumn(text_col, redacted)


def contamination_flags(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    benchmark_text_col: str = "text",
    n: int = 8,
    min_overlap: int = 1,
) -> DataFrame:
    """Benchmark-contamination check: flag documents sharing ≥ ``min_overlap``
    word ``n``-grams with a benchmark/eval set (the standard n-gram-overlap
    decontamination used for training corpora; 8–13-gram windows typical).

    Output: (id, n_contaminated_ngrams, contaminated) per INPUT document —
    every doc appears exactly once.

    Scale shape: the benchmark's distinct n-gram hashes are tiny relative to
    the corpus (eval sets are small by definition) → broadcast left-semi-style
    aggregation; the corpus side is one explode + one broadcast join + one
    groupBy keyed by doc id.  The corpus is never shuffled by n-gram."""
    from .dedup import _exploded_shingle_index

    # the index helper needs an id column; synthesize one (never surfaced —
    # only the distinct hash set leaves this subplan).
    bench = (
        _exploded_shingle_index(
            benchmark.withColumn("_bid", F.lit(0)), benchmark_text_col, "_bid", n, "fast"
        )
        .select("_h")
        .distinct()
    )
    corpus = _exploded_shingle_index(df, text_col, id_col, n, "fast")
    hits = (
        corpus.join(F.broadcast(bench), on="_h", how="left_semi")
        .groupBy("_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated_ngrams"))
    )
    return (
        df.select(F.col(id_col))
        .join(hits.withColumnRenamed("_id", id_col), on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("n_contaminated_ngrams", F.lit(0))
            .cast("long")
            .alias("n_contaminated_ngrams"),
            (
                F.coalesce("n_contaminated_ngrams", F.lit(0)) >= min_overlap
            ).alias("contaminated"),
        )
    )


# Gopher-rule defaults (Rae et al. 2021, "Scaling Language Models: Methods,
# Analysis & Insights from Training Gopher", App. A — the published MassiveText
# document-quality heuristics).  Every threshold is a keyword so pipelines can
# re-tune per corpus; the defaults are the paper's.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]
BULLET_PREFIXES = ["•", "‣", "▪", "-", "*"]


# The published MassiveText thresholds, single-sourced: the metrics relation
# (gopher_quality) and the inline gate (gopher_passes_expr) both resolve
# their rules here, so the two can never drift (review r5).
GOPHER_QUALITY_DEFAULTS: dict[str, float] = {
    "min_words": 50,
    "max_words": 100_000,
    "min_mean_word_len": 3.0,
    "max_mean_word_len": 10.0,
    "max_symbol_word_ratio": 0.1,
    "max_bullet_line_ratio": 0.9,
    "max_ellipsis_line_ratio": 0.3,
    "min_alpha_word_ratio": 0.8,
    "min_stopwords": 2,
}


def _resolve_gopher_rules(rules: dict) -> dict:
    unknown = set(rules) - set(GOPHER_QUALITY_DEFAULTS)
    if unknown:
        raise TypeError(f"unknown Gopher rule(s): {sorted(unknown)}")
    return {**GOPHER_QUALITY_DEFAULTS, **rules}


def _gopher_rule_conjunction(m: dict, thr: dict) -> Column:
    """The nine published rule comparisons over a metric-expression (or
    metric-column) dict — THE single definition both gates share."""
    return (
        (m["n_words"] >= thr["min_words"])
        & (m["n_words"] <= thr["max_words"])
        & (m["mean_word_len"] >= thr["min_mean_word_len"])
        & (m["mean_word_len"] <= thr["max_mean_word_len"])
        & (m["symbol_word_ratio"] <= thr["max_symbol_word_ratio"])
        & (m["bullet_line_ratio"] <= thr["max_bullet_line_ratio"])
        & (m["ellipsis_line_ratio"] <= thr["max_ellipsis_line_ratio"])
        & (m["alpha_word_ratio"] >= thr["min_alpha_word_ratio"])
        & (m["n_stopwords"] >= thr["min_stopwords"])
    )


def gopher_quality(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    stopwords: list[str] | None = None,
    **rules,
) -> DataFrame:
    """Per-document Gopher quality-rule metrics and the combined keep flag.

    The seven published rules, each computed as a JVM expression in ONE
    codegen'd projection (no shuffle, no Python, no explode — line and word
    rules run on higher-order functions over the split arrays):

    1. word count in [min_words, max_words]
    2. mean word length in [min_mean_word_len, max_mean_word_len]
    3. symbol-to-word ratio (# + ellipsis) <= max_symbol_word_ratio
    4. fraction of lines starting with a bullet <= max_bullet_line_ratio
    5. fraction of lines ending with an ellipsis <= max_ellipsis_line_ratio
    6. fraction of words containing an alphabetic char >= min_alpha_word_ratio
    7. at least min_stopwords distinct stop words present

    Scale: narrow map-only stage; at 100 TB this pipelines with the parquet
    scan and the filter on ``passes`` pushes straight into the same stage.
    """
    thr = _resolve_gopher_rules(rules)
    t = F.col(text_col)
    m = _gopher_metric_exprs(t, stopwords)
    out = df.select(
        F.col(id_col),
        m["n_words"].alias("n_words"),
        m["mean_word_len"].alias("mean_word_len"),
        m["symbol_word_ratio"].alias("symbol_word_ratio"),
        m["bullet_line_ratio"].alias("bullet_line_ratio"),
        m["ellipsis_line_ratio"].alias("ellipsis_line_ratio"),
        m["alpha_word_ratio"].alias("alpha_word_ratio"),
        m["n_stopwords"].alias("n_stopwords"),
    )
    cols = {k: F.col(k) for k in (
        "n_words", "mean_word_len", "symbol_word_ratio", "bullet_line_ratio",
        "ellipsis_line_ratio", "alpha_word_ratio", "n_stopwords")}
    return out.withColumn("passes", _gopher_rule_conjunction(cols, thr))


def gopher_passes_expr(t, stopwords: list[str] | None = None, **rules):
    """The combined Gopher keep flag as ONE inline boolean expression over a
    text column — bit-identical to ``gopher_quality(...).passes`` (same
    metric expressions, same 6-dp rounding), for pipelines that want the
    gate fused into an existing projection instead of a metrics relation +
    semi-join (which would evaluate the upstream subtree twice)."""
    return _gopher_rule_conjunction(
        _gopher_metric_exprs(t, stopwords), _resolve_gopher_rules(rules)
    )


def _gopher_metric_exprs(t, stopwords: list[str] | None = None) -> dict:
    """The seven Gopher rule metrics as named expressions over text column
    ``t`` (rounded exactly as ``gopher_quality`` reports them), shared by the
    metrics relation and the inline gate so the two can never diverge."""
    sw = GOPHER_STOPWORDS if stopwords is None else stopwords
    toks = tokens(t)
    n_words = F.size(toks)
    # Mean word length = non-whitespace chars / word count (one regex pass).
    non_space = F.length(F.regexp_replace(t, r"\s", ""))
    mean_word_len = F.when(n_words > 0, non_space / n_words).otherwise(F.lit(0.0))
    # Symbol counts via length deltas — no regex, portable across engines.
    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    n_ellipsis = (
        (F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))) / 3
        + F.length(t)
        - F.length(F.replace(t, F.lit("…"), F.lit("")))
    )
    symbol_ratio = F.when(n_words > 0, (n_hash + n_ellipsis) / n_words).otherwise(
        F.lit(0.0)
    )
    lines = F.filter(F.split(t, r"\n"), lambda l: F.trim(l) != "")
    n_lines = F.size(lines)
    bullet = F.size(
        F.filter(
            lines,
            lambda l: F.array_contains(
                F.array(*[F.lit(b) for b in BULLET_PREFIXES]),
                F.substring(F.ltrim(l), 1, 1),
            ),
        )
    )
    ellipsis_end = F.size(
        F.filter(
            lines,
            lambda l: F.rtrim(l).endswith("...") | F.rtrim(l).endswith("…"),
        )
    )
    bullet_ratio = F.when(n_lines > 0, bullet / n_lines).otherwise(F.lit(0.0))
    ellipsis_ratio = F.when(n_lines > 0, ellipsis_end / n_lines).otherwise(F.lit(0.0))
    # \p{L} (any Unicode letter), not [a-z]: the rule is "contains an
    # alphabetic character" and must not auto-fail accented or non-Latin
    # scripts (tokens are already lowercased, so ASCII behavior is identical)
    alpha_words = F.size(F.filter(toks, lambda w: w.rlike(r"\p{L}")))
    alpha_ratio = F.when(n_words > 0, alpha_words / n_words).otherwise(F.lit(0.0))
    n_stop = F.size(
        F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(w) for w in sw]))
    )
    return {
        "n_words": n_words,
        "mean_word_len": F.round(mean_word_len, 6),
        "symbol_word_ratio": F.round(symbol_ratio, 6),
        "bullet_line_ratio": F.round(bullet_ratio, 6),
        "ellipsis_line_ratio": F.round(ellipsis_ratio, 6),
        "alpha_word_ratio": F.round(alpha_ratio, 6),
        "n_stopwords": n_stop.cast("int"),
    }


def c4_clean_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words_per_line: int = 3,
    require_terminal_punct: bool = True,
    line_ban: list[str] | None = None,
    doc_ban: list[str] | None = None,
    min_kept_lines: int = 3,
    passthrough: bool = False,
) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020, §2.2 heuristics).

    Line rules (a line survives iff it passes all):
    - at least ``min_words_per_line`` whitespace words
    - ends in terminal punctuation (. ! ? ") when ``require_terminal_punct``
    - contains none of ``line_ban`` substrings (default: ["javascript"],
      case-insensitive)

    Document rules:
    - dropped when the text contains any of ``doc_ban`` (default:
      ["lorem ipsum", "{"]) or fewer than ``min_kept_lines`` lines survive.

    Everything runs in one narrow projection via higher-order functions over
    the line array — the rebuilt text never round-trips through a shuffle, so
    at corpus scale this is a pure map stage fused with the scan.

    ``passthrough=True`` keeps every input column alongside the computed
    ones, so pipeline callers can replace the text in-place with a narrow
    projection instead of re-joining the corpus on id.  Ban terms are
    matched case-insensitively (both sides lowercased)."""
    lb = [b.lower() for b in (["javascript"] if line_ban is None else line_ban)]
    db = [b.lower() for b in (["lorem ipsum", "{"] if doc_ban is None else doc_ban)]
    t = F.col(text_col)
    lines = F.filter(F.split(t, r"\n"), lambda l: F.trim(l) != "")

    def line_ok(l: Column) -> Column:
        words = F.size(
            F.filter(F.split(F.trim(l), r"\s+"), lambda w: w != "")
        )
        ok = words >= min_words_per_line
        if require_terminal_punct:
            ok = ok & F.rtrim(l).rlike('[.!?"]$')
        for b in lb:
            ok = ok & ~F.contains(F.lower(l), F.lit(b))
        return ok

    kept = F.filter(lines, line_ok)
    doc_banned = F.lit(False)
    for b in db:
        doc_banned = doc_banned | F.contains(F.lower(t), F.lit(b))
    lead = [df["*"]] if passthrough else [F.col(id_col)]
    return df.select(
        *lead,
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept"),
        (~doc_banned & (F.size(kept) >= min_kept_lines)).alias("keep_doc"),
        F.array_join(kept, "\n").alias("cleaned"),
    )


# --- Gopher repetition rules (Rae et al. 2021, MassiveText Table A1) --------

# Published thresholds: fraction of characters in the single most frequent
# word n-gram (n=2..4), and fraction of characters in ALL duplicated word
# n-grams (n=5..10).
GOPHER_TOP_NGRAM_THRESHOLDS = {2: 0.20, 3: 0.18, 4: 0.16}
GOPHER_DUP_NGRAM_THRESHOLDS = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}


def _nonblank_segments(t: Column, sep: str) -> Column:
    """Trimmed non-blank segments of ``t`` split on ``sep`` (a regex)."""
    return F.filter(
        F.transform(F.split(t, sep), lambda s: F.trim(s)), lambda s: s != ""
    )


def _dup_segment_stats(segments: Column) -> tuple[Column, Column]:
    """(duplicate count, duplicate chars) over a segment array: every
    occurrence AFTER the first of an identical segment counts (the common
    Gopher-implementation definition, e.g. Dolma/RedPajama), and its chars
    are the segment's length.  Computed by sorting the array and comparing
    adjacent entries — pure codegen, O(S log S) per document, no shuffle."""
    sorted_seg = F.sort_array(segments)
    # element_at is 1-based; the lambda index is 0-based, so element_at(.., i)
    # IS the previous element for the entry at 0-based position i
    dups = F.filter(
        sorted_seg, lambda x, i: (i > 0) & (x == F.element_at(sorted_seg, i))
    )
    dup_chars = F.aggregate(
        dups, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    return F.size(dups), dup_chars


def _word_ngrams_all(toks, n: int):
    """ALL word n-grams in order (duplicates kept — unlike word_shingles,
    which is distinct by design); empty for documents with < n tokens."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def gopher_repetition(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_dup_line_fraction: float = 0.30,
    max_dup_para_fraction: float = 0.30,
    max_dup_line_char_fraction: float = 0.20,
    max_dup_para_char_fraction: float = 0.20,
    top_ngram_thresholds: dict[int, float] | None = None,
    dup_ngram_thresholds: dict[int, float] | None = None,
) -> DataFrame:
    """Per-document Gopher REPETITION metrics and the combined keep flag —
    the second half of the published MassiveText filter (the seven
    document-shape rules are :func:`gopher_quality`):

    1. duplicate line / paragraph fraction  <= 0.30
    2. duplicate line / paragraph CHARACTER fraction <= 0.20
    3. top word-n-gram character fraction (n=2,3,4) <= {0.20, 0.18, 0.16}
    4. duplicate word-n-gram character fraction (n=5..10)
       <= {0.15 .. 0.10}

    Definitional choices (implementations differ; these are applied
    consistently on BOTH the metric and its oracle): a "duplicate"
    line/paragraph/n-gram occurrence is every occurrence AFTER THE FIRST of
    a byte-identical trimmed segment / gram; the top-n-gram character
    fraction is occurrences x n-gram length over the space-joined token
    character count, and the top gram must occur >= 2 times to score (one
    occurrence is not repetition — without this, short clean documents
    trivially fail; the paper's web documents are long enough that the
    distinction vanishes); duplicate-n-gram chars sum occurrence lengths
    without deduplicating overlapping character positions (the cheap
    published approximation, an upper bound on the exact coverage variant)
    and every fraction is clamped to 1.0.

    N-gram identity is xxhash64 of the gram (64-bit): two distinct grams
    colliding WITHIN one document would merge their counts — negligible for
    a quality heuristic and the price of an integers-only shuffle.

    Scale shape: the line/paragraph metrics are a narrow in-array projection
    (segment arrays are small); the n-gram metrics are ONE inline explode of
    (n, gram-hash, gram-length) entries — 9 entries per token position —
    into a (doc, n, hash) count aggregate and a per-doc conditional rollup,
    both map-side-combinable hash aggregates keyed by the doc id.  Only
    12-byte int tuples shuffle, never gram strings.  (A shuffle-free
    in-array sort+fold variant was measured 20x slower: Catalyst evaluates
    higher-order ``aggregate`` lambdas interpreted, per element — the
    explode keeps everything in whole-stage codegen.)  Per-document
    transient memory is O(9T) gram structs while the generator input
    materializes — ~60 MB at the 100k-word ceiling Gopher's own max_words
    rule imposes, so apply :func:`gopher_quality` (or any length gate)
    FIRST on corpora that may contain pathological multi-million-token
    rows."""
    from ..functions.parallelism import ensure_parallelism

    top_thr = (
        GOPHER_TOP_NGRAM_THRESHOLDS if top_ngram_thresholds is None
        else top_ngram_thresholds
    )
    dup_thr = (
        GOPHER_DUP_NGRAM_THRESHOLDS if dup_ngram_thresholds is None
        else dup_ngram_thresholds
    )
    all_ns = sorted(set(top_thr) | set(dup_thr))
    t = F.col(text_col)
    toks = tokens(t)
    total_chars = F.length(F.concat_ws(" ", toks))

    lines = _nonblank_segments(t, r"\n")
    paras = _nonblank_segments(t, r"\n{2,}")
    n_lines, n_paras = F.size(lines), F.size(paras)
    line_chars = F.aggregate(
        lines, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    para_chars = F.aggregate(
        paras, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    dup_line_n, dup_line_c = _dup_segment_stats(lines)
    dup_para_n, dup_para_c = _dup_segment_stats(paras)

    def frac(num, den) -> Column:
        return F.round(
            F.least(
                F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0)),
                F.lit(1.0),
            ),
            6,
        )

    seg = df.select(
        F.col(id_col),
        total_chars.alias("_total"),
        frac(dup_line_n, n_lines).alias("dup_line_frac"),
        frac(dup_para_n, n_paras).alias("dup_para_frac"),
        frac(dup_line_c, line_chars).alias("dup_line_char_frac"),
        frac(dup_para_c, para_chars).alias("dup_para_char_frac"),
    )

    # inline generator input (see _exploded_shingle_index): one explode
    # emits (n, hash, len) for every gram of every configured n.  The lambda
    # MUST stay unary (a second defaulted parameter would make pyspark treat
    # it as an (element, index) binary lambda), so n binds via a factory.
    # The token array is STAGED in its own projection (round 12): the gram
    # transforms reference the token array from inside their slice lambdas —
    # higher-order functions evaluate those interpreted, once per element —
    # so the inline form re-ran the regex tokenization once per gram × 9
    # configured n values.  Staging halved the gram aggregate at sf1
    # (31.6→15.1 s, identical checksums); see word_shingles_of.
    tk = F.col("_tk")

    def gram_entries(n: int) -> Column:
        return F.transform(
            _word_ngrams_all(tk, n),
            lambda g: F.struct(
                F.lit(n).alias("n"),
                F.xxhash64(g).alias("h"),
                F.length(g).alias("l"),
            ),
        )

    gram_structs = F.flatten(F.array(*[gram_entries(n) for n in all_ns]))
    per_gram = (
        ensure_parallelism(df)
        .select(F.col(id_col).alias("_id"), tokens(t).alias("_tk"))
        .select("_id", F.explode(gram_structs).alias("g"))
        .select("_id", "g.n", "g.h", "g.l")
        .groupBy("_id", "n", "h", "l")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    k, l, nn = F.col("k"), F.col("l"), F.col("n")
    per_doc = per_gram.groupBy("_id").agg(
        *[
            F.max(F.when((nn == n) & (k >= 2), k * l)).alias(f"_top_{n}")
            for n in sorted(top_thr)
        ],
        *[
            F.sum(F.when((nn == n) & (k > 1), (k - 1) * l)).alias(f"_dup_{n}")
            for n in sorted(dup_thr)
        ],
    )

    joined = seg.join(per_doc, seg[id_col] == per_doc["_id"], "left")
    total = F.col("_total")
    out = joined.select(
        seg[id_col],
        "dup_line_frac",
        "dup_para_frac",
        "dup_line_char_frac",
        "dup_para_char_frac",
        *[
            frac(F.coalesce(F.col(f"_top_{n}"), F.lit(0)), total).alias(
                f"top_{n}gram_char_frac"
            )
            for n in sorted(top_thr)
        ],
        *[
            frac(F.coalesce(F.col(f"_dup_{n}"), F.lit(0)), total).alias(
                f"dup_{n}gram_char_frac"
            )
            for n in sorted(dup_thr)
        ],
    )
    passes = (
        (F.col("dup_line_frac") <= max_dup_line_fraction)
        & (F.col("dup_para_frac") <= max_dup_para_fraction)
        & (F.col("dup_line_char_frac") <= max_dup_line_char_fraction)
        & (F.col("dup_para_char_frac") <= max_dup_para_char_fraction)
    )
    for n, thr in sorted(top_thr.items()):
        passes = passes & (F.col(f"top_{n}gram_char_frac") <= thr)
    for n, thr in sorted(dup_thr.items()):
        passes = passes & (F.col(f"dup_{n}gram_char_frac") <= thr)
    return out.withColumn("passes", passes)
