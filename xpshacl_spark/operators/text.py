"""Text-analysis operators for large-scale training-data pipelines.

Everything here is pure built-in Column expressions (JVM-side,
whole-stage codegen) — no Python in the row path — so each operator is
a zero-shuffle map over the documents table and survives a 100x
scale-up as an embarrassingly parallel scan.

The reference engine has no text analytics; these are the north-rule
"training-data pipeline" additions (lang-ID, quality scoring, token
counting, fingerprinting) layered on the same engine. They are also
usable as Shape `Expr` predicates (e.g. quality_score < t -> violation).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Language-ID heuristic: tiny per-language stopword lists. Deterministic
# and trivially mirrorable in ANSI SQL (the DuckDB oracle embeds the
# same lists). Order matters for tie-breaks: first list wins ties.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that", "for", "it"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "los", "se", "no"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "zu", "mit", "den"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "est", "que", "pour"),
}

#: BPE-ish token regex: runs of alphanumerics OR single non-space symbols.
TOKEN_RE = "[A-Za-z0-9]+|[^A-Za-z0-9\\s]"

#: Word-split regex used consistently across operators and oracles.
WS_RE = "\\s+"


def words(col: Column | str) -> Column:
    """Whitespace-delimited words of a (trimmed) text column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), WS_RE)


def token_count(col: Column | str) -> Column:
    """Whitespace token count; 0 for empty/blank strings."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.trim(c) == "", F.lit(0)).otherwise(F.size(words(c)))


def bpe_token_count(col: Column | str) -> Column:
    """Count of BPE-ish tokens (alnum runs + individual symbols)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_RE), F.lit(0)))


def stopword_hits(col: Column | str, lang: str) -> Column:
    """How many word OCCURRENCES are stopwords of `lang` (not distinct)."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(words(col), lambda w: F.array_contains(sw, F.lower(w))))


def lang_id(col: Column | str) -> Column:
    """Argmax language by stopword-occurrence count; 'und' if no hits.

    Ties break by STOPWORDS key order (en before es before de before
    fr), matching the oracle's CASE evaluation order.
    """
    scores = {lang: stopword_hits(col, lang) for lang in STOPWORDS}
    best = None
    for lang, s in scores.items():
        best = s if best is None else F.greatest(best, s)
    out = F.lit("und")
    # reversed so that earlier languages overwrite later ones on ties
    for lang in reversed(list(STOPWORDS)):
        out = F.when((scores[lang] > 0) & (scores[lang] == best), F.lit(lang)).otherwise(out)
    return out


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are not alnum/space (0 for empty)."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    n_clean = F.length(F.regexp_replace(c, "[A-Za-z0-9\\s]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(n_clean / n.cast("double"))


def stopword_ratio(col: Column | str) -> Column:
    """Fraction of word occurrences that are English stopwords."""
    n = token_count(col)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        stopword_hits(col, "en") / n.cast("double")
    )


def mean_word_len(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n = token_count(col)
    total = F.length(F.regexp_replace(c, WS_RE, ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(total / n.cast("double"))


def quality_score(col: Column | str) -> Column:
    """Composite document-quality heuristic in [0, 1].

    score = 0.4 * min(1, tokens/50)            (enough content)
          + 0.3 * (1 - min(1, punct_ratio*5))  (not symbol soup)
          + 0.3 * min(1, stopword_ratio*4)     (natural-language-ness)

    Deterministic arithmetic only, so the DuckDB oracle reproduces it
    bit-for-bit at 6-decimal rounding.
    """
    toks = token_count(col).cast("double")
    length_term = F.least(F.lit(1.0), toks / F.lit(50.0))
    punct_term = F.lit(1.0) - F.least(F.lit(1.0), punct_ratio(col) * F.lit(5.0))
    sw_term = F.least(F.lit(1.0), stopword_ratio(col) * F.lit(4.0))
    return (
        F.lit(0.4) * length_term + F.lit(0.3) * punct_term + F.lit(0.3) * sw_term
    )


def rebalance_if_narrow(df: DataFrame) -> DataFrame:
    """Widen a narrow input before an explosion-heavy stage.

    Shingling/gram operators multiply row counts 10-100x and spend
    their time BUILDING strings on the pre-explosion tasks; when the
    upstream scan has fewer partitions than spark.sql.shuffle.partitions
    (small files, one row-group, a coalesced cache) that construction
    runs on too few cores — measured 3.6x on a single-split corpus.
    One narrow round-robin exchange of the COMPACT pre-explosion rows
    fixes the imbalance. At cluster scale inputs already arrive with
    >= shuffle-partition splits, so this is a structural no-op there;
    values are unchanged either way (round-robin repartition is
    retry-deterministic via Spark's sort-before-repartition).

    The partition probe is gated: streaming inputs and plans with an
    upstream shuffle are returned untouched (post-shuffle parallelism
    is already shuffle.partitions, and probing such a plan with .rdd
    would execute its stages under AQE at plan-construction time)."""
    if df.isStreaming:
        return df
    try:
        # inside the try: platforms running AQE auto-tuning set
        # shuffle.partitions to a non-numeric value (e.g. "auto"), and
        # this guard must degrade to a no-op there, not raise
        target = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        plan = df._jdf.queryExecution().executedPlan().toString()
    except Exception:
        return df
    # a shuffle upstream already yields shuffle-partition parallelism —
    # and probing such a plan with .rdd would EXECUTE the upstream
    # stages under AQE (a real job at plan-construction time, running
    # the most expensive stage twice). Only bare-scan pipelines are
    # probed; .rdd on those runs no job.
    if "Exchange" in plan.replace("BroadcastExchange", ""):
        return df
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def gram_array(ws: Column, n) -> Column:
    """Guarded word n-gram array over a word-array column: one
    space-joined gram per start position, EMPTY for docs with < n
    words (a bare sequence(1, size-n+1) would DESCEND on short docs,
    not be empty). ``n`` may be a Python int or a Column (runtime n) —
    the single shared builder for shingles, positioned shingles, and
    the all-n repetition stats, so gram construction can never diverge
    between the span operators and the quality signals."""
    n_col = F.lit(n) if isinstance(n, int) else n
    k = F.size(ws) - (n_col - F.lit(1))
    return F.when(
        k >= 1,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(" ", F.slice(ws, i, n_col)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def normalize_text(col: Column | str) -> Column:
    """Canonical form for fingerprinting/dedup: lowercase, collapse all
    non-alnum runs to single spaces, trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " "))


def fingerprint(col: Column | str) -> Column:
    """Content fingerprint: md5 of the normalized text (the same md5
    keying idea as the violation-KG signature URIs,
    /root/reference/src/violation_kg.py:88-102)."""
    return F.md5(normalize_text(col))


def unicode_normalize(
    col: Column | str, form: str = "NFKC", casefold: bool = True
) -> Column:
    """Unicode-canonical text for MULTILINGUAL dedup keys:
    `unicodedata` normalization (NFKC by default: full-width forms,
    ligatures, compatibility characters fold to their canonical
    equivalents) + casefold (the unicode-correct lowercase: ß -> ss,
    İ -> i̇) + whitespace-run collapse. :func:`normalize_text`'s
    ``[^a-z0-9]`` canon deletes every non-Latin codepoint — fine for
    English web text, destructive for CJK/Cyrillic/Arabic corpora —
    so fingerprint multilingual content as
    ``F.md5(unicode_normalize(text_col))`` instead.

    Spark has no NFKC builtin, so this is the documented Arrow-batched
    pandas-UDF path (pandas' ``.str.normalize`` — C-looped over the
    batch, never per-row Python in the plan). NULL in, NULL out. Not
    oracle-parity-safe: DuckDB's ``nfc_normalize`` implements NFC
    only, which is why the mirrored operators keep the regex canon."""
    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown unicode normalization form: {form!r}")
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        out = s.str.normalize(form)
        if casefold:
            out = out.str.casefold()
        return out.str.replace(r"\s+", " ", regex=True).str.strip()

    c = F.col(col) if isinstance(col, str) else col
    return _norm(c)


def shingle_fingerprint(col: Column | str, n: int = 3) -> Column:
    """Rolling-window fingerprint: the MIN md5 over word n-gram shingles
    of the normalized text (a 1-hash MinHash; collision => near-dup
    candidate). NULL when the document has fewer than n words."""
    ws = F.split(normalize_text(col), " ")
    k = F.size(ws) - (n - 1)
    # sequence(1, 0) is DESCENDING in Spark, not empty — guard short docs
    shingles = F.when(
        k >= 1,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.md5(F.concat_ws(" ", F.slice(ws, i, n))),
        ),
    )
    return F.array_min(shingles)


def analyze(df: DataFrame, text_col: str = "text") -> DataFrame:
    """All text metrics as extra columns — one fused zero-shuffle scan
    that tokenizes each document exactly ONCE.

    The composable Column functions above duplicate their subexpressions
    when nested (lang_id alone references stopword_hits ~12x, and
    Catalyst does not de-duplicate across a single expression tree), so
    this staged form projects the lowered word array and the four
    per-language hit counts into intermediate columns first. Multi-use
    non-trivial aliases survive CollapseProject, so each is evaluated
    once per row; everything downstream references cheap attributes.
    Values are bit-identical to the composable forms (same expressions,
    same fold order) — the DuckDB oracle is unchanged.

    Narrow inputs are rebalanced first (r6): the fused scan's per-row
    expression work (tokenize + 4 stopword filters + regex ratios) is
    the whole cost of the operator, and on a single-row-group local
    file it would otherwise run on 1-2 cores (sf1.0: 4.6 s -> 2.9 s).
    Structural no-op at cluster scale — see rebalance_if_narrow.
    """
    df = rebalance_if_narrow(df)
    c = F.col(text_col)
    base_cols = list(df.columns)
    staged = df.withColumn("_xw", F.transform(words(c), F.lower))
    staged = staged.withColumn(
        "_xn", F.when(F.trim(c) == "", F.lit(0)).otherwise(F.size(F.col("_xw")))
    )
    def _hits(ws: tuple[str, ...]) -> Column:
        sw = F.array(*[F.lit(w) for w in ws])
        return F.size(F.filter(F.col("_xw"), lambda w: F.array_contains(sw, w)))

    for lang, ws in STOPWORDS.items():
        staged = staged.withColumn(f"_xs_{lang}", _hits(ws))
    staged = staged.withColumn("_xp", punct_ratio(c))

    n = F.col("_xn")
    best = None
    for lang in STOPWORDS:
        s = F.col(f"_xs_{lang}")
        best = s if best is None else F.greatest(best, s)
    lang_pred = F.lit("und")
    for lang in reversed(list(STOPWORDS)):
        s = F.col(f"_xs_{lang}")
        lang_pred = F.when((s > 0) & (s == best), F.lit(lang)).otherwise(lang_pred)
    swr = F.when(n == 0, F.lit(0.0)).otherwise(
        F.col("_xs_en") / n.cast("double")
    )
    total_wlen = F.length(F.regexp_replace(c, WS_RE, ""))
    mwl = F.when(n == 0, F.lit(0.0)).otherwise(total_wlen / n.cast("double"))
    quality = (
        F.lit(0.4) * F.least(F.lit(1.0), n.cast("double") / F.lit(50.0))
        + F.lit(0.3) * (F.lit(1.0) - F.least(F.lit(1.0), F.col("_xp") * F.lit(5.0)))
        + F.lit(0.3) * F.least(F.lit(1.0), swr * F.lit(4.0))
    )
    return staged.select(
        *base_cols,
        n.alias("n_tokens"),
        bpe_token_count(c).alias("n_bpe_tokens"),
        lang_pred.alias("lang_pred"),
        F.round(F.col("_xp"), 6).alias("punct_ratio"),
        F.round(swr, 6).alias("stopword_ratio"),
        F.round(mwl, 6).alias("mean_word_len"),
        F.round(quality, 6).alias("quality"),
        fingerprint(c).alias("fingerprint"),
    )


def profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Back-compat name for the fused text-analysis scan."""
    return analyze(df, text_col)


# PII detection regexes, kept in the common Java-regex / RE2 subset so
# the DuckDB oracle counts identically (no alternation whose greedy-vs-
# leftmost-longest semantics could diverge between engines).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+\d[\d().-]{7,}\d",
}


def pii_flags(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII indicator counts (emails, IPv4s, phone-like
    numbers) + an `any_pii` gate column — the scrubbing/filter primitive
    of a training-data pipeline. One fused zero-shuffle scan; counting
    is non-overlapping leftmost matching in both Spark and the oracle.
    Narrow inputs are rebalanced first (r6): three regexp_extract_all
    passes per doc are the whole cost; no-op at cluster scale."""
    df = rebalance_if_narrow(df)
    c = F.col(text_col)
    counts = [
        F.size(F.regexp_extract_all(c, F.lit(p), F.lit(0))).alias(f"n_{name}")
        for name, p in PII_PATTERNS.items()
    ]
    out = df.select(*df.columns, *counts)
    any_pii = None
    for name in PII_PATTERNS:
        t = F.col(f"n_{name}") > 0
        any_pii = t if any_pii is None else (any_pii | t)
    return out.withColumn("any_pii", any_pii)


GOPHER_REQUIRED_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_flags(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_required_words: int = 2,
) -> DataFrame:
    """The full Gopher/MassiveText document-filter rule set (Rae et al.
    2021, arXiv:2112.11446 §A1.1) as one fused scan: word-count bounds,
    mean-word-length bounds, PER-SYMBOL symbol-to-word ratios (the
    paper applies the 0.1 threshold to the hash symbol and the ellipsis
    SEPARATELY — a fused sum would over-filter docs at e.g. 6% + 6%),
    bullet-started and ellipsis-ended line fractions, alphabetic-word
    fraction, and the required-stopword rule (>= ``min_required_words``
    of the/be/to/of/and/that/have/with). Adds the eight signal columns
    plus a combined ``gopher_pass`` boolean next to the input columns;
    NULL text propagates to NULL signals and NULL pass.

    Word metrics run over a whitespace-normalized view of the text
    (every whitespace run -> one space, then trimmed): F.trim strips
    only ASCII spaces, so without this a tab-only document would count
    two words; line rules tolerate leading/trailing whitespace via
    ``\\s*`` in the anchors for the same reason (a tab-indented bullet
    is still a bullet).

    Complements :func:`quality_score` (a soft composite for ranking)
    with the published HARD filter — the two are used together in
    practice: hard gate first, score survivors.

    100-TB shape: ZERO shuffle — every rule is a per-row higher-order
    expression over the word/line arrays inside one codegen'd scan
    (same plan class as pii_flags; plan-pinned no-Exchange)."""
    c = F.col(text_col)
    wtxt = F.trim(F.regexp_replace(c, "\\s+", " "))
    ws = words(wtxt)
    n_words = token_count(wtxt)
    lines = F.split(c, "\n")
    n_lines = F.size(lines)
    lws = F.transform(ws, lambda w: F.lower(w))

    n_hash = F.size(F.regexp_extract_all(c, F.lit("#"), F.lit(0)))
    n_ellipsis_sym = F.size(
        F.regexp_extract_all(c, F.lit("\\.{3}|…"), F.lit(0))
    )
    n_alpha_words = F.size(F.filter(ws, lambda w: w.rlike("[A-Za-z]")))
    n_bullet = F.size(
        F.filter(lines, lambda l: l.rlike("^\\s*[•\\-\\*]"))
    )
    n_ellipsis = F.size(
        F.filter(lines, lambda l: l.rlike("(\\.{3}|…)\\s*$"))
    )
    n_required = None
    for w in GOPHER_REQUIRED_WORDS:
        t = F.array_contains(lws, w).cast("int")
        n_required = t if n_required is None else (n_required + t)

    def _frac(num: Column, den: Column) -> Column:
        return F.when(den == 0, F.lit(0.0)).otherwise(
            F.round(num / den.cast("double"), 6)
        )

    out = df.select(
        *df.columns,
        n_words.alias("n_words"),
        F.round(mean_word_len(wtxt), 6).alias("mean_word_len"),
        _frac(n_hash, n_words).alias("hash_word_ratio"),
        _frac(n_ellipsis_sym, n_words).alias("ellipsis_word_ratio"),
        _frac(n_bullet, n_lines).alias("frac_bullet_lines"),
        _frac(n_ellipsis, n_lines).alias("frac_ellipsis_lines"),
        _frac(n_alpha_words, n_words).alias("frac_alpha_words"),
        n_required.alias("n_required_words"),
    )
    return out.withColumn(
        "gopher_pass",
        F.col("n_words").between(min_words, max_words)
        & F.col("mean_word_len").between(min_mean_word_len, max_mean_word_len)
        & (F.col("hash_word_ratio") <= max_symbol_word_ratio)
        & (F.col("ellipsis_word_ratio") <= max_symbol_word_ratio)
        & (F.col("frac_bullet_lines") <= max_bullet_line_frac)
        & (F.col("frac_ellipsis_lines") <= max_ellipsis_line_frac)
        & (F.col("frac_alpha_words") >= min_alpha_word_frac)
        & (F.col("n_required_words") >= min_required_words),
    )


#: Tracking query parameters stripped by normalize_url (prefix match
#: for utm_*; exact for the ad-click ids). Public convention
#: (CCNet/RefinedWeb URL-dedup preprocessing).
URL_TRACKING_PARAM_RE = "^(utm_[^=]*|gclid|fbclid|msclkid)(=|$)"


def normalize_url(col: Column | str) -> Column:
    """Canonical URL for dedup keys (the CCNet/RefinedWeb URL-dedup
    preprocessing step), as pure Column expressions:

    * drop the ``#fragment``;
    * lowercase scheme and host (path/query case is preserved —
      paths are case-sensitive);
    * strip a leading ``www.`` and the scheme's default port
      (``:80`` http / ``:443`` https);
    * drop tracking query parameters (``utm_*``, gclid, fbclid,
      msclkid), preserving the relative order of the rest, and the
      ``?`` itself when nothing survives;
    * strip trailing ``/`` runs from the path.

    A value with no ``scheme://`` prefix is not a URL: it comes back
    lowercased+trimmed only, so the function is usable directly on a
    mixed ``source`` column. NULL in, NULL out."""
    c = F.col(col) if isinstance(col, str) else col
    u = F.regexp_replace(F.trim(c), "#.*$", "")
    scheme = F.lower(F.regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.regexp_replace(
        F.lower(F.regexp_extract(u, "^[^:/?]+://([^/?]*)", 1)), "^www\\.", ""
    )
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    rest = F.regexp_replace(u, "^[^:/?]+://[^/?]*", "")
    path = F.regexp_replace(F.regexp_extract(rest, "^([^?]*)", 1), "/+$", "")
    query = F.regexp_extract(rest, "\\?(.*)$", 1)
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~F.lower(p).rlike(URL_TRACKING_PARAM_RE),
    )
    q = F.array_join(kept, "&")
    return F.when(scheme == "", F.lower(u)).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            host,
            path,
            F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
        )
    )


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    min_words_per_line: int = 3,
    min_sentences: int = 5,
    badwords: tuple[str, ...] = (),
) -> DataFrame:
    """The C4 cleaning rule set (Raffel et al. 2020, arXiv:1910.10683
    §2.2) as one fused scan — the line-REWRITING counterpart to
    :func:`gopher_quality_flags` (which only gates):

    * line filter -> ``c4_text``: keep lines that end in a terminal
      punctuation mark (``. ! ?`` optionally followed by a closing
      quote), contain at least ``min_words_per_line`` words, and do not
      mention "javascript" (case-insensitive);
    * page gate -> ``c4_pass``: at least ``min_sentences`` sentences in
      the RETAINED text (sentence ~= terminal-punct run at a word
      boundary), no "lorem ipsum", no curly brace, and no word from the
      caller's ``badwords`` list (the paper uses the public
      "Dirty/Naughty" list; empty default = rule off).

    The paper's remaining rules map to existing operators and are NOT
    duplicated here: its three-sentence-span corpus dedup is
    :func:`xpshacl_spark.operators.dedup.strip_dup_spans` /
    ``dedup_paragraphs``, and its langdetect gate composes as
    ``.where(lang_id(...) == 'en')``.

    NULL text propagates to NULL ``c4_text``/signals/pass, same policy
    as the Gopher filter.

    100-TB shape: ZERO shuffle — the line filter and every signal are
    per-row higher-order expressions inside one codegen'd scan
    (plan-pinned no-Exchange, no-Generate, filters still pushed)."""
    c = F.col(text_col)
    lines = F.split(c, "\n")

    def _keep(l: Column) -> Column:
        wtxt = F.trim(F.regexp_replace(l, WS_RE, " "))
        return (
            l.rlike('[.!?]["”]?\\s*$')
            & (F.size(F.split(wtxt, " ")) >= min_words_per_line)
            & ~F.lower(l).contains("javascript")
        )

    kept = F.filter(lines, _keep)
    c4_text = F.array_join(kept, "\n")
    # sentence ~= terminal-punct run followed by whitespace/end; counted
    # on the retained text, after the line filter (the paper's rule
    # order: filter lines first, then drop short pages)
    n_sentences = F.regexp_count(c4_text, F.lit('[.!?]["”]?(\\s|$)'))
    has_lorem = F.lower(c).contains("lorem ipsum")
    has_brace = c.contains("{")
    if badwords:
        import re as _re

        pat = "(?i)\\b(?:" + "|".join(_re.escape(w) for w in badwords) + ")\\b"
        has_bad = c.rlike(pat)
    else:
        # rule off, but NULL text must still yield NULL (not False)
        has_bad = F.when(c.isNotNull(), F.lit(False))
    out = df.select(
        *df.columns,
        c4_text.alias("c4_text"),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept_lines"),
        n_sentences.alias("n_sentences"),
        has_lorem.alias("has_lorem_ipsum"),
        has_brace.alias("has_curly_brace"),
        has_bad.alias("has_badword"),
    )
    return out.withColumn(
        "c4_pass",
        (F.col("n_sentences") >= min_sentences)
        & ~F.col("has_lorem_ipsum")
        & ~F.col("has_curly_brace")
        & ~F.col("has_badword"),
    )


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher/C4-style repetition quality signals per document:

    * dup_word_frac — fraction of word occurrences that are repeats
      (1 - distinct/total), from array_distinct in the same scan;
    * top_word / top_word_frac — the modal normalized word and its
      occurrence fraction (boilerplate detector).

    The mode needs per-(doc, word) counts, so the plan is ONE read of
    the text column -> explode_outer (a NULL-word row keeps empty
    documents alive) -> hash agg on (doc, word) with map-side combine
    (the shuffle carries distinct words per doc, not occurrences) ->
    per-doc agg deriving n_words = sum(counts) and n_distinct =
    count(*) from the SAME relation — no second scan of the corpus and
    no join back. A per-doc higher-order-function mode would be
    O(words x distinct) per row — quadratic in document length — so
    the agg is the plan that survives 10k-word web documents. Ties
    break to the lexicographically smallest word via min_by on a
    (-count, word) key; the NULL-word sentinel sorts last so it is
    only chosen when the document has no words at all.
    Narrow inputs are rebalanced first (r6; no-op at cluster scale)."""
    df = rebalance_if_narrow(df)
    ws = F.split(normalize_text(text_col), " ")
    per_word = (
        df.select(
            F.col(id_col),
            F.explode_outer(F.filter(ws, lambda w: w != "")).alias("word"),
        )
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("wn"))
    )
    real = F.col("word").isNotNull()
    top = per_word.groupBy(id_col).agg(
        F.sum(F.when(real, F.col("wn")).otherwise(0)).alias("n_words"),
        F.count(F.when(real, 1)).alias("n_distinct"),
        F.min_by(
            F.when(real, F.struct(F.col("word").alias("w"), F.col("wn").alias("n"))),
            # key: non-null words first, then count desc, then word asc
            F.struct(
                F.col("word").isNull().alias("z"),
                (-F.col("wn")).alias("a"),
                F.col("word").alias("b"),
            ),
        ).alias("_top"),
    )
    nw = F.col("n_words").cast("double")
    return top.select(
        id_col,
        F.col("n_words").cast("int").alias("n_words"),
        F.round(
            F.when(F.col("n_words") == 0, F.lit(0.0)).otherwise(
                1.0 - F.col("n_distinct") / nw
            ),
            6,
        ).alias("dup_word_frac"),
        F.col("_top.w").alias("top_word"),
        F.round(
            F.when(F.col("n_words") == 0, F.lit(0.0)).otherwise(
                F.col("_top.n") / nw
            ),
            6,
        ).alias("top_word_frac"),
    )


def unigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    oov_count: float = 0.5,
    vocab: "DataFrame | None" = None,
) -> DataFrame:
    """Corpus-relative unigram log-probability per document — the
    CCNet/Gopher-style language-model quality filter with the LM
    reduced to its unigram term (deterministic, no external model):

        score(doc) = mean over word occurrences of
                     ln(count(word) / total_words),

    where counts come from THIS corpus (OOV impossible by construction;
    `oov_count` substitutes when scoring against a FOREIGN vocabulary
    via the optional join below). Low scores = rare-word soup
    (boilerplate hashes, gibberish); high scores = common fluent text.

    Plan: explode -> join the vocabulary -> re-aggregate by doc (two
    hash aggs + one keyed join, map-side combined). Pass `vocab` (a
    (word, wn) DataFrame, e.g. a persisted reference vocabulary) for
    the production shape: ONE scan of the corpus and OOV words scored
    at `oov_count`. Without it the vocabulary is derived from the
    corpus itself — convenient and oracle-exact, but the self-join
    means the text column is scanned twice (fine at test scale;
    precompute and persist the vocab at 100 TB). Returns
    (id, n_words, logprob)."""
    ws = F.split(normalize_text(text_col), " ")
    words_rel = df.select(
        F.col(id_col),
        F.explode(F.filter(ws, lambda w: w != "")).alias("word"),
    )
    if vocab is None:
        vocab = words_rel.groupBy("word").agg(F.count(F.lit(1)).alias("wn"))
        join_how = "inner"  # every corpus word is in its own vocab
    else:
        join_how = "left"  # OOV words score at oov_count
    total = vocab.agg(F.sum("wn").alias("t"))
    scored = (
        words_rel.join(vocab, "word", join_how)
        .crossJoin(F.broadcast(total))
        .select(
            id_col,
            F.log(
                F.coalesce(F.col("wn").cast("double"), F.lit(float(oov_count)))
                / F.col("t")
            ).alias("lp"),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_words"),
        F.round(F.avg("lp"), 6).alias("logprob"),
    )
    # a document with ZERO words has no exploded rows — join back so it
    # still appears (n_words 0, logprob NULL): a quality filter that
    # anti-joins low scorers must not let empty docs slip through by
    # absence
    return df.select(id_col).join(agg, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_words"), F.lit(0)).alias("n_words"),
        "logprob",
    )


def _bigram_rows(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Positioned word-bigram relation (id, w1, w2), one row per
    adjacent pair of normalized words; docs with < 2 words contribute
    no rows (guarded — a bare sequence(1, size-1) would DESCEND on
    empty docs, same trap as gram_array)."""
    ws = F.filter(F.split(normalize_text(text_col), " "), lambda w: w != "")
    k = F.size(ws) - 1
    pairs = F.when(
        k >= 1,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.struct(
                F.element_at(ws, i).alias("w1"),
                F.element_at(ws, i + F.lit(1)).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return df.select(
        F.col(id_col), F.explode(pairs).alias("p")
    ).select(id_col, "p.w1", "p.w2")


def bigram_model(df: DataFrame, text_col: str = "text"):
    """Train the Stupid-Backoff bigram model (Brants et al. 2007,
    "Large Language Models in Machine Translation" — the backoff used
    at web scale precisely because it needs NO discounting pass) from a
    corpus: returns ``(bigrams, unigrams)`` where

    * ``bigrams`` = (w1, w2, n12, s12) with s12 = n12 / count(w1)
      — the conditional score is precomputed AT TRAIN TIME (one
      vocab-sized join here) so scoring needs one fewer corpus-sized
      join per document batch;
    * ``unigrams`` = (word, wn) occurrence counts (the backoff term).

    Both relations are vocabulary-sized — persist them once and score
    any number of corpora against them (the CCNet production shape:
    the LM is trained on a clean reference corpus, e.g. Wikipedia, and
    scores the crawl)."""
    words_rel = df.select(
        F.explode(
            F.filter(F.split(normalize_text(text_col), " "), lambda w: w != "")
        ).alias("word")
    )
    unigrams = words_rel.groupBy("word").agg(F.count(F.lit(1)).alias("wn"))
    pair_counts = (
        _bigram_rows(df.select(F.lit(1).alias("_one"), text_col), "_one", text_col)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n12"))
    )
    bigrams = (
        pair_counts.join(
            unigrams.select(F.col("word").alias("w1"), F.col("wn").alias("n1")),
            "w1",
        )
        .select("w1", "w2", "n12", (F.col("n12") / F.col("n1")).alias("s12"))
    )
    return bigrams, unigrams


def bigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    model: "tuple[DataFrame, DataFrame] | None" = None,
    alpha: float = 0.4,
    oov_count: float = 0.5,
) -> DataFrame:
    """Bigram Stupid-Backoff log-score per document — the CCNet-style
    LM perplexity filter one order up from :func:`unigram_logprob`
    (CCNet itself uses a 5-gram KenLM; the bigram with Stupid Backoff
    is the largest order whose training is a single hash aggregation):

        score(doc) = mean over bigram positions i = 2..n of
                     ln S(w_i | w_{i-1}),
        S(w2 | w1) = count(w1 w2) / count(w1)   if the bigram was seen,
                   = alpha * count(w2) / N      otherwise (Stupid
                     Backoff; OOV w2 scores at ``oov_count``).

    Low scores = improbable word transitions (gibberish, keyword
    stuffing, boilerplate soup); high scores = fluent text. Pair with
    :func:`perplexity_buckets` for the CCNet head/middle/tail split.

    Plan: ONE explode of the corpus into (id, w1, w2) -> left join the
    (vocab²-sized, broadcast-eligible) bigram relation -> left join the
    unigram relation on w2 -> broadcast the total -> one hash re-agg by
    doc. Pass ``model`` (the persisted pair from :func:`bigram_model`)
    for the production shape; without it the model is derived from the
    corpus itself — oracle-exact but the text column is scanned twice
    (fine at test scale; train-once-and-persist at 100 TB). Returns
    (id, n_bigrams, logprob) with empty/one-word docs retained at
    n_bigrams 0 / NULL logprob (a filter that anti-joins low scorers
    must not pass short docs by absence)."""
    if model is None:
        bigrams, unigrams = bigram_model(df, text_col)
    else:
        bigrams, unigrams = model
    pairs = _bigram_rows(df, id_col, text_col)
    total = unigrams.agg(F.sum("wn").alias("t"))
    scored = (
        pairs.join(bigrams.select("w1", "w2", "s12"), ["w1", "w2"], "left")
        .join(
            unigrams.select(F.col("word").alias("w2"), F.col("wn").alias("wn2")),
            "w2",
            "left",
        )
        .crossJoin(F.broadcast(total))
        .select(
            id_col,
            F.log(
                F.coalesce(
                    F.col("s12"),
                    F.lit(float(alpha))
                    * F.coalesce(
                        F.col("wn2").cast("double"), F.lit(float(oov_count))
                    )
                    / F.col("t"),
                )
            ).alias("lp"),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_bigrams"),
        F.round(F.avg("lp"), 6).alias("logprob"),
    )
    return df.select(id_col).join(agg, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
        "logprob",
    )


def perplexity_buckets(
    df: DataFrame,
    score_col: str = "logprob",
    buckets: int = 3,
    accuracy: int = 10000,
    bucket_col: str = "bucket",
) -> DataFrame:
    """CCNet-style perplexity bucketing (head/middle/tail): assign each
    row a quantile bucket of ``score_col`` WITHOUT a global sort — the
    cut points come from ONE approx-percentile aggregation (GK sketch,
    map-side partials), are crossJoin-broadcast, and the assignment is
    a per-row expression. A window/ntile formulation would range-
    shuffle the whole corpus and rank it; this plan touches the corpus
    once and shuffles only sketch partials, so it survives 100 TB.

    Bucket 0 = lowest scores (= highest perplexity, CCNet's "tail"),
    bucket ``buckets-1`` = highest (CCNet's "head"); ties on a cut
    point fall to the lower bucket; NULL scores get a NULL bucket. For
    buckets=3 a ``ppl_bucket`` label column (tail/middle/head) is
    added. Cut points are approximate within the sketch's rank
    guarantee (1/accuracy); exactness at the boundaries is not the
    contract — stable, cheap stratification is."""
    if buckets < 2:
        raise ValueError("buckets must be >= 2")
    fracs = [i / buckets for i in range(1, buckets)]
    # underscore-prefixed internal alias: a user column named "cuts"
    # must survive the crossJoin+drop round-trip
    cuts = df.agg(
        F.percentile_approx(
            F.col(score_col), F.array(*[F.lit(f) for f in fracs]), accuracy
        ).alias("_ppl_cuts")
    )
    bucket = F.when(
        F.col(score_col).isNotNull(),
        F.size(
            F.filter(F.col("_ppl_cuts"), lambda c: c < F.col(score_col))
        ).cast("int"),
    )
    out = df.crossJoin(F.broadcast(cuts)).withColumn(bucket_col, bucket).drop(
        "_ppl_cuts"
    )
    if buckets == 3:
        out = out.withColumn(
            "ppl_bucket",
            # guard explicitly: element_at(arr, NULL) is not NULL-safe
            # across ANSI modes, and a NULL score must not get a label
            F.when(
                F.col(bucket_col).isNotNull(),
                F.element_at(
                    F.array(F.lit("tail"), F.lit("middle"), F.lit("head")),
                    F.col(bucket_col) + 1,
                ),
            ),
        )
    return out


def vocabulary(df: DataFrame, text_col: str = "text", k: int = 1000) -> DataFrame:
    """Corpus vocabulary: the k most frequent normalized tokens as
    (token, n, rank), ties broken by token ascending.

    Plan: explode the normalized word arrays -> one grouped count
    (map-side combine absorbs hot tokens like stopwords, so the shuffle
    carries one row per distinct token per partition, not per
    occurrence) -> distributed top-k via orderBy+limit, which Spark
    plans as TakeOrderedAndProject (each task keeps a k-row heap; the
    driver merges |tasks| heaps — never a global sort of the full
    distinct-token relation). The rank window runs AFTER the limit, so
    its unpartitioned sort sees at most k rows regardless of corpus
    size. This is the tokenizer-training / vocab-pruning primitive at
    100 TB scale: a web corpus has billions of distinct tokens, and a
    global rank window over them would be a one-task straggler —
    guarded against in tests/test_plans_salt.py.
    Narrow inputs are rebalanced first (r6; no-op at cluster scale)."""
    df = rebalance_if_narrow(df)
    toks = (
        df.select(F.explode(F.split(normalize_text(text_col), " ")).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    topk = toks.orderBy(F.col("n").desc(), F.col("token").asc()).limit(k)
    w = Window.orderBy(F.col("n").desc(), F.col("token").asc())
    return (
        topk.withColumn("rank", F.row_number().over(w).cast("int"))
        .select("token", "n", "rank")
    )


def bpe_merge_candidates(
    df: DataFrame, text_col: str = "text", k: int = 50
) -> DataFrame:
    """One iteration of BPE tokenizer training at corpus scale: the k
    most frequent ADJACENT CHARACTER PAIRS within normalized tokens,
    as (pair, n_pairs), ties broken by pair ascending — the pair a
    trainer would merge next. (Full BPE re-runs this after each merge
    over the re-segmented corpus; each iteration is this same count.)

    Plan: explode tokens -> explode in-token bigrams via a
    transform(sequence(...)) higher-order function (JVM-side, no
    Python) -> ONE grouped count whose map-side combine collapses the
    pair stream to at most |alphabet|^2 rows per partition before the
    shuffle (normalized text means <= 36^2 distinct pairs — the
    shuffle is constant-size regardless of corpus size) ->
    orderBy+limit, planned as TakeOrderedAndProject.

    Narrow inputs are rebalanced first (r6): the token/bigram explode
    is the operator's whole cost and must not run on a 1-2 split local
    file; structural no-op at cluster scale."""
    df = rebalance_if_narrow(df)
    toks = df.select(
        F.explode(F.split(normalize_text(text_col), " ")).alias("tok")
    ).where(F.length("tok") >= 2)
    pairs = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(tok) - 1),"
                " i -> substring(tok, i, 2))"
            )
        ).alias("pair")
    )
    counted = pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("n_pairs"))
    return counted.orderBy(F.col("n_pairs").desc(), F.col("pair").asc()).limit(
        k
    )


def ngram_repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ns: tuple[int, ...] = (2, 3, 4, 5, 10),
) -> DataFrame:
    """Gopher rule 5-6 n-gram repetition signals, one row per (doc, n):

    * top_ngram / top_char_frac — the MOST FREQUENT word n-gram (ties
      break to the lexicographically smallest) and the fraction of the
      normalized text's characters its occurrences cover
      (count * chars(gram) / chars(doc)); Gopher filters docs whose
      top-{2,3,4}-gram fraction exceeds 0.20/0.18/0.16.
    * dup_char_frac — characters covered by ALL n-grams occurring >= 2
      times, summed per occurrence (count * chars(gram)) / chars(doc);
      Gopher filters duplicated-{5..10}-gram fractions above
      0.15..0.10. Overlapping occurrences are counted per-occurrence
      (the standard Dolma/RedPajama reimplementation), so the raw
      value can exceed 1 on degenerate inputs — thresholds live well
      below that.

    Plan (r6): normalization and word-splitting stay in the JVM (so
    gram text can never diverge from the other span/dedup operators),
    then ONE Arrow-batched mapInPandas pass computes every n's mode
    and duplicate coverage per doc with tuple n-grams and a Counter —
    gram strings are never materialized except the single winning
    top_ngram per (doc, n). Tie-break parity: tuple-of-words order
    equals joined-with-space string order because the normalized
    alphabet ([a-z0-9]) sorts above the space separator. The division
    and HALF_UP rounding stay in Spark over the emitted integer
    numerators, so emitted doubles are bit-identical to the r5 plan.

    The r5 shape built every gram STRING in interpreted
    higher-order-function evals and shuffled the occurrence-sized
    (doc, n, gram) relation through a count agg and a per-doc agg
    (sf1.0: 7.9 s of the 9.0 s total was gram construction alone);
    this plan is zero-shuffle past the narrow-input rebalance and
    measures ~2 s. Values are identical: the Counter groups are
    exactly the old count(*) groups.
    """
    nt = F.trim(normalize_text(text_col))
    staged = rebalance_if_narrow(df).select(
        F.col(id_col).alias("doc_id"),
        F.filter(F.split(nt, " "), lambda w: w != "").alias("_ws"),
        F.length(nt).alias("_chars"),
    )
    ns_list = [int(n) for n in ns]
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = (
        f"doc_id {id_type}, n int, top_ngram string, "
        "_cover bigint, _dupchars bigint, _chars int"
    )

    def _stats(batches):
        from collections import Counter

        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "n", "top_ngram", "_cover", "_dupchars", "_chars"
            )}
            for doc, ws, chars in zip(
                pdf["doc_id"], pdf["_ws"], pdf["_chars"]
            ):
                chars_out = None if pd.isna(chars) else int(chars)
                words = None if ws is None else list(ws)
                for n in ns_list:
                    top, cover, dup = None, 0, 0
                    if words and len(words) >= n:
                        grams = list(zip(*(words[i:] for i in range(n))))
                        cnt = Counter(grams)
                        best_g, best_c = min(
                            cnt.items(), key=lambda kv: (-kv[1], kv[0])
                        )
                        top = " ".join(best_g)
                        cover = best_c * (len(top))
                        dup = sum(
                            c * (sum(map(len, g)) + n - 1)
                            for g, c in cnt.items()
                            if c >= 2
                        )
                    out["doc_id"].append(doc)
                    out["n"].append(n)
                    out["top_ngram"].append(top)
                    out["_cover"].append(cover)
                    out["_dupchars"].append(dup)
                    out["_chars"].append(chars_out)
            yield pd.DataFrame(out)

    per = staged.mapInPandas(_stats, schema=out_schema)
    chars = F.col("_chars").cast("double")
    has = (F.col("_chars") > 0) & F.col("top_ngram").isNotNull()
    return per.select(
        "doc_id",
        "n",
        "top_ngram",
        F.when(has, F.round(F.col("_cover") / chars, 6))
        .otherwise(F.lit(0.0))
        .alias("top_char_frac"),
        F.when(has, F.round(F.col("_dupchars") / chars, 6))
        .otherwise(F.lit(0.0))
        .alias("dup_char_frac"),
    )


def nb_quality_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "is_ref",
) -> DataFrame:
    """Model-based quality filtering (the CCNet/LLaMA-style "looks like
    the reference corpus" classifier): train a Bernoulli naive-Bayes
    word model against a boolean reference label and score every doc —
    BOTH stages in one lazy plan, no driver-side training loop.

    Per word (distinct per doc):
        w(word) = ln(((dfp + 0.5) / (P + 1)) / ((dfn + 0.5) / (N + 1)))
    where dfp/dfn are the word's reference/non-reference document
    frequencies and P/N the class doc totals (Laplace 0.5). Per doc:
        score = round(mean of w over its distinct words, 6)
    (0.0 and n_scored_words = 0 for wordless docs). Positive score =
    reference-like; filter below a threshold.

    Plan: the distinct-(doc, word) relation feeds the vocab-sized
    weight agg AND the scoring join; Spark plans the two consumers as
    two explode passes over the corpus text — on a large corpus use
    :func:`nb_quality_scores_with_words`, which persists the relation
    and returns the handle so the caller can unpersist (same
    convention as dedup.simhash_pairs_with_fingerprints; a bare
    keyword flag could never release the cache, since unpersist only
    acts on the exact DataFrame persist was called on). Class totals
    are a 1-row agg
    cross-joined broadcast into the weight relation (never collected);
    the scoring join is keyed by word with map-side combine absorbing
    hot words. Rounding to 6 decimals absorbs the sub-ulp double drift
    of ln and of partition-order float summation (same convention as
    unigram_logprob)."""
    W = nb_words(df, id_col, text_col, label_col)
    return _nb_scores_from_words(df, W, id_col, label_col)


def nb_words(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "is_ref",
) -> DataFrame:
    """The distinct-(doc_id, _ref, word) relation both NB stages
    consume — exposed so callers can materialize it ONCE (persist, or
    a managed table for cross-run reuse) and feed
    :func:`nb_quality_scores_from_words`, paying a single corpus
    explode instead of the two the convenience form plans."""
    words_arr = F.array_distinct(
        F.filter(F.split(normalize_text(text_col), " "), lambda w: w != "")
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.col(label_col).cast("boolean").alias("_ref"),
        F.explode(words_arr).alias("word"),
    )


def nb_quality_scores_from_words(
    df: DataFrame,
    words: DataFrame,
    id_col: str = "doc_id",
    label_col: str = "is_ref",
) -> DataFrame:
    """Score against an already-materialized :func:`nb_words` relation
    (persisted handle or table read-back) — the production shape: the
    corpus text is exploded exactly once, when ``words`` was built;
    this plan touches only the compact words relation plus a 1-row
    class-totals agg over ``df``."""
    return _nb_scores_from_words(df, words, id_col, label_col)


def nb_quality_scores_with_words(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "is_ref",
) -> tuple[DataFrame, DataFrame]:
    """:func:`nb_quality_scores` plus the PERSISTED distinct-(doc,
    word) relation — ``(scores, words)``. Both consumers (weight agg +
    scoring join) read the cache instead of re-exploding the corpus
    text. The caller owns the handle: ``words.unpersist()`` once
    scores are materialized."""
    from pyspark import StorageLevel

    W = nb_words(df, id_col, text_col, label_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    return _nb_scores_from_words(df, W, id_col, label_col), W


def _nb_scores_from_words(
    df: DataFrame, W: DataFrame, id_col: str, label_col: str
) -> DataFrame:
    totals = df.select(
        F.sum(F.col(label_col).cast("boolean").cast("long")).alias("_P"),
        F.count(F.lit(1)).alias("_T"),
    ).select("_P", (F.col("_T") - F.col("_P")).alias("_N"))
    stats = W.groupBy("word").agg(
        F.sum(F.col("_ref").cast("long")).alias("_dfp"),
        F.count(F.lit(1)).alias("_dft"),
    )
    weights = stats.crossJoin(F.broadcast(totals)).select(
        "word",
        F.log(
            ((F.col("_dfp") + 0.5) / (F.col("_P") + 1))
            / ((F.col("_dft") - F.col("_dfp") + 0.5) / (F.col("_N") + 1))
        ).alias("_w"),
    )
    scored = (
        W.select("doc_id", "word")
        .join(weights, "word")
        .groupBy("doc_id")
        .agg(
            F.round(F.sum("_w") / F.count(F.lit(1)), 6).alias("score"),
            F.count(F.lit(1)).cast("int").alias("n_scored_words"),
        )
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("score", F.lit(0.0)).alias("score"),
            F.coalesce("n_scored_words", F.lit(0)).alias("n_scored_words"),
        )
    )


def bpe_word_counts(
    df: DataFrame, text_col: str = "text", max_words: int = 1_000_000
) -> DataFrame:
    """The corpus-side half of BPE training (Sennrich et al. 2016):
    distinct normalized words with counts — ONE corpus-sized hash agg
    (map-side combine collapses repeats before the shuffle), capped at
    the max_words most frequent via TakeOrderedAndProject (ties broken
    by word ascending, so the cap is deterministic). Real tokenizer
    trainers (subword-nmt, HF tokenizers) train on exactly this
    relation: the iterative merge loop never needs the corpus again,
    only the vocab-sized word-count table."""
    w = df.select(
        F.explode(F.split(normalize_text(text_col), " ")).alias("word")
    ).where(F.col("word") != "")
    return (
        w.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.col("word"))
        .limit(max_words)
    )


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 100,
    min_pair_count: int = 2,
    max_words: int = 1_000_000,
) -> list:
    """Full BPE tokenizer training: returns the ordered merge list
    [(left, right), ...] (highest-count pair first; ties broken by
    (left, right) ascending — deterministic across runs and engines).
    Words carry the classic '</w>' end-of-word marker so merges can
    distinguish word-final units (the Sennrich formulation).

    Scale split: the corpus contributes exactly ONE aggregation
    (:func:`bpe_word_counts`); the merge loop then runs driver-side
    over the vocab-sized word-count table — the same architecture as
    subword-nmt/HF trainers, because pair statistics shrink with the
    vocab, not the corpus. The driver materialization is bounded by
    max_words (top-frequency cap), never corpus-sized."""
    rows = bpe_word_counts(df, text_col, max_words).collect()
    vocab = {}
    for r in rows:
        syms = tuple(r["word"]) + ("</w>",)
        vocab[syms] = vocab.get(syms, 0) + int(r["n"])
    merges = []
    for _ in range(n_merges):
        pair_counts: dict = {}
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + n
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (a, b), _n = best
        merged = a + b
        nv = {}
        for syms, n in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            nv[t] = nv.get(t, 0) + n
        vocab = nv
        merges.append((a, b))
    return merges


def apply_bpe(
    df: DataFrame,
    merges: list,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize with a trained merge list: per word, repeatedly apply
    the LOWEST-RANK applicable merge (the standard BPE inference rule —
    HF 'BPE' model semantics), '</w>' marking word ends. Arrow-batched
    pandas UDF (a documented Python-path exception: merge application
    is an in-word loop over a rank dict that Column HOFs cannot
    express; the batch transfer is Arrow and the rank dict is built
    once per executor via closure capture)."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}

    def encode_word(word: str) -> list:
        syms = list(word) + ["</w>"]
        while len(syms) > 1:
            best_rank, best_i = None, None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_i is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        return syms

    @F.pandas_udf("array<string>")
    def enc(texts: pd.Series) -> pd.Series:
        import re as _re

        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            norm = _re.sub(r"[^a-z0-9]+", " ", t.lower()).strip()
            toks: list = []
            for wd in norm.split():
                if wd:
                    toks.extend(encode_word(wd))
            out.append(toks)
        return pd.Series(out)

    return df.withColumn(out_col, enc(F.col(text_col)))
