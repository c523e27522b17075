"""Deterministic, distributed sampling for training-data pipelines.

`df.sample()` is seed-stable only for a fixed partitioning — repartition
the input and the sample changes, which is useless for resumable
100 TB jobs. These samplers instead hash the ROW KEY, so membership is
a pure function of the data: zero shuffle, reproducible across cluster
sizes, re-runs, and engines (the same predicate is expressible in ANSI
SQL for the DuckDB oracle).

Mechanism: keep a row iff the first 8 hex chars of
md5(seed | key...) compare below a threshold string. Hex strings
compare lexicographically exactly like the 32-bit integers they
encode, so `rate` maps to threshold int(rate * 16^8) formatted as
8 hex digits — granularity 1/2^32, plenty for any sampling rate.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rate_threshold(rate: float) -> str:
    """Threshold string for a sampling rate in [0, 1]: 8 hex digits for
    rate < 1, and "g" for rate 1.0. "g" sorts above every hex string,
    so `bucket < threshold` is a tautology — rate 1.0 keeps ALL rows,
    including the ~1-in-2^32 keys whose bucket is exactly 'ffffffff'
    (which a 'ffffffff' threshold with strict '<' would drop at
    billion-row scale). Same lexicographic comparison in any engine, so
    oracle SQL embedding this literal stays in parity."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    if rate >= 1.0:
        return "g"
    return format(min(int(rate * 16**8), 16**8 - 1), "08x")


def hash_bucket(key_cols: Sequence[str], seed: str = "sample") -> Column:
    """First 8 md5 hex chars of (seed | key...) — the row's sampling
    coordinate in [0x00000000, 0xffffffff] as a hex string."""
    parts = [F.lit(seed)] + [F.col(c).cast("string") for c in key_cols]
    return F.substring(F.md5(F.concat_ws("|", *parts)), 1, 8)


def hash_sample(
    df: DataFrame,
    key_cols: Sequence[str],
    rate: float,
    seed: str = "sample",
) -> DataFrame:
    """Keep a deterministic `rate` fraction of rows keyed by key_cols.

    One zero-shuffle scan; the filter is a plain string comparison that
    whole-stage codegen inlines. Rows with equal keys always land on
    the same side of the cut (dedup-friendly: sample by doc key, not by
    physical row)."""
    return df.where(hash_bucket(key_cols, seed) < F.lit(rate_threshold(rate)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: Mapping[object, float],
    key_cols: Sequence[str],
    default_rate: float = 0.0,
    seed: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic sampling: rates maps stratum value ->
    keep fraction (e.g. downsample boilerplate 'web' docs, keep all
    'books'). Same zero-shuffle hash mechanism; the per-stratum
    threshold is a CASE over compile-time literals."""
    thr: Column = F.lit(rate_threshold(default_rate))
    for value, rate in sorted(rates.items(), key=lambda kv: str(kv[0])):
        thr = F.when(
            F.col(strata_col) == F.lit(value), F.lit(rate_threshold(rate))
        ).otherwise(thr)
    return df.where(hash_bucket(key_cols, seed) < thr)


def split_train_eval(
    df: DataFrame,
    key_cols: Sequence[str],
    eval_rate: float = 0.01,
    seed: str = "split",
) -> tuple[DataFrame, DataFrame]:
    """Disjoint, exhaustive train/eval split on the same hash coordinate
    (train = rows at/above the cut, eval = rows below). Keys never leak
    across the split regardless of partitioning or cluster size."""
    cut = F.lit(rate_threshold(eval_rate))
    coord = hash_bucket(key_cols, seed)
    return df.where(coord >= cut), df.where(coord < cut)


def cap_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    key_cols: Sequence[str],
    cap: int,
    seed: str = "cap",
    salt: int = 0,
) -> DataFrame:
    """Per-group document quota (the web-corpus per-DOMAIN cap): keep at
    most `cap` rows per group, selected in deterministic hash order —
    unbiased w.r.t. ingestion/id order and identical across engines,
    partitionings, and cluster sizes (same md5 coordinate as
    hash_sample, so the ANSI oracle is a plain ROW_NUMBER()).

    Plan: row_number window over (group, ORDER BY hash, key) <= cap —
    one shuffle on group_cols. Because the row_number is immediately
    filtered `<= cap`, Catalyst plans a WindowGroupLimit (rank-limit
    pushdown): each MAP task pre-caps its local rows per group BEFORE
    the exchange, so a mega-domain (10^9 rows of one host) ships at
    most cap rows per input partition instead of all of them — the
    skew bound is built into the modern plan (pinned by plan test).
    `salt > 0` additionally applies the exact two-phase form —
    per-(group, salt-of-key) row_number keeps cap rows per sub-group,
    then the final per-group window sees <= cap*salt survivors — for
    engines without rank-limit pushdown or when the group count is so
    low that per-group reducer memory still matters. Every global
    top-cap-by-hash row is in its salt bucket's top-cap, so both forms
    are value-identical (property-tested).
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    from pyspark.sql.window import Window

    keys = [F.col(c) for c in key_cols]
    # ORDER-ONLY key: the 8-hex sampling coordinate parsed to a long.
    # Lowercase fixed-width hex is order-isomorphic to its integer
    # value, so every window below selects exactly the rows the
    # hex-string order (the oracle's ROW_NUMBER coordinate) selects —
    # ties map to ties — while the rank-limit sort compares 8-byte
    # longs instead of strings (r06, guide §2.3 narrower types).
    base = df.withColumn(
        "_h", F.conv(hash_bucket(key_cols, seed), 16, 10).cast("long")
    )
    if salt > 0:
        sk = F.pmod(F.xxhash64(*keys), F.lit(salt))
        w1 = (
            Window.partitionBy(*[F.col(c) for c in group_cols], sk)
            .orderBy(F.col("_h"), *keys)
        )
        base = (
            base.withColumn("_rn1", F.row_number().over(w1))
            .where(F.col("_rn1") <= cap)
            .drop("_rn1")
        )
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(
        F.col("_h"), *keys
    )
    return (
        base.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= cap)
        .drop("_rn", "_h")
    )


def budget_mix(
    df: DataFrame,
    strata_col: str,
    weight_col: str,
    budgets: Mapping[object, float],
    key_cols: Sequence[str],
    seed: str = "mix",
    default_rate: float = 0.0,
) -> DataFrame:
    """Training-mix recipe sampling: down-sample each stratum to a
    target total WEIGHT (token/char budget per source — the standard
    way a pretraining mix is specified). Per-stratum keep rate =
    min(1, budget / total_weight); membership then uses the
    deterministic key-hash coordinate, so the sample is stable across
    runs, partitionings, and engines, and a stratum under its budget
    is kept whole.

    The realized weight is rate * total in expectation (hash sampling
    is per-document); exact-budget packing would need the weighted
    prefix-sum machinery of operators.packing instead.

    Plan: one narrow (stratum, weight) groupBy whose result — ONE row
    per stratum — is collected to compute the rate literals (the only
    driver materialization, analogous to the packing operator's
    N-partition totals), then the same zero-shuffle CASE-threshold
    scan as stratified_sample.
    """
    totals = {
        r[0]: r[1]
        for r in df.groupBy(strata_col).agg(F.sum(weight_col)).collect()
    }
    rates = {}
    for stratum, budget in budgets.items():
        t = totals.get(stratum)
        rates[stratum] = 0.0 if not t else min(1.0, budget / t)
    return stratified_sample(df, strata_col, rates, key_cols, default_rate, seed)


def temperature_mix(
    df: DataFrame,
    strata_col: str,
    weight_col: str,
    key_cols: Sequence[str],
    budget: float,
    alpha: float = 0.5,
    seed: str = "tmix",
    default_rate: float = 0.0,
) -> DataFrame:
    """Temperature-scaled mixture sampling — the α-weighted pretraining
    mix (GPT-3 §2.2 / multilingual-LM exponent-smoothed sampling,
    publicly documented): stratum i receives share t_i^α / Σ_j t_j^α of
    the total weight `budget`, so α < 1 flattens the natural mixture
    (up-weights small sources, down-weights the web-crawl monolith)
    and α = 1 degenerates to proportional (keep-rate uniform across
    strata). Per-stratum keep rate = min(1, share·budget / t_i); a
    stratum whose α-share exceeds its size is kept whole (no
    up-sampling — repeat-epoch scheduling is a trainer concern).

    Determinism across engines/partitionings: totals are exact sums;
    α = 0.5 uses math.sqrt (IEEE correctly-rounded — bit-identical in
    any engine, unlike pow); the normalizer Σ accumulates in
    sorted-stratum order; membership is the same hash-threshold
    predicate as every sampler here. Plan: one narrow totals groupBy
    collected (one row per stratum), then a zero-shuffle CASE scan."""
    import math

    def _powa(t: float) -> float:
        return math.sqrt(t) if alpha == 0.5 else t**alpha

    totals = {
        r[0]: float(r[1])
        for r in df.groupBy(strata_col).agg(F.sum(weight_col)).collect()
        if r[0] is not None and r[1] is not None
    }
    items = sorted(totals.items(), key=lambda kv: str(kv[0]))
    s_total = 0.0
    for _, t in items:
        if t > 0:
            s_total += _powa(t)
    rates = {}
    for stratum, t in items:
        if t <= 0 or s_total <= 0:
            rates[stratum] = 0.0
        else:
            rates[stratum] = min(1.0, (budget * _powa(t) / s_total) / t)
    return stratified_sample(df, strata_col, rates, key_cols, default_rate, seed)


# ---------------------------------------------------------------------------
# DSIR: data selection via hashed n-gram importance resampling
# ---------------------------------------------------------------------------


def _dsir_feat_id(gram: Column, buckets: int) -> Column:
    """Hashed feature id of a word n-gram: first 8 md5 hex chars as an
    int, mod buckets. md5 (not xxhash64) so the Python test oracle and
    an ANSI engine can recompute the identical bucket ids."""
    h32 = F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long")
    return F.pmod(h32, F.lit(buckets))


def _dsir_grams(text_col: str) -> Column:
    """DSIR's feature set: lowercase word unigrams + bigrams (Xie et
    al. 2023 §3 use hashed n-grams up to n=2), via the shared
    gram builder so tokenization can never diverge from the other
    text operators."""
    from xpshacl_spark.operators.text import gram_array, words

    # drop the "" pseudo-word a blank doc splits into, so empty/blank
    # docs contribute NO features and score exactly 0
    ws = F.filter(words(F.lower(F.col(text_col))), lambda w: w != "")
    return F.concat(gram_array(ws, 1), gram_array(ws, 2))


def dsir_feature_log_ratio(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    buckets: int = 16384,
    smoothing: float = 1.0,
) -> DataFrame:
    """The DSIR importance model as a reusable artifact: per hashed
    feature f, log p_target(f) - log p_raw(f) under Laplace-smoothed
    bag-of-hashed-ngram multinomials — (feat, log_ratio), at most
    `buckets` rows. Persist it like the vocab/fingerprint artifacts and
    score any number of raw shards against it.

    Plan: one hashed-feature count agg per corpus (map-side combine
    absorbs the explode fan-out; the shuffle key space is capped at
    `buckets` rows per side), a 1-row totals agg broadcast-cross-joined
    into the ratio expression (never collected), and one buckets-sized
    full-outer join. Nothing here scales with corpus size except the
    two scans."""

    def counts(df: DataFrame, name: str) -> DataFrame:
        return (
            df.select(F.explode(_dsir_grams(text_col)).alias("gram"))
            .select(_dsir_feat_id(F.col("gram"), buckets).alias("feat"))
            .groupBy("feat")
            .agg(F.count(F.lit(1)).alias(name))
        )

    ct, cr = counts(target, "n_t"), counts(raw, "n_r")
    tot_t = ct.agg(F.coalesce(F.sum("n_t"), F.lit(0)).alias("tot_t"))
    tot_r = cr.agg(F.coalesce(F.sum("n_r"), F.lit(0)).alias("tot_r"))
    joined = (
        ct.join(cr, "feat", "full_outer")
        .crossJoin(F.broadcast(tot_t))
        .crossJoin(F.broadcast(tot_r))
    )
    s = F.lit(float(smoothing))
    b = F.lit(float(buckets))
    log_p = lambda n, tot: F.log(  # noqa: E731
        (F.coalesce(n, F.lit(0)).cast("double") + s)
        / (F.col(tot).cast("double") + s * b)
    )
    return joined.select(
        "feat",
        (log_p(F.col("n_t"), "tot_t") - log_p(F.col("n_r"), "tot_r")).alias(
            "log_ratio"
        ),
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 16384,
    smoothing: float = 1.0,
    log_ratio: DataFrame | None = None,
) -> DataFrame:
    """Per-document DSIR importance weight (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): the
    log importance ratio of the doc's hashed n-gram bag,
    sum_f count(f) * (log p_target(f) - log p_raw(f)) — (id, dsir_weight),
    one row per raw doc (empty/blank docs get weight 0.0).

    Pass `log_ratio` (from :func:`dsir_feature_log_ratio`, possibly
    persisted from an earlier run) to skip refitting; otherwise
    `target` is required and the model is fit in the same lazy plan.

    Plan: ONE raw-corpus explode -> broadcast join against the
    buckets-sized ratio table -> per-doc re-agg (the unigram_logprob
    shape); occurrence rows join WITHOUT a per-doc feature dedup
    because the weight is count-weighted by definition."""
    if log_ratio is None:
        if target is None:
            raise ValueError("need either target or a fitted log_ratio")
        log_ratio = dsir_feature_log_ratio(
            raw, target, text_col, buckets, smoothing
        )
    occ = raw.select(
        F.col(id_col),
        F.explode_outer(_dsir_grams(text_col)).alias("gram"),
    ).select(
        id_col, _dsir_feat_id(F.col("gram"), buckets).alias("feat")
    )
    return (
        occ.join(F.broadcast(log_ratio), "feat", "left")
        .groupBy(id_col)
        .agg(F.coalesce(F.sum("log_ratio"), F.lit(0.0)).alias("dsir_weight"))
    )


def dsir_select(
    weights: DataFrame,
    n: int,
    id_col: str = "doc_id",
    weight_col: str = "dsir_weight",
    seed: str = "dsir",
) -> DataFrame:
    """Select n docs by Gumbel-top-k over the importance weights —
    exactly DSIR's sampling-without-replacement step: adding i.i.d.
    Gumbel noise g_i to log-weights and taking the top k draws k docs
    without replacement with probability proportional to exp(weight)
    (Gumbel-max trick). The noise is DETERMINISTIC per (seed, id):
    u = (first 8 md5 hex chars of seed|id as int + 0.5) / 2^32,
    g = -log(-log(u)) — reproducible across runs, partitionings, and
    engines, like every sampler in this module.

    Plan: orderBy+limit compiles to TakeOrderedAndProject (per-partition
    top-n + driver merge of n-row heads) — no global sort at any scale.
    """
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.lit(seed), F.col(id_col).cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(1 << 32))
    key = F.col(weight_col) + (-F.log(-F.log(u)))
    return (
        weights.withColumn("gumbel_key", key)
        .orderBy(F.desc("gumbel_key"), F.col(id_col))
        .limit(n)
    )
