"""DSIR importance resampling: hashed n-gram importance weights +
Gumbel-top-k selection (Xie et al. 2023).

Mirror-only proof (zero-slack r05 gate): a row-at-a-time Python oracle
recomputes the md5 feature hashing, the Laplace-smoothed log-ratio
model, every per-doc weight, and the deterministic Gumbel keys.
"""

import hashlib
import math
import re

import pytest

from xpshacl_spark.operators.sample import (
    dsir_feature_log_ratio,
    dsir_select,
    dsir_weights,
)

BUCKETS = 64  # small so collisions actually happen and are covered
SMOOTH = 1.0


# ---------------------------------------------------------------------------
# Python oracle — mirrors the operators byte-for-byte
# ---------------------------------------------------------------------------


def py_grams(text):
    if text is None:
        return []
    ws = [w for w in re.split(r"\s+", text.strip().lower()) if w != ""]
    grams = list(ws)
    grams += [" ".join(ws[i : i + 2]) for i in range(len(ws) - 1)]
    return grams


def py_feat(gram, buckets=BUCKETS):
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16) % buckets


def py_counts(texts, buckets=BUCKETS):
    c = {}
    for t in texts:
        for g in py_grams(t):
            f = py_feat(g, buckets)
            c[f] = c.get(f, 0) + 1
    return c


def py_log_ratio(raw_texts, target_texts, buckets=BUCKETS, s=SMOOTH):
    ct, cr = py_counts(target_texts, buckets), py_counts(raw_texts, buckets)
    tot_t, tot_r = sum(ct.values()), sum(cr.values())
    out = {}
    for f in set(ct) | set(cr):
        pt = (ct.get(f, 0) + s) / (tot_t + s * buckets)
        pr = (cr.get(f, 0) + s) / (tot_r + s * buckets)
        out[f] = math.log(pt) - math.log(pr)
    return out


def py_weight(text, ratio):
    return sum(ratio.get(py_feat(g), 0.0) for g in py_grams(text))


def py_gumbel_key(doc_id, weight, seed="dsir"):
    u = (
        int(hashlib.md5(f"{seed}|{doc_id}".encode()).hexdigest()[:8], 16) + 0.5
    ) / 2**32
    return weight + (-math.log(-math.log(u)))


RAW = [
    (0, "the cat sat on the mat"),
    (1, "spark executes distributed dataframe plans"),
    (2, "wiki article about medieval castles and moats"),
    (3, "spark dataframe joins shuffle on their keys"),
    (4, "lorem ipsum dolor sit amet"),
    (5, "the dog sat on the log"),
    (6, ""),
    (7, None),
    (8, "spark spark spark"),
]
TARGET = [
    (100, "spark dataframe plans"),
    (101, "distributed spark shuffle keys"),
    (102, "dataframe plans shuffle"),
]


def dfs(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    return raw, target


def test_dsir_log_ratio_matches_python_oracle(spark):
    raw, target = dfs(spark)
    got = {
        r["feat"]: r["log_ratio"]
        for r in dsir_feature_log_ratio(
            raw, target, buckets=BUCKETS, smoothing=SMOOTH
        ).collect()
    }
    want = py_log_ratio([t for _, t in RAW], [t for _, t in TARGET])
    assert set(got) == set(want)
    for f in want:
        assert got[f] == pytest.approx(want[f], rel=1e-12), f"feat {f}"


def test_dsir_weights_match_python_oracle(spark):
    raw, target = dfs(spark)
    got = {
        r["doc_id"]: r["dsir_weight"]
        for r in dsir_weights(
            raw, target, buckets=BUCKETS, smoothing=SMOOTH
        ).collect()
    }
    ratio = py_log_ratio([t for _, t in RAW], [t for _, t in TARGET])
    assert set(got) == {i for i, _ in RAW}  # empty + NULL docs keep a row
    for i, t in RAW:
        assert got[i] == pytest.approx(py_weight(t, ratio), rel=1e-9), f"doc {i}"
    # semantics: target-like docs outweigh off-topic ones
    assert got[3] > got[2] and got[1] > got[4]
    assert got[6] == 0.0 and got[7] == 0.0


def test_dsir_prefit_ratio_reused(spark):
    # fitting once and scoring with log_ratio= must equal the fused path
    raw, target = dfs(spark)
    ratio = dsir_feature_log_ratio(raw, target, buckets=BUCKETS)
    a = {r["doc_id"]: r["dsir_weight"] for r in dsir_weights(raw, target, buckets=BUCKETS).collect()}
    b = {
        r["doc_id"]: r["dsir_weight"]
        for r in dsir_weights(raw, log_ratio=ratio, buckets=BUCKETS).collect()
    }
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == pytest.approx(b[k], rel=1e-12)
    with pytest.raises(ValueError):
        dsir_weights(raw)  # neither target nor ratio


def test_dsir_select_matches_gumbel_oracle(spark):
    raw, target = dfs(spark)
    w = dsir_weights(raw, target, buckets=BUCKETS)
    ratio = py_log_ratio([t for _, t in RAW], [t for _, t in TARGET])
    keys = {
        i: py_gumbel_key(i, py_weight(t, ratio), seed="s1") for i, t in RAW
    }
    want = [i for i, _ in sorted(keys.items(), key=lambda kv: -kv[1])][:4]
    got = [r["doc_id"] for r in dsir_select(w, 4, seed="s1").collect()]
    assert sorted(got) == sorted(want)
    # per-row key parity too
    gotk = {
        r["doc_id"]: r["gumbel_key"]
        for r in dsir_select(w, len(RAW), seed="s1").collect()
    }
    for i in keys:
        assert gotk[i] == pytest.approx(keys[i], rel=1e-9)


def test_dsir_select_deterministic_and_seed_sensitive(spark):
    raw, target = dfs(spark)
    w = dsir_weights(raw, target, buckets=BUCKETS)
    a = sorted(r["doc_id"] for r in dsir_select(w, 3, seed="a").collect())
    a2 = sorted(
        r["doc_id"]
        for r in dsir_select(w.repartition(7), 3, seed="a").collect()
    )
    assert a == a2  # stable across partitionings
    seeds = {
        s: tuple(sorted(r["doc_id"] for r in dsir_select(w, 3, seed=s).collect()))
        for s in ("a", "b", "c", "d")
    }
    assert len(set(seeds.values())) > 1  # the noise actually moves picks


def test_dsir_plans(spark):
    # weights: ratio side must broadcast; select: top-k must compile to
    # TakeOrderedAndProject, never a global Sort+collect
    raw, target = dfs(spark)
    w = dsir_weights(raw, target, buckets=BUCKETS)
    wplan = w._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in wplan
    sel = dsir_select(w, 3)
    splan = sel._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in splan
