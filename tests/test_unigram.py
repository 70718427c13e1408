"""Distributed unigram-LM tokenizer trainer vs a pure-Python reference —
the trained models must be IDENTICAL (same seed inventory, same
fixed-point EM counts, same prune), under any partitioning. The
per-word float math (forward-backward, logsumexp, Viterbi) is
re-evaluated by the reference in the same operation order, and the
fixed-point quantization before aggregation makes the cross-partition
sums associative — so bit-identity is by construction, and these tests
pin it.
"""

from __future__ import annotations

import math
import re
from collections import Counter

from pyspark.sql import functions as F

from etl_lealone_spark.operators.unigram import (
    SCALE,
    unigram_encode_udf,
    unigram_train,
    viterbi_segment,
)


# -- pure-Python reference ---------------------------------------------------
def _py_words(texts):
    ws = []
    for t in texts:
        ws += [w for w in re.sub(r"[^a-z0-9]+", " ", t.lower()).strip().split(" ") if w]
    return Counter(ws)


def _py_fb(word, logp, max_len):
    n = len(word)
    NEG = float("-inf")
    alpha = [NEG] * (n + 1)
    alpha[0] = 0.0
    for i in range(1, n + 1):
        acc = NEG
        for j in range(max(0, i - max_len), i):
            lp = logp.get(word[j:i])
            if lp is None or alpha[j] == NEG:
                continue
            v = alpha[j] + lp
            acc = v if acc == NEG else (
                max(acc, v) + math.log1p(math.exp(-abs(acc - v)))
            )
        alpha[i] = acc
    if alpha[n] == NEG:
        return {}
    beta = [NEG] * (n + 1)
    beta[n] = 0.0
    for i in range(n - 1, -1, -1):
        acc = NEG
        for j in range(i + 1, min(n, i + max_len) + 1):
            lp = logp.get(word[i:j])
            if lp is None or beta[j] == NEG:
                continue
            v = beta[j] + lp
            acc = v if acc == NEG else (
                max(acc, v) + math.log1p(math.exp(-abs(acc - v)))
            )
        beta[i] = acc
    z = alpha[n]
    exp = {}
    for i in range(n):
        if alpha[i] == NEG:
            continue
        for j in range(i + 1, min(n, i + max_len) + 1):
            p = word[i:j]
            lp = logp.get(p)
            if lp is None or beta[j] == NEG:
                continue
            exp[p] = exp.get(p, 0.0) + math.exp(alpha[i] + lp + beta[j] - z)
    return exp


def _py_unigram(texts, vocab_size, max_len, seed_size, em_iters):
    words = _py_words(texts)
    sub = Counter()
    for w, nw in words.items():
        for i in range(len(w)):
            for ln in range(1, min(max_len, len(w) - i) + 1):
                sub[w[i : i + ln]] += nw
    top = sorted(sub.items(), key=lambda kv: (-kv[1], kv[0]))[:seed_size]
    seen = dict(top)
    for p, c in sorted(
        ((p, c) for p, c in sub.items() if len(p) == 1),
        key=lambda kv: (-kv[1], kv[0]),
    ):
        seen.setdefault(p, c)
    seed_chars = {p for p in seen if len(p) == 1}
    q = {p: c * SCALE for p, c in seen.items()}

    def probs(qq):
        total = sum(qq.values())
        return {p: math.log(c) - math.log(total) for p, c in qq.items() if c > 0}

    logp = probs(q)
    for _ in range(em_iters):
        qn = {}
        for w, nw in words.items():
            for p, e in _py_fb(w, logp, max_len).items():
                qn[p] = qn.get(p, 0) + int(round(e * nw * SCALE))
        q = qn
        for ch in seed_chars:
            q[ch] = max(q.get(ch, 0), 1)
        logp = probs(q)
    ranked = sorted(q.items(), key=lambda kv: (-kv[1], kv[0]))
    kept = {p for p, _ in ranked[:vocab_size]} | seed_chars
    kept_q = {p: max(q.get(p, 0), 1) if p in seed_chars else q[p]
              for p in kept if p in q or p in seed_chars}
    kept_q = {p: c for p, c in kept_q.items() if c > 0}
    final = probs(kept_q)
    return sorted(final.items(), key=lambda kv: (-kept_q[kv[0]], kv[0]))


TEXTS = [
    "low lower lowest low low",
    "new newer newest new new new",
    "wide wider widest",
    "the low new wide road; the lower newer wider load!",
    "tokenizer training needs subword units; unigram units differ from merges",
]

KW = dict(vocab_size=60, max_piece_len=5, seed_size=200, em_iters=2)


def test_unigram_train_matches_reference(spark):
    d = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    got = unigram_train(d, **KW)
    want = _py_unigram(TEXTS, KW["vocab_size"], KW["max_piece_len"],
                       KW["seed_size"], KW["em_iters"])
    assert [p for p, _ in got] == [p for p, _ in want]
    assert got == want  # logprobs bit-identical too (same int counts)


def test_unigram_train_partitioning_invariant(spark):
    d = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    a = unigram_train(d.coalesce(1), **KW)
    b = unigram_train(d.repartition(7), **KW)
    assert a == b


def test_unigram_model_is_a_distribution(spark):
    d = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    model = unigram_train(d, **KW)
    mass = sum(math.exp(lp) for _, lp in model)
    assert abs(mass - 1.0) < 1e-9
    # every training character survives the prune
    chars = {c for t in TEXTS for c in re.sub(r"[^a-z0-9]+", "", t.lower())}
    pieces = {p for p, _ in model}
    assert chars <= pieces


def test_unigram_encode_viterbi(spark):
    d = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    model = unigram_train(d, **KW)
    logp = dict(model)
    # segmentation reconstructs the word and maximizes model likelihood
    for w in ("lowest", "newer", "tokenizer", "units"):
        seg = viterbi_segment(w, logp, KW["max_piece_len"])
        assert "".join(seg) == w
        assert all(p in logp for p in seg)
    # OOV characters fall back to single-char pieces, never crash
    seg = viterbi_segment("low#x", logp, KW["max_piece_len"])
    assert "".join(seg) == "low#x"
    # the Arrow-batched encoder matches the driver-side Viterbi
    enc = unigram_encode_udf(model, KW["max_piece_len"])
    rows = (
        spark.createDataFrame([("lowest",), ("newer",)], "w string")
        .select("w", enc(F.col("w")).alias("toks"))
        .collect()
    )
    for r in rows:
        assert r["toks"] == viterbi_segment(r["w"], logp, KW["max_piece_len"])
