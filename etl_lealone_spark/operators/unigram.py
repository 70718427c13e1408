"""Distributed unigram-LM tokenizer training (Kudo 2018 — the
SentencePiece unigram model), complementing the BPE trainer
(:mod:`.bpe`) with the other major subword-tokenizer family.

Spark-native shape, same state compaction as BPE:

1. ONE corpus pass builds the word-frequency table — a 100 TB corpus
   collapses to its distinct normalized words (vocabulary-bounded).
2. SEED: every substring of length 1..``max_piece_len`` of every word,
   weighted by word count, aggregated in one partial+final int sum;
   the top ``seed_size`` by (count desc, piece asc) plus ALL single
   characters become the candidate piece inventory (bounded collect —
   ``seed_size`` rows).
3. EM: each iteration is one ``mapInPandas`` pass over the word table
   (piece table broadcast via closure — it is ≤ seed_size entries).
   The E-step runs exact forward-backward over each word's
   segmentation lattice and emits per-piece expected counts; the
   M-step is a groupBy-sum plus a bounded collect.
4. PRUNE to ``vocab_size`` by final expected count (single characters
   always survive so every string stays encodable), renormalize.

Cross-partition determinism: expected counts are floats, and float
addition is not associative — a naive sum would depend on partitioning.
Every per-word expected count is therefore quantized to fixed-point
int64 (``round(x * 2^24)``) BEFORE aggregation; integer sums are
associative, so the trained model is bit-identical under any
partitioning and to the pure-Python reference implementation in
tests/test_unigram.py (which mirrors the same per-word float math in
the same evaluation order, then the same quantization).

Encoding uses Viterbi segmentation as an Arrow-batched pandas UDF
(:func:`unigram_encode_udf`) — per-row dynamic programming is genuinely
data-dependent control flow, the documented case for the Pandas-UDF
path over JVM expressions.

Reference for semantics: Kudo 2018 (arXiv:1804.10959); SentencePiece's
full trainer also re-runs EM between prune rounds — this implementation
does a single EM phase then one prune, a documented simplification that
keeps the merge of determinism + distribution exact.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bpe import word_freq_table

SCALE = 1 << 24  # fixed-point quantum for deterministic count sums
_OOV_LOGP = -1e9  # encode-time penalty for characters never seen in training


def _seed_pieces(
    words: DataFrame, max_piece_len: int, seed_size: int
) -> list[tuple[str, int]]:
    """Top-``seed_size`` substrings by weighted count (+ every single
    char), each with its quantizable integer count. One shuffle."""
    w = F.col("w")
    subs = words.select(
        "n",
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.length(w)),
                    lambda i: F.transform(
                        F.sequence(
                            F.lit(1),
                            F.least(F.lit(max_piece_len), F.length(w) - i + 1),
                        ),
                        lambda ln: w.substr(i, ln),
                    ),
                )
            )
        ).alias("piece"),
    )
    # checkpoint so the substring explode + shuffle — the seed phase's
    # heaviest stage — runs once for the two collects below
    counts = subs.groupBy("piece").agg(
        F.sum("n").cast("bigint").alias("cnt")
    ).localCheckpoint(eager=True)
    top = counts.orderBy(F.desc("cnt"), "piece").limit(seed_size).collect()
    chars = (
        counts.filter(F.length("piece") == 1)
        .orderBy(F.desc("cnt"), "piece")
        .collect()
    )
    seen: dict[str, int] = {}
    for r in list(top) + list(chars):
        seen.setdefault(r["piece"], int(r["cnt"]))
    return sorted(seen.items(), key=lambda kv: (-kv[1], kv[0]))


def _forward_backward(word: str, logp: dict[str, float], max_len: int):
    """Exact posterior expected count of each piece occurrence in
    ``word`` under the current unigram model. Returns ({piece: count},
    total_log_likelihood). Lattice nodes are the |word|+1 cut points;
    j is always iterated ASCENDING so the logsumexp accumulation order
    is reproducible anywhere."""
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
        return {}, NEG
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
    exp: dict[str, float] = {}
    for i in range(n):
        if alpha[i] == NEG:
            continue
        for j in range(i + 1, min(n, i + max_len) + 1):
            p = word[i:j]
            lp = logp.get(p)
            if lp is None or beta[j] == NEG:
                continue
            exp[p] = exp.get(p, 0.0) + math.exp(alpha[i] + lp + beta[j] - z)
    return exp, z


def _em_pass(words: DataFrame, logp: dict[str, float], max_len: int) -> DataFrame:
    """One distributed E-step: (piece, qcount) partials, summed.
    The piece table rides the task closure (≤ seed_size floats).

    Partials and their sum are decimal(38,0), not long: a very common
    piece at corpus scale ("the" at ~1e12 occurrences) times the 2^24
    quantum exceeds int64, and a long sum would wrap silently — the
    same overflow class connected_components' convergence sum guards
    against (Python ints on the pandas side are arbitrary-precision, so
    the per-partial value is exact too)."""
    from decimal import Decimal

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pieces: list[str] = []
            qcounts: list[Decimal] = []
            for word, cnt in zip(pdf["w"], pdf["n"]):
                exp, _ = _forward_backward(word, logp, max_len)
                for p, e in exp.items():
                    pieces.append(p)
                    qcounts.append(Decimal(int(round(e * cnt * SCALE))))
            yield pd.DataFrame({"piece": pieces, "qcount": qcounts})

    partials = words.select("w", "n").mapInPandas(
        gen, "piece string, qcount decimal(38,0)"
    )
    return partials.groupBy("piece").agg(F.sum("qcount").alias("qcount"))


def _probs_from_qcounts(q: dict[str, int]) -> dict[str, float]:
    total = sum(q.values())
    return {p: math.log(c) - math.log(total) for p, c in q.items() if c > 0}


def unigram_train(
    df: DataFrame,
    vocab_size: int = 120,
    text_col: str = "text",
    max_piece_len: int = 6,
    seed_size: int = 512,
    em_iters: int = 3,
) -> list[tuple[str, float]]:
    """Train a unigram-LM tokenizer; returns [(piece, logprob)] sorted
    by (final expected count desc, piece asc) — the model table.

    Deterministic under any partitioning (fixed-point count sums) and
    bit-identical to the pure-Python reference on the same corpus.
    """
    words = word_freq_table(df, text_col).select("w", "n").localCheckpoint(
        eager=True
    )
    seed = _seed_pieces(words, max_piece_len, seed_size)
    seed_chars = {p for p, _ in seed if len(p) == 1}
    q: dict[str, int] = {p: c * SCALE for p, c in seed}
    logp = _probs_from_qcounts(q)
    for _ in range(em_iters):
        rows = _em_pass(words, logp, max_piece_len).collect()  # ≤ seed_size
        q = {r["piece"]: int(r["qcount"]) for r in rows}
        # required-character coverage (SentencePiece's guarantee): a
        # rare char whose posterior quantizes to 0 would vanish from
        # the model and leave words unencodable — floor every seed
        # char at one quantum
        for ch in seed_chars:
            q[ch] = max(q.get(ch, 0), 1)
        logp = _probs_from_qcounts(q)
    # prune: keep top vocab_size by (qcount desc, piece asc); single
    # chars always survive so every string stays encodable
    ranked = sorted(q.items(), key=lambda kv: (-kv[1], kv[0]))
    kept = {p for p, _ in ranked[:vocab_size]} | seed_chars
    kept_q = {p: max(q.get(p, 0), 1) if p in seed_chars else q[p]
              for p in kept if p in q or p in seed_chars}
    kept_q = {p: c for p, c in kept_q.items() if c > 0}
    final = _probs_from_qcounts(kept_q)
    return sorted(final.items(), key=lambda kv: (-kept_q[kv[0]], kv[0]))


def viterbi_segment(
    word: str, logp: dict[str, float], max_len: int
) -> list[str]:
    """Max-likelihood segmentation. Ties prefer the LONGEST last piece
    (smallest split point j) — fixed so engines and the reference agree.
    Characters absent from the model get the OOV penalty, so every
    string segments."""
    n = len(word)
    NEG = float("-inf")
    best = [NEG] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            if best[j] == NEG:
                continue
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                if len(piece) != 1:
                    continue
                lp = _OOV_LOGP
            v = best[j] + lp
            # strictly greater: on exact ties the FIRST (smallest) j
            # wins, i.e. the longest last piece
            if v > best[i]:
                best[i] = v
                back[i] = j
    out: list[str] = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    return out[::-1]


def unigram_encode_udf(model: list[tuple[str, float]], max_piece_len: int = 6):
    """pandas UDF string -> array<string>: Viterbi-encode each word with
    the trained model (Arrow-batched; the model rides the closure)."""
    from pyspark.sql.functions import pandas_udf

    logp = dict(model)

    @pandas_udf("array<string>")
    def encode(col: pd.Series) -> pd.Series:
        return col.map(
            lambda w: viterbi_segment(w, logp, max_piece_len)
            if isinstance(w, str) and w
            else []
        )

    return encode
