"""Distributed BPE trainer vs a pure-Python reference implementation —
the merge sequences must be IDENTICAL (same greedy left-to-right merge,
same count-desc/lexicographic tie-break)."""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F

from etl_lealone_spark.operators.bpe import (
    EOW,
    bpe_encode_expr,
    bpe_train,
    word_freq_table,
)


# -- pure-Python reference ---------------------------------------------------
def _py_words(texts):
    ws = []
    for t in texts:
        ws += [w for w in re.sub(r"[^a-z0-9]+", " ", t.lower()).strip().split(" ") if w]
    return Counter(ws)


def _py_merge(syms, a, b):
    out, carry = [], None
    for t in syms:
        if carry == a and t == b:
            out.append(a + b)
            carry = None
        else:
            if carry is not None:
                out.append(carry)
            carry = t
    if carry is not None:
        out.append(carry)
    return out


def _py_bpe(texts, n_merges):
    vocab = {w: (n, list(w) + [EOW]) for w, n in _py_words(texts).items()}
    merges = []
    for _ in range(n_merges):
        counts = Counter()
        for _, (n, syms) in vocab.items():
            for x, y in zip(syms, syms[1:]):
                counts[(x, y)] += n
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, cnt))
        vocab = {w: (n, _py_merge(s, a, b)) for w, (n, s) in vocab.items()}
    return merges


TEXTS = [
    "low lower lowest low low",
    "new newer newest new new new",
    "wide wider widest",
    "the low new wide road; the lower newer wider load!",
]


def test_bpe_train_matches_reference(spark):
    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    got = bpe_train(d, n_merges=12)
    want = _py_bpe(TEXTS, 12)
    assert got == want
    assert len(got) == 12
    # weighted counts are positive and the first merge is the global max
    assert got[0][2] == max(m[2] for m in got)


def test_bpe_encode_applies_merges_in_order(spark):
    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    merges = bpe_train(d, n_merges=8)
    enc = word_freq_table(d).select(
        "w", bpe_encode_expr(F.col("syms"), merges).alias("toks")
    )
    rows = {r["w"]: r["toks"] for r in enc.collect()}
    # every token is either a learned merge product or a base symbol
    learned = {a + b for a, b, _ in merges}
    for w, toks in rows.items():
        assert "".join(toks) == w + EOW  # lossless segmentation
        for t in toks:
            assert len(t) == 1 or t in learned or t == EOW
    # a frequent word compresses below character count
    assert len(rows["low"]) < len("low") + 1


def test_bpe_train_partitioning_invariant(spark):
    rows = [(i, TEXTS[i % len(TEXTS)]) for i in range(40)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    a = bpe_train(d.coalesce(1), n_merges=6)
    b = bpe_train(d.repartition(7), n_merges=6)
    assert a == b


def test_encode_udf_matches_fold_expression(spark):
    # the Arrow encoder (scale path: merge table in the closure) must be
    # row-identical to the nested-fold expression (codegen path) on the
    # same trained merges — including overlap chains and repeated pairs
    from pyspark.sql import functions as F

    from etl_lealone_spark.operators.bpe import (
        _initial_symbols,
        bpe_encode_expr,
        bpe_encode_udf,
        bpe_train,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["low lower lowest", "new newer newest", "wide wider widest",
             "aaa aaaa aa", "low low low new new wide"] * 4
        )],
        "doc_id long, text string",
    )
    merges = bpe_train(docs, n_merges=6, checkpoint_every=1)
    assert len(merges) == 6
    words = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("w")
    ).distinct()
    both = words.select(
        "w",
        bpe_encode_expr(_initial_symbols(F.col("w")), merges).alias("fold"),
        bpe_encode_udf(merges)(F.col("w")).alias("arrow"),
    ).collect()
    assert len(both) > 0
    for r in both:
        assert r["fold"] == r["arrow"], r["w"]


def test_encode_udf_null_word_returns_null(spark):
    # public-operator contract (r9 advisor): a NULL in the word column
    # encodes to NULL instead of raising TypeError inside the Arrow batch
    from etl_lealone_spark.operators.bpe import bpe_encode_udf

    df = spark.createDataFrame(
        [("low",), (None,), ("lower",)], "w string"
    )
    rows = {
        r["w"]: r["toks"]
        for r in df.select(
            "w", bpe_encode_udf([("l", "o", 3)])(F.col("w")).alias("toks")
        ).collect()
    }
    assert rows[None] is None
    assert rows["low"] == ["lo", "w", EOW]
    assert rows["lower"] == ["lo", "w", "e", "r", EOW]
