"""Distributed BPE tokenizer training (iterative merge loop).

Byte-pair-encoding training (Sennrich et al. 2016; the GPT-2 tokenizer
recipe) as a Spark-native iteration:

1. ONE corpus pass builds the word-frequency table — the trainer's whole
   state. A 100 TB corpus collapses to its distinct normalized words
   (bounded by vocabulary, not corpus size), each with a count and its
   initial symbol sequence (characters + an end-of-word marker).
2. Each merge round: explode adjacent symbol pairs weighted by word
   count (one partial+final aggregation on the pair key — map-side
   combine collapses virtually everything, the shuffle carries at most
   |alphabet|² rows per task), pick the argmax pair with a
   deterministic tie-break (count desc, then lexicographic), and apply
   the merge to every word's symbol array with a single fold
   expression (carry-based ``aggregate`` — JVM codegen, no Python).
3. The per-round argmax is a 1-row ``collect`` — the same bounded
   driver action the recursive-CTE fixpoint uses; everything heavy
   stays distributed. The word table is re-checkpointed every few
   rounds so lineage stays flat.

The merge sequence is fully deterministic (weighted counts are exact
integers; ties break lexicographically), so the distributed trainer is
bit-identical to a single-process reference implementation — pinned by
test against a pure-Python BPE on the same input.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import words as _norm_words

EOW = "▁"  # end-of-word sentinel appended to each word


def _initial_symbols(w: Column) -> Column:
    """Character symbols of a word + end-of-word marker."""
    return F.concat(F.split(w, ""), F.array(F.lit(EOW)))


def _merge_pair_expr(tokens: Column, a: str, b: str) -> Column:
    """Replace every adjacent (a, b) in ``tokens`` with the merged symbol.

    Carry-based left fold: the accumulator holds (result, carry); each
    step either completes a merge (carry==a and t==b), flushes the carry,
    or loads it. Left-to-right single pass — exactly the reference BPE
    merge order (overlapping occurrences merge greedily from the left).
    """
    merged = a + b
    init = F.struct(
        F.array().cast("array<string>").alias("res"),
        F.lit(None).cast("string").alias("carry"),
    )

    def step(acc: Column, t: Column) -> Column:
        is_merge = acc["carry"].eqNullSafe(F.lit(a)) & (t == F.lit(b))
        res = F.when(
            is_merge, F.concat(acc["res"], F.array(F.lit(merged)))
        ).otherwise(
            F.when(
                acc["carry"].isNull(), acc["res"]
            ).otherwise(F.concat(acc["res"], F.array(acc["carry"])))
        )
        carry = F.when(is_merge, F.lit(None).cast("string")).otherwise(t)
        return F.struct(res.alias("res"), carry.alias("carry"))

    def finish(acc: Column) -> Column:
        return F.when(
            acc["carry"].isNull(), acc["res"]
        ).otherwise(F.concat(acc["res"], F.array(acc["carry"])))

    return F.aggregate(tokens, init, step, finish)


def word_freq_table(
    df: DataFrame, text_col: str = "text", min_len: int = 1
) -> DataFrame:
    """(word, n, syms) trainer state from one corpus pass."""
    w = (
        df.select(F.explode(_norm_words(F.col(text_col))).alias("w"))
        .filter(F.length("w") >= min_len)
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return w.select("w", "n", _initial_symbols(F.col("w")).alias("syms"))


def _pair_counts(vocab: DataFrame) -> DataFrame:
    pairs = vocab.select(
        "n",
        F.explode(
            F.when(
                F.size("syms") < 2, F.array().cast("array<struct<a:string,b:string>>")
            ).otherwise(
                F.zip_with(
                    F.slice(F.col("syms"), 1, F.size("syms") - 1),
                    F.slice(F.col("syms"), 2, F.size("syms") - 1),
                    lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                )
            )
        ).alias("p"),
    )
    return pairs.groupBy("p.a", "p.b").agg(F.sum("n").alias("cnt"))


def bpe_train(
    df: DataFrame,
    n_merges: int = 50,
    text_col: str = "text",
    checkpoint_every: int = 8,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns [(a, b, weighted_count)].

    The returned list is the tokenizer's merge table, in training order.
    """
    vocab = word_freq_table(df, text_col).localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for r in range(n_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.desc("cnt"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] <= 0:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        merges.append((a, b, cnt))
        vocab = vocab.select(
            "w", "n", _merge_pair_expr(F.col("syms"), a, b).alias("syms")
        )
        if (r + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=True)
    return merges


def bpe_encode_expr(tokens: Column, merges: list[tuple[str, str, int]]) -> Column:
    """Apply a learned merge table to an initial symbol array (in merge
    order) — the ENCODE side of the tokenizer, as one JVM expression."""
    out = tokens
    for a, b, _ in merges:
        out = _merge_pair_expr(out, a, b)
    return out


def bpe_encode_udf(merges: list[tuple[str, str, int]]):
    """Arrow-batched BPE encoder: the merge table rides the closure and
    each word encodes in one Python pass per merge (greedy left-to-right
    with skip-after-merge — exactly :func:`_merge_pair_expr`'s carry
    fold, pinned equal by test).

    Why not the fold expression for big merge tables: ``bpe_encode_expr``
    nests one ``aggregate`` PER MERGE, so analysis/codegen cost grows
    with the merge count (measured ~20s at 8 merges; a real 32k-merge
    tokenizer is unreachable in expression space). The UDF's cost is
    O(merges x symbols) per DISTINCT word in an Arrow batch — and the
    encode input is the vocabulary, never the corpus (callers join the
    per-word token counts back onto frequencies).
    """
    from pyspark.sql.functions import pandas_udf

    pairs = [(a, b) for a, b, _ in merges]

    def one(w: str) -> list[str] | None:
        # public operator: a NULL word encodes to NULL (callers that
        # pre-filter see no change; without this, list(None) raises
        # inside the Arrow batch and kills the whole task)
        if w is None:
            return None
        syms = list(w) + [EOW]
        for a, b in pairs:
            out: list[str] = []
            i = 0
            n = len(syms)
            while i < n:
                if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    # hint-less form: PEP 563 (module-level `from __future__ import
    # annotations`) stringifies hints pandas_udf cannot resolve here
    return pandas_udf(lambda col: col.map(one), "array<string>")
