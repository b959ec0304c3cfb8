"""BPE tokenizer training and encoding, Spark-distributed.

The byte-pair-encoding loop — count adjacent symbol pairs over the
corpus, merge the most frequent pair, repeat — is the standard
subword-tokenizer trainer (Sennrich et al. 2016, public). Each round
is embarrassingly parallel in the COUNT (a map-side-combined groupBy
of pair partials) and driver-scalar in the DECISION (one argmax), so
the Spark formulation is:

    per round:
      1. pair counts: mapInPandas emits per-document pair partials?
         NO — pure expressions: explode adjacent pairs of the symbol
         arrays, groupBy count (the `token_pair_stats` shape);
      2. winner = 1-row argmax collect (count desc, pair asc — the
         deterministic tie-break real trainers also need for
         reproducibility);
      3. apply the merge: leftmost-greedy sequential replacement
         within each document's symbol array — a true per-row
         recurrence (overlapping occurrences like 'aaa' under merge
         a+a depend on scan order), so this one step is Arrow-batched
         mapInPandas, the imperative slot.

    corpus passes = n_merges (inherent to BPE); production trainers
    bound the corpus by SAMPLING first (`weighted_sample_hash` /
    `hash_split` are the samplers), not by changing the loop.

Symbol state is carried as an array<string> column checkpointed per
round (same lineage-truncation discipline as `graph.py` — without it
the plan re-derives every round from round zero).

`apply_bpe_merges` replays a trained merge list at ENCODE time —
merges broadcast to executors, same greedy semantics, one pass.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _merge_once(symbols: list, a: str, b: str) -> list:
    """Leftmost-greedy single-pair merge within one document."""
    out = []
    i, n = 0, len(symbols)
    while i < n:
        if i + 1 < n and symbols[i] == a and symbols[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def _apply_merges_fn(merges: list[tuple[str, str]], col: str):
    def apply(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[col] = [
                _apply_all(list(s), merges) for s in pdf[col]
            ]
            yield pdf

    return apply


def _apply_all(symbols: list, merges: list[tuple[str, str]]) -> list:
    for a, b in merges:
        symbols = _merge_once(symbols, a, b)
    return symbols


def _pair_counts(df: DataFrame, col: str) -> DataFrame:
    pairs = df.select(
        F.explode(
            F.expr(
                f"transform(slice({col}, 1, size({col}) - 1),"
                f" (t, i) -> struct(t AS a, {col}[i + 1] AS b))"
            )
        ).alias("p")
    ).select("p.a", "p.b")
    return pairs.groupBy("a", "b").agg(F.count("*").alias("n"))


def train_bpe_merges(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 32,
    min_count: int = 2,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges over whitespace-pretokenized
    documents (symbols start as characters within each word, words
    separated by the word-boundary marker '▁' prefix convention is NOT
    used here — words are independent symbol sequences, the simplest
    classroom form). Returns [(left, right, count)] in merge order.
    Stops early when no pair reaches ``min_count``.
    """
    spark = docs.sparkSession
    # initial symbols: per word, its characters; documents contribute
    # every word (frequency matters, so no dedup)
    words = docs.select(
        F.explode(
            F.split(
                F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " "
            )
        ).alias("w")
    ).filter(F.col("w") != "")
    state = words.select(
        F.expr("transform(split(w, ''), x -> x)").alias("syms")
    ).localCheckpoint(eager=True)

    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            _pair_counts(state, "syms")
            .orderBy(F.col("n").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < min_count:
            break
        a, b, n = top[0]["a"], top[0]["b"], int(top[0]["n"])
        merges.append((a, b, n))
        state = state.mapInPandas(
            _apply_merges_fn([(a, b)], "syms"), schema="syms array<string>"
        ).localCheckpoint(eager=True)
    return merges


def apply_bpe_merges(
    docs: DataFrame,
    merges: list[tuple[str, str]] | list[tuple[str, str, int]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Encode documents with a trained merge list (one Arrow-batched
    pass; merges ride to executors inside the serialized function —
    merge lists are KBs). Output: per document, the flat token
    sequence with words encoded independently, in order."""
    mlist = [(m[0], m[1]) for m in merges]
    prepped = docs.withColumn(
        "__words",
        F.split(F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " "),
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for words in pdf["__words"]:
                toks: list[str] = []
                for w in words:
                    if w:
                        toks.extend(_apply_all(list(w), mlist))
                out.append(toks)
            pdf = pdf.copy()
            pdf[out_col] = out
            yield pdf.drop(columns=["__words"])

    out_fields = [f"{f.name} {f.dataType.simpleString()}" for f in docs.schema.fields]
    schema = ", ".join(out_fields + [f"{out_col} array<string>"])
    return prepped.mapInPandas(encode, schema=schema)
