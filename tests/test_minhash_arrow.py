"""Bit-identity pins for the Arrow/numpy MinHash signature path (r15).

The MinHash hash values ARE the signatures — they feed `est_jaccard`
(an output column) and the band hashes (which decide candidate pairs)
— so the Arrow rewrite of the signature fold is only admissible if it
reproduces the retired-in-the-hot-path HOF expression EXACTLY, value
for value. These tests pin that:

- `test_xxh64_numpy_matches_spark_all_tail_lengths` pins the numpy
  XXH64 kernel against live `F.xxhash64` for every tail-length class
  (0..100 bytes, multi-byte UTF-8, the 32-byte stripe loop) and the
  chained trailing int-literal fold.
- `test_minhash_arrow_signatures_bit_identical` pins the full Arrow
  signature stage against `minhash_signature` (the HOF reference
  formulation, still shipped) on hostile text: NULL, empty, single
  token, sub-k token counts, unicode, long texts, duplicated shingles.
- `test_banded_signatures_arrow_parity` pins the banded output (both
  `use_arrow` arms) — id, signature, band, AND bhash — on the sf
  fixture corpus, so the persisted-index layout is provably unchanged.
"""

from __future__ import annotations

import os
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

HOSTILE_TEXTS = [
    (1, None),
    (2, ""),
    (3, " "),
    (4, "one"),
    (5, "two tokens"),
    (6, "exactly three tokens"),
    (7, "now four whole tokens"),
    (8, "a a a a a a a a"),
    (9, "the same the same the same the same"),
    (10, "MIXED Case   And\tWhitespace\n\ncollapse  test here"),
    (11, "unicode éléphant über 中文 分词 测试 🙂 emoji tail"),
    (12, "x" * 500),
    (13, " ".join(f"tok{i}" for i in range(200))),
    (14, " ".join(f"w{i % 7}" for i in range(64))),
    (15, "véry lóng unicode tökens " * 20),
    (16, "ends with spaces   "),
    (17, "   starts with spaces"),
    # adjacent empty/NULL rows stress the duplicate-offset bookkeeping
    # (empty rows share their byte offset with the next row's start)
    (18, ""),
    (19, ""),
    (20, "after empties three tokens"),
    (21, None),
    (22, ""),
    (23, None),
]


def test_xxh64_numpy_matches_spark_all_tail_lengths(spark):
    from reactionetl_etl_spark.functions.xxh64_numpy import (
        xxh64_chain_int,
        xxh64_slices,
    )

    rng = random.Random(7)
    cases = []
    for length in range(0, 101):
        cases.append("".join(rng.choice("abcdef ghijé中") for _ in range(length)))
    cases += ["", "é" * 40, "\U0001f600 emoji \U0001f4a9 tail", "a" * 1000]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(cases)], "i int, s string"
    )
    rows = df.select(
        "i",
        F.xxhash64("s").alias("h_plain"),
        F.xxhash64("s", F.lit(42)).alias("h_chain"),
    ).collect()
    exp_plain = {r["i"]: r["h_plain"] for r in rows}
    exp_chain = {r["i"]: r["h_chain"] for r in rows}
    for i, s in enumerate(cases):
        b = np.frombuffer(s.encode("utf-8"), dtype=np.uint8)
        got = xxh64_slices(b, np.array([0]), np.array([len(b)]), seed=42)
        assert int(got.view(np.int64)[0]) == exp_plain[i], f"plain len={len(b)}"
        chained = xxh64_chain_int(42, got)
        assert int(chained.view(np.int64)[0]) == exp_chain[i], f"chain len={len(b)}"


@pytest.mark.parametrize("num_perm,k", [(32, 3), (16, 2), (8, 5)])
def test_minhash_arrow_signatures_bit_identical(spark, num_perm, k):
    from reactionetl_etl_spark.operators.dedup import (
        minhash_signature,
        minhash_signature_frame,
    )

    docs = spark.createDataFrame(HOSTILE_TEXTS, "doc_id long, text string")
    ref = {
        r["doc_id"]: list(r["signature"])
        for r in minhash_signature(docs, "text", num_perm, k)
        .select("doc_id", "signature")
        .collect()
    }
    got = {
        r["id"]: list(r["signature"])
        for r in minhash_signature_frame(docs, "text", "doc_id", num_perm, k).collect()
    }
    assert got == ref


def test_minhash_arrow_fixture_corpus_bit_identical(spark, sf_dir):
    from reactionetl_etl_spark.operators.dedup import (
        minhash_signature,
        minhash_signature_frame,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    ref = {
        r["doc_id"]: tuple(r["signature"])
        for r in minhash_signature(docs, "text")
        .select("doc_id", "signature")
        .collect()
    }
    got = {
        r["id"]: tuple(r["signature"])
        for r in minhash_signature_frame(docs, "text", "doc_id").collect()
    }
    assert got == ref


def test_banded_signatures_arrow_parity(spark, sf_dir):
    from reactionetl_etl_spark.operators.dedup import banded_signatures

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    cols = ("id", "band", "bhash", "signature")

    def key_rows(df):
        return sorted(
            (r["id"], r["band"], r["bhash"], tuple(r["signature"]))
            for r in df.select(*cols).collect()
        )

    new = key_rows(banded_signatures(docs, "text", "doc_id", use_arrow=True))
    old = key_rows(banded_signatures(docs, "text", "doc_id", use_arrow=False))
    assert new == old
    assert len(new) > 0


def test_minhash_arrow_plan_has_no_batch_eval_python(spark, sf_dir):
    """The Arrow stage must plan as a single Arrow-eval map node —
    PythonMapInArrow — never row-pickled BatchEvalPython (guide §4)."""
    from reactionetl_etl_spark.operators.dedup import banded_signatures

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    plan = (
        banded_signatures(docs, "text", "doc_id", use_arrow=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "MapInArrow" in plan


def test_minhash_auto_arm_is_size_adaptive(spark, sf_dir):
    """use_arrow=None picks the formulation from the optimizer's size
    estimate: the fixture corpus (« 8 MB) must stay on the JVM fold
    (no Python node in the benched plan — the fixed Python-runner tax
    costs more than the fold there), while a frame estimated past the
    threshold flips to the Arrow stage."""
    from reactionetl_etl_spark.operators.dedup import (
        _minhash_auto_arrow,
        banded_signatures,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    assert _minhash_auto_arrow(docs) is False
    plan = (
        banded_signatures(docs, "text", "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInArrow" not in plan and "BatchEvalPython" not in plan

    big = spark.range(3_000_000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("x" * 80), F.col("id").cast("string")).alias("text"),
    )
    assert _minhash_auto_arrow(big) is True
    plan_big = (
        banded_signatures(big, "text", "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInArrow" in plan_big
