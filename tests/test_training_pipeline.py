"""End-to-end training-corpus build (pipelines/training.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from reactionetl_etl_spark.pipelines import build_training_corpus


def _docs(spark, sf_dir):
    from reactionetl_etl_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "documents")


def test_build_training_corpus_end_to_end(spark, sf_dir, tmp_path):
    out = str(tmp_path / "corpus")
    docs = _docs(spark, sf_dir)
    eval_set = docs.filter(F.col("doc_id") % 17 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    stats = build_training_corpus(
        spark, docs, out, token_budget=512, eval_set=eval_set, webdataset=True
    )

    # conservation: every input doc is exported or in the ledger, once
    assert stats.n_input == (
        stats.n_exported
        + stats.n_quality_dropped
        + stats.n_dup_dropped
        + stats.n_contaminated_dropped
    )
    assert stats.n_exported > 0 and stats.n_shards > 0
    # eval docs are verbatim copies of corpus docs → contamination must fire
    assert stats.n_contaminated_dropped > 0

    shards = spark.read.parquet(f"{out}/shards")
    ledger = spark.read.parquet(f"{out}/ledger")
    assert shards.count() == stats.n_exported
    assert ledger.count() == stats.n_input - stats.n_exported
    # no doc appears on both sides, none twice
    assert shards.join(ledger, "doc_id").count() == 0
    assert ledger.select("doc_id").distinct().count() == ledger.count()
    # every ledger row carries a machine-readable reason
    assert ledger.filter(F.col("reason").isNull() | (F.col("reason") == "")).count() == 0

    # shard assignment is the greedy layout over the shuffle order
    rows = sorted(
        shards.select("shuffle_pos", "n_tokens", "tokens_before", "shard_id").collect(),
        key=lambda r: r["shuffle_pos"],
    )
    cum = 0
    for r in rows:
        assert r["tokens_before"] == cum
        # int(): partition-dir read-back may type shard_id as string
        assert int(r["shard_id"]) == cum // 512
        cum += r["n_tokens"]

    # the webdataset export mirrors the packed shards: one tar per
    # packed shard id, every exported doc present once, members stored
    # in shuffle order with token counts in the metadata
    import json

    from reactionetl_etl_spark.io.webdataset import read_webdataset_shards

    wds = read_webdataset_shards(spark, f"{out}/webdataset").collect()
    assert len(wds) == stats.n_exported
    assert {r["shard_id"] for r in wds} == {
        int(r["shard_id"]) for r in shards.select("shard_id").distinct().collect()
    }
    by_key = {int(r["key"]): r for r in wds}
    for r in shards.collect():
        w = by_key[r["doc_id"]]
        assert int(w["shard_id"]) == int(r["shard_id"])
        meta = json.loads(w["meta"])
        assert meta["n_tokens"] == r["n_tokens"]
        assert bytes(w["payload"]).decode() == r["text"]

    stats2 = build_training_corpus(
        spark, docs, str(tmp_path / "corpus2"), token_budget=512, eval_set=eval_set
    )
    assert stats2 == stats  # deterministic end-to-end


def test_build_training_corpus_no_eval_set(spark, sf_dir, tmp_path):
    out = str(tmp_path / "corpus")
    stats = build_training_corpus(spark, _docs(spark, sf_dir), out, token_budget=1024)
    assert stats.n_contaminated_dropped == 0
    assert stats.n_exported + stats.n_quality_dropped + stats.n_dup_dropped == stats.n_input


def test_build_image_corpus_conservation_and_ledger(spark, tmp_path):
    """Every input image lands in exactly one place — a shard or one
    ledger row with the right stage: undecodable junk, a too-small
    image, a cross-container duplicate (BMP copy of a PNG keeps the
    smaller id), everything else exported resized; shard assignment is
    deterministic."""
    import numpy as np

    from reactionetl_etl_spark.etl.snapshots import head_version  # noqa: F401  (env warm)
    from reactionetl_etl_spark.operators.multimodal import encode_bmp, encode_png
    from reactionetl_etl_spark.pipelines.multimodal import build_image_corpus

    rng = np.random.default_rng(11)
    big = rng.integers(0, 256, (64, 48, 3), dtype=np.uint8)
    other = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    tiny = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    rows = [
        (1, bytearray(encode_png(big))),
        (2, bytearray(encode_bmp(big))),          # visual dup of 1
        (3, bytearray(encode_png(other))),
        (4, bytearray(encode_bmp(tiny))),         # below min_side
        (5, bytearray(b"junk bytes, not an image")),
    ]
    imgs = spark.createDataFrame(rows, "media_id long, content binary")
    out = str(tmp_path / "imgcorpus")
    stats = build_image_corpus(
        spark, imgs, out, min_side=16, max_side=32, n_shards=4, webdataset=True
    )
    assert (stats.n_input, stats.n_undecodable, stats.n_too_small) == (5, 1, 1)
    assert stats.n_dup_dropped == 1 and stats.n_exported == 2
    ledger = {
        r["media_id"]: (r["stage"], r["reason"])
        for r in spark.read.parquet(f"{out}/ledger").collect()
    }
    assert ledger[5][0] == "undecodable"
    assert ledger[4] == ("too_small", "8x8")
    assert ledger[2] == ("near_dup", "kept=1")
    exported = spark.read.parquet(f"{out}/shards")
    got = {r["media_id"]: (r["dst_width"], r["dst_height"]) for r in exported.collect()}
    assert set(got) == {1, 3}
    assert got[1] == (24, 32) and got[3] == (32, 32)  # aspect-preserving cap
    # conservation: every id in exactly one of shards ∪ ledger
    assert set(got) | set(ledger) == {1, 2, 3, 4, 5}
    # the training-loader tar export carries the same two keepers with
    # sniffed extensions and geometry metadata
    import json

    from reactionetl_etl_spark.io.webdataset import read_webdataset_shards

    wds = {
        int(r["key"]): (r["ext"], json.loads(r["meta"]))
        for r in read_webdataset_shards(spark, f"{out}/webdataset").collect()
    }
    assert set(wds) == {1, 3}
    assert wds[1][0] == "png" and wds[3][0] == "png"
    assert (wds[1][1]["dst_width"], wds[1][1]["dst_height"]) == (24, 32)
    assert (wds[3][1]["src_width"], wds[3][1]["src_height"]) == (40, 40)
