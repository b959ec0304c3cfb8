"""End-to-end multimodal (image) corpus builder: the engine's media
operators composed into the pipeline a multimodal pretraining run
executes, with the same drop-ledger discipline as the text corpus
builder (`pipelines/training.py`):

    raw (media_id, content) binaries
      → header sniff + geometry filter   (undecodable / too-small docs
                                          dropped, with ledger reasons)
      → perceptual dedup                 (dHash → pigeonhole Hamming
                                          pairs → connected components →
                                          ONE keeper per visual cluster,
                                          smallest-id-wins)
      → bounded resize                   (longer side ≤ max_side, real
                                          pixel resample + re-encode)
      → sharded export                   (shard_id = hash bucket; per-
                                          shard stats + full drop ledger)

Every stage is a tested operator; this module adds composition and the
audit trail. Corpus membership stays explainable per image: why is
media X absent from shard S → one ledger row with a machine-readable
stage + reason.

Scale posture: three narrow Arrow-batched decode passes (header+dims,
dHash, resize) — each embarrassingly parallel, no shuffle; the only
shuffles are the Hamming candidate join (8-byte hash keys) and the
rollup-sized component/keeper aggregation. Stages communicate by
media_id keep-lists, never by re-materializing payloads.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reactionetl_etl_spark.operators.graph import connected_components
from reactionetl_etl_spark.operators.multimodal import (
    decode_image_features,
    image_dhash,
    resize_images,
)


@dataclass
class ImageCorpusStats:
    n_input: int
    n_undecodable: int
    n_too_small: int
    n_dup_dropped: int
    n_exported: int
    n_shards: int


def image_duplicate_drop_list(
    imgs: DataFrame,
    id_col: str = "media_id",
    binary_col: str = "content",
    max_hamming: int = 4,
) -> DataFrame:
    """(media_id, kept_media) for every image dropped as a visual
    near-dup: dHash pairs → connected components → smallest-id keeper
    per cluster (ids are stable, so the keeper is replay-stable —
    unlike quality-scored keepers, pixels carry no 'longest text'
    analogue)."""
    from reactionetl_etl_spark.operators.dedup import hamming_candidates

    sig = image_dhash(imgs, id_col, binary_col).filter(F.col("dhash").isNotNull())
    pairs = hamming_candidates(sig, id_col, "dhash", max_hamming)
    comps = connected_components(pairs, src="id_a", dst="id_b")
    clusters = comps.select(
        F.col("node").alias(id_col), F.col("component").alias("cluster_id")
    )
    keepers = clusters.groupBy("cluster_id").agg(F.min(id_col).alias("kept_media"))
    return (
        clusters.join(keepers, "cluster_id")
        .filter(F.col(id_col) != F.col("kept_media"))
        .select(id_col, "kept_media")
    )


def build_image_corpus(
    spark: SparkSession,
    imgs: DataFrame,
    out_path: str,
    min_side: int = 16,
    max_side: int = 512,
    max_hamming: int = 4,
    n_shards: int = 16,
    id_col: str = "media_id",
    binary_col: str = "content",
    webdataset: bool = False,
) -> ImageCorpusStats:
    """Run the full image-corpus build (module doc) and write:

        <out>/shards/shard_id=<s>/*.parquet   resized images + geometry
        <out>/ledger/*.parquet                every dropped media_id +
                                              stage + reason
        <out>/shard_stats/*.parquet           per-shard counts/bytes
        <out>/webdataset/shard-%05d.tar       training-loader tar export
                                              (``webdataset=True``):
                                              payload under its sniffed
                                              image extension + geometry
                                              JSON per key

    Deterministic end-to-end: hash-bucketed shards, smallest-id dedup
    keepers, no RNG. Returns stage-level counts."""
    n_input = imgs.count()

    meta = decode_image_features(imgs, id_col, binary_col, with_features=False).select(
        id_col, "mime", "width", "height"
    )
    undecodable = meta.filter(F.col("width").isNull()).select(
        id_col,
        F.lit("undecodable").alias("stage"),
        F.concat(F.lit("mime="), F.coalesce("mime", F.lit("unknown"))).alias("reason"),
    )
    too_small = meta.filter(
        F.col("width").isNotNull()
        & ((F.col("width") < min_side) | (F.col("height") < min_side))
    ).select(
        id_col,
        F.lit("too_small").alias("stage"),
        F.concat_ws(
            "x", F.col("width").cast("string"), F.col("height").cast("string")
        ).alias("reason"),
    )
    kept = imgs.join(
        meta.filter(
            F.col("width").isNotNull()
            & (F.col("width") >= min_side)
            & (F.col("height") >= min_side)
        ).select(id_col),
        id_col,
        "left_semi",
    )

    dup_raw = image_duplicate_drop_list(kept, id_col, binary_col, max_hamming)
    dup_drops = dup_raw.select(
        id_col,
        F.lit("near_dup").alias("stage"),
        F.concat(F.lit("kept="), F.col("kept_media").cast("string")).alias("reason"),
    )
    kept = kept.join(dup_raw.select(id_col), id_col, "left_anti")

    resized = resize_images(kept, max_side, id_col, binary_col)
    sharded = resized.withColumn(
        "shard_id", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).cast("int")
    )
    sharded.write.mode("overwrite").partitionBy("shard_id").parquet(f"{out_path}/shards")
    ledger = undecodable.unionByName(too_small).unionByName(dup_drops)
    ledger.write.mode("overwrite").parquet(f"{out_path}/ledger")
    shard_stats = sharded.groupBy("shard_id").agg(
        F.count("*").alias("n_images"),
        F.sum(F.length("content")).alias("n_bytes"),
    )
    shard_stats.write.mode("overwrite").parquet(f"{out_path}/shard_stats")

    if webdataset:
        from reactionetl_etl_spark.io.webdataset import write_webdataset_shards

        head = F.hex(F.col("content").substr(1, 4))
        wds = resized.withColumn(
            "img_ext",
            F.when(head.startswith("89504E47"), "png")
            .when(head.startswith("424D"), "bmp")
            .when(head.startswith("5036"), "ppm")
            .when(head.startswith("47494638"), "gif")
            .when(head.startswith("FFD8"), "jpg")
            .otherwise("bin"),
        )
        write_webdataset_shards(
            wds,
            f"{out_path}/webdataset",
            key_col=id_col,
            payload_col="content",
            meta_cols=("src_width", "src_height", "dst_width", "dst_height"),
            ext_col="img_ext",
            n_shards=n_shards,
        )

    stage_counts = {
        r["stage"]: r["n"]
        for r in ledger.groupBy("stage").agg(F.count("*").alias("n")).collect()
    }
    exported = spark.read.parquet(f"{out_path}/shards")
    n_exported = exported.count()
    n_out_shards = exported.select("shard_id").distinct().count()
    return ImageCorpusStats(
        n_input=n_input,
        n_undecodable=int(stage_counts.get("undecodable", 0)),
        n_too_small=int(stage_counts.get("too_small", 0)),
        n_dup_dropped=int(stage_counts.get("near_dup", 0)),
        n_exported=n_exported,
        n_shards=n_out_shards,
    )
