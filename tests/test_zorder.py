"""Z-order clustering: correctness + measured pruning effect."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from reactionetl_etl_spark.etl.zorder import morton_code, zorder_by


def test_morton_code_interleaves_bits(spark):
    df = spark.createDataFrame([(0b1010, 0b0110)], "x long, y long")
    [row] = df.select(
        morton_code([F.col("x"), F.col("y")], 4).alias("z")
    ).collect()
    # x bits at even positions, y bits at odd: x=1010, y=0110
    # → z bits (pos 7..0): y3 x3 y2 x2 y1 x1 y0 x0 = 0 1 1 0 1 1 0 0
    assert row["z"] == 0b01101100


def test_zorder_preserves_rows(spark):
    df = spark.range(1000).select(
        (F.col("id") % 97).alias("a"), (F.col("id") * 7 % 101).alias("b")
    )
    out = zorder_by(df, ["a", "b"], n_bits=8, num_partitions=4)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, df.collect()))
    assert out.columns == ["a", "b"]  # __z dropped by default


def _rowgroup_overlap_fraction(path: str, a_box, b_box):
    """Fraction of parquet row groups whose (a, b) min/max stats
    overlap the 2-D query box — exactly what the reader must scan."""
    import pyarrow.parquet as pq

    total = hit = 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            sa = g.column(names["a"]).statistics
            sb = g.column(names["b"]).statistics
            total += 1
            if (
                sa.min <= a_box[1] and sa.max >= a_box[0]
                and sb.min <= b_box[1] and sb.max >= b_box[0]
            ):
                hit += 1
    assert total > 0
    return hit / total


def test_zorder_tightens_rowgroup_stats_for_2d_predicates(spark, tmp_path):
    """The measured point of z-ordering: for a small 2-D box predicate,
    far fewer row groups overlap under z-order layout than under a
    single-column sort (which clusters `a` perfectly and `b` not at
    all)."""
    n = 200_000
    df = spark.range(n).select(
        F.xxhash64("id").bitwiseAND(F.lit(1023)).alias("a"),
        F.xxhash64("id", F.lit(1)).bitwiseAND(F.lit(1023)).alias("b"),
    )
    sorted_path = str(tmp_path / "sorted_a")
    z_path = str(tmp_path / "zorder")
    # small row groups (Hadoop-level knob — the writer option is not
    # honored for block size) so each file holds many: stats granularity
    hconf = spark._jsc.hadoopConfiguration()
    old_block = hconf.get("parquet.block.size")
    hconf.setInt("parquet.block.size", 32 * 1024)
    try:
        (
            df.repartitionByRange(4, "a").sortWithinPartitions("a")
            .write.parquet(sorted_path)
        )
        zorder_by(df, ["a", "b"], n_bits=10, num_partitions=4).write.parquet(z_path)
    finally:
        if old_block is None:
            hconf.unset("parquet.block.size")
        else:
            hconf.set("parquet.block.size", old_block)

    # The case single-column layout cannot serve: a predicate selective
    # on the NON-sort column. Under sort-by-a, every row group spans
    # (nearly) all of b → ~100% of groups overlap; under z-order each
    # group covers a small b-range too → most groups skip.
    b_box = ((0, 1023), (400, 430))
    frac_sorted_b = _rowgroup_overlap_fraction(sorted_path, *b_box)
    frac_z_b = _rowgroup_overlap_fraction(z_path, *b_box)
    assert frac_sorted_b > 0.9, frac_sorted_b
    assert frac_z_b < frac_sorted_b / 3, (frac_z_b, frac_sorted_b)

    # and on a 2-D box, z-order is never worse than the single sort
    box = ((100, 160), (400, 460))
    frac_sorted = _rowgroup_overlap_fraction(sorted_path, *box)
    frac_z = _rowgroup_overlap_fraction(z_path, *box)
    assert frac_z <= frac_sorted, (frac_z, frac_sorted)

    # and the queried rows are identical either way
    q = lambda p: (
        spark.read.parquet(p)
        .filter(
            (F.col("a").between(*box[0])) & (F.col("b").between(*box[1]))
        )
        .count()
    )
    assert q(z_path) == q(sorted_path)
