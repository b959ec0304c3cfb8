"""Distributed global ranking: rank / dense_rank / row_number / ntile
over a TOTAL order without a single-partition window.

`Window.orderBy(...)` with no partitionBy plans as
`Exchange SinglePartition` + one-task sort — the whole table funnels
through one core, the canonical scale-killer. The distributed
formulation reduces the global sort to a prefix sum over DISTINCT rank
keys:

    1. per-key counts:  C = df.groupBy(rank keys).count()
       — map-side-combinable shuffle; |C| = distinct keys ≪ rows.
    2. prefix sums over C in key order (range-partition C, local
       prefix + cross-partition offsets over ≤ num_partitions rows):
       rows_before(k), key_index(k).
    3. join rows back to C on the key (one shuffle of df on the key):
       rank       = rows_before + 1
       dense_rank = key_index + 1
       row_number = rows_before + row_number() within the key group
       ntile      = closed form over (row_number, total).

Every stage is parallel; the only single-task window runs over one row
per partition (≤ spark.sql.shuffle.partitions rows).

C is persisted: its lineage contains a range exchange, and
RangePartitioner's boundary sampling is NOT deterministic across
evaluations (empirically, Spark 4 picks different boundaries per run),
so forking an unpersisted range-partitioned plan can give two branches
inconsistent partition ids. Persisting the (tiny) distinct-key table
pins one evaluation; the final ranks are value-determined either way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _ordered(exprs: list[Column], descending: list[bool]) -> list[Column]:
    return [e.desc() if d else e.asc() for e, d in zip(exprs, descending)]


def global_order_ranks(
    df: DataFrame,
    rank_exprs: list[Column],
    rank_desc: list[bool],
    tie_exprs: list[Column] = (),
    tie_desc: list[bool] = (),
    ntile_n: int | None = None,
    num_partitions: int | None = None,
    keep_total: bool = False,
) -> DataFrame:
    """Append ``global_rank``, ``global_dense_rank``,
    ``global_row_number`` (and ``global_ntile`` when ``ntile_n``) to df.

    rank/dense_rank tie on ``rank_exprs``; row_number/ntile follow the
    refined total order (rank_exprs, then tie_exprs — pass tie columns
    that make it unique, or row_number is an arbitrary tie order).
    SQL-standard ntile: n%k leading buckets get one extra row.
    Assumes non-null rank keys (null sort placement is not modeled).

    ``keep_total=True`` additionally keeps ``global_total`` (the row
    count) — with global_rank it yields percent_rank ((rank-1)/(n-1))
    and cume_dist ((rank-1+ties)/n) without any further global pass.
    """
    spark = df.sparkSession
    n_parts = int(num_partitions or spark.conf.get("spark.sql.shuffle.partitions", "200"))
    kfields = [e.alias(f"__k{i}") for i, e in enumerate(rank_exprs)]
    key_ord = _ordered(
        [F.col(f"__kstruct.__k{i}") for i in range(len(rank_exprs))], list(rank_desc)
    )

    dfk = df.withColumn("__kstruct", F.struct(*kfields))
    counts = dfk.groupBy("__kstruct").agg(F.count("*").alias("__cnt"))
    counts = (
        counts.repartitionByRange(n_parts, *key_ord)
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )

    w_loc = Window.partitionBy("__pid").orderBy(*key_ord)
    local = counts.select(
        "__kstruct",
        "__pid",
        F.coalesce(
            F.sum("__cnt").over(w_loc.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("__lpre"),
        (F.row_number().over(w_loc) - 1).alias("__lkidx"),
    )
    stats = counts.groupBy("__pid").agg(
        F.sum("__cnt").alias("__pcnt"), F.count("*").alias("__pkeys")
    )
    w_prev = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = stats.select(
        "__pid",
        F.coalesce(F.sum("__pcnt").over(w_prev), F.lit(0)).alias("__roff"),
        F.coalesce(F.sum("__pkeys").over(w_prev), F.lit(0)).alias("__koff"),
        F.sum("__pcnt").over(w_all).alias("__n"),
    )
    keyed = local.join(F.broadcast(offsets), on="__pid").select(
        "__kstruct",
        (F.col("__lpre") + F.col("__roff")).alias("__before"),
        (F.col("__lkidx") + F.col("__koff") + F.lit(1)).alias("__dense"),
        "__n",
    )

    # One shuffle of df on the key serves both the join and the
    # within-key row_number window (same partitioning, no re-exchange).
    tie_ord = _ordered(list(tie_exprs), list(tie_desc)) or [F.lit(1)]
    w_tie = Window.partitionBy("__kstruct").orderBy(*tie_ord)
    out = (
        dfk.join(keyed, on="__kstruct")
        .withColumn("global_rank", F.col("__before") + F.lit(1))
        .withColumn("global_dense_rank", F.col("__dense"))
        .withColumn("global_row_number", F.col("__before") + F.row_number().over(w_tie))
    )
    if ntile_n is not None:
        k = int(ntile_n)
        # SQL-standard ntile from the global row number: base = n div k,
        # rem = n % k; buckets 1..rem hold base+1 rows. All-bigint, all
        # positive, so `div` floors exactly; greatest() keeps the dead
        # ELSE branch safe when n < k (base = 0).
        out = out.withColumn(
            "global_ntile",
            F.expr(
                f"CASE WHEN global_row_number <= (__n % {k}) * ((__n div {k}) + 1)"
                f" THEN (global_row_number - 1) div ((__n div {k}) + 1) + 1"
                f" ELSE (__n % {k})"
                f"  + (global_row_number - (__n % {k}) * ((__n div {k}) + 1) - 1)"
                f"    div greatest(__n div {k}, 1) + 1 END"
            ),
        )
    if keep_total:
        out = out.withColumn("global_total", F.col("__n"))
    return out.drop("__kstruct", "__before", "__dense", "__n")


def global_running_sum(
    df: DataFrame,
    order_exprs: list[Column],
    order_desc: list[bool],
    value_col: str,
    out_col: str = "global_running_sum",
    exclusive: bool = False,
    bucket_expr: Column | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed prefix sum of ``value_col`` over a TOTAL order —
    `sum(v) OVER (ORDER BY ...)` without the single-partition window
    that expression plans as. Same two-level scheme as the ranks above:
    local cumsum within an order-aligned partition + broadcast prefix
    offsets over the per-partition totals (≤ num_partitions rows).

    ``exclusive=True`` yields the sum of strictly-preceding rows (the
    shard-assignment form: a row's own weight doesn't push it into the
    next shard).

    ``bucket_expr``: a deterministic, order-monotone coarse bucket of
    the order key (e.g. ``doc_id div 2000`` for dense ids, or a date
    column for time-ordered data). When given, it REPLACES
    repartitionByRange as the partitioning — and because it is a pure
    function of the row (not sampled boundaries), the two consumers of
    the partitioned frame stay consistent with NO persist of the full
    input. Prefer it whenever the order key has a known monotone
    binning — which at 100 TB it almost always does (time, dense id).
    Without it, the range-partitioned input is pinned (eager
    localCheckpoint) for the duration of the query, because
    RangePartitioner boundary sampling is nondeterministic across
    evaluations and the local-cumsum and partition-total branches must
    see the same partitioning. An EAGER localCheckpoint (not persist)
    is the pin: partition ids freeze at one evaluation, and the
    checkpointed blocks free themselves when the plan is garbage
    collected — a plain persist() registers in the CacheManager and
    leaks until an explicit unpersist, which a long-running caller
    (the streaming packing sink packs every micro-batch) would never
    issue.
    """
    ord_cols = _ordered(list(order_exprs), list(order_desc))
    if bucket_expr is not None:
        part = df.withColumn("__pid", bucket_expr)
    else:
        spark = df.sparkSession
        n_parts = int(
            num_partitions or spark.conf.get("spark.sql.shuffle.partitions", "200")
        )
        part = (
            df.repartitionByRange(n_parts, *ord_cols)
            .withColumn("__pid", F.spark_partition_id())
            .localCheckpoint(eager=True)
        )
    w_loc = Window.partitionBy("__pid").orderBy(*ord_cols)
    upper = -1 if exclusive else 0
    local = part.withColumn(
        "__lsum",
        F.coalesce(
            F.sum(value_col).over(w_loc.rowsBetween(Window.unboundedPreceding, upper)),
            F.lit(0),
        ),
    )
    stats = part.groupBy("__pid").agg(F.sum(value_col).alias("__psum"))
    w_prev = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = stats.select(
        "__pid", F.coalesce(F.sum("__psum").over(w_prev), F.lit(0)).alias("__off")
    )
    out = (
        local.join(F.broadcast(offsets), on="__pid")
        .withColumn(out_col, F.col("__lsum") + F.col("__off"))
        .drop("__pid", "__lsum")
    )
    return out


def kendall_tau_distinct(
    df: DataFrame,
    x_rank_col: str,
    y_rank_col: str,
    n_buckets: int = 64,
) -> DataFrame:
    """Exact Kendall tau-a between two DISTINCT rank columns (both
    permutations of 1..n — produce them with `global_order_ranks`'
    row_number and a unique tie-break), computed distributed: a naive
    discordant-pair count is an O(n²) self-join; a single-machine
    mergesort needs the whole sequence in one place. Neither survives
    n in the billions.

    Decomposition (exact, no sampling): bucket both ranks into
    ``n_buckets`` equi-width ranges. A discordant pair (x_a < x_b,
    y_a > y_b) falls in exactly one class:

      G  — different x-bucket AND different y-bucket: count from the
           B×B histogram alone (strict bucket order decides the pair),
           via 2-D prefix sums over ≤ B² rows;
      X  — same x-bucket: counted exactly inside that x-bucket group;
      Y  — same y-bucket (different x-bucket): counted inside that
           y-bucket group, which ALSO re-counts its same-x-bucket
           pairs, so
      C  — same x-bucket AND same y-bucket (cell) pairs are counted by
           BOTH X and Y: one cell-grouped pass subtracts them.

      D = G + X + Y − C ;   tau = 1 − 4D / (n(n−1))

    Every grouped pass counts inversions within a group of ~n/B rows
    (Arrow-batched, numpy O(m log m) mergesort), so per-task memory is
    the bucket, never the table; the histogram algebra runs on ≤ B²
    rows. Choose n_buckets ≈ √n upward for balance. Deterministic:
    pure integer counting.

    Returns a 1-row DataFrame: (n, n_discordant, tau).
    """
    import pandas as pd

    spark = df.sparkSession
    base = df.select(
        F.col(x_rank_col).cast("long").alias("rx"),
        F.col(y_rank_col).cast("long").alias("ry"),
    ).localCheckpoint(eager=True)
    n = base.count()
    if n < 2:
        raise ValueError("kendall_tau_distinct needs at least 2 rows")
    width = max(1, (n + n_buckets - 1) // n_buckets)
    bx = ((F.col("rx") - 1) / width).cast("int")
    by = ((F.col("ry") - 1) / width).cast("int")
    cells = base.select(bx.alias("bx"), by.alias("by"))

    g = cells.groupBy("bx", "by").agg(F.count(F.lit(1)).alias("c"))
    # G term: Σ G[i1][j1]·G[i2][j2] over i1<i2, j1>j2 via 2-D prefix
    # sums on the (≤ B²)-row histogram: C[i][j] = Σ_{i'<i} G[i'][j],
    # T[i][j] = Σ_{j'>j} C[i][j'], G_term = Σ G[i][j]·T[i][j].
    # DENSIFIED first: a zero-count cell still carries a nonzero
    # prefix (C[i][j] sums counts of SMALLER i at the same j), and a
    # sparse window would skip it — undercounting every pair routed
    # through the hole (caught by the bucketed-vs-bruteforce test)
    bxs = g.select("bx").distinct()
    bys = g.select("by").distinct()
    g = (
        bxs.crossJoin(bys)
        .join(g, ["bx", "by"], "left")
        .select("bx", "by", F.coalesce("c", F.lit(0)).alias("c"))
    )
    wi = (
        Window.partitionBy("by")
        .orderBy("bx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = g.withColumn("cc", F.coalesce(F.sum("c").over(wi), F.lit(0)))
    wj = (
        Window.partitionBy("bx")
        .orderBy(F.col("by").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = cum.withColumn("tt", F.coalesce(F.sum("cc").over(wj), F.lit(0)))
    g_term = t.agg(F.sum(F.col("c") * F.col("tt"))).first()[0] or 0

    def _inversions(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        y = pdf.sort_values("rx", kind="mergesort")["ry"].to_numpy()

        def count(arr):
            m = arr.size
            if m < 2:
                return 0, arr
            mid = m // 2
            cl, left = count(arr[:mid])
            cr, right = count(arr[mid:])
            # vectorized cross-count: each left element (earlier in x
            # order) pairs discordantly with every SMALLER right
            # element; `right` is sorted, so one searchsorted gives
            # all counts at once
            inv = cl + cr + int(np.searchsorted(right, left, side="left").sum())
            return inv, np.sort(np.concatenate((left, right)))

        total, _ = count(y)
        return pd.DataFrame({"inv": [total]})

    def group_inversions(keyed: DataFrame, keys: list) -> int:
        out = keyed.groupBy(*keys).applyInPandas(_inversions, "inv long")
        return out.agg(F.sum("inv")).first()[0] or 0

    both = base.select("rx", "ry", bx.alias("bx"), by.alias("by"))
    x_term = group_inversions(both, ["bx"])
    y_term = group_inversions(both, ["by"])
    c_term = group_inversions(both, ["bx", "by"])

    d = int(g_term) + int(x_term) + int(y_term) - int(c_term)
    tau = 1.0 - 4.0 * d / (n * (n - 1.0))
    return spark.createDataFrame(
        [(n, d, tau)], "n long, n_discordant long, tau double"
    )
