"""SemDeDup: semantic deduplication via embedding clustering.

Public method (Abbas et al., "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication", 2023): k-means-cluster the
corpus embeddings, compare pairs only WITHIN a cluster, and for every
group of mutual near-duplicates (cosine >= threshold) keep exactly one
representative — the member LEAST similar to its cluster centroid, so
the survivor set preserves diversity at the cluster boundary instead
of collapsing toward the centroid.

This catches what MinHash/SimHash cannot: paraphrases, translations,
and templated rewrites that share meaning but few n-grams. It is the
third rung of the dedup ladder (exact -> near-lexical -> semantic).

Spark shape, and why it holds at 100 TB:
- clustering reuses the IVF machinery (`similarity.train_ivf_centroids`
  — one bounded-sample Spark ML job; `with_ivf_cell`'s argmax-dot as a
  pure array expression), so cell assignment is a zero-shuffle map.
- the pairwise comparison is a CELL equi-join, never a cross product:
  shuffle is keyed on the cell id, and the quadratic term is bounded
  per cell (n_cells is the knob — the paper runs 50k clusters on
  LAION; cost ~ sum over cells of |cell|^2).
- duplicate groups are closed transitively with the same min-label
  propagation every other dedup family here uses
  (`graph.connected_components`), so A~B~C collapses to ONE keeper
  even when A!~C — pairwise keeper-picking would double-drop.
- keeper selection is one `min_by` aggregate per component, shuffle
  keyed on component id.

At index scale, write the celled table partitioned by cell (exactly
like the persisted IVF index) and re-run only dirty cells on append.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from reactionetl_etl_spark.functions.vectors import dot
from reactionetl_etl_spark.operators.graph import connected_components
from reactionetl_etl_spark.operators.similarity import (
    _coarse_centroids,
    train_ivf_centroids,
)


def _cell_pairs(celled: DataFrame, threshold: float) -> DataFrame:
    """Within-cell near-dup pairs over the (__id, __v unit-normalized,
    cell) frame, in two stages:

    1. PREFILTER (numpy gram per cell, Arrow-batched applyInPandas):
       each cell's vectors form one BLAS V·Vᵀ; upper-triangle entries
       ≥ threshold − 1e-9 become candidate pairs. The margin makes the
       prefilter PROVABLY lossless: both the BLAS dot and the exact
       verifier's sequential fold err at most n·eps·Σ|xᵢyᵢ| ≤
       64·2⁻⁵³ ≈ 7e-15 from the true product on unit vectors
       (Cauchy-Schwarz bounds Σ|xᵢyᵢ| by 1), five orders below the
       margin — no exact-passing pair can be dropped.
    2. EXACT VERIFY (JVM): survivors join their vectors back by id and
       re-test with the SAME interpreted `dot` fold the original
       formulation used, so the emitted pair set is bit-for-bit
       identical to the pure-HOF join (pinned oracles unchanged) while
       the quadratic term runs as one matmul per cell instead of
       ~|cell|²/2 interpreted 64-element folds (measured 3.5→2.1 s on
       the benched query).

    Still never a cartesian: stage 1 is keyed on the cell id (plan pin
    unchanged), stage 2 on candidate ids — work ∝ true near-dup count."""
    import numpy as np
    import pandas as pd

    margin = 1e-9

    def emit(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["__id"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame(
                {"id_a": np.array([], dtype=np.int64), "id_b": np.array([], dtype=np.int64)}
            )
        V = np.array([np.asarray(v, dtype=np.float64) for v in pdf["__v"]])
        G = V @ V.T
        iu, ju = np.triu_indices(len(ids), k=1)
        keep = G[iu, ju] >= threshold - margin
        a, b = ids[iu[keep]], ids[ju[keep]]
        return pd.DataFrame(
            {"id_a": np.minimum(a, b).astype(np.int64), "id_b": np.maximum(a, b).astype(np.int64)}
        )

    # degenerate rows (NULL cell — zero/non-finite norm, NULL elements;
    # see _cell_assign_arrow) can't pair: drop them before the grouped
    # gram build, mirroring the NULL-vector exclusion upstream
    celled = celled.filter(F.col("cell").isNotNull())
    cand = celled.groupBy("cell").applyInPandas(emit, "id_a long, id_b long")
    va = celled.select(F.col("__id").alias("id_a"), F.col("__v").alias("__va"))
    vb = celled.select(F.col("__id").alias("id_b"), F.col("__v").alias("__vb"))
    return (
        cand.join(va, on="id_a")
        .join(vb, on="id_b")
        .filter(dot(F.col("__va"), F.col("__vb")) >= threshold)
        .select("id_a", "id_b")
    )


def _cell_assign_arrow(
    embeddings: DataFrame,
    centroids: list[list[float]],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(__id, __v unit-normalized, cell, centroid_sim) for non-NULL
    vectors — the Arrow/numpy formulation of the original HOF-expression
    celling (r14), BIT-IDENTICAL by construction:

    - the SQL norm fold `aggregate(v, 0.0, (a,y) -> a + y*y)` and the
      `dot` fold `aggregate(zip_with(u,c,*), 0.0, +)` are strict
      left-to-right IEEE-double accumulations; `np.add.accumulate`
      performs the same sequential accumulation over the same widened
      (float64-cast) elements, and IEEE multiply/divide/sqrt are
      deterministic, so every norm, unit component, and centroid score
      carries the same bits as the interpreted fold produced;
    - cell = FIRST index attaining the array max under Spark's ordering
      and equality (-0.0 equal to 0.0);
    - rounding of centroid_sim stays a JVM `F.round` on the raw score,
      so the HALF_UP decimal behavior is Spark's own, not a Python
      reimplementation.

    Degenerate embeddings (r15, ADVICE item): a row whose norm is ZERO
    or NON-FINITE — the all-zero vector, any NULL element (NULL list
    slots arrive as NaN through Arrow), any NaN/Inf element — cannot
    be placed on the unit sphere, so it gets NULL cell / NULL
    centroid_sim / all-NULL __v and is EXCLUDED from pair joins; it
    re-enters the final verdict as keep=True, exactly the NULL-vector
    convention. (The retired HOF expression did not define a usable
    alternative: under Spark 4 ANSI mode its `x / 0.0` RAISES
    DIVIDE_BY_ZERO on a zero-norm row, and a NULL element NULLed the
    whole row's scores — the NULL verdict is the one consistent,
    non-crashing semantics. Pinned by
    test_degenerate_embeddings_get_null_cell.)

    Why: the expression path ran 16 interpreted 64-element folds per
    row (plus the norm fold) outside whole-stage codegen — the single
    costliest slice of semantic_dedup's assignment checkpoint
    (PERF_NOTES r8/r14). One Arrow pass replaces ~1k lambda
    evaluations per row with vectorized numpy; row-local math, so the
    result is independent of batching and partitioning."""
    import numpy as np
    import pandas as pd

    from reactionetl_etl_spark.functions.vectors import non_null_vectors

    C = np.array([np.asarray(c, dtype=np.float64) for c in centroids])
    n_cells = len(C)
    inp = non_null_vectors(embeddings, vec_col).select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__e")
    )
    id_type = inp.schema["__id"].dataType.simpleString()

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.array([np.asarray(v, dtype=np.float64) for v in pdf["__e"]])
            sq = V * V
            n = np.sqrt(np.add.accumulate(sq, axis=1)[:, -1])
            ok = np.isfinite(n) & (n > 0.0)
            with np.errstate(divide="ignore", invalid="ignore"):
                U = V / n[:, None]
            if ok.all():
                # fast path (every real corpus batch): fully vectorized,
                # bit-identical to the r14 formulation
                S = np.empty((len(V), n_cells))
                for c in range(n_cells):
                    S[:, c] = np.add.accumulate(U * C[c], axis=1)[:, -1]
                m = S.max(axis=1)
                yield pd.DataFrame(
                    {
                        "__id": pdf["__id"].to_numpy(),
                        "__v": list(U),
                        "cell": (S == m[:, None]).argmax(axis=1).astype(np.int32),
                        "__sim": m,
                    }
                )
                continue
            cells = np.full(len(V), None, dtype=object)
            sims = np.full(len(V), None, dtype=object)
            vs: list = [None] * len(V)
            if ok.any():
                Uo = U[ok]
                S = np.empty((len(Uo), n_cells))
                for c in range(n_cells):
                    S[:, c] = np.add.accumulate(Uo * C[c], axis=1)[:, -1]
                m = S.max(axis=1)
                ok_cells = (S == m[:, None]).argmax(axis=1)
                for row, c, s, u in zip(np.nonzero(ok)[0], ok_cells, m, Uo):
                    cells[row] = int(c)
                    sims[row] = float(s)
                    vs[row] = u
            # degenerate rows: NULL cell/sim and an all-NULL unit vector
            # of the same length (docstring convention)
            for row in np.nonzero(~ok)[0]:
                vs[row] = [None] * V.shape[1]
            yield pd.DataFrame(
                {
                    "__id": pdf["__id"].to_numpy(),
                    "__v": vs,
                    "cell": cells,
                    "__sim": sims,
                }
            )

    out = inp.mapInPandas(
        assign, f"__id {id_type}, __v array<double>, cell int, __sim double"
    )
    return out.select(
        "__id", "__v", "cell", F.round("__sim", 6).alias("centroid_sim")
    )


def semantic_dedup(
    embeddings: DataFrame,
    dim: int,
    n_cells: int = 16,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
    train: bool = True,
    seed: int = 42,
    max_cell_rows: int | None = None,
    train_max_iter: int = 10,
) -> DataFrame:
    """Per-row semantic-dedup verdicts: (id, cell, centroid_sim,
    component, keep).

    - ``cell``: the row's k-means cluster (trained when ``train``,
      else the fixed pseudo-random fallback — both deterministic).
    - ``centroid_sim``: cosine similarity to its own cell centroid
      (the paper's ranking signal, also a useful quality feature).
    - ``component``: the transitive near-dup group id within the cell
      (smallest member id), NULL for rows with no near-duplicate.
    - ``keep``: True for semantically unique rows and for the one
      keeper per duplicate group — the member with the LOWEST
      (centroid_sim, id), per the paper's low-similarity-to-centroid
      rule with a deterministic id tie-break.

    ``max_cell_rows`` optionally guards the per-cell quadratic term:
    when set, one count aggregate verifies no cell exceeds it and the
    call raises instead of scheduling a blown-up join (the fix is more
    cells, exactly as the paper scales: n_cells ~ N / target_cell_size).

    Deterministic end to end (seeded k-means, RNG-free propagation,
    id tie-breaks) — two runs over the same corpus return identical
    verdicts, which makes the drop-list auditable and resumable.
    """
    if centroids is None:
        # max_iter=10 (vs the index trainer's 20): the cells only scope
        # which pairs get compared — the paper needs a good-enough
        # partitioning, not a converged one, and the fit is the single
        # costliest stage (deterministic either way: fixed seed + count)
        centroids = (
            train_ivf_centroids(embeddings, n_cells, vec_col, seed=seed, max_iter=train_max_iter)
            if train
            else _coarse_centroids(dim, n_cells)
        )

    # L2-normalize ONCE at assignment time: centroids are unit vectors,
    # so every downstream cosine collapses to a plain dot product — the
    # pair predicate then runs ONE array fold per candidate instead of
    # cosine's three (dot + two norms), which is where the per-pair
    # cost lives at bench scale. NULL embeddings are excluded BEFORE
    # celling (inside _cell_assign_arrow): they would land in a shared
    # NULL cell whose applyInPandas group crashes the numpy gram build
    # as soon as it holds two of them. A row that can't be embedded
    # can't be semantically deduplicated, so it re-enters the verdict
    # frame below as keep=True with NULL cell/centroid_sim/component —
    # row count preserved. r14: assignment runs the Arrow/numpy path
    # (bit-identical; see _cell_assign_arrow) instead of 16 interpreted
    # folds per row.
    celled = (
        _cell_assign_arrow(embeddings, centroids, id_col, vec_col)
        # reused by the pair join (both sides) and the final verdict
        # join; checkpoint so the scan + normalize + argmax run once
        .localCheckpoint(eager=True)
    )

    out = _dedup_verdicts(celled, threshold, id_col, max_cell_rows)
    # NULL-embedding rows: semantically unique by convention (nothing
    # to compare), NULL cell/sim/component, keep=True
    null_rows = embeddings.filter(F.col(vec_col).isNull()).select(
        F.col(id_col).cast(out.schema[id_col].dataType),
        F.lit(None).cast(out.schema["cell"].dataType).alias("cell"),
        F.lit(None).cast(out.schema["centroid_sim"].dataType).alias("centroid_sim"),
        F.lit(None).cast(out.schema["component"].dataType).alias("component"),
        F.lit(True).alias("keep"),
    )
    return out.unionByName(null_rows)


def _dedup_verdicts(
    celled: DataFrame,
    threshold: float,
    id_col: str,
    max_cell_rows: int | None = None,
) -> DataFrame:
    """(id, cell, centroid_sim, component, keep) over an already-celled
    (__id, __v, cell, centroid_sim) frame — `semantic_dedup`'s verdict
    machinery factored out (r15) so the incremental append path can run
    it over batch rows it has ALREADY celled (reusing the batch's
    Arrow celling pass for the within-batch stage) instead of celling
    the survivor rows a second time. Callers union their own
    NULL-vector rows; ``celled`` must be materialized (checkpoint or
    parquet) because the pair join reads it from three sides."""
    if max_cell_rows is not None:
        biggest = celled.groupBy("cell").count().agg(F.max("count")).collect()[0][0]
        if biggest and biggest > max_cell_rows:
            raise ValueError(
                f"largest cell holds {biggest} rows > max_cell_rows="
                f"{max_cell_rows}; raise n_cells (cost is per-cell quadratic)"
            )

    # the quadratic join is the expensive plan; evaluate it once —
    # connected_components otherwise re-runs it per side of its
    # symmetric edge union
    pairs = _cell_pairs(celled, threshold).localCheckpoint(eager=True)

    comps = connected_components(pairs, "id_a", "id_b")  # (node, component)
    ranked = comps.join(
        celled.select(F.col("__id").alias("node"), "centroid_sim"), on="node"
    )
    keepers = ranked.groupBy("component").agg(
        F.min_by("node", F.struct("centroid_sim", "node")).alias("__keeper")
    )
    verdicts = (
        comps.join(keepers, on="component")
        .select(
            F.col("node").alias("__id"),
            "component",
            (F.col("node") == F.col("__keeper")).alias("keep"),
        )
    )
    return celled.join(verdicts, on="__id", how="left").select(
        F.col("__id").alias(id_col),
        "cell",
        "centroid_sim",
        "component",
        F.coalesce("keep", F.lit(True)).alias("keep"),
    )


def _celled_frame(
    embeddings: DataFrame,
    centroids: list[list[float]],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(__id, __v unit-normalized, cell, centroid_sim) for non-NULL
    vectors — the same construction as `semantic_dedup` (SHARED code
    path so verdicts from the two entry points agree bit-for-bit),
    exposed for the incremental append path which cells TWO frames
    against one fixed geometry. r14: both entry points run the
    Arrow/numpy assignment (`_cell_assign_arrow`, bit-identical to the
    retired HOF-expression formulation)."""
    return _cell_assign_arrow(embeddings, centroids, id_col, vec_col)


def write_semdedup_state(
    kept: DataFrame,
    path: str,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "overwrite",
) -> None:
    """Persist the celled incumbent geometry — (__id, __v
    unit-normalized, centroid_sim, cell) parquet PARTITIONED BY cell,
    the IVF-index sink pattern — so nightly `semdedup_append` calls
    probe it via ``kept_celled=read_semdedup_state(...)`` instead of
    re-celling the whole kept corpus per append (r15: the celling pass
    over the incumbents was the dominant recurring cost, and it is
    recomputed work — the corpus does not move between appends; the
    geometry is fixed by ``centroids`` exactly as for the IVF index,
    so cells written in January match probes in June).

    ``mode='append'`` grows the state incrementally with each batch's
    kept rows (cell assignment is deterministic under the FIXED
    centroids, so old and new rows cell consistently). Degenerate rows
    (NULL cell — zero/non-finite norm, NULL elements) are dropped:
    the probe is a cell equi-join, which a NULL key can never match,
    and they would land in the unreadable Hive default partition."""
    _celled_frame(kept, centroids, id_col, vec_col).filter(
        F.col("cell").isNotNull()
    ).write.mode(mode).partitionBy("cell").parquet(path)


def read_semdedup_state(spark, path: str) -> DataFrame:
    """The persisted celled-incumbent table, in the exact shape
    `semdedup_append`'s ``kept_celled`` expects. The partition column
    comes back as a string (partition type inference is disabled
    engine-wide); cast it back to the int the celling stage wrote."""
    return spark.read.parquet(path).withColumn(
        "cell", F.col("cell").cast("int")
    )


def semdedup_append(
    kept: DataFrame | None,
    batch: DataFrame,
    dim: int,
    centroids: list[list[float]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell_rows: int | None = None,
    kept_celled: DataFrame | None = None,
) -> DataFrame:
    """Incremental SemDeDup maintenance: dedup an APPEND BATCH against
    an already-deduped corpus without re-deduping the world — the
    semantic rung's sign-once-maintain-forever path (the LSH/IVF/PQ
    indexes already have theirs via the streaming append sinks).

    Policy is KEEP-FIRST (stable corpus): an incumbent kept row always
    beats an arriving near-duplicate, so corpus membership is monotone
    under appends — nothing already shipped to training is ever
    retroactively dropped, and the drop-list for each batch is final
    the day it lands. Two stages:

      1. corpus probe — batch rows meet kept rows in a CELL equi-join
         (fixed ``centroids`` geometry, so cells are stable across
         appends; never a cross product) and any batch row with
         cosine >= threshold to an incumbent is dropped as
         ``origin='corpus_dup'`` with ``dup_of`` = its most-similar
         incumbent (ties to the lower id) — auditable provenance.
      2. within-batch dedup — survivors run the standard
         `semantic_dedup` under the SAME fixed geometry (train=False
         semantics via explicit centroids): transitive components,
         one keeper per group by the lowest-(centroid_sim, id) rule;
         non-keepers emit ``origin='batch_dup'`` with ``dup_of`` =
         their component keeper.

    Returns ONE verdict row per batch row: (id, cell, centroid_sim,
    origin 'corpus_dup'|'batch_dup'|'unique', dup_of, keep) — NULL
    embeddings keep with NULL cell/sim/dup_of (`semantic_dedup`'s
    convention). Deterministic end to end, so the output pins.

    Invariants (tested): the post-append kept set contains no
    within-threshold pair involving a kept batch row, and stage-1
    drops never resurface as stage-2 keepers. NOTE the keep-first
    asymmetry vs a full re-run: a batch row connected to an incumbent
    only TRANSITIVELY through another dropped batch row is not pursued
    across the corpus boundary (a full `semantic_dedup` over
    corpus+batch might merge those components and elect a different
    keeper). That locality is the price of never touching clean cells;
    at threshold ~0.95 chains across the boundary are rare, and the
    audit columns make any residual pair findable.

    Scale: stage 1 shuffles both sides on the cell id only (the probe
    is the `semantic_contamination_ann` shape — neither side
    broadcasts); stage 2's quadratic term is per-cell over the BATCH
    only. Cells untouched by the batch cost nothing — the whole point.

    r15: pass ``kept_celled`` (the persisted celled-incumbent table —
    `read_semdedup_state` of a `write_semdedup_state` layout, or any
    (__id, __v, cell) frame produced by `_celled_frame` under the SAME
    centroids) to skip re-celling the kept corpus — the production
    shape, where the incumbent geometry is signed once at corpus-build
    time and every nightly append only cells its own batch. ``kept``
    is ignored (may be None) when ``kept_celled`` is given. The batch's
    own celling pass is also reused for stage 2 (survivors filter out
    of the already-celled batch frame instead of being re-celled) —
    bit-identical because cell assignment is row-local math.
    """
    if kept_celled is not None:
        kc = kept_celled
    else:
        kc = _celled_frame(kept, centroids, id_col, vec_col).localCheckpoint(
            eager=True
        )
    bc = _celled_frame(batch, centroids, id_col, vec_col).localCheckpoint(eager=True)

    if max_cell_rows is not None:
        # same refusal contract as semantic_dedup's guard: the probe's
        # per-cell term is |kept_cell| x |batch_cell| — verify the
        # larger side with one count aggregate and raise BEFORE
        # scheduling a blown-up join (fix: more cells in the signed
        # geometry, re-signing the index — exactly the SemDeDup paper's
        # n_cells ~ N / target_cell_size scaling)
        for label, frame in (("kept", kc), ("batch", bc)):
            biggest = frame.groupBy("cell").count().agg(F.max("count")).collect()[0][0]
            if biggest and biggest > max_cell_rows:
                raise ValueError(
                    f"largest {label}-side cell holds {biggest} rows >"
                    f" max_cell_rows={max_cell_rows}; re-sign the geometry"
                    f" with more cells (probe cost is per-cell"
                    f" |kept| x |batch|)"
                )

    hits = (
        bc.select(F.col("__id").alias("__bid"), F.col("__v").alias("__bv"), "cell")
        .join(
            kc.select(F.col("__id").alias("__kid"), F.col("__v").alias("__kv"), "cell"),
            on="cell",
        )
        .withColumn("__sim", dot(F.col("__bv"), F.col("__kv")))
        .filter(F.col("__sim") >= threshold)
    )
    # most-similar incumbent, ties to the LOWER corpus id: max_by over
    # (sim, -id) — deterministic because both components are values,
    # not partition order
    corpus_dups = hits.groupBy("__bid").agg(
        F.max_by("__kid", F.struct(F.col("__sim"), (-F.col("__kid")).alias("__nk")))
        .alias("dup_of")
    )

    # within-batch stage over the survivors: filter the ALREADY-celled
    # batch frame instead of re-celling the survivor rows (r15) — cell
    # assignment is row-local, so the filtered frame carries exactly
    # the values a second Arrow pass would recompute. Checkpoint: the
    # pair join reads it from three sides.
    surv_celled = bc.join(
        corpus_dups.select(F.col("__bid").alias("__id")), on="__id", how="left_anti"
    ).localCheckpoint(eager=True)
    inner = _dedup_verdicts(surv_celled, threshold, id_col, max_cell_rows)
    # NULL-embedding batch rows are not in bc (excluded before celling)
    # and can never be corpus dups: unique keeps, semantic_dedup's
    # convention
    null_rows = batch.filter(F.col(vec_col).isNull()).select(
        F.col(id_col).cast(inner.schema[id_col].dataType),
        F.lit(None).cast(inner.schema["cell"].dataType).alias("cell"),
        F.lit(None).cast(inner.schema["centroid_sim"].dataType).alias("centroid_sim"),
        F.lit(None).cast(inner.schema["component"].dataType).alias("component"),
        F.lit(True).alias("keep"),
    )
    inner = inner.unionByName(null_rows)
    # component keeper id for batch_dup provenance: the kept member of
    # the row's component (exactly one exists by construction)
    keepers = (
        inner.filter(F.col("keep") & F.col("component").isNotNull())
        .select("component", F.col(id_col).alias("__keeper"))
    )
    inner_v = (
        inner.join(keepers, on="component", how="left")
        .select(
            F.col(id_col),
            "cell",
            "centroid_sim",
            F.when(F.col("keep"), F.lit("unique"))
            .otherwise(F.lit("batch_dup"))
            .alias("origin"),
            F.when(F.col("keep"), F.lit(None).cast("long"))
            .otherwise(F.col("__keeper").cast("long"))
            .alias("dup_of"),
            "keep",
        )
    )
    corpus_v = (
        bc.join(corpus_dups, bc["__id"] == corpus_dups["__bid"], "inner")
        .select(
            F.col("__id").alias(id_col),
            "cell",
            "centroid_sim",
            F.lit("corpus_dup").alias("origin"),
            F.col("dup_of").cast("long"),
            F.lit(False).alias("keep"),
        )
    )
    return inner_v.unionByName(corpus_v)
