"""Deduplication operators for large text corpora.

Four tiers, cheapest → most recall, all expressed as distributed
DataFrame plans (no driver-side loops, no Python UDFs — everything is
Catalyst expressions, so the hot path stays in whole-stage codegen):

1. exact_dedup        — identical keys; one hash-aggregate shuffle.
2. fingerprint_dedup  — md5 over normalized text; catches
                        whitespace/case-variant copies at the same cost.
3. minhash_lsh_*      — near-duplicates via shingling → MinHash
                        signatures → banded LSH self-join. Candidate
                        generation is an equi-join on (band, band_hash),
                        which shuffles only bucket ids + doc keys, never
                        full text. This is the 100 TB path: cost is
                        O(n · sig_len) + join on collision buckets.
4. simhash            — 64-bit SimHash signatures; near-dup candidates
                        share one of four 16-bit chunks (Hamming ≤ 3
                        guaranteed recall within chunk scheme).

Determinism: hashes are xxhash64 with fixed seed=42 and the permutation
parameters are generated from a fixed table, so signatures are stable
across runs/partitionings (required for incremental dedup at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Mersenne prime 2^31-1: modulus for the universal-hash permutation
# family h_i(x) = (a_i * x + b_i) mod p used by MinHash. 31-bit hashes
# and parameters keep a_i * x < 2^62, safely inside int64 under ANSI
# mode (Spark 4 default: long overflow is an error, not a wrap).
_MERSENNE_P = (1 << 31) - 1


def normalize_text(col) -> "F.Column":
    """Lowercase, collapse whitespace, strip — the canonical form used
    by fingerprint and shingle dedup."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def exact_dedup(df: DataFrame, keys: list[str], tie_break: str) -> DataFrame:
    """Keep exactly one row per key-set: the minimum ``tie_break`` row.

    Deterministic alternative to ``dropDuplicates`` (which keeps an
    arbitrary row). One shuffle on ``keys``.
    """
    w = Window.partitionBy(*keys).orderBy(F.col(tie_break).asc())
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def fingerprint_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Group rows by md5(normalized text); emit one keeper per group.

    Returns (fingerprint, keeper_id, n_members). The groupBy is a
    map-side-combinable hash aggregate — at 100 TB only 32-char digests
    and ids shuffle, never document bodies.
    """
    return (
        df.select(F.md5(normalize_text(text_col)).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keeper_id"), F.count("*").alias("n_members"))
    )


def shingle(col, k: int = 3) -> "F.Column":
    """k-token shingles of a text column as array<string>.

    Pure SQL higher-order functions: split → sliding window via
    transform(sequence(...)) — JVM-side, no UDF.

    NOTE: as a standalone expression the tokenization is inlined into
    the per-shingle lambda (O(tokens²) per row). Fine for tests and
    small frames; the hot path (minhash_signature) materializes the
    token array as a column first so split() runs once per row.
    """
    if not isinstance(col, str):
        raise ValueError("shingle() takes a column name")
    # Tokenize the NORMALIZED text (lowercase, collapsed whitespace) so
    # whitespace/case-variant near-dups collide, matching fingerprint_dedup.
    expr = f"split(trim(regexp_replace(lower({col}), '\\\\s+', ' ')), ' ')"
    return F.expr(
        f"transform(sequence(1, greatest(size({expr}) - {k - 1}, 1)),"
        f" i -> array_join(slice({expr}, i, {k}), ' '))"
    )


def _fan_out_cpu_bound(df: DataFrame) -> DataFrame:
    """Signature computation is CPU-bound: its parallelism must come
    from task count, not byte count. A small corpus arrives as one
    input split and would pin all the hash work on one core; fan it out
    to defaultParallelism. At real scale the scan already has at least
    that many splits, so this is a no-op — no shuffle is added."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def _perm_params(num_perm: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the universal hash family.

    Derived from a fixed linear-congruential stream — no RNG state, so
    every run/cluster computes identical signatures.
    """
    params = []
    x = 0x9E3779B97F4A7C15
    for _ in range(num_perm):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        a = (x % (_MERSENNE_P - 1)) + 1
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        b = x % _MERSENNE_P
        params.append((a, b))
    return params


def minhash_signature(df: DataFrame, text_col: str, num_perm: int = 32, k_shingle: int = 3) -> DataFrame:
    """Append ``signature: array<bigint>`` (length num_perm).

    sig[i] = min over shingles s of (a_i * xxhash64(s) + b_i) mod p.
    Cost O(rows · shingles · num_perm), embarrassingly parallel,
    no shuffle (on an already-parallel scan).

    The token array and shingle hashes are materialized as columns so
    split/xxhash64 run ONCE per row, and all num_perm mins fold into a
    single aggregate over the hash array (state = num_perm-long array,
    one least() per shingle per permutation) — num_perm separate
    array_min(transform(...)) expressions would re-walk the hash array
    num_perm times and, worse, per-shingle tokenization would make the
    signature O(tokens²) per row.
    """
    k = k_shingle
    df = _fan_out_cpu_bound(df)
    df = df.withColumn(
        "__toks",
        F.expr(f"split(trim(regexp_replace(lower({text_col}), '\\\\s+', ' ')), ' ')"),
    )
    # Hash each shingle once (reduced to 31 bits), then apply the cheap
    # affine permutations — products stay < 2^62, no int64 overflow.
    df = df.withColumn(
        "__h",
        F.expr(
            f"transform(sequence(1, greatest(size(__toks) - {k - 1}, 1)),"
            f" i -> pmod(xxhash64(array_join(slice(__toks, i, {k}), ' '), 42), {_MERSENNE_P}L))"
        ),
    )
    ab = ", ".join(f"named_struct('a', {a}L, 'b', {b}L)" for a, b in _perm_params(num_perm))
    sig = (
        f"aggregate(__h, array_repeat({_MERSENNE_P}L, {num_perm}),"
        f" (acc, h) -> zip_with(acc, array({ab}),"
        f" (s, p) -> least(s, (h * p.a + p.b) % {_MERSENNE_P}L)))"
    )
    return df.withColumn("signature", F.expr(sig)).drop("__toks", "__h")


def minhash_signature_frame(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int = 32,
    k_shingle: int = 3,
) -> DataFrame:
    """(id, signature) — the Arrow/numpy formulation of
    `minhash_signature(df, ...).select(id, signature)` (r15),
    BIT-IDENTICAL by construction and pinned by
    tests/test_minhash_arrow.py:

    - NORMALIZATION stays the JVM `trim(regexp_replace(lower(...)))`
      expression (Java regex/locale semantics are not re-implemented),
      and only that one string per row crosses the Arrow boundary —
      shipping the token ARRAY instead serializes every token as its
      own Arrow value (~10x the values for 3-token shingles; measured
      dominant at scale). Tokens are recovered in numpy from the space
      positions: the normalized text IS `' '.join(tokens)`, so token
      boundaries are exactly the 0x20 bytes;
    - each shingle's bytes are exactly `array_join(slice(toks,i,k),' ')`
      encoded as UTF-8 — a WINDOW into the batch's own Arrow string
      buffer (token i start .. token i+k-1 end), zero copies (no
      per-shingle string allocation, the r14 span-family trick, but the
      HASH input is unchanged because here the hash values ARE the
      signatures);
    - the digest is Spark's own `xxhash64(gram, 42)` chain — XXH64 of
      the UTF-8 bytes at seed 42, then the 4-byte `hashInt(42)` fold —
      reproduced bit-for-bit by `functions/xxh64_numpy.py` (NULL text
      skips the string child: digest = hashInt(42, 42), as Spark does);
    - `pmod` and the affine min-fold are exact int64 arithmetic
      (products < 2^62, numpy floored-mod == pmod for positive moduli).

    Why: the interpreted HOF fold ran num_perm lambda evaluations per
    shingle per row outside whole-stage codegen, plus one string build
    + one JVM xxhash64 call per shingle — the single biggest CPU sink
    of the dedup family (r14 verdict item 1). One mapInArrow pass
    replaces all of it with vectorized numpy; row-local math, so the
    result is independent of batching and partitioning."""
    import numpy as np

    from pyspark.sql import types as T

    from reactionetl_etl_spark.functions.xxh64_numpy import (
        xxh64_chain_int,
        xxh64_slices,
    )

    k = k_shingle
    p = _MERSENNE_P
    params = _perm_params(num_perm)
    a_vec = np.array([a for a, _ in params], dtype=np.int64)
    b_vec = np.array([b for _, b in params], dtype=np.int64)

    df = _fan_out_cpu_bound(df)
    inp = df.select(
        F.col(id_col).alias("id"),
        F.expr(
            f"trim(regexp_replace(lower({text_col}), '\\\\s+', ' '))"
        ).alias("__nt"),
    )
    out_schema = T.StructType(
        [
            T.StructField("id", inp.schema["id"].dataType),
            T.StructField("signature", T.ArrayType(T.LongType())),
        ]
    )

    def sign(batches):
        import pyarrow as pa

        for batch in batches:
            m = batch.num_rows
            if m == 0:
                continue
            ids = batch.column(0)
            nt = batch.column(1)
            if nt.offset != 0:  # defensive: Spark emits offset-0 batches
                nt = nt.take(pa.array(np.arange(m)))
            null_rows = nt.is_null().to_numpy(zero_copy_only=False)
            bufs = nt.buffers()
            odt = np.int64 if pa.types.is_large_string(nt.type) else np.int32
            offs = (
                np.frombuffer(bufs[1], dtype=odt)[: m + 1].astype(np.int64)
                if bufs[1] is not None
                else np.zeros(m + 1, dtype=np.int64)  # all-null column
            )
            data = (
                np.frombuffer(bufs[2], dtype=np.uint8)
                if bufs[2] is not None
                else np.zeros(0, dtype=np.uint8)
            )
            if null_rows.any() and ((offs[1:] - offs[:-1])[null_rows] != 0).any():
                raise ValueError("null rows with non-empty extents")  # not Spark-shaped

            # token boundaries from space positions: the normalized text
            # is ' '.join(tokens), so every 0x20 byte is a separator.
            # Space → row: count of row ENDS <= position (duplicate
            # offsets from empty rows make the naive offs-bisect wrong).
            sp = offs[0] + np.nonzero(data[offs[0] : offs[-1]] == 0x20)[0]
            sp_row = np.searchsorted(offs[1:], sp, side="right")
            n_toks = np.bincount(sp_row, minlength=m).astype(np.int64) + 1
            # per-row sorted token starts/ends: first-token starts are
            # the row offsets, later starts follow each space; ends are
            # each space, then the row end. Stable sorts keep row order
            # on the empty-row ties (offs[r] == offs[r+1]).
            tok_start = np.concatenate([offs[:-1], sp + 1])
            tok_start = tok_start[np.argsort(tok_start, kind="stable")]
            tok_end = np.sort(np.concatenate([sp, offs[1:]]), kind="stable")

            # shingle windows: sequence(1, greatest(n-k+1, 1)) semantics
            row_tok0 = np.zeros(m + 1, dtype=np.int64)
            np.cumsum(n_toks, out=row_tok0[1:])
            n_sh = np.maximum(n_toks - (k - 1), 1)
            sh_bounds = np.zeros(m + 1, dtype=np.int64)
            np.cumsum(n_sh, out=sh_bounds[1:])
            tot_sh = int(sh_bounds[-1])
            sh_row = np.repeat(np.arange(m, dtype=np.int64), n_sh)
            sh_i = np.arange(tot_sh, dtype=np.int64) - sh_bounds[:-1][sh_row]
            first = row_tok0[:-1][sh_row] + sh_i
            last = np.minimum(
                first + (k - 1), row_tok0[:-1][sh_row] + n_toks[sh_row] - 1
            )
            starts = tok_start[first]
            lens = tok_end[last] - starts
            # NULL text: xxhash64 skips the null string child, so the
            # running hash stays at seed 42 before the int fold
            is_null_sh = null_rows[sh_row]
            digests = np.empty(tot_sh, dtype=np.uint64)
            str_sh = ~is_null_sh
            if str_sh.any():
                digests[str_sh] = xxh64_slices(
                    data, starts[str_sh], lens[str_sh], seed=42
                )
            if is_null_sh.any():
                digests[is_null_sh] = np.uint64(42)
            digests = xxh64_chain_int(42, digests)
            h31 = digests.view(np.int64) % p  # floored mod == pmod, p > 0

            sig = np.empty((m, num_perm), dtype=np.int64)
            row_starts = sh_bounds[:-1]
            for j in range(num_perm):
                t = (h31 * a_vec[j] + b_vec[j]) % p
                sig[:, j] = np.minimum.reduceat(t, row_starts)
            sig_arr = pa.ListArray.from_arrays(
                pa.array(
                    np.arange(0, (m + 1) * num_perm, num_perm, dtype=np.int32),
                    pa.int32(),
                ),
                pa.array(sig.ravel(), pa.int64()),
            )
            yield pa.RecordBatch.from_arrays([ids, sig_arr], ["id", "signature"])

    return inp.mapInArrow(sign, out_schema)


# Input-size threshold (optimizer estimate, bytes) above which the
# signature stage runs the Arrow/numpy path. Measured on local[32]
# (quiet-gated, r15): any Python stage costs a fixed ~0.2 s per plan
# execution (runner + Arrow stream setup — present even at ONE task),
# while the interpreted HOF fold costs ~8 ms per input-MB per core.
# At the 0.25 MB bench corpus the tax dominates (0.43 → 0.55 s); at
# 23 MB the fold dominates and Arrow wins 2.07x (2.77 → 1.34 s); the
# gap widens linearly from there — at 100 TB partitions the fold would
# be minutes per task vs milliseconds of tax. 8 MB sits safely past
# the measured break-even.
MINHASH_ARROW_MIN_BYTES = 8 * 1024 * 1024


def _minhash_auto_arrow(df: DataFrame) -> bool:
    """Pick the signature formulation from the optimizer's size
    estimate (driver-only, no job): Arrow/numpy above
    MINHASH_ARROW_MIN_BYTES, the interpreted HOF fold below. Unknown
    size estimates err toward Arrow — the scale posture."""
    try:
        est = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return True
    return est >= MINHASH_ARROW_MIN_BYTES


def banded_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int = 32,
    bands: int = 8,
    k_shingle: int = 3,
    use_arrow: bool | None = None,
) -> DataFrame:
    """(id, signature, band, bhash): one row per document per band.

    The banded form is both the self-join input (minhash_lsh_candidates)
    and the PERSISTED INDEX layout (write_minhash_index) — identical
    parameters produce identical band hashes forever, so an index built
    in January matches a probe in June.

    r15: the signature stage has two BIT-IDENTICAL formulations —
    the interpreted HOF fold (`minhash_signature`) and the Arrow/numpy
    pass (`minhash_signature_frame`); `use_arrow=None` (default) picks
    by input size (`_minhash_auto_arrow`: the Python boundary's fixed
    ~0.2 s/plan tax only pays for itself past ~8 MB of input). Band
    explode + band hash stay JVM expressions either way (8 short-string
    hashes per row over the already-materialized signature). Identity
    is pinned by tests/test_minhash_arrow.py, so the arm choice can
    never change emitted pairs.
    """
    if num_perm % bands != 0:
        raise ValueError(f"num_perm ({num_perm}) must be divisible by bands ({bands})")
    rows_per_band = num_perm // bands
    if use_arrow is None:
        use_arrow = _minhash_auto_arrow(df)
    if use_arrow:
        sig = minhash_signature_frame(df, text_col, id_col, num_perm, k_shingle)
    else:
        sig = minhash_signature(df, text_col, num_perm, k_shingle).select(
            F.col(id_col).alias("id"), "signature"
        )
    return sig.select(
        "id",
        "signature",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}),"
                f" b -> named_struct('band', b,"
                f" 'bhash', xxhash64(array_join(slice(signature, b * {rows_per_band} + 1, {rows_per_band}), ','), 42)))"
            )
        ).alias("bb"),
    ).select("id", "signature", F.col("bb.band").alias("band"), F.col("bb.bhash").alias("bhash"))


def _cap_buckets(banded: DataFrame, max_bucket: int | None) -> DataFrame:
    """Boilerplate defense: drop oversized (band, bhash) buckets before
    any join. The count is a window over the join key itself, so the
    extra pass reuses the same hash-partitioning the join needs anyway.
    Deterministic: whole buckets, never sampled members."""
    if max_bucket is None:
        return banded
    bw = Window.partitionBy("band", "bhash")
    return (
        banded.withColumn("__bsize", F.count("*").over(bw))
        .filter(F.col("__bsize") <= max_bucket)
        .drop("__bsize")
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int = 32,
    bands: int = 8,
    k_shingle: int = 3,
    min_jaccard: float = 0.5,
    max_bucket: int = 64,
) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash LSH.

    Pipeline: signature → explode into ``bands`` band-hashes →
    self-equi-join on (band, band_hash) with id<id → estimate Jaccard
    from full signatures → filter. Returns
    (id_a, id_b, est_jaccard) with id_a < id_b, deduplicated.

    Scale: the join key is a 64-bit band hash; the shuffled payload is
    (id, signature) only. Skewed buckets (boilerplate text) are the
    known hazard: a bucket of m members yields m² join output, so one
    bucket of 10⁶ identical-boilerplate docs is 10¹² pairs. Buckets
    larger than ``max_bucket`` are dropped BEFORE the self-join
    (deterministic: whole buckets, never sampled members). Pairs that
    also collide in a normal-sized band are still found; a corpus-wide
    boilerplate cluster is exactly what fingerprint_dedup already
    collapses more cheaply. Set ``max_bucket=None`` to disable.
    """
    banded = banded_signatures(df, text_col, id_col, num_perm, bands, k_shingle)
    banded = _cap_buckets(banded, max_bucket)
    left = banded.alias("l")
    right = banded.alias("r")
    est = F.expr(
        "aggregate(zip_with(sig_a, sig_b, (x, y) -> if(x = y, 1, 0)), 0, (acc, v) -> acc + v)"
        f" / cast({num_perm} as double)"
    )
    # Estimate + threshold BEFORE the pair-dedup: recomputing the
    # 32-element zip for a pair that collides in several bands is
    # cheaper than shuffling both 256-byte signatures through the
    # dropDuplicates exchange — the dedup then moves only (id, id, est).
    return (
        left.join(right, on=["band", "bhash"], how="inner")
        .filter(F.col("l.id") < F.col("r.id"))
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.signature").alias("sig_a"),
            F.col("r.signature").alias("sig_b"),
        )
        .withColumn("est_jaccard", F.round(est, 4))
        .filter(F.col("est_jaccard") >= min_jaccard)
        .select("id_a", "id_b", "est_jaccard")
        .dropDuplicates(["id_a", "id_b"])
    )


def simhash_signature(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """64-bit SimHash over tokens; returns (id, simhash bigint).

    bit j of the signature = sign of sum over tokens of ±1 according to
    bit j of xxhash64(token). Expressed as nested higher-order
    functions — heavy constant factor (64 × tokens adds per row) but
    fully JVM-side and shuffle-free.

    Tokens are hashed once into an array column, then ONE aggregate
    pass maintains all 64 bit-sums (state = 64-long array) — the
    per-bit form (64 aggregates, each re-tokenizing) costs 64× the
    split/hash work per row.
    """
    df = _fan_out_cpu_bound(df)
    toks = f"split(trim(regexp_replace(lower({text_col}), '\\\\s+', ' ')), ' ')"
    df = df.withColumn("__th", F.expr(f"transform({toks}, t -> xxhash64(t, 42))"))
    bit_sums = (
        "aggregate(__th, array_repeat(0L, 64),"
        " (acc, h) -> zip_with(acc, sequence(0, 63),"
        " (s, j) -> s + if((shiftright(h, j) & 1) = 1, 1L, -1L)))"
    )
    sig = (
        f"aggregate(zip_with({bit_sums}, sequence(0, 63), (s, j) -> if(s > 0, shiftleft(1L, j), 0L)),"
        f" 0L, (acc, v) -> acc + v)"
    )
    return df.select(F.col(id_col).alias("id"), F.expr(sig).alias("simhash"))


def simhash_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    max_bucket: int = 1024,
) -> DataFrame:
    """Near-dup candidates whose SimHashes differ in ≤ max_hamming bits.

    Blocking: split the 64-bit signature into 4 × 16-bit chunks; any
    pair within Hamming ≤ 3 shares at least one chunk (pigeonhole), so
    an equi-join per chunk has full recall. Returns
    (id_a, id_b, hamming).

    Chunk keys are only 16 bits, so buckets grow ~n/65536 on a uniform
    corpus and quadratically on boilerplate; buckets above
    ``max_bucket`` are dropped before the self-join (same defense and
    caveats as minhash_lsh_candidates). ``max_bucket=None`` disables.
    """
    sig = simhash_signature(df, text_col, id_col)
    return hamming_candidates(sig, "id", "simhash", max_hamming, max_bucket)


def hamming_candidates(
    sig_df: DataFrame,
    id_col: str = "id",
    sig_col: str = "simhash",
    max_hamming: int = 3,
    max_bucket: int | None = 1024,
) -> DataFrame:
    """Pairs of rows whose 64-bit signatures differ in ≤ ``max_hamming``
    bits, for ANY signature family (text SimHash, image dHash, …).

    Blocking: split the signature into ``max_hamming + 1`` chunks — a
    pair within the Hamming budget must agree on at least one chunk
    (pigeonhole), so per-chunk equi-joins have FULL recall and the
    cross product never materializes. Chunk widths are 64 // n_chunks
    bits (the last chunk absorbing the remainder), so the bucket-skew
    and cap semantics match `simhash_candidates` (which delegates
    here). Returns (id_a, id_b, hamming)."""
    n_chunks = max_hamming + 1
    width = 64 // n_chunks
    pieces = []
    for c in range(n_chunks):
        w = width if c < n_chunks - 1 else 64 - width * (n_chunks - 1)
        if w >= 64:
            # max_hamming=0: one 64-bit chunk = the whole signature.
            # (2^64-1)L would overflow the signed BIGINT literal; the
            # unmasked value IS the chunk key (exact-duplicate join).
            key = sig_col
        else:
            key = f"shiftright({sig_col}, {c * width}) & {(1 << w) - 1}L"
        pieces.append(f"named_struct('chunk', {c}, 'ckey', {key})")
    chunked = sig_df.select(
        F.col(id_col).alias("id"),
        F.col(sig_col).alias("__sig"),
        F.explode(F.expr(f"array({', '.join(pieces)})")).alias("cc"),
    ).select("id", "__sig", F.col("cc.chunk").alias("chunk"), F.col("cc.ckey").alias("ckey"))
    if max_bucket is not None:
        cw = Window.partitionBy("chunk", "ckey")
        chunked = (
            chunked.withColumn("__bsize", F.count("*").over(cw))
            .filter(F.col("__bsize") <= max_bucket)
            .drop("__bsize")
        )
    l, r = chunked.alias("l"), chunked.alias("r")
    hamming = F.expr("bit_count(l.__sig ^ r.__sig)")
    return (
        l.join(r, on=["chunk", "ckey"], how="inner")
        .filter(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"), hamming.alias("hamming"))
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


# -- incremental dedup against a persisted index ------------------------

def write_minhash_index(
    df: DataFrame,
    text_col: str,
    id_col: str,
    path: str,
    num_perm: int = 32,
    bands: int = 8,
    k_shingle: int = 3,
    mode: str = "append",
) -> None:
    """Persist the banded signature index for a corpus (or a new batch
    of it — ``mode='append'`` grows the index incrementally).

    At 100 TB you sign each document ONCE, when it arrives; dedup of a
    new batch is then a probe against this table, never a recompute of
    the whole corpus. Layout: parquet partitioned by ``band`` so a
    probe prunes to the bands it hashes into; only (id, signature,
    bhash) is stored — document bodies never enter the index.
    """
    banded_signatures(df, text_col, id_col, num_perm, bands, k_shingle).write.mode(
        mode
    ).partitionBy("band").parquet(path)


def probe_minhash_index(
    new_docs: DataFrame,
    index: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int = 32,
    bands: int = 8,
    k_shingle: int = 3,
    min_jaccard: float = 0.5,
    max_bucket: int = 64,
) -> DataFrame:
    """Near-duplicates of ``new_docs`` against an existing corpus index
    (a DataFrame — ``spark.read.parquet(index_path)`` or an in-plan
    ``banded_signatures`` frame). Returns (new_id, index_id,
    est_jaccard), est ≥ ``min_jaccard``, self-matches dropped (a
    re-submitted document is already in the index under its own id).

    Scale: only the NEW batch is signed (typically ≪ corpus); the join
    is an equi-join on (band, bhash) — with a 10⁹-doc index and a
    10⁶-doc batch, the shuffle moves the batch's bands plus matching
    index buckets only. Parameters must equal the index's build
    parameters; ``max_bucket`` caps both sides' buckets (same
    boilerplate defense as minhash_lsh_candidates).
    """
    new_banded = _cap_buckets(
        banded_signatures(new_docs, text_col, id_col, num_perm, bands, k_shingle),
        max_bucket,
    ).alias("n")
    idx = _cap_buckets(index, max_bucket).alias("i")
    est = F.expr(
        "aggregate(zip_with(sig_a, sig_b, (x, y) -> if(x = y, 1, 0)), 0, (acc, v) -> acc + v)"
        f" / cast({num_perm} as double)"
    )
    return (
        new_banded.join(idx, on=["band", "bhash"], how="inner")
        .filter(F.col("n.id") != F.col("i.id"))
        .select(
            F.col("n.id").alias("new_id"),
            F.col("i.id").alias("index_id"),
            F.col("n.signature").alias("sig_a"),
            F.col("i.signature").alias("sig_b"),
        )
        .withColumn("est_jaccard", F.round(est, 4))
        .filter(F.col("est_jaccard") >= min_jaccard)
        .select("new_id", "index_id", "est_jaccard")
        .dropDuplicates(["new_id", "index_id"])
    )


def jaccard_prefix_join(
    docs: DataFrame,
    tau: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_pairs: int | None = None,
) -> DataFrame:
    """EXACT all-pairs token-set Jaccard >= ``tau`` via
    frequency-ordered prefix filtering (the PPJoin family — Xiao et
    al., "Efficient Similarity Joins for Near Duplicate Detection",
    WWW'08 — public literature). MinHash/SimHash produce candidates
    probabilistically; this join is exact with NO false negatives, at
    the cost that ``tau`` must be high enough for the prefix filter to
    bite.

    Principle: order every doc's distinct tokens by ascending global
    frequency (ties by token); two sets with Jaccard >= tau must share
    at least one token within each other's first
    |d| - ceil(tau*|d|) + 1 tokens. So candidates = equi-join on
    PREFIX tokens only — and because the ordering puts the RAREST
    tokens in prefixes, join buckets are df-bounded for exactly the
    tokens most likely to be in one, the opposite skew profile of a
    naive token join. A length filter (|b| >= ceil(tau*|a|)) prunes
    before verification; verification re-joins the two full sorted
    arrays and computes exact overlap with a set intersection.

    Shuffles: token-frequency groupBy, per-doc sort groupBy, prefix
    explode + equi-join on (token), pair distinct, two id-keyed joins
    for verification. Candidate count is sum of per-prefix-token df²
    — bounded because prefixes hold rare tokens; no quadratic term on
    frequent tokens ever forms.

    On a DEGENERATE corpus (tiny shared vocabulary, near-uniform
    texts) the RESULT itself is quadratic — no algorithm fixes that,
    the output is the problem. ``max_pairs`` guards it: when set, a
    cheap pre-flight estimate sums C(prefix_df, 2) over the prefix
    token histogram (an upper bound on candidate pairs, one scalar
    aggregation over data this join builds anyway) and raises
    ValueError when the bound exceeds ``max_pairs`` — so a 100 TB run
    on a degenerate corpus fails loudly up front instead of writing a
    quadratic output. Default None keeps the plan lazy and unchanged.

    Output: (id_a, id_b, jaccard4) with id_a < id_b, jaccard
    floor-rounded at 4 decimals, only pairs >= ``tau``."""
    if not 0.0 < tau <= 1.0:
        raise ValueError("tau must be in (0, 1]")
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(F.split(normalize_text(text_col), " "))).alias(
            "token"
        ),
    )
    freq = toks.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    ordered = (
        toks.join(freq, "token")
        .groupBy("id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("df"), F.col("token")))
            ).alias("__o")
        )
        .select(
            "id",
            F.expr("transform(__o, x -> x.token)").alias("toks"),
            F.size("__o").alias("len"),
        )
    )
    prefix_len = (
        F.col("len") - F.ceil(F.lit(tau) * F.col("len")).cast("int") + F.lit(1)
    )
    pref = ordered.select(
        "id",
        "len",
        F.explode(F.slice("toks", 1, prefix_len)).alias("token"),
    )
    if max_pairs is not None:
        # upper bound on candidates: every unordered pair within each
        # prefix-token bucket. One scalar agg over `pref`; rare-token
        # prefixes keep these dfs small on natural vocabularies, so a
        # blown bound is a real degenerate-corpus signal, not noise.
        est = (
            pref.groupBy("token")
            .agg(F.count(F.lit(1)).alias("pdf"))
            .select(
                F.sum(F.col("pdf") * (F.col("pdf") - 1) / 2).alias("bound")
            )
            .collect()[0]["bound"]
        )
        est = int(est or 0)
        if est > max_pairs:
            raise ValueError(
                f"jaccard_prefix_join: candidate-pair upper bound {est} exceeds "
                f"max_pairs={max_pairs} — the corpus vocabulary is too uniform "
                f"for tau={tau} (the OUTPUT would be near-quadratic); raise tau, "
                "pre-dedup with minhash_lsh, or raise max_pairs explicitly"
            )
    a, b = pref.alias("a"), pref.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.id") < F.col("b.id"))
            # length filter: |b| in [ceil(tau*|a|), |a|/tau] is implied
            # by symmetry; one side suffices since a<b is id-, not
            # size-ordered — apply both bounds explicitly
            & (F.col("b.len") * F.lit(tau) <= F.col("a.len"))
            & (F.col("a.len") * F.lit(tau) <= F.col("b.len")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    ta = ordered.select(F.col("id").alias("id_a"), F.col("toks").alias("toks_a"))
    tb = ordered.select(F.col("id").alias("id_b"), F.col("toks").alias("toks_b"))
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    uni = F.size("toks_a") + F.size("toks_b") - inter
    jac = inter.cast("double") / uni
    return (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .filter(jac >= F.lit(tau))
        .select(
            "id_a",
            "id_b",
            (F.floor(jac * 10_000 + F.lit(0.5)) / 10_000).alias("jaccard4"),
        )
    )
