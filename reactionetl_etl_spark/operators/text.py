"""Text-analysis operators for training-data pipelines.

Everything here is built from `pyspark.sql.functions` string/array
expressions — per-document work parallelizes across partitions with no
shuffle; the only shuffles are the final aggregations on small keys
(lang, source). No Python UDFs in any hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tiny per-language marker sets for the n-gram/stopword language-ID
# heuristic. Deliberately minimal — real pipelines plug in fastText or
# CLD3 via a pandas UDF; the heuristic keeps everything JVM-side.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to"),
    "de": ("der", "die", "und", "das", "ein"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "los", "las", "una", "y"),
}

# A BPE-ish tokenizer regex: word pieces, numbers, or single
# non-space symbols — a public approximation of GPT-2-style pretokenization.
BPE_ISH_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def tokens(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def token_count(col) -> Column:
    return F.size(tokens(col))


def regex_token_count(col, pattern: str = BPE_ISH_PATTERN) -> Column:
    """Token count under a BPE-ish pretokenization regex."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0)))


def stopword_ratio(col, stopwords: tuple[str, ...] = LANG_MARKERS["en"]) -> Column:
    """Fraction of whitespace tokens that are stopwords."""
    toks = tokens(col)
    sw = F.array(*[F.lit(s) for s in stopwords])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return hits / F.greatest(F.size(toks), F.lit(1)).cast("double")


def unique_token_ratio(col) -> Column:
    toks = tokens(col)
    return F.size(F.array_distinct(toks)) / F.greatest(F.size(toks), F.lit(1)).cast("double")


def quality_score(col) -> Column:
    """Heuristic document quality in [0, 1]:
    0.4·length-score + 0.3·lexical-diversity + 0.3·(1 − stopword excess).

    Mirrors the length/punctuation/stopword-ratio family of filters
    used by public pretraining pipelines (C4, Gopher rules), expressed
    as one Catalyst expression tree.

    Quantized via floor(x·10⁴ + 0.5)/10⁴ instead of round(): floor on
    the shared binary double is engine-independent, while round()
    differs between Spark (shortest-decimal HALF_UP) and other engines
    (binary-value rounding) exactly at .00005 boundaries.
    """
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c).cast("double")
    length_score = F.least(n / F.lit(500.0), F.lit(1.0))
    diversity = unique_token_ratio(c)
    sw_excess = F.greatest(stopword_ratio(c) - F.lit(0.4), F.lit(0.0))
    raw = F.lit(0.4) * length_score + F.lit(0.3) * diversity + F.lit(0.3) * (F.lit(1.0) - sw_excess)
    return F.floor(raw * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)


_ROLL_P = 1_000_000_007  # modulus keeps acc*31 + h < 2^36: ANSI-safe


def rolling_fingerprint(col, cross_engine: bool = False) -> Column:
    """Order-sensitive document fingerprint: polynomial rolling hash
    over per-token hashes, modulo a 30-bit prime (no int64 wrap-around —
    Spark 4's ANSI mode treats overflow as an error). Stable across
    partitionings; cheap incremental re-fingerprinting.

    Token hash: xxhash64 by default (fastest, JVM-side, Spark-only);
    ``cross_engine=True`` hashes via the first 8 md5 hex chars instead,
    which any engine reproduces bit-for-bit (DuckDB:
    ``('0x' || substring(md5(t), 1, 8))::BIGINT``) — same fold, same
    prime, fully oracle-checkable. acc·31 + h stays < 2³⁵ + 2³² ≪ 2⁶³,
    so the fold is ANSI-overflow-safe in both variants."""
    toks = tokens(col)
    if cross_engine:
        tok_hash = lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")  # noqa: E731
    else:
        tok_hash = lambda t: F.pmod(F.xxhash64(t, F.lit(42)), F.lit(_ROLL_P).cast("long"))  # noqa: E731
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * F.lit(31).cast("long") + tok_hash(t))
        % F.lit(_ROLL_P).cast("long"),
    )


def lang_scores(col) -> Column:
    """Map<lang, marker hit count> for the language-ID heuristic."""
    toks = tokens(col)
    entries = []
    for lang, markers in LANG_MARKERS.items():
        sw = F.array(*[F.lit(s) for s in markers])
        entries.append(F.struct(F.lit(lang).alias("lang"), F.size(F.filter(toks, lambda t: F.array_contains(sw, t))).alias("hits")))
    return F.array(*entries)


def lang_id(col) -> Column:
    """argmax of marker hits; 'und' (undetermined) when no marker fires.
    Ties break by language code order for determinism."""
    scored = lang_scores(col)
    best = F.aggregate(
        scored,
        F.struct(F.lit("und").alias("lang"), F.lit(0).alias("hits")),
        lambda acc, s: F.when(s["hits"] > acc["hits"], s).otherwise(acc),
    )
    return best["lang"]


# PII patterns, restricted to syntax RE2 and Java regex interpret
# identically (character classes + bounded quantifiers; no backrefs,
# no lookaround) so Spark results stay oracle-checkable cross-engine.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+\d{1,2}-\d{3}-\d{4}",
}


def pii_count(col, kind: str) -> Column:
    """Number of matches of one PII pattern in a text column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(PII_PATTERNS[kind]), F.lit(0)))


def redact_pii(col) -> Column:
    """Replace every PII match with a `<KIND>` placeholder.

    Pure `regexp_replace` chain — stays inside whole-stage codegen, so
    redaction streams through the scan with zero shuffle at any scale.
    """
    c = F.col(col) if isinstance(col, str) else col
    for kind, pat in PII_PATTERNS.items():
        c = F.regexp_replace(c, pat, f"<{kind.upper()}>")
    return c


def token_ngrams(df: DataFrame, text_col: str, k: int) -> DataFrame:
    """Explode a frame into one row per k-token shingle of the
    NORMALIZED text (lowercase, collapsed whitespace), as column `gram`.

    The token array is materialized as a real column before the
    transform() so split() runs once per row — embedding the split
    inside the per-shingle lambda recomputes it per element (O(tokens²)
    per row; see the MinHash signature note in operators/dedup.py).
    Docs shorter than k tokens emit one truncated shingle, matching
    operators.dedup.shingle.
    """
    toks = F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " "
    )
    grams = F.expr(
        f"transform(sequence(1, greatest(size(__toks) - {k - 1}, 1)),"
        f" i -> array_join(slice(__toks, i, {k}), ' '))"
    )
    return (
        df.withColumn("__toks", toks)
        .withColumn("gram", F.explode(grams))
        .drop("__toks")
    )


def token_ngrams_pos(df: DataFrame, text_col: str, k: int) -> DataFrame:
    """`token_ngrams` with provenance: one row per k-token shingle AND
    its 1-based token position (`pos`, `gram`). The positioned variant
    exists for span-level work — knowing WHERE a duplicated shingle
    sits inside the document, not just that it exists."""
    toks = F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " "
    )
    pairs = F.expr(
        f"transform(sequence(1, greatest(size(__toks) - {k - 1}, 1)),"
        f" i -> struct(i AS pos, array_join(slice(__toks, i, {k}), ' ') AS gram))"
    )
    d = df.withColumn("__toks", toks).withColumn("__pg", F.explode(pairs))
    return d.select(
        *df.columns, F.col("__pg.pos").alias("pos"), F.col("__pg.gram").alias("gram")
    ).drop("__toks")


def _token_ngram_hashes_pos(df: DataFrame, text_col: str, id_col: str, k: int) -> DataFrame:
    """(id, pos, __gh, __gh2): one row per k-token shingle position with
    the shingle's digest — xxhash64 over the token-array SLICE itself,
    never a joined string (r14). The span operators only ever compare
    shingles for EQUALITY, and slice equality ⟺ joined-string equality
    (tokens are split on the join character), so building the
    per-shingle string and hashing it was pure constant-factor cost:
    one O(k·token_len) string allocation per shingle per row. Digest
    VALUES differ from the string form, but no digest ever leaves the
    plan — only equality classes do.

    r15: the digest is a PAIR of independently-seeded xxhash64 values
    (the salt literal comes FIRST, so the second hash runs the whole
    slice under a different effective seed — salting last would make
    __gh2 a pure function of __gh). One 64-bit digest carries real
    birthday-collision mass at 100 TB (~10¹⁰ distinct shingles →
    millions of expected false merges feeding a REPORTED rate metric);
    the pair restores effective 128-bit equality for 16 bytes/row on
    the wire — still half the retired 32-char md5 string."""
    toks = F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " "
    )
    # nested transform: slice ONCE per shingle (a lambda has no `let`;
    # inlining slice() under each hash materialized every window twice
    # — measured ~15% of the query back)
    pairs = F.expr(
        f"transform(transform(sequence(1, greatest(size(__toks) - {k - 1}, 1)),"
        f" i -> slice(__toks, i, {k})),"
        f" (s, j) -> struct(j + 1 AS pos, xxhash64(s) AS gh, xxhash64(7, s) AS gh2))"
    )
    d = df.select(id_col, text_col).withColumn("__toks", toks).withColumn(
        "__pg", F.explode(pairs)
    )
    return d.select(
        id_col,
        F.col("__pg.pos").alias("pos"),
        F.col("__pg.gh").alias("__gh"),
        F.col("__pg.gh2").alias("__gh2"),
    )


def duplicated_span_extents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """Per-document EXTENTS of cross-document duplicated content: every
    maximal token range covered by k-token shingles that also appear in
    at least one OTHER document — the span-level answer behind
    `cross_doc_dup_rate`'s scalar, and the input an exact-substring
    dedup pass needs to cut duplicated regions instead of whole docs.

    Output: (id, span_start, span_end, span_tokens), token positions
    1-based inclusive; overlapping/adjacent covered ranges merge.

    Scale: shingles shuffle as paired 16-byte xxhash64 digests (never
    gram strings — r14: hashed straight off the token-array slice, no
    per-shingle string build; r15: a second independently-seeded hash
    restores effective 128-bit equality — one 64-bit digest has real
    birthday-collision mass at 100 TB); "appears in ≥2 distinct documents" is
    decided by ONE window over the digest partition (min(id) ≠ max(id)
    ⟺ countDistinct(id) ≥ 2) instead of a count aggregate joined back
    — the digest rows cross the wire once, not twice, and the join
    disappears; the island merge is a per-document window — bounded by
    single-document token counts, so no hot-key reducer. Because every
    covered interval has the same length k, island starts reduce to
    `pos > lag(pos) + k` (the running-max-end of general interval
    merging is unnecessary), one lag + one running sum."""
    from pyspark.sql import Window

    grams = _token_ngram_hashes_pos(df, text_col, id_col, k)
    wg = Window.partitionBy("__gh", "__gh2")
    dup_pos = (
        grams.withColumn("__min_id", F.min(id_col).over(wg))
        .withColumn("__max_id", F.max(id_col).over(wg))
        .filter(F.col("__min_id") != F.col("__max_id"))
        .select(id_col, "pos")
        # hash-cluster by doc BEFORE the (id, pos) dedup: a partitioning
        # on id satisfies the dedup's (id, pos) clustering AND the
        # extents window's id clustering, so one exchange serves both
        # (was: distinct's (id, pos) exchange + the window's id exchange)
        .repartition(id_col)
        .dropDuplicates([id_col, "pos"])
    )
    return _covered_extents(dup_pos, id_col, k)


def _covered_extents(dup_pos: DataFrame, id_col: str, k: int) -> DataFrame:
    """Merge k-wide covered intervals starting at each (id, pos) into
    maximal extents (span_start, span_end, span_tokens). Because every
    interval has the same width, a new island starts exactly when
    `pos > lag(pos) + k` — one lag + one running sum per document."""
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy("pos")
    new_island = F.when(
        F.lag("pos").over(w).isNull() | (F.col("pos") > F.lag("pos").over(w) + k), 1
    ).otherwise(0)
    islanded = dup_pos.withColumn("__new", new_island).withColumn(
        "__isl", F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        islanded.groupBy(id_col, "__isl")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + (k - 1)).alias("span_end"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_tokens"),
        )
    )


def cut_duplicated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """Exact-substring deduplication as an ACTION (the Lee et al. 2022
    policy): for every k-token shingle shared across documents, the
    smallest-id document OWNS it; every other document gets the covered
    token ranges CUT from its text, so repeated boilerplate survives
    exactly once in the corpus instead of per-copy. Whole-doc dedup
    (`dedup_exact_documents` / minhash) can't do this — most web
    duplication is span-level (quoted passages, templates, licenses),
    not whole-document.

    Output per input row: (id, n_tokens_before, n_tokens_cut,
    text_dedup) where text_dedup is the NORMALIZED text (lowercase,
    collapsed whitespace — the shingling normalization) with cut
    ranges removed; a fully-duplicated non-owner doc comes back empty.

    Scale: shingles shuffle as paired 16-byte digests (r14: hashed
    straight off the token-array slice, no per-shingle string build;
    r15: effective 128-bit equality — see _token_ngram_hashes_pos);
    ownership and
    the shared-across-docs test are ONE window over the digest
    partition (owner = min(id); shared ⟺ min(id) ≠ max(id) ⟺
    countDistinct(id) ≥ 2) instead of a min+countDistinct aggregate
    joined back to the gram rows — the digest rows cross the wire once,
    not twice, the join disappears, and countDistinct's expand phase
    with it; per-doc cut extents are FEW (merged islands), so the
    rebuild is an in-row `filter()` over the token array against a
    broadcast-sized extent list per row — no token-level shuffle ever
    happens."""
    from pyspark.sql import Window

    grams = _token_ngram_hashes_pos(df, text_col, id_col, k)
    wg = Window.partitionBy("__gh", "__gh2")
    dup_pos = (
        grams.withColumn("__owner", F.min(id_col).over(wg))
        .withColumn("__max_id", F.max(id_col).over(wg))
        .filter(
            (F.col("__owner") != F.col("__max_id"))
            & (F.col(id_col) != F.col("__owner"))
        )
        .select(id_col, "pos")
        # one id-clustered exchange serves the dedup, the extents
        # window AND the cuts aggregate below (see duplicated_span_extents)
        .repartition(id_col)
        .dropDuplicates([id_col, "pos"])
    )
    cuts = (
        _covered_extents(dup_pos, id_col, k)
        .groupBy(id_col)
        .agg(F.collect_list(F.struct("span_start", "span_end")).alias("__cuts"))
    )
    toks = F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " "
    )
    kept = F.expr(
        "filter(transform(__toks, (t, i) -> struct(t AS t, i + 1 AS p)),"
        " x -> !exists(__cuts, c -> x.p >= c.span_start AND x.p <= c.span_end))"
    )
    d = df.select(id_col, text_col).withColumn("__toks", toks).join(
        cuts, on=id_col, how="left"
    )
    kept_tokens = F.when(F.col("__cuts").isNull(), F.col("__toks")).otherwise(
        F.expr("transform(__kept, x -> x.t)")
    )
    return (
        d.withColumn("__kept", F.when(F.col("__cuts").isNull(), F.lit(None)).otherwise(kept))
        .withColumn("__out", kept_tokens)
        .select(
            id_col,
            F.size("__toks").alias("n_tokens_before"),
            (F.size("__toks") - F.size("__out")).alias("n_tokens_cut"),
            F.array_join("__out", " ").alias("text_dedup"),
        )
    )


def chunk_documents(
    df: DataFrame,
    text_col: str,
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split documents into fixed-token chunks with overlap — the
    context-window packing step of every pretraining/RAG pipeline.

    Chunk starts are 1, 1+stride, 1+2·stride, … up to
    max(n_tokens − overlap, 1) (overlap = chunk_tokens − stride), so
    every token is covered and only the last chunk may run short.
    Emits (…original columns…, chunk_idx, chunk_text, chunk_n_tokens).
    One explode per row, zero shuffle — chunking streams through the
    scan at any corpus size.
    """
    if not 0 < stride <= chunk_tokens:
        raise ValueError("need 0 < stride <= chunk_tokens")
    overlap = chunk_tokens - stride
    toks = F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " "
    )
    starts = F.expr(
        f"sequence(1, greatest(size(__toks) - {overlap}, 1), {stride})"
    )
    return (
        df.withColumn("__toks", toks)
        .withColumn("__start", F.explode(starts))
        .withColumn("chunk_idx", ((F.col("__start") - 1) / stride).cast("long"))
        .withColumn(
            "chunk_text",
            F.array_join(F.expr(f"slice(__toks, __start, {chunk_tokens})"), " "),
        )
        .withColumn(
            "chunk_n_tokens", F.expr(f"size(slice(__toks, __start, {chunk_tokens}))")
        )
        .drop("__toks", "__start")
    )


def ngram_contamination(
    train: DataFrame,
    eval_set: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 4,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Benchmark-contamination check: (train_id, eval_id, n_shared)
    for every train/eval document pair sharing ≥1 distinct k-token
    shingle.

    Scale posture, ``broadcast_eval=True`` (default): the eval side is
    a benchmark suite — thousands of documents, not billions — so its
    distinct gram set is broadcast and the 100 TB train corpus is
    probed map-side; the train gram stream is deliberately NOT
    pre-distinct'ed (that would shuffle every gram in the corpus) —
    countDistinct after the broadcast join dedups multiplicity instead,
    so the only shuffle carries MATCHED (train_id, eval_id, gram) rows,
    which are rare by construction.

    ``broadcast_eval=False`` is the fallback for eval suites that
    exceed the broadcast threshold (a multi-benchmark union easily
    does): both sides key on the 64-bit ``xxhash64(gram)`` and meet in
    a hash-partitioned shuffle equi-join — the shuffle carries 8-byte
    digests, never the gram strings, and no side needs to fit in
    memory. ``n_shared`` then counts distinct gram HASHES; at 2⁻⁶⁴
    per-pair collision odds the count is exact for any real corpus
    (same trade as fingerprint dedup)."""
    if broadcast_eval:
        tr = token_ngrams(train, text_col, k).select(
            F.col(id_col).alias("train_id"), "gram"
        )
        ev = (
            token_ngrams(eval_set, text_col, k)
            .select(F.col(id_col).alias("eval_id"), "gram")
            .distinct()
        )
        return (
            tr.join(F.broadcast(ev), on="gram")
            .groupBy("train_id", "eval_id")
            .agg(F.countDistinct("gram").alias("n_shared"))
        )
    tr = token_ngrams(train, text_col, k).select(
        F.col(id_col).alias("train_id"), F.xxhash64("gram").alias("__gh")
    )
    # shuffle_hash hint: Catalyst can't see explode cardinality, so it
    # under-estimates the eval gram stream and would auto-broadcast it —
    # the exact misestimate this path exists to avoid.
    ev = (
        token_ngrams(eval_set, text_col, k)
        .select(F.col(id_col).alias("eval_id"), F.xxhash64("gram").alias("__gh"))
        .distinct()
        .hint("shuffle_hash")
    )
    return (
        tr.join(ev, on="__gh")
        .groupBy("train_id", "eval_id")
        .agg(F.countDistinct("__gh").alias("n_shared"))
    )


def document_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document stats frame: tokens, chars, diversity, quality."""
    return df.select(
        "*",
        token_count(text_col).alias("n_tokens"),
        F.length(text_col).alias("n_chars_computed"),
        F.round(unique_token_ratio(text_col), 4).alias("uniq_ratio"),
        F.round(stopword_ratio(text_col), 4).alias("stop_ratio"),
        quality_score(text_col).alias("quality"),
    )


def repetition_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021,
    "Scaling Language Models", appendix A1.1 — public): heavily
    repetitive documents are low-quality training data, and the
    cheapest detectors are exact self-repetition rates. Per document:

    - ``n_lines``, ``dup_line_frac`` (fraction of lines that are
      duplicates of another line in the SAME doc) and
      ``dup_line_char_frac`` (character-weighted version — one long
      duplicated line matters more than many short ones);
    - ``top_bigram`` / ``top_bigram_frac``: the most frequent word
      2-gram and the fraction of normalized characters its occurrences
      cover (ties broken lexicographically-greatest, deterministic).

    Spark shape: the line signals are pure per-row HOFs (zero
    shuffle); the bigram mode needs a per-(doc, gram) count — one
    doc-keyed explode + groupBy + row_number, all shuffles keyed on
    doc_id, never global. At 100 TB this is the same cost profile as
    any per-doc tokenize pass."""
    c = F.col(text_col)
    lines = F.split(c, "\n")
    dlines = F.array_distinct(lines)
    chars = lambda arr: F.expr(  # noqa: E731
        f"aggregate(transform({arr}, x -> length(x)), 0L, (a, b) -> a + b)"
    )
    line_stats = df.select(
        F.col(id_col),
        F.size(lines).alias("n_lines"),
        _round6(
            F.lit(1.0)
            - F.size(dlines) / F.greatest(F.size(lines), F.lit(1)).cast("double")
        ).alias("dup_line_frac"),
        lines.alias("__lines"),
        dlines.alias("__dlines"),
    ).select(
        id_col,
        "n_lines",
        "dup_line_frac",
        _round6(
            F.lit(1.0)
            - chars("__dlines") / F.greatest(chars("__lines"), F.lit(1)).cast("double")
        ).alias("dup_line_char_frac"),
    )
    norm_len = F.length(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    )
    grams = token_ngrams(
        df.select(F.col(id_col), F.col(text_col), norm_len.alias("__nlen")), text_col, 2
    )
    counts = grams.groupBy(id_col, "__nlen", "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # max(struct(cnt, gram)) == "highest count, ties to the
    # lexicographically-greatest gram" — the same deterministic pick a
    # row_number window would make, but as an ALGEBRAIC aggregate:
    # map-side combined, no per-doc sort, one exchange keyed on doc_id
    top = (
        counts.groupBy(id_col, "__nlen")
        .agg(F.max(F.struct(F.col("cnt"), F.col("gram"))).alias("__top"))
        .select(
            id_col,
            F.col("__top.gram").alias("top_bigram"),
            _round6(
                F.length("__top.gram")
                * F.col("__top.cnt")
                / F.greatest("__nlen", F.lit(1)).cast("double")
            ).alias("top_bigram_frac"),
        )
    )
    return line_stats.join(top, on=id_col, how="left")


def _round6(c: Column) -> Column:
    """floor(x·1e6 + 0.5)/1e6 — the repo's cross-engine rounding (plain
    round() diverges between Spark and DuckDB at .5 boundaries)."""
    return F.floor(c * 1_000_000 + F.lit(0.5)) / 1_000_000


def strip_html(col) -> Column:
    """Plain text out of an HTML payload — the first transform of any
    web-crawl training pipeline. Pure column expressions (JVM regex,
    zero Python): drop comments / <script> / <style> blocks (dotall,
    non-greedy, case-insensitive), strip remaining tags, decode the
    six ubiquitous entities (&amp; LAST so &amp;lt; round-trips as
    the literal '&lt;' — the standard decode order), collapse
    whitespace. A heuristic extractor, not an HTML5 parser: malformed
    markup degrades to extra whitespace, never to an error."""
    c = F.col(col) if isinstance(col, str) else col
    x = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    x = F.regexp_replace(x, r"(?is)<script\b.*?</script\s*>", " ")
    x = F.regexp_replace(x, r"(?is)<style\b.*?</style\s*>", " ")
    x = F.regexp_replace(x, r"(?s)<[^>]+>", " ")
    for ent, ch in [
        ("&nbsp;", " "),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&amp;", "&"),
    ]:
        x = F.replace(x, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(x, r"\s+", " "))


def span_corruption(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mask_rate: float = 0.15,
    span_len: int = 3,
    salt: str = "t5",
) -> DataFrame:
    """T5/UL2-style span-corruption pairs (Raffel et al. 2020 §3.1.4 —
    public): contiguous token spans are masked out of the input and
    become the target, each span replaced by a numbered sentinel:

        input : the quick <extra_id_0> over the <extra_id_1> dog
        target: <extra_id_0> brown fox jumped <extra_id_1> lazy

    Spans are HASH-seeded, not RNG-seeded: token i STARTS a span iff
    md5(salt:doc:i)'s 32-bit hex prefix falls under mask_rate/span_len
    (so the expected masked fraction is mask_rate with spans of
    span_len) — the same retry-stable determinism discipline as
    `split.hash_split`. Two runs, two sessions, two engines: identical
    pairs.

    Spark shape: pure per-row column expressions — the mask array via
    nested HOFs, the sentinel-numbered pair via ONE O(n) aggregate()
    fold per row. Zero shuffle at any scale. Returns id, n_tokens,
    n_masked, n_spans, corrupted_text, target_text."""
    if not 0.0 < mask_rate < 1.0:
        raise ValueError(f"mask_rate must be in (0,1), got {mask_rate}")
    if span_len < 1:
        raise ValueError(f"span_len must be >= 1, got {span_len}")
    thresh = format(int(mask_rate / span_len * 2**32), "08x")
    toks = F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " "
    )
    d = df.select(F.col(id_col), toks.alias("__toks"))
    d = d.withColumn(
        "__starts",
        F.expr(
            f"transform(sequence(1, size(__toks)), i -> "
            f"substring(md5(concat('{salt}', ':', cast({id_col} as string), ':', i)), 1, 8)"
            f" < '{thresh}')"
        ),
    ).withColumn(
        "__masked",
        F.expr(
            f"transform(sequence(1, size(__toks)), i -> "
            f"exists(sequence(greatest(1, i - {span_len - 1}), i),"
            f" j -> element_at(__starts, j)))"
        ),
    )
    d = d.withColumn(
        "__sstart",
        F.expr(
            "transform(sequence(1, size(__toks)), i -> element_at(__masked, i)"
            " AND (i = 1 OR NOT element_at(__masked, i - 1)))"
        ),
    )
    pair = F.expr(
        """aggregate(
             sequence(1, size(__toks)),
             named_struct('corr', cast(array() as array<string>),
                          'targ', cast(array() as array<string>),
                          'k', 0),
             (acc, i) -> named_struct(
               'corr', CASE WHEN NOT element_at(__masked, i)
                              THEN array_append(acc.corr, element_at(__toks, i))
                            WHEN element_at(__sstart, i)
                              THEN array_append(acc.corr, concat('<extra_id_', acc.k, '>'))
                            ELSE acc.corr END,
               'targ', CASE WHEN element_at(__sstart, i)
                              THEN array_append(
                                     array_append(acc.targ, concat('<extra_id_', acc.k, '>')),
                                     element_at(__toks, i))
                            WHEN element_at(__masked, i)
                              THEN array_append(acc.targ, element_at(__toks, i))
                            ELSE acc.targ END,
               'k', acc.k + IF(element_at(__sstart, i), 1, 0)),
             acc -> acc)"""
    )
    return d.select(
        id_col,
        F.size("__toks").alias("n_tokens"),
        F.expr("size(filter(__masked, x -> x))").alias("n_masked"),
        F.expr("size(filter(__sstart, x -> x))").alias("n_spans"),
        F.array_join(pair["corr"], " ").alias("corrupted_text"),
        F.array_join(pair["targ"], " ").alias("target_text"),
    )


def ngram_contamination_bloom(
    train: DataFrame,
    eval_set: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 4,
    fpp: float = 0.005,
    max_eval_grams: int = 50_000_000,
) -> DataFrame:
    """`ngram_contamination`, third scale regime: BLOOM pre-filter +
    exact verify. The broadcast path ships the eval suite's full
    distinct gram STRINGS to every executor (~tens of bytes per gram);
    the shuffle path moves the whole corpus' gram hashes. In between
    sits the classic filter-then-verify split: a Bloom filter over the
    eval grams costs ~1.2 bytes/gram at 0.5% fpp — 20-50x smaller than
    the string set — so suites far past the string-broadcast threshold
    still probe map-side; the rare bloom HITS (true matches + fpp of
    the corpus grams) then exact-join the eval grams, which removes
    every false positive, making the result IDENTICAL to the other two
    paths (the oracle does not change).

    Spark shape: one bounded driver collect of eval gram hashes
    (`max_eval_grams` guards it — a suite past that belongs on the
    shuffle path), a vectorized numpy membership test via @pandas_udf
    over the corpus gram stream (Arrow-batched, zero shuffle), and the
    existing matched-rows-only aggregation."""
    import numpy as np

    from reactionetl_etl_spark.etl.bloom import bloom_params, build_bloom
    from reactionetl_etl_spark.functions.pandas_fns import bloom_membership_udf

    ev = (
        token_ngrams(eval_set, text_col, k)
        .select(F.col(id_col).alias("eval_id"), "gram")
        .distinct()
    )
    hashes = ev.select(F.xxhash64("gram")).limit(max_eval_grams + 1).collect()
    if len(hashes) > max_eval_grams:
        raise ValueError(
            f"eval suite exceeds max_eval_grams={max_eval_grams} distinct grams — "
            "use ngram_contamination(broadcast_eval=False) (the shuffle path)"
        )
    m, kh = bloom_params(len(hashes), fpp)
    bits = build_bloom(np.array([r[0] for r in hashes], dtype=np.int64), m, kh)
    bc = train.sparkSession.sparkContext.broadcast(bits)
    might_contain = bloom_membership_udf(bc, m, kh)

    tr = token_ngrams(train, text_col, k).select(
        F.col(id_col).alias("train_id"), "gram"
    )
    candidates = tr.filter(might_contain(F.xxhash64("gram")))
    return (
        candidates.join(F.broadcast(ev), on="gram")  # exact verify kills fps
        .groupBy("train_id", "eval_id")
        .agg(F.countDistinct("gram").alias("n_shared"))
    )
