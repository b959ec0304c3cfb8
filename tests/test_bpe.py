"""BPE trainer/encoder vs an independent reference implementation."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from reactionetl_etl_spark.operators.bpe import (
    apply_bpe_merges,
    train_bpe_merges,
)


def _ref_bpe(corpus: list[str], n_merges: int, min_count: int = 2):
    """Straight-line reference BPE (same tie-break: count desc, then
    (a, b) asc) over whitespace-pretokenized lowercase text."""
    seqs = []
    for doc in corpus:
        for w in " ".join(doc.lower().split()).split(" "):
            if w:
                seqs.append(list(w))
    merges = []
    for _ in range(n_merges):
        counts = Counter()
        for s in seqs:
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += 1
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), n = best
        if n < min_count:
            break
        merges.append((a, b, n))
        new_seqs = []
        for s in seqs:
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            new_seqs.append(out)
        seqs = new_seqs
    return merges


CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "wider wider wider new new",
    "aaa aaab aaaa",  # overlap case: leftmost-greedy matters
]


def test_train_bpe_matches_reference(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    got = train_bpe_merges(df, "text", n_merges=12)
    want = _ref_bpe(CORPUS, 12)
    assert got == want
    assert len(got) > 4  # learned something real


def test_apply_bpe_encodes_like_reference(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id int, text string"
    )
    merges = train_bpe_merges(df, "text", n_merges=8)
    enc = {
        r["doc_id"]: list(r["bpe_tokens"])
        for r in apply_bpe_merges(df, merges).collect()
    }

    mlist = [(a, b) for a, b, _ in merges]

    def ref_encode(text):
        toks = []
        for w in " ".join(text.lower().split()).split(" "):
            s = list(w)
            for a, b in mlist:
                out, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                s = out
            toks.extend(s)
        return toks

    for i, t in enumerate(CORPUS):
        assert enc[i] == ref_encode(t), i
    # 'low' must have become a single token with this corpus
    assert "low" in enc[0]


def test_train_bpe_min_count_stops_early(spark):
    df = spark.createDataFrame([("ab cd",)], "text string")  # every pair unique
    assert train_bpe_merges(df, "text", n_merges=5, min_count=2) == []


def test_bpe_encode_tokens_query_witness(spark):
    """Non-circular witness for the pinned bpe_encode_tokens query: for
    the sampled docs, n_tokens and the first-8-token prefix recomputed
    with the straight-line reference encoder (driven by the SAME
    trained merges, themselves reference-checked above) must agree
    with the catalog query's output on the real corpus fixture."""
    from reactionetl_etl_spark.plans.catalog import get_query

    sfd = "/root/testdata/sf0.001"
    rows = {
        r["doc_id"]: r
        for r in get_query("bpe_encode_tokens").builder(spark, sfd).collect()
    }
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sfd}/documents.parquet")
        .filter(F.col("doc_id") % 10 == 0)
        .collect()
    }
    assert set(rows) == set(docs)

    corpus = [
        r["text"]
        for r in spark.read.parquet(f"{sfd}/documents.parquet")
        .filter(F.col("doc_id") % 4 == 0)
        .collect()
    ]
    mlist = [(a, b) for a, b, _ in _ref_bpe(corpus, 8)]

    def ref_encode(text):
        toks = []
        for w in " ".join(text.lower().split()).split(" "):
            if not w:
                continue
            s = list(w)
            for a, b in mlist:
                out, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                s = out
            toks.extend(s)
        return toks

    for did, text in docs.items():
        toks = ref_encode(text)
        r = rows[did]
        assert r["n_tokens"] == len(toks), did
        assert r["first_tokens"] == " ".join(toks[:8]), did
        assert r["n_words"] == len(" ".join(text.lower().split()).split(" ")), did


def test_bpe_fertility_by_lang_query_witness(spark):
    """Non-circular witness for the pinned bpe_fertility_by_lang query:
    per-language token/word/byte/OOV sums recomputed in straight-line
    Python — reference-trained merges, reference greedy encoder, vocab
    = training-sample charset ∪ merge products — must agree with the
    catalog query on the real corpus fixture."""
    import math

    from reactionetl_etl_spark.plans.catalog import get_query

    sfd = "/root/testdata/sf0.001"
    got = {
        r["lang"]: tuple(r)[1:]
        for r in get_query("bpe_fertility_by_lang").builder(spark, sfd).collect()
    }

    all_docs = spark.read.parquet(f"{sfd}/documents.parquet").select(
        "doc_id", "lang", "text"
    ).collect()
    train = [r["text"] for r in all_docs if r["doc_id"] % 4 == 0]
    merges = _ref_bpe(train, 8)
    mlist = [(a, b) for a, b, _ in merges]
    vocab = {a + b for a, b in mlist}
    for text in train:
        for w in " ".join(text.lower().split()).split(" "):
            vocab |= set(w)

    def ref_encode(text):
        toks = []
        for w in " ".join(text.lower().split()).split(" "):
            if not w:
                continue
            s = list(w)
            for a, b in mlist:
                out, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                s = out
            toks.extend(s)
        return toks

    agg: dict[str, list[int]] = {}
    for r in all_docs:
        norm = " ".join(r["text"].lower().split())
        toks = ref_encode(r["text"])
        rec = agg.setdefault(r["lang"], [0, 0, 0, 0, 0])
        rec[0] += 1
        rec[1] += len(norm.split(" ")) if norm else 1  # size(split('')) == 1
        rec[2] += len(toks)
        rec[3] += len(norm.replace(" ", "").encode("utf-8"))
        rec[4] += sum(1 for t in toks if t not in vocab)

    def r6(x):
        return math.floor(x * 1_000_000 + 0.5) / 1_000_000

    want = {
        lang: (
            n_docs,
            n_words,
            n_tokens,
            n_bytes,
            n_oov,
            r6(n_tokens / n_words),
            r6(n_bytes / n_tokens),
            r6(n_oov / n_tokens),
        )
        for lang, (n_docs, n_words, n_tokens, n_bytes, n_oov) in agg.items()
    }
    assert got == want
