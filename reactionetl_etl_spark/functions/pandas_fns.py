"""Scalar pandas UDFs (Arrow-vectorized row-level Python).

NOTE: no `from __future__ import annotations` here — pandas_udf infers
the eval type from the REAL type hints, and postponed evaluation turns
them into unresolvable strings.

These are the slow path by design: functions/vectors.py computes the
same things JVM-side and wins whenever an expression can. Scalar
pandas UDFs exist for transforms that genuinely need numpy/scipy —
the data crosses to Python once per Arrow batch, not per row.
"""

import numpy as np
import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def l2_norm(v: pd.Series) -> pd.Series:
    """L2 norm of an array<float> column, one numpy reduction per row
    within an Arrow batch."""
    return v.map(
        lambda arr: float(np.sqrt(np.sum(np.square(np.asarray(arr, dtype="float64")))))
    )


def bloom_membership_udf(broadcast_bits, m: int, k: int):
    """Factory: a vectorized Bloom-membership test over an int64 hash
    column (the `etl/bloom.py` double-hashing scheme). Lives here, not
    in the caller's module, because pandas_udf needs REAL type hints
    and `from __future__ import annotations` (which the operator
    modules use) turns them into unresolvable strings — the exact trap
    this module's header documents. ``broadcast_bits`` is an
    `sc.broadcast` of the filter bytes so the bitset ships once per
    executor, not once per task closure."""
    m_ = np.uint64(m)
    k_ = int(k)

    @pandas_udf("boolean")
    def might_contain(h: pd.Series) -> pd.Series:
        arr = np.frombuffer(broadcast_bits.value, dtype=np.uint8)
        hv = h.to_numpy(dtype=np.int64).astype(np.uint64)
        h1 = hv % m_
        h2 = ((hv >> np.uint64(33)) | np.uint64(1)) % m_
        ok = np.ones(len(hv), dtype=bool)
        for i in range(k_):
            idx = (h1 + np.uint64(i) * h2) % m_
            ok &= (
                arr[(idx >> np.uint64(3)).astype(np.int64)]
                & (np.uint64(1) << (idx & np.uint64(7))).astype(np.uint8)
            ) != 0
        return pd.Series(ok)

    return might_contain


@pandas_udf("double")
def trimmed_mean_micro6(v: pd.Series) -> float:
    """GROUPED_AGG pandas UDF (custom UDAF): 10%-trimmed mean — drop
    the floor(0.1·n) smallest AND largest values, average the rest.
    The robust-location aggregate Catalyst has no builtin for; each
    group's values arrive as ONE Arrow batch, partial aggregation does
    not apply (trimming is holistic — same class as exact medians).

    Cross-engine exactness: values are quantized to integer
    MICRO-UNITS (floor(v·1e6 + 0.5), int64) before summing, so the
    fold is order-independent and the single final division is the
    only float op — a numpy float sum would pairwise-accumulate in an
    order an oracle can't replicate."""
    a = np.sort(np.asarray(v.dropna(), dtype="float64"))
    n = a.size
    if n == 0:
        return None
    k = int(np.floor(0.1 * n))
    kept = a[k : n - k] if n - 2 * k > 0 else a
    micro = np.floor(kept * 1_000_000 + 0.5).astype("int64")
    return float(int(micro.sum()) / 1_000_000 / len(kept))


@pandas_udf("int")
def zlib_len(text: pd.Series) -> pd.Series:
    """Deflate-compressed byte length of a text column (zlib level 6)
    — the numerator of the compression-ratio quality signal
    (Gopher/RefinedWeb family: highly compressible text is repetitive
    boilerplate; incompressible text is noise). stdlib zlib at a FIXED
    level is deterministic for a given input AND a given zlib build
    (the container pins one — a zlib upgrade would shift lengths and
    trip the pinned contract loudly, which is the desired failure
    mode), so the derived signals pin as a value contract."""
    import zlib

    return text.map(lambda t: len(zlib.compress(t.encode("utf-8"), 6)))
