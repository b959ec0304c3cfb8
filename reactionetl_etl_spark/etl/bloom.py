"""Per-file Bloom filters for manifest-level file skipping.

Min/max stats (`snapshot_scan`) prune range predicates on CLUSTERED
columns — but a point lookup on a high-cardinality, unclustered key
(order id, doc id, user id) matches every file's [min, max] and prunes
nothing. The lakehouse answer (Delta/Iceberg both ship it) is a small
Bloom filter per (file, column) committed with the manifest: an
equality predicate then touches only the files whose filter MIGHT
contain the key — O(matching files + fpp·files) instead of O(table).

Design constraints this implementation honors:
- The hash is Spark's `xxhash64` (seed 42), computed EXECUTOR-side on
  the column during the post-write read-back; the probe hashes its
  literal with the same Spark expression, so builder and prober can
  never drift. Bit placement is classic double hashing
  (Kirsch–Mitzenmacher: idx_i = h1 + i·h2 mod m), derived from the one
  64-bit hash — no second hash function needed.
- Filters are built DISTRIBUTED (one `applyInPandas` over the new
  files keyed by file path, vectorized numpy bit-setting); only the
  finished ~kilobyte bitsets travel to the driver for the manifest.
  Nothing row-scale ever collects.
- Sizing uses the standard m = -n·ln(p)/ln(2)², k = m/n·ln(2) with n =
  the file's ROW count (an upper bound on distincts — conservative:
  more bits than needed, never fewer).
- Absent/oversized filters degrade to "keep the file" — pruning is
  always conservative, like the min/max path.
"""

from __future__ import annotations

import base64
import math

import numpy as np

# Spark's xxhash64 default seed — pinned so builder and probe agree.
XXHASH_SEED = 42
DEFAULT_FPP = 0.01
# Cap a single filter at 256 KiB of bits: beyond that (≈1.7M rows/file
# at 1% fpp) the manifest bloats faster than skipping pays; such files
# simply carry no filter for that column.
MAX_BITS = 256 * 1024 * 8


def bloom_params(n_rows: int, fpp: float = DEFAULT_FPP) -> tuple[int, int]:
    """(m_bits, k_hashes) for ``n_rows`` insertions at ``fpp``."""
    n = max(int(n_rows), 1)
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = max(64, (m + 63) // 64 * 64)  # whole 64-bit words
    k = max(1, int(round(m / n * math.log(2))))
    return m, k


def _indices(h: np.ndarray, m: int, k: int) -> np.ndarray:
    """Double-hashed bit indices, shape (len(h), k). h is int64 (Spark
    xxhash64 output); arithmetic in uint64 so overflow wraps."""
    hu = h.astype(np.uint64)
    h1 = hu % np.uint64(m)
    h2 = ((hu >> np.uint64(33)) | np.uint64(1)) % np.uint64(m)
    ks = np.arange(k, dtype=np.uint64)
    return (h1[:, None] + ks[None, :] * h2[:, None]) % np.uint64(m)


def build_bloom(hashes: np.ndarray, m: int, k: int) -> bytes:
    """Bitset bytes (little-endian words) with every hash inserted."""
    bits = np.zeros(m // 8, dtype=np.uint8)
    idx = _indices(np.asarray(hashes, dtype=np.int64).ravel(), m, k).ravel()
    np.bitwise_or.at(bits, (idx // 8).astype(np.int64), (1 << (idx % 8)).astype(np.uint8))
    return bits.tobytes()


def bloom_may_contain(bits: bytes, m: int, k: int, h: int) -> bool:
    idx = _indices(np.array([h], dtype=np.int64), m, k).ravel()
    arr = np.frombuffer(bits, dtype=np.uint8)
    byte = (idx // 8).astype(np.int64)
    mask = (1 << (idx % 8)).astype(np.uint8)
    return bool(np.all((arr[byte] & mask) != 0))


def encode_bloom(m: int, k: int, bits: bytes) -> dict:
    """JSON-safe manifest entry."""
    return {"m": m, "k": k, "bits": base64.b64encode(bits).decode("ascii")}


def decode_bloom(entry: dict) -> tuple[int, int, bytes]:
    return entry["m"], entry["k"], base64.b64decode(entry["bits"])
