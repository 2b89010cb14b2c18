"""Constant-memory corpus membership — a distributed Bloom filter.

The third point on the exact-dedup cost curve (the Dolma pipeline's
paragraph-dedup mechanism). The engine already has two: `exact_dedup`
(a full groupBy — exact, one corpus shuffle) and the MinHash signature
store (near-dup, ~8·H bytes of persisted state per retained doc). A
Bloom digest gives O(1)-state approximate EXACT membership: ~1.2 bytes
per key at 1% FPR regardless of corpus size, probes are map-only
against a broadcast byte array (ZERO shuffle at ingest), and digests
MERGE by bitwise OR — the same mergeable-rollup property as the HLL /
count-min / weighted-sample sketches, so per-batch digests fold into
any-horizon membership with no rescan.

The price is one-sided error, and for dedup the side matters: a false
POSITIVE means a genuinely new document is wrongly dropped (bounded by
``fpr``); a seen document is NEVER missed (no false negatives — pinned
by test, the same invariant the reference demands of its serving blooms
at `02_geofraud_fraud.py:141-147`).

Construction is Kirsch-Mitzenmacher double hashing: the key is hashed
JVM-side to two independent 64-bit values (xxhash64 of the key, and of
the key + a salt literal), and probe index i = h1 + i·h2 (mod m) — k
derived indices from two hashes, the standard analysis-preserving
scheme. Executors set bits into per-partition numpy bitmaps inside one
Arrow-batched pass (vectorized — no per-row Python); the driver ORs the
per-partition bitmaps (P × m/8 bytes of transfer; at multi-GB digests
fold in two levels by calling `merge_blooms` over partition groups).

Like every sketch here the digest is deterministic in its inputs: the
hash family is seeded, so the same corpus always yields the same bytes.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "bloomset-h2"


def bloom_params(expected_items: int, fpr: float) -> tuple[int, int]:
    """(m_bits, k_hashes) for the target capacity/error — the standard
    formulas m = -n·ln p / ln²2, k = (m/n)·ln 2; m rounded up to a
    whole byte."""
    if expected_items <= 0:
        raise ValueError(f"expected_items must be positive, got {expected_items}")
    if not (0.0 < fpr < 1.0):
        raise ValueError(f"fpr must be in (0, 1), got {fpr}")
    m = math.ceil(-expected_items * math.log(fpr) / (math.log(2) ** 2))
    m = ((m + 7) // 8) * 8
    k = max(1, round(m / expected_items * math.log(2)))
    return m, k


def _hash_cols(key_col: str):
    return (
        F.xxhash64(F.col(key_col).cast("string")).alias("__h1"),
        F.xxhash64(F.col(key_col).cast("string"), F.lit(_SALT)).alias("__h2"),
    )


def _indices(h1: np.ndarray, h2: np.ndarray, m: int, k: int) -> np.ndarray:
    """(len, k) probe positions via double hashing in uint64 space."""
    a = h1.astype(np.uint64)
    b = h2.astype(np.uint64)
    ks = np.arange(k, dtype=np.uint64)
    return ((a[:, None] + ks[None, :] * b[:, None]) % np.uint64(m)).astype(
        np.int64
    )


def build_bloom(
    df: DataFrame,
    key_col: str,
    expected_items: int,
    fpr: float = 0.01,
) -> bytes:
    """Digest every non-null ``key_col`` value into an ``m/8``-byte Bloom
    bitmap. One Arrow-batched corpus pass; the only non-map step is the
    driver OR of per-partition bitmaps."""
    m, k = bloom_params(expected_items, fpr)
    nbytes = m // 8

    hashed = df.filter(F.col(key_col).isNotNull()).select(*_hash_cols(key_col))

    def per_partition(batches):
        bits = np.zeros(nbytes, dtype=np.uint8)
        any_rows = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            any_rows = True
            idx = _indices(
                pdf["__h1"].to_numpy(), pdf["__h2"].to_numpy(), m, k
            ).ravel()
            np.bitwise_or.at(bits, idx >> 3, (1 << (idx & 7)).astype(np.uint8))
        if any_rows:
            yield pd.DataFrame({"bits": [bits.tobytes()]})

    parts = hashed.mapInPandas(per_partition, "bits binary").collect()
    out = np.zeros(nbytes, dtype=np.uint8)
    for r in parts:
        out |= np.frombuffer(r["bits"], dtype=np.uint8)
    return out.tobytes()


def merge_blooms(blooms: "list[bytes]") -> bytes:
    """Union digests built with the SAME (expected_items, fpr): bitwise
    OR — per-batch digests roll up exactly (set-union semantics)."""
    if not blooms:
        raise ValueError("nothing to merge")
    sizes = {len(b) for b in blooms}
    if len(sizes) != 1:
        raise ValueError(f"mismatched bloom sizes {sorted(sizes)} — digests "
                         "must share (expected_items, fpr)")
    out = np.frombuffer(blooms[0], dtype=np.uint8).copy()
    for b in blooms[1:]:
        out |= np.frombuffer(b, dtype=np.uint8)
    return out.tobytes()


def probe_bloom(
    df: DataFrame,
    bloom: bytes,
    key_col: str,
    expected_items: int,
    fpr: float = 0.01,
    out_col: str = "maybe_seen",
) -> DataFrame:
    """df + boolean ``out_col``: True when the key MAY be in the digest
    (false positives at ~fpr), False when it is DEFINITELY absent. The
    digest broadcasts with the serialized task (m/8 bytes); the probe is
    one Arrow-batched map pass — zero shuffle. NULL keys probe NULL."""
    from pyspark.sql.functions import pandas_udf

    m, k = bloom_params(expected_items, fpr)
    if len(bloom) != m // 8:
        raise ValueError(
            f"digest is {len(bloom)} bytes but (expected_items={expected_items}, "
            f"fpr={fpr}) implies {m // 8} — parameters must match the build"
        )
    bits = np.frombuffer(bloom, dtype=np.uint8)

    @pandas_udf("boolean")
    def seen(h1: pd.Series, h2: pd.Series) -> pd.Series:
        if len(h1) == 0:
            return pd.Series([], dtype="boolean")
        idx = _indices(h1.to_numpy(), h2.to_numpy(), m, k)
        hit = (bits[idx >> 3] & (1 << (idx & 7)).astype(np.uint8)) != 0
        return pd.Series(hit.all(axis=1))

    h1, h2 = _hash_cols(key_col)
    out = df.withColumn(out_col, seen(h1.cast("long"), h2.cast("long")))
    return out.withColumn(
        out_col,
        F.when(F.col(key_col).isNull(), F.lit(None)).otherwise(F.col(out_col)),
    )
