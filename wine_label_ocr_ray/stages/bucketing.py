"""Shared deterministic bucketing hash.

One vectorized ``hash(column) % mod`` used by every stage that
shuffles on a synthetic bucket key (reassembly, stitch pairing, the
distributed dedup cogroups). A single implementation keeps the
polars-seeded hash and its crc32 fallback consistent across stages —
two shuffles that must co-locate the same keys (e.g. the dedup
exact-leg's DB and probe sides) rely on this being THE hash.

Bucket values are run-internal (dropped before results surface), so
only determinism-within-a-run matters, not stability across polars
versions.
"""
from __future__ import annotations

import pyarrow as pa


def hash_mod(ids: pa.Array | pa.ChunkedArray, mod: int) -> pa.Array:
    """Vectorized deterministic ``hash(ids) % mod`` -> int32 array.

    polars' seeded row hash (vectorized, no per-row Python) with a
    crc32-of-str fallback when polars is absent.
    """
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    try:
        import polars as pl
        h = pl.from_arrow(ids).hash(seed=42).to_numpy()
        return pa.array((h % mod).astype("int32"), pa.int32())
    except ImportError:
        import zlib
        return pa.array([zlib.crc32(str(d).encode()) % mod
                         for d in ids.to_pylist()], pa.int32())
