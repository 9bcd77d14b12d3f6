"""Shared helpers for the query suite."""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def read_table(sf_dir: str, table: str, *, columns: Optional[List[str]] = None,
               filter=None, override_num_blocks: Optional[int] = None
               ) -> "ray.data.Dataset":
    """Column-pruned (and optionally row-filtered) parquet read of one
    driver table."""
    from .._rayprep import ensure_serializable
    ensure_serializable()
    kwargs = {}
    if columns is not None:
        kwargs["columns"] = columns
    if filter is not None:
        kwargs["filter"] = filter
    if override_num_blocks is not None:
        kwargs["override_num_blocks"] = override_num_blocks
    return ray.data.read_parquet(os.path.join(sf_dir, f"{table}.parquet"),
                                 **kwargs)


def join_partitions() -> int:
    """Hash-join partition count scaled to the cluster: too many
    partitions on a small cluster thrashes aggregator actors, too few
    under-parallelizes the build."""
    import ray
    cpus = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    # each partition spawns an aggregator actor with ~seconds of
    # startup; cap well below the CPU count
    return max(2, min(cpus // 2, 16))


def round_df(df: pd.DataFrame, cols: List[str], digits: int = 3) -> pd.DataFrame:
    """Round float columns so both the Ray result and the DuckDB oracle
    hash identically (round(3+) on doubles cannot hit decimal-half
    boundaries, so numpy banker's vs SQL half-away never diverges)."""
    for c in cols:
        df[c] = np.round(df[c].astype(np.float64), digits)
    return df


def one_row(**values) -> pd.DataFrame:
    return pd.DataFrame({k: [v] for k, v in values.items()})
