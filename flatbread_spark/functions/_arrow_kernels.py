"""Arrow-batched (pandas UDF) kernels.

NOTE: deliberately NO ``from __future__ import annotations`` here — pandas_udf
resolves the function's type hints at decoration time, and PEP-563 stringified
annotations make it fail with UNSUPPORTED_SIGNATURE.
"""
import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


def make_bucket_udf(planes_mat, tables: int, nbits: int):
    """Sign-LSH bucket assignment for all tables in one matmul per batch.

    planes_mat: (tables*nbits, dim) float64 — stacked hyperplanes.
    Returns a pandas UDF: array<float> -> array<bigint> (one bucket/table).
    """
    weights = 1 << np.arange(nbits, dtype=np.int64)

    @pandas_udf("array<bigint>")
    def all_buckets(vecs: pd.Series) -> pd.Series:
        V = np.stack(vecs.to_numpy()).astype(np.float64)  # (batch, dim)
        bits = (V @ planes_mat.T) > 0                     # (batch, tables*nbits)
        bits = bits.reshape(len(V), tables, nbits)
        buckets = (bits * weights).sum(axis=2)            # (batch, tables)
        return pd.Series(list(buckets))

    return all_buckets
