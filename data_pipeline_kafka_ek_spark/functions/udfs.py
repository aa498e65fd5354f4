"""Pandas UDF definitions.

NOTE: no ``from __future__ import annotations`` here — pandas_udf infers
its eval type from the *evaluated* signature type hints, and postponed
annotations turn them into strings it can't interpret.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf


def make_series_udf(fn, return_type: str):
    """Wrap a scalar python fn into an Arrow-batched Series->Series UDF."""

    @pandas_udf(return_type)
    def _udf(s: pd.Series) -> pd.Series:
        return s.map(fn)

    return _udf


def make_batch_udf(fn, return_type: str, dtype=None):
    """Wrap a batch fn (sequence -> sequence, e.g. numpy-vectorized) into an
    Arrow-batched Series->Series UDF — one call per Arrow batch."""

    @pandas_udf(return_type)
    def _udf(s: pd.Series) -> pd.Series:
        return pd.Series(fn(s), dtype=dtype)

    return _udf
