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
