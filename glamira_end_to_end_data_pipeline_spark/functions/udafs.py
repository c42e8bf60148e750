"""Arrow-batched grouped-agg Pandas UDFs (§2.10 UDAF surface).

NOTE: deliberately NO ``from __future__ import annotations`` here —
``pandas_udf`` infers the UDF type from *evaluated* annotations
(``pd.Series -> float`` ⇒ grouped-agg), and stringified annotations
break that inference.
"""

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def median_udaf(v: pd.Series) -> float:
    """Exact median — sort-based, so numpy and any SQL engine agree
    bit-for-bit (midpoint of the two central values at even n)."""
    return float(np.median(v.to_numpy()))


@pandas_udf("double")
def mad_udaf(v: pd.Series) -> float:
    """Median absolute deviation — the robust spread statistic; exact
    and order-independent for the same reason as the median."""
    arr = v.to_numpy()
    return float(np.median(np.abs(arr - np.median(arr))))
