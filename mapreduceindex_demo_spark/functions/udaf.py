"""Pandas UDAF surface (SURVEY §2.7 — the reference has no reduce at all).

NOTE: deliberately NO `from __future__ import annotations` here — PySpark
selects the GROUPED_AGG variant by introspecting *live* type hints
(Series -> scalar), and PEP 563 string annotations break that detection.
"""

import pandas as pd

from pyspark.sql import functions as F


@F.pandas_udf("double")
def weighted_avg_price(price: pd.Series, qty: pd.Series) -> float:
    """Quantity-weighted average price in integer cents — exact integer
    sums make the result order-independent (bit-identical to the SQL
    oracle) even though groups arrive in arbitrary partition order."""
    cents = (price * 100).round().astype("int64")
    q = qty.astype("int64")
    tot_q = int(q.sum())
    if tot_q == 0:
        return float("nan")
    return float(int((cents * q).sum())) / (float(tot_q) * 100.0)
