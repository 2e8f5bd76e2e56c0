"""APID include/exclude filter.

Parity: reference ``src/mdp/plugins/transformers/filter.py:22-46`` —
whitelist OR blacklist (both set → ValueError), neither → passthrough.
Unlike the reference (which mutates the dataset in place), this is a
pure relational filter that Catalyst pushes down to the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apid_filter(
    df: DataFrame,
    include: list[int] | None = None,
    exclude: list[int] | None = None,
    column: str = "apid",
) -> DataFrame:
    if include and exclude:
        raise ValueError("apid_filter: set include OR exclude, not both")
    if include:
        return df.filter(F.col(column).isin([int(a) for a in include]))
    if exclude:
        return df.filter(~F.col(column).isin([int(a) for a in exclude]))
    return df
