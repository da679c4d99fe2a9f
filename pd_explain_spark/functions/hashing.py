"""The portable-hash contract shared by every sampling, shuffling, and
signature operator — and by their DuckDB oracles.

Spark's fast native hash (xxhash64) does not exist in other engines, so
every operator whose result must be reproducible cross-engine derives
its randomness from md5 over explicitly constructed bytes:

    Spark:  F.conv(F.substring(F.md5(x), 1, width), 16, 10).cast("bigint")
    DuckDB: ('0x' || substr(md5(x), 1, width))::BIGINT

Both engines hash identical bytes to the identical hex string, and the
first ``width`` hex chars parse to the identical non-negative integer
(width=15 -> 60 bits, the default everywhere). This module is the ONE
definition of that wrapper; keep the two engine spellings in sync here
and nowhere else.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["md5_int"]


def md5_int(hex_col: Column, width: int = 15) -> Column:
    """First ``width`` hex chars of an md5-hex column as a non-negative
    BIGINT (DuckDB mirror: ``('0x' || substr(<hex>, 1, width))::BIGINT``).
    ``width`` must be <= 15 so the value fits a signed 64-bit int."""
    return F.conv(F.substring(hex_col, 1, width), 16, 10).cast("bigint")
