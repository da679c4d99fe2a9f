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

__all__ = ["md5_int", "md5_int_hi"]


def md5_int(hex_col: Column, width: int = 15) -> Column:
    """First ``width`` hex chars of an md5-hex column as a non-negative
    BIGINT (DuckDB mirror: ``('0x' || substr(<hex>, 1, width))::BIGINT``).
    ``width`` must be <= 15 so the value fits a signed 64-bit int."""
    return F.conv(F.substring(hex_col, 1, width), 16, 10).cast("bigint")


def md5_int_hi(hex_col: Column, width: int = 15) -> Column:
    """SECOND 64-bit lane of the same digest: hex chars 17..(16+width)
    as a non-negative BIGINT (DuckDB mirror:
    ``('0x' || substr(<hex>, 17, width))::BIGINT``). One md5 digest
    carries 128 bits, so operators that need many independent hash
    functions (corpus MinHash) pair md5_int/md5_int_hi per digest and
    halve the dominant md5 cost."""
    return F.conv(F.substring(hex_col, 17, width), 16, 10).cast("bigint")
