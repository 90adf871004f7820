"""Cross-engine primitives shared by the pipeline operators.

Every primitive exists twice: a Spark Column builder and a DuckDB SQL
string builder computing the bit-identical value, so driver-side
value-hash comparison holds. The shared 60-bit hash is
int(md5(utf8)[0:15], 16) — md5 is identical everywhere; 15 hex digits
(60 bits) fit a signed int64 in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Large prime used for all modular hash arithmetic. Operands stay
# < ~2^47 so products with coefficients < 2^17 never overflow int64
# in either engine.
MOD = 1_000_000_007


def h64(col: Column) -> Column:
    """60-bit md5-derived hash of a string column (Spark side)."""
    return F.conv(F.substring(F.md5(F.encode(col, "UTF-8")), 1, 15), 16, 10).cast(
        "long"
    )


def h64_sql(expr: str) -> str:
    """DuckDB twin of :func:`h64`."""
    return f"CAST(concat('0x', substring(md5({expr}), 1, 15)) AS BIGINT)"


def words_col(text: Column | str = "text") -> Column:
    """Whitespace word split (Spark). Matches words_sql exactly."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def words_sql(expr: str = "text") -> str:
    return f"string_split({expr}, ' ')"


def py_h64(s: str) -> int:
    """Python twin (for plane literals and numpy oracles in tests)."""
    import hashlib

    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)
