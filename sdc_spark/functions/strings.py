"""The ``series.str`` method surface as JVM-side Column builders.

Reference: /root/reference/sdc/datatypes/hpat_pandas_stringmethods_functions.py
(explicit overloads :95-1053, template-generated :1122-1339) — 26 methods.
All but title/swapcase compose from built-in pyspark.sql.functions, so they
run inside whole-stage codegen; title/swapcase need per-character case logic
→ Arrow-vectorized pandas UDFs (the reference's slow path is a JIT loop;
ours is a vectorized pandas str call).

Python padding semantics reproduced exactly (validated against pandas):
- ljust/rjust/center/zfill never truncate (Spark's lpad/rpad do → guarded);
- center puts the extra fill char LEFT iff both pad and width are odd
  (CPython's ``(pad // 2) + (pad & width & 1)``);
- zfill is sign-aware: '-12'.zfill(5) → '-0012';
- find returns -1 when absent (locate is 1-based, 0 when absent).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


# -- simple wrappers -------------------------------------------------------

def length(x) -> Column:
    return F.length(_c(x))


def lower(x) -> Column:
    return F.lower(_c(x))


def upper(x) -> Column:
    return F.upper(_c(x))


def strip(x, chars: str | None = None) -> Column:
    return F.trim(_c(x)) if chars is None else F.btrim(_c(x), F.lit(chars))


def lstrip(x, chars: str | None = None) -> Column:
    return F.ltrim(_c(x)) if chars is None else F.ltrim(_c(x), F.lit(chars))


def rstrip(x, chars: str | None = None) -> Column:
    return F.rtrim(_c(x)) if chars is None else F.rtrim(_c(x), F.lit(chars))


def capitalize(x) -> Column:
    """Python capitalize: first char upper, REST lower (initcap is per-word
    — not the same)."""
    c = _c(x)
    return F.concat(F.upper(F.substring(c, 1, 1)), F.lower(F.substring(c, 2, 2147483646)))


def startswith(x, pat: str) -> Column:
    return _c(x).startswith(pat)


def endswith(x, pat: str) -> Column:
    return _c(x).endswith(pat)


def contains(x, pat: str, regex: bool = True) -> Column:
    return _c(x).rlike(pat) if regex else _c(x).contains(pat)


def find(x, sub: str) -> Column:
    """str.find: 0-based index, -1 when absent."""
    return (F.locate(sub, _c(x)) - 1).cast("int")


def replace(x, pat: str, repl: str, regex: bool = False) -> Column:
    c = _c(x)
    return F.regexp_replace(c, pat, repl) if regex else F.replace(c, F.lit(pat), F.lit(repl))


def split(x, pat: str = " ") -> Column:
    # pandas split uses literal separator by default; F.split takes a regex
    import re

    return F.split(_c(x), re.escape(pat))


def join(x, sep: str) -> Column:
    return F.array_join(_c(x), sep)


def extract(x, pat: str, group: int = 1) -> Column:
    """pandas str.extract single-group form: first regex capture group (or
    ``group``); null when the pattern does not match (regexp_extract
    returns '' on no-match — mapped to null for pandas NaN parity)."""
    got = F.regexp_extract(_c(x), pat, group)
    return F.when(got == "", F.lit(None)).otherwise(got)


def count_matches(x, pat: str) -> Column:
    """pandas str.count: non-overlapping regex match count."""
    return F.regexp_count(_c(x), F.lit(pat))


# -- padding (Python semantics: never truncate) ----------------------------

def ljust(x, width: int, fillchar: str = " ") -> Column:
    c = _c(x)
    return F.when(F.length(c) >= width, c).otherwise(F.rpad(c, width, fillchar))


def rjust(x, width: int, fillchar: str = " ") -> Column:
    c = _c(x)
    return F.when(F.length(c) >= width, c).otherwise(F.lpad(c, width, fillchar))


def center(x, width: int, fillchar: str = " ") -> Column:
    c = _c(x)
    pad = F.lit(width) - F.length(c)
    # CPython: left = pad//2 + (pad & width & 1)
    left = F.floor(pad / 2).cast("int") + (
        pad.cast("int").bitwiseAND(F.lit(width)).bitwiseAND(F.lit(1))
    )
    return F.when(F.length(c) >= width, c).otherwise(
        F.rpad(F.lpad(c, (F.length(c) + left).cast("int"), fillchar), width, fillchar)
    )


def zfill(x, width: int) -> Column:
    c = _c(x)
    sign = F.substring(c, 1, 1)
    has_sign = sign.isin("-", "+")
    body = F.when(has_sign, F.substring(c, 2, 2147483646)).otherwise(c)
    filled = F.when(
        has_sign, F.concat(sign, F.lpad(body, width - 1, "0"))
    ).otherwise(F.lpad(body, width, "0"))
    return F.when(F.length(c) >= width, c).otherwise(filled)


# -- character-class predicates (regex, ASCII + common unicode) ------------

def isalpha(x) -> Column:
    return _c(x).rlike(r"^\p{L}+$")


def isdigit(x) -> Column:
    return _c(x).rlike(r"^\p{Nd}+$")


def isdecimal(x) -> Column:
    return _c(x).rlike(r"^\p{Nd}+$")


def isnumeric(x) -> Column:
    return _c(x).rlike(r"^[\p{Nd}\p{Nl}\p{No}]+$")


def isalnum(x) -> Column:
    return _c(x).rlike(r"^[\p{L}\p{Nd}]+$")


def isspace(x) -> Column:
    return _c(x).rlike(r"^\s+$")


def islower(x) -> Column:
    """Python: at least one cased char, no uppercase."""
    c = _c(x)
    return c.rlike(r"\p{Ll}") & ~c.rlike(r"\p{Lu}")


def isupper(x) -> Column:
    c = _c(x)
    return c.rlike(r"\p{Lu}") & ~c.rlike(r"\p{Ll}")


def istitle(x) -> Column:
    """Titlecase: every cased run starts upper followed by lowers."""
    c = _c(x)
    return c.rlike(r"\p{Lu}") & ~c.rlike(
        r"(^|[^\p{L}])\p{Ll}|\p{Lu}\p{Lu}|\p{Ll}\p{Lu}"
    )


# -- pandas-UDF slow path (per-char case logic) ----------------------------

@F.pandas_udf(T.StringType())
def title(s: pd.Series) -> pd.Series:
    """str.title (pandas semantics: capitalize after ANY non-alpha)."""
    return s.str.title()


@F.pandas_udf(T.StringType())
def swapcase(s: pd.Series) -> pd.Series:
    return s.str.swapcase()


@F.pandas_udf(T.StringType())
def casefold(s: pd.Series) -> pd.Series:
    return s.str.casefold()
