"""pandas top-level conversion functions — ``to_numeric`` / ``to_datetime``
— as pure JVM cast expressions.

Reference parity: the reference documents both as the siblings of
``Series.astype`` (…series_functions.py:1855-1868) and its legacy compiler
pass lists ``pd.to_numeric`` as an intended rewrite target
(…hpat_pandas_dataframe_pass.py:415-416). Here they compile to
``try_cast`` / ``try_to_timestamp`` — whole-stage-codegen casts, no Python
in the row path; ``errors='raise'`` validates with ONE count aggregate
(the only action), ``errors='coerce'`` is fully lazy.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sdc_spark.frame.series import IDX, VAL, SparkSeries

# strftime -> Spark (Java) datetime pattern fragments. Literal '%%' first.
_STRFTIME_TO_JAVA = [
    ("%%", "%"),
    ("%Y", "yyyy"),
    ("%y", "yy"),
    ("%m", "MM"),
    ("%d", "dd"),
    ("%H", "HH"),
    ("%I", "hh"),
    ("%M", "mm"),
    ("%S", "ss"),
    ("%f", "SSSSSS"),
    ("%p", "a"),
    ("%j", "DDD"),
    ("%b", "MMM"),
    ("%B", "MMMM"),
    ("%a", "EEE"),
    ("%A", "EEEE"),
    ("%z", "xx"),
]


def strftime_to_java(fmt: str) -> str:
    """Translate a pandas/CPython strftime format to a Spark datetime
    pattern (the same mapping read_csv's parse_dates path relies on)."""
    out = fmt
    for py, java in _STRFTIME_TO_JAVA:
        out = out.replace(py, java)
    if "%" in out:
        raise ValueError(f"unsupported strftime directive in {fmt!r}")
    return out


def to_numeric(
    s: SparkSeries, errors: str = "raise", downcast: str | None = None
) -> SparkSeries:
    """pandas.to_numeric over a (typically string) series.

    ``errors='coerce'`` -> unparseable values become null (``try_cast`` —
    lazy, codegen). ``errors='raise'`` -> one count aggregate over the
    mismatches raises ValueError eagerly, like pandas. Result dtype is
    double (pandas' numeric default here), or long with
    ``downcast='integer'``."""
    if errors not in ("raise", "coerce"):
        raise ValueError(f"unsupported errors={errors!r}")
    target = "bigint" if downcast == "integer" else "double"
    cast = F.col(VAL).try_cast(target)
    if errors == "raise":
        bad = (
            s._df.filter(F.col(VAL).isNotNull() & cast.isNull())
            .limit(1)
            .collect()
        )
        if bad:
            raise ValueError(
                f"Unable to parse string {bad[0][VAL]!r} to numeric"
            )
    return SparkSeries(s._df.select(IDX, cast.alias(VAL)), name=s.name)


def to_datetime(
    s: SparkSeries, format: str | None = None, errors: str = "raise"
) -> SparkSeries:
    """pandas.to_datetime over a string series: strftime ``format`` is
    translated to a Spark pattern; without one, Spark's ISO-ish default
    parse applies. ``errors='coerce'`` nulls unparseable values
    (``try_to_timestamp``); ``errors='raise'`` validates eagerly with one
    aggregate."""
    if errors not in ("raise", "coerce"):
        raise ValueError(f"unsupported errors={errors!r}")
    fmt = [F.lit(strftime_to_java(format))] if format else []
    parsed = F.try_to_timestamp(F.col(VAL), *fmt)
    if errors == "raise":
        bad = (
            s._df.filter(F.col(VAL).isNotNull() & parsed.isNull())
            .limit(1)
            .collect()
        )
        if bad:
            raise ValueError(
                f"Unable to parse {bad[0][VAL]!r} with format {format!r}"
            )
    return SparkSeries(s._df.select(IDX, parsed.alias(VAL)), name=s.name)
