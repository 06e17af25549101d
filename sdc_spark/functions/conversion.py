"""pandas top-level conversion functions — ``to_numeric`` / ``to_datetime``
— as pure JVM cast expressions.

Reference parity: the reference documents both as the siblings of
``Series.astype`` (…series_functions.py:1855-1868) and its legacy compiler
pass lists ``pd.to_numeric`` as an intended rewrite target
(…hpat_pandas_dataframe_pass.py:415-416). Here they compile to
``try_cast`` / ``try_to_timestamp`` — whole-stage-codegen casts, no Python
in the row path; ``errors='raise'`` validates with ONE limit(1) probe over
a single-execution input (expensive lineages are materialized first so the
probe and the real query share one computation), ``errors='coerce'`` is
fully lazy.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from sdc_spark.frame.series import IDX, VAL, SparkSeries
from sdc_spark.materialize import materialize

# Optimized-plan node names whose presence means re-executing the lineage
# is genuinely expensive (shuffle or Python stage) — a bare scan+filter
# lineage is cheaper to run twice than to copy into the block manager.
_EXPENSIVE_PLAN_NODES = (
    "Join", "Aggregate", "Window", "Generate", "Sort", "Expand",
    "FlatMapGroupsInPandas", "MapInPandas", "ArrowEvalPython",
)

# Node names only count at a tree position (line head after the `+- :-`
# prefix art), NOT as substrings — `Project [Join#12]` is a column named
# Join inside a cheap projection, not a join.
_EXPENSIVE_PLAN_RE = re.compile(
    r"^[\s:+-]*(?:%s)\b" % "|".join(_EXPENSIVE_PLAN_NODES), re.MULTILINE
)


def _single_execution(s: SparkSeries) -> SparkSeries:
    """Return ``s`` backed by a frame whose lineage executes at most once
    across the raise-validation probe AND every downstream consumer.

    ``errors='raise'`` must probe the parsed column eagerly (pandas
    raises at call time), which would otherwise re-run the input's whole
    lineage once for the probe and again for the real query — the
    round-6 `series_conversions` regression. Inputs whose optimized plan
    contains a shuffle/Python stage are materialized first; a plain
    scan(+filter/project) lineage is left alone, since running it twice
    is cheaper than block-manager round-trips."""
    try:
        plan = s._df._jdf.queryExecution().optimizedPlan().toString()
    except Exception:  # noqa: BLE001 — connect-mode etc.: be safe, copy
        return SparkSeries(materialize(s._df), name=s.name)
    if _EXPENSIVE_PLAN_RE.search(plan):
        return SparkSeries(materialize(s._df), name=s.name)
    return s

# strftime -> Spark (Java) datetime pattern fragments.
_STRFTIME_TO_JAVA = [
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


_DIRECTIVES = dict(_STRFTIME_TO_JAVA)


def strftime_to_java(fmt: str) -> str:
    """Translate a pandas/CPython strftime format to a Spark datetime
    pattern (the same mapping read_csv's parse_dates path relies on).

    Single left-to-right scan of '%X' pairs — sequential str.replace
    would turn '%%' into '%' first and then re-substitute the remainder
    ('%Y%%m' must mean yyyy + literal '%m', not yyyy + month). Literal
    text containing ASCII letters is emitted Java-quoted ('...', with
    '' for an embedded quote); punctuation passes through bare."""
    out: list[str] = []
    lit: list[str] = []

    def _flush() -> None:
        if not lit:
            return
        run = "".join(lit)
        lit.clear()
        if any(c.isalpha() for c in run) or "'" in run:
            out.append("'" + run.replace("'", "''") + "'")
        else:
            out.append(run)

    i = 0
    while i < len(fmt):
        ch = fmt[i]
        if ch != "%":
            lit.append(ch)
            i += 1
            continue
        if i + 1 >= len(fmt):
            raise ValueError(f"trailing '%' in strftime format {fmt!r}")
        nxt = fmt[i + 1]
        if nxt == "%":
            lit.append("%")
        else:
            tok = _DIRECTIVES.get("%" + nxt)
            if tok is None:
                raise ValueError(f"unsupported strftime directive in {fmt!r}")
            _flush()
            out.append(tok)
        i += 2
    _flush()
    return "".join(out)


def to_numeric(
    s: SparkSeries, errors: str = "raise", downcast: str | None = None
) -> SparkSeries:
    """pandas.to_numeric over a (typically string) series.

    ``errors='coerce'`` -> unparseable values become null (``try_cast`` —
    lazy, codegen). ``errors='raise'`` -> one count aggregate over the
    mismatches raises ValueError eagerly, like pandas.

    Dtype: the default is double for ANY parseable input (documented
    divergence from pandas, which eagerly probes the materialized result
    and picks int64 when all values are integral — a lazy engine must
    not run the query to type it). ``downcast='integer'`` applies
    pandas' lossless rule with ONE scalar aggregate: values are parsed
    as double first and the column becomes bigint only when every
    non-null value is exactly integral and in long range — '1.5' stays
    1.5 in a double column, never silently nulled."""
    if errors not in ("raise", "coerce"):
        raise ValueError(f"unsupported errors={errors!r}")
    cast = F.col(VAL).try_cast("double")
    if errors == "raise":
        s = _single_execution(s)
        bad = (
            s._df.filter(F.col(VAL).isNotNull() & cast.isNull())
            .limit(1)
            .collect()
        )
        if bad:
            raise ValueError(
                f"Unable to parse string {bad[0][VAL]!r} to numeric"
            )
    out = s._df.select(IDX, cast.alias(VAL))
    if downcast == "integer":
        d = F.col(VAL)
        lossless = (
            (F.floor(d) == d)
            & (d >= F.lit(float(-(2**63))))
            & (d < F.lit(float(2**63)))
        )
        row = out.agg(
            F.count(F.lit(1)).alias("rows"),
            F.count(VAL).alias("n"),
            F.sum(
                F.when(d.isNull(), 0).when(lossless, 0).otherwise(1)
            ).alias("lossy"),
        ).collect()[0]
        # nulls (missing or coerced) keep the column double — an int64
        # pandas column cannot hold NaN either
        if row["n"] and row["n"] == row["rows"] and not row["lossy"]:
            return SparkSeries(
                out.select(IDX, d.cast("bigint").alias(VAL)), name=s.name
            )
    return SparkSeries(out, name=s.name)


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
        s = _single_execution(s)
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
