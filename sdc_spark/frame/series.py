"""SparkSeries — the reference's SeriesType surface
(/root/reference/sdc/datatypes/hpat_pandas_series_functions.py, 4,875 LoC of
@overload methods) re-expressed as a thin wrapper over a 2-column Spark
DataFrame (__index__, value).

Binary ops align on the index via a full outer join — exactly the
reference's ``_sdc_internal_join`` semantics
(sdc/datatypes/common_functions.py:225-456). Reductions return Python
scalars (the reference returns numpy scalars). Order-dependent ops
(shift/cumsum/rolling) order by __index__.
"""

from __future__ import annotations

from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sdc_spark.functions import expressions as sexpr
from sdc_spark.functions import strings as sstr

IDX = "__index__"
VAL = "__value__"


class SparkSeries:
    def __init__(self, df: DataFrame, name: str | None = None, floating: bool = False):
        """df must have columns (__index__, __value__). ``floating`` tags
        float dtype so NaN participates in null semantics (SURVEY §1.3)."""
        self._df = df
        self.name = name
        self._floating = floating or dict(df.dtypes).get(VAL) in ("double", "float")

    # -- construction ------------------------------------------------------

    @classmethod
    def from_column(cls, sdf: DataFrame, col: str, index_col: str = IDX) -> SparkSeries:
        return cls(
            sdf.select(F.col(index_col).alias(IDX), F.col(col).alias(VAL)), name=col
        )

    # -- basic attrs (ref …series_functions.py:1224-1812) ------------------

    def __len__(self) -> int:
        return self._df.count()

    @property
    def size(self) -> int:
        return len(self)

    def to_pandas(self):
        # results that carry their own ordering (value_counts, sort_values)
        # expose it as __ord__; plain series order by index
        if "__ord__" in self._df.columns:
            pdf = self._df.orderBy("__ord__").drop("__ord__").toPandas()
        else:
            pdf = self._df.orderBy(IDX).toPandas()
        s = pd.Series(pdf[VAL].values, index=pdf[IDX].values, name=self.name)
        return s

    # -- elementwise -------------------------------------------------------

    def _unary(self, fn, floating: bool | None = None) -> SparkSeries:
        return SparkSeries(
            self._df.select(IDX, fn(F.col(VAL)).alias(VAL)),
            name=self.name,
            floating=self._floating if floating is None else floating,
        )

    def abs(self) -> SparkSeries:
        return self._unary(F.abs)

    def astype(self, dtype: str) -> SparkSeries:
        if dtype in ("int", "int64"):
            return self._unary(sexpr.astype_long, floating=False)
        if dtype in ("float", "float64"):
            return self._unary(lambda c: c.cast("double"), floating=True)
        if dtype == "str":
            return self._unary(lambda c: c.cast("string"), floating=False)
        return self._unary(lambda c: c.cast(dtype))

    def isna(self) -> SparkSeries:
        return self._unary(lambda c: sexpr.isna(c, self._floating), floating=False)

    def notna(self) -> SparkSeries:
        return self._unary(lambda c: sexpr.notna(c, self._floating), floating=False)

    def fillna(self, value) -> SparkSeries:
        return self._unary(lambda c: sexpr.fillna(c, value, self._floating))

    def dropna(self) -> SparkSeries:
        return SparkSeries(
            self._df.filter(sexpr.notna(F.col(VAL), self._floating)),
            name=self.name,
            floating=self._floating,
        )

    def isin(self, values) -> SparkSeries:
        return self._unary(lambda c: c.isin(*list(values)), floating=False)

    # -- binary ops with index alignment (ref common_functions.py:225-456) --

    def _binary(self, other, fn, fill_value=None) -> SparkSeries:
        if isinstance(other, SparkSeries):
            a = self._df.select(F.col(IDX), F.col(VAL).alias("__l__"))
            b = other._df.select(F.col(IDX), F.col(VAL).alias("__r__"))
            j = a.join(b, on=IDX, how="full")
            lc, rc = F.col("__l__"), F.col("__r__")
            if fill_value is not None:
                lc = F.coalesce(lc, F.lit(fill_value))
                rc = F.coalesce(rc, F.lit(fill_value))
            out = j.select(F.col(IDX), fn(lc, rc).alias(VAL))
            return SparkSeries(out, name=None, floating=True)
        return self._unary(lambda c: fn(c, F.lit(other)))

    def __add__(self, other):
        return self._binary(other, lambda a, b: a + b)

    def add(self, other, fill_value=None):
        return self._binary(other, lambda a, b: a + b, fill_value)

    def __sub__(self, other):
        return self._binary(other, lambda a, b: a - b)

    def sub(self, other, fill_value=None):
        return self._binary(other, lambda a, b: a - b, fill_value)

    def __mul__(self, other):
        return self._binary(other, lambda a, b: a * b)

    def mul(self, other, fill_value=None):
        return self._binary(other, lambda a, b: a * b, fill_value)

    def __truediv__(self, other):
        return self._binary(other, sexpr.pandas_div)

    def div(self, other, fill_value=None):
        return self._binary(other, sexpr.pandas_div, fill_value)

    def __floordiv__(self, other):
        return self._binary(other, sexpr.pandas_floordiv)

    def __mod__(self, other):
        return self._binary(other, sexpr.pandas_mod)

    def __pow__(self, other):
        return self._binary(other, sexpr.pandas_pow)

    def __lt__(self, other):
        return self._binary(other, lambda a, b: a < b)

    def __le__(self, other):
        return self._binary(other, lambda a, b: a <= b)

    def __gt__(self, other):
        return self._binary(other, lambda a, b: a > b)

    def __ge__(self, other):
        return self._binary(other, lambda a, b: a >= b)

    def __eq__(self, other):  # type: ignore[override]
        return self._binary(other, lambda a, b: a == b)

    def __ne__(self, other):  # type: ignore[override]
        return self._binary(other, lambda a, b: a != b)

    def __and__(self, other):
        return self._binary(other, lambda a, b: a & b)

    def __or__(self, other):
        return self._binary(other, lambda a, b: a | b)

    def __invert__(self):
        return self._unary(lambda c: ~c)

    # -- reductions (ref §2.4) --------------------------------------------

    def _reduce(self, expr) -> Any:
        return self._df.agg(expr.alias("r")).collect()[0]["r"]

    def sum(self):
        return self._reduce(F.sum(VAL))

    def prod(self):
        return self._reduce(F.product(VAL))

    def min(self):
        return self._reduce(F.min(VAL))

    def max(self):
        return self._reduce(F.max(VAL))

    def mean(self):
        return self._reduce(F.avg(VAL))

    def median(self):
        return self._reduce(F.median(VAL))

    def std(self, ddof: int = 1):
        return self._reduce(F.stddev_samp(VAL) if ddof == 1 else F.stddev_pop(VAL))

    def var(self, ddof: int = 1):
        return self._reduce(F.var_samp(VAL) if ddof == 1 else F.var_pop(VAL))

    def count(self) -> int:
        return self._reduce(F.count(F.when(sexpr.notna(F.col(VAL), self._floating), 1)))

    def nunique(self, dropna: bool = True) -> int:
        return self._reduce(F.countDistinct(VAL))

    def quantile(self, q: float):
        return self._reduce(F.percentile(F.col(VAL), F.lit(q)))

    def skew(self):
        n = F.count(VAL)
        return self._reduce(F.skewness(VAL) * F.sqrt(n * (n - 1)) / (n - 2))

    def corr(self, other: SparkSeries):
        j = self._df.select(IDX, F.col(VAL).alias("__l__")).join(
            other._df.select(IDX, F.col(VAL).alias("__r__")), IDX, "inner"
        )
        return j.agg(F.corr("__l__", "__r__").alias("r")).collect()[0]["r"]

    def cov(self, other: SparkSeries):
        j = self._df.select(IDX, F.col(VAL).alias("__l__")).join(
            other._df.select(IDX, F.col(VAL).alias("__r__")), IDX, "inner"
        )
        return j.agg(F.covar_samp("__l__", "__r__").alias("r")).collect()[0]["r"]

    def idxmax(self):
        return self._reduce(F.max_by(IDX, VAL))

    def idxmin(self):
        return self._reduce(F.min_by(IDX, VAL))

    def where(self, cond: SparkSeries, other=None) -> SparkSeries:
        """Keep values where cond holds, else ``other`` (default null/NaN) —
        pandas Series.where."""
        if isinstance(other, SparkSeries):
            raise NotImplementedError("Series-valued other not supported yet")
        c = cond._df.select(F.col(IDX), F.col(VAL).alias("__c__"))
        j = self._df.join(c, IDX, "left")
        return SparkSeries(
            j.select(IDX, F.when(F.col("__c__"), F.col(VAL)).otherwise(F.lit(other)).alias(VAL)),
            name=self.name,
            floating=self._floating,
        )

    def mask(self, cond: SparkSeries, other=None) -> SparkSeries:
        return self.where(~cond, other)

    def set_where(self, cond: SparkSeries, value) -> SparkSeries:
        """series[cond] = value (ref setitem overloads
        …series_functions.py:500-833) — immutable result, reference-style
        no-reflection semantics."""
        return self.mask(cond, value)

    # -- order-dependent ops ----------------------------------------------

    def shift(self, periods: int = 1, fill_value=None) -> SparkSeries:
        w = W.orderBy(IDX)
        return self._unary(lambda c: F.lag(c, periods, fill_value).over(w))

    def cumsum(self) -> SparkSeries:
        w = W.orderBy(IDX).rowsBetween(W.unboundedPreceding, 0)
        if self._floating:
            # pandas: NaN stays NaN but doesn't poison the running sum
            return self._unary(
                lambda c: F.when(
                    sexpr.notna(c, True),
                    F.sum(F.when(sexpr.notna(c, True), c)).over(w),
                ).otherwise(F.lit(float("nan")))
            )
        return self._unary(lambda c: F.sum(c).over(w))

    def pct_change(self, periods: int = 1) -> SparkSeries:
        w = W.orderBy(IDX)
        return self._unary(lambda c: c / F.lag(c, periods).over(w) - 1, floating=True)

    def _ordered(self, *keys) -> SparkSeries:
        out = self._df.drop("__ord__").select(
            IDX, VAL, F.row_number().over(W.orderBy(*keys)).alias("__ord__")
        )
        return SparkSeries(out, name=self.name, floating=self._floating)

    def sort_values(self, ascending: bool = True) -> SparkSeries:
        """NaNs forced last regardless of direction (ref TBB sort kernels,
        sdc/native/sort.cpp:43-128)."""
        key = F.col(VAL).asc_nulls_last() if ascending else F.col(VAL).desc_nulls_last()
        if self._floating:
            nan_last = F.when(F.isnan(VAL) | F.col(VAL).isNull(), 1).otherwise(0).asc()
            return self._ordered(nan_last, key, F.col(IDX))
        return self._ordered(key, F.col(IDX))

    def nlargest(self, n: int = 5) -> SparkSeries:
        s = self.dropna() if self._floating else self
        out = s._ordered(F.col(VAL).desc_nulls_last(), F.col(IDX))
        return SparkSeries(
            out._df.orderBy("__ord__").limit(n), name=self.name, floating=self._floating
        )

    def nsmallest(self, n: int = 5) -> SparkSeries:
        s = self.dropna() if self._floating else self
        out = s._ordered(F.col(VAL).asc_nulls_last(), F.col(IDX))
        return SparkSeries(
            out._df.orderBy("__ord__").limit(n), name=self.name, floating=self._floating
        )

    def head(self, n: int = 5) -> SparkSeries:
        return SparkSeries(
            self._df.orderBy(IDX).limit(n), name=self.name, floating=self._floating
        )

    def unique(self) -> list:
        return [r[0] for r in self._df.select(VAL).distinct().collect()]

    def value_counts(self, ascending: bool = False):
        """Returns a SparkSeries keyed by value. pandas tie order is first
        appearance (hashtable insertion order) — reproduced distributively
        as min(original index) per value (ref …series_functions.py:1375)."""
        base = self._df.filter(sexpr.notna(F.col(VAL), self._floating)).select(
            F.col(VAL).alias("__key__"), F.col(IDX).alias("__oi__")
        )
        order = [
            F.col("__cnt__").asc() if ascending else F.col("__cnt__").desc(),
            F.col("__first__").asc(),
        ]
        counted = (
            base.groupBy("__key__")
            .agg(F.count(F.lit(1)).alias("__cnt__"), F.min("__oi__").alias("__first__"))
            .select(
                F.col("__key__").alias(IDX),
                F.col("__cnt__").alias(VAL),
                F.row_number().over(W.orderBy(*order)).alias("__ord__"),
            )
        )
        return SparkSeries(counted, name="count", floating=False)

    # -- rolling / map / apply --------------------------------------------

    def rolling(self, window: int, min_periods: int | None = None, center: bool = False):
        """ref RollingType carries `center` (sdc/datatypes/
        hpat_pandas_rolling_types.py:36-72) though its kernels only do
        trailing windows — we support both."""
        from sdc_spark.frame.rolling import SeriesRolling

        return SeriesRolling(
            self, window, window if min_periods is None else min_periods, center
        )

    def map(self, arg) -> SparkSeries:
        """dict → literal map lookup (JVM); callable → Arrow pandas UDF
        (ref pandas_series_functions/map.py:38-115)."""
        if isinstance(arg, dict):
            mapping = F.create_map(*[F.lit(x) for kv in arg.items() for x in kv])
            return self._unary(lambda c: mapping.getItem(c))
        first = self._df.select(VAL).first()
        probe = arg(first[0]) if first is not None else 0.0
        rt = "double" if isinstance(probe, float) else "long" if isinstance(probe, int) else "string"

        @F.pandas_udf(rt)
        def udf(s: pd.Series) -> pd.Series:
            return s.map(arg)

        return self._unary(udf)

    def apply(self, func) -> SparkSeries:
        return self.map(func)

    # -- accessors ---------------------------------------------------------

    @property
    def str(self):
        return _StrAccessor(self)


class _StrAccessor:
    """series.str — dispatches to sdc_spark.functions.strings builders."""

    def __init__(self, s: SparkSeries):
        self._s = s

    def _wrap(self, fn, floating: bool = False) -> SparkSeries:
        return self._s._unary(fn, floating=floating)

    def lower(self):
        return self._wrap(sstr.lower)

    def upper(self):
        return self._wrap(sstr.upper)

    def len(self):
        return self._wrap(sstr.length)

    def strip(self):
        return self._wrap(sstr.strip)

    def lstrip(self):
        return self._wrap(sstr.lstrip)

    def rstrip(self):
        return self._wrap(sstr.rstrip)

    def capitalize(self):
        return self._wrap(sstr.capitalize)

    def title(self):
        return self._wrap(sstr.title)

    def swapcase(self):
        return self._wrap(sstr.swapcase)

    def casefold(self):
        return self._wrap(sstr.casefold)

    def startswith(self, pat):
        return self._wrap(lambda c: sstr.startswith(c, pat))

    def endswith(self, pat):
        return self._wrap(lambda c: sstr.endswith(c, pat))

    def contains(self, pat, regex=True):
        return self._wrap(lambda c: sstr.contains(c, pat, regex))

    def find(self, sub):
        return self._wrap(lambda c: sstr.find(c, sub))

    def replace(self, pat, repl, regex=False):
        return self._wrap(lambda c: sstr.replace(c, pat, repl, regex))

    def ljust(self, width, fillchar=" "):
        return self._wrap(lambda c: sstr.ljust(c, width, fillchar))

    def rjust(self, width, fillchar=" "):
        return self._wrap(lambda c: sstr.rjust(c, width, fillchar))

    def center(self, width, fillchar=" "):
        return self._wrap(lambda c: sstr.center(c, width, fillchar))

    def zfill(self, width):
        return self._wrap(lambda c: sstr.zfill(c, width))

    def isalpha(self):
        return self._wrap(sstr.isalpha)

    def isdigit(self):
        return self._wrap(sstr.isdigit)

    def isalnum(self):
        return self._wrap(sstr.isalnum)

    def islower(self):
        return self._wrap(sstr.islower)

    def isupper(self):
        return self._wrap(sstr.isupper)

    def isspace(self):
        return self._wrap(sstr.isspace)

    def istitle(self):
        return self._wrap(sstr.istitle)
