"""Hypothesis property tests: pandas-differential over generated inputs
for the alignment-sensitive core (merge, index-aligned binops,
drop_duplicates). Spark sessions are expensive, so examples are kept
small and few — the value is the generator hitting key shapes humans
skip: empty frames, all-duplicate keys, all-null columns, disjoint keys.
"""

from __future__ import annotations

import sys

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, "/root/repo")

from sdc_spark.frame import from_pandas

KEYS = st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=6)
VALS = st.lists(
    st.one_of(st.integers(min_value=-5, max_value=5), st.none()),
    min_size=0,
    max_size=6,
)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _frame(keys, vals):
    # explicit dtypes: an empty untyped list would infer float64 keys,
    # which pandas itself refuses to merge with string keys
    n = min(len(keys), len(vals))
    return pd.DataFrame(
        {
            "k": pd.array(keys[:n], dtype="string"),
            "v": pd.array(vals[:n], dtype="Int64"),
        }
    )


@given(lk=KEYS, lv=VALS, rk=KEYS, rv=VALS, how=st.sampled_from(["inner", "left", "outer"]))
@_SETTINGS
def test_merge_matches_pandas(spark, lk, lv, rk, rv, how):
    left, right = _frame(lk, lv), _frame(rk, rv)
    right = right.rename(columns={"v": "w"})
    got = (
        from_pandas(spark, left)
        .merge(from_pandas(spark, right), on="k", how=how)
        .to_pandas()
        .sort_values(["k", "v", "w"], na_position="last")
        .reset_index(drop=True)
    )
    exp = (
        left.merge(right, on="k", how=how)
        .sort_values(["k", "v", "w"], na_position="last")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    for c in ("k", "v", "w"):
        ge = [None if pd.isna(x) else x for x in got[c]]
        ee = [None if pd.isna(x) else x for x in exp[c]]
        assert ge == ee, f"{how} column {c}: {ge} != {ee}"


@given(keys=KEYS, vals=VALS, keep=st.sampled_from(["first", "last"]))
@_SETTINGS
def test_drop_duplicates_matches_pandas(spark, keys, vals, keep):
    pdf = _frame(keys, vals)
    got = (
        from_pandas(spark, pdf)
        .drop_duplicates(subset=["k"], keep=keep)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    exp = pdf.drop_duplicates(subset=["k"], keep=keep).sort_values("k").reset_index(drop=True)
    assert got["k"].tolist() == exp["k"].tolist()
    gv = [None if pd.isna(x) else x for x in got["v"]]
    ev = [None if pd.isna(x) else x for x in exp["v"]]
    assert gv == ev
