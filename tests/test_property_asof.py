"""Property-based differential testing of the bucketed as-of join.

merge_asof without by-keys uses the same range-bucket machinery as the
rolling family (operators/asof.py), where the rolling equivalent hid a
multi-bucket lookback bug — so the as-of carry path gets the same
adversarial treatment: random frames with heavy ties and tiny
num_buckets, compared exactly against pandas.merge_asof.

Tie semantics: pandas merge_asof picks the LAST right row at equal
timestamps; right frames here have unique ``on`` values so spark/pandas
agree without tie-break gymnastics.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pd_explain_spark.operators.asof import merge_asof

LEFT = st.lists(
    st.integers(min_value=0, max_value=30), min_size=1, max_size=40
)
RIGHT = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),
        st.integers(min_value=-100, max_value=100),
    ),
    min_size=0,
    max_size=15,
    unique_by=lambda t: t[0],
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(left=LEFT, right=RIGHT, direction=st.sampled_from(["backward", "forward", "nearest"]))
def test_asof_bucketed_matches_pandas(spark, left, right, direction):
    ldf = spark.createDataFrame([(i, t) for i, t in enumerate(left)], "lid long, t long")
    rdf = spark.createDataFrame(right or [(None, None)], "t long, rv long")
    if not right:
        rdf = rdf.filter("t is not null")
    got = {
        r["lid"]: r["rv"]
        for r in merge_asof(ldf, rdf, on="t", direction=direction, num_buckets=3).collect()
    }
    lpdf = pd.DataFrame({"lid": range(len(left)), "t": left}).sort_values(["t", "lid"])
    rpdf = pd.DataFrame(right, columns=["t", "rv"]).sort_values("t") if right else pd.DataFrame(
        {"t": pd.Series(dtype="int64"), "rv": pd.Series(dtype="int64")}
    )
    m = pd.merge_asof(lpdf, rpdf, on="t", direction=direction)
    want = {
        lid: (None if pd.isna(v) else int(v)) for lid, v in zip(m["lid"], m["rv"])
    }
    assert got == want
