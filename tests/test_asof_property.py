"""Property-based check: asof_join matches a brute-force per-row
reference on randomized inputs (hypothesis drives sizes, keys,
timestamps — including ties and keys missing on either side)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from catme_etl_spark.operators.asof import asof_join

_row = st.tuples(
    st.integers(min_value=0, max_value=4),  # key
    st.integers(min_value=0, max_value=50),  # ts
)


def _brute_force(left, right):
    out = []
    for k, t in left:
        cands = [rt for rk, rt in right if rk == k and rt <= t]
        out.append((k, t, max(cands) if cands else None))
    return sorted(out, key=lambda x: (x[0], x[1], -1 if x[2] is None else x[2]))


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(_row, min_size=1, max_size=25),
    right=st.lists(_row, min_size=0, max_size=25),
)
def test_asof_join_matches_bruteforce(spark, left, right):
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k long, ts long, rid long"
    )
    rdf = spark.createDataFrame(right or [(99, 0)], "k long, ts long")
    if not right:
        rdf = rdf.filter("k < 0")  # empty right side, schema kept
    got = asof_join(ldf, rdf, on="k", left_ts="ts", right_ts="ts")
    rows = sorted(
        ((r.k, r.ts, r.ts_asof) for r in got.collect()),
        key=lambda x: (x[0], x[1], -1 if x[2] is None else x[2]),
    )
    assert rows == _brute_force(left, right)
