"""Third-implementation property checks for the round-9 debut queue
(the `test_pending_oracle_property` pattern): each queued oracle runs
against an INDEPENDENT pure-Python mirror over hypothesis-generated
tables, so an edge bug shared by both engines' SQL (a wrong remainder
rule, an off-by-one at a window edge) cannot hide inside a two-way
agreement. DuckDB-only — no Spark session, so hundreds of random
cases run in seconds."""

from __future__ import annotations

import hashlib
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

import __spark_entry__ as entry  # noqa: F401 — populates the registries


def _oracle_rows(name: str, **frames) -> list[tuple]:
    from catme_etl_spark.operators.registry import ORACLE, PENDING_ORACLE

    sql = ORACLE.get(name) or PENDING_ORACLE[name]
    con = duckdb.connect()
    for t, df in frames.items():
        con.register(t, df)
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


# --- weekly seasonality ------------------------------------------------------

ts_strategy = st.lists(
    st.integers(min_value=0, max_value=120 * 86400),  # seconds, ~4 months
    min_size=1,
    max_size=200,
)


@settings(max_examples=150, deadline=None)
@given(ts_strategy)
def test_seasonality_oracle_equals_counter_mirror(secs):
    df = pd.DataFrame(
        {
            "user_id": [1] * len(secs),
            "ts": pd.to_datetime(secs, unit="s"),
            "event_type": ["view"] * len(secs),
            "value": [1.0] * len(secs),
        }
    )
    got = _oracle_rows("events_weekly_seasonality_profile", events=df)
    from collections import Counter

    c = Counter(((s // 3600) + 72) % 168 for s in secs)
    tot = sum(c.values())
    expect = sorted(
        (how, n, (1_000_000 * n) // tot) for how, n in c.items()
    )
    assert got == expect


# --- diversity/length correlation -------------------------------------------

docs_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=40),  # n_tokens
        st.integers(min_value=1, max_value=40),  # distinct cap
    ),
    min_size=2,
    max_size=30,
)


@settings(max_examples=150, deadline=None)
@given(docs_strategy)
def test_diversity_corr_oracle_equals_python_mirror(spec):
    texts, xs, ys = [], [], []
    for n, dcap in spec:
        nd = min(n, dcap)
        toks = [f"w{i}" for i in range(nd)] + ["w0"] * (n - nd)
        texts.append(" ".join(toks))
        xs.append(n)
        # actual distinct count: w0 may duplicate into the filler
        ys.append((1_000_000 * len(set(toks))) // n)
    df = pd.DataFrame(
        {
            "doc_id": range(1, len(texts) + 1),
            "text": texts,
            "source": ["s"] * len(texts),
            "n_chars": [1] * len(texts),
        }
    )
    got = _oracle_rows("text_diversity_length_corr", documents=df)
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    d1, d2 = n * sxx - sx * sx, n * syy - sy * sy
    if d1 == 0 or d2 == 0:
        expect = [("s", n, True, 0.0)]
    else:
        r = (n * sxy - sx * sy) / (math.sqrt(d1) * math.sqrt(d2))
        expect = [("s", n, False, math.floor(r * 10000 + 0.5) / 10000)]
    assert got == expect


# --- U-shaped attribution ----------------------------------------------------

WINDOW_US = 1_800_000_000

touch_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),          # user
        st.integers(min_value=0, max_value=7200),       # click offset s
    ),
    min_size=0,
    max_size=25,
)
purchase_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),          # user
        st.integers(min_value=0, max_value=7200),       # purchase offset s
        st.integers(min_value=1, max_value=50_000),     # cents
    ),
    min_size=1,
    max_size=8,
)


def _u_credit(cents: int, n: int, rk: int) -> int:
    if n == 1:
        return cents
    if n == 2:
        return cents // 2 + (cents % 2 if rk == 1 else 0)
    forty = (2 * cents) // 5
    if rk == 1 or rk == n:
        return forty
    pool = cents - 2 * forty
    base, extra = divmod(pool, n - 2)
    return base + (1 if rk - 1 <= extra else 0)


@settings(max_examples=150, deadline=None)
@given(touch_strategy, purchase_strategy)
def test_u_shaped_oracle_equals_python_mirror(clicks, purchases):
    rows, eid = [], 1
    for u, s in clicks:
        rows.append((eid, u, s, "click", 0.0))
        eid += 1
    for u, s, cents in purchases:
        rows.append((eid, u, s, "purchase", cents / 100.0))
        eid += 1
    df = pd.DataFrame(
        rows, columns=["event_id", "user_id", "ts", "event_type", "value"]
    )
    df["ts"] = pd.to_datetime(df["ts"], unit="s")
    got = _oracle_rows("events_attribution_u_shaped", events=df)

    # mirror
    from collections import defaultdict

    hourly = defaultdict(lambda: [0, 0])  # hour_us -> [n_clicks, cents]
    clicks_by_user = defaultdict(list)
    for eid2, u, s, t, _v in rows:
        if t == "click":
            clicks_by_user[u].append((s, eid2))
    for eid2, u, s, t, v in rows:
        if t != "purchase":
            continue
        cents = round(v * 100)
        touched = sorted(
            (cs, cid)
            for cs, cid in clicks_by_user[u]
            if 0 <= (s - cs) * 1_000_000 <= WINDOW_US
        )
        n = len(touched)
        for rk, (cs, _cid) in enumerate(touched, start=1):
            h = (cs // 3600) * 3600 * 1_000_000
            hourly[h][0] += 1
            hourly[h][1] += _u_credit(cents, n, rk)
        # conservation identity
        if n:
            assert sum(_u_credit(cents, n, rk) for rk in range(1, n + 1)) == cents
    expect = sorted(
        (h, k, round(c / 100.0, 2)) for h, (k, c) in hourly.items()
    )
    assert got == expect
