"""Third-implementation property checks for the round-15 debut queue
(the `test_round9_oracle_property` pattern): each queued oracle runs
against an INDEPENDENT pure-Python mirror over hypothesis-generated
tables — DuckDB-only, no Spark session."""

from __future__ import annotations

import datetime as dt
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


# --- Spearman: doubled average ranks, ppm grid, NULL degeneracy ---------------

cust_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1),       # segment index
        st.integers(min_value=-500_00, max_value=500_00),  # balance cents
        st.lists(                                     # order prices (cents)
            st.integers(min_value=1, max_value=90_000_00),
            max_size=3,
        ),
    ),
    min_size=1,
    max_size=30,
)


def _doubled_ranks(vals):
    return [
        2 * sum(1 for w in vals if w < v) + 1 + sum(1 for w in vals if w == v)
        for v in vals
    ]


@settings(max_examples=120, deadline=None)
@given(cust_strategy)
def test_spearman_oracle_equals_python_mirror(rows):
    segs = ["AUTO", "BIKE"]
    customer = pd.DataFrame(
        [
            (i + 1, segs[s], bal_c / 100.0)
            for i, (s, bal_c, _) in enumerate(rows)
        ],
        columns=["c_custkey", "c_mktsegment", "c_acctbal"],
    )
    orders = pd.DataFrame(
        [
            (100 * (i + 1) + j, i + 1, price_c / 100.0)
            for i, (_, _, prices) in enumerate(rows)
            for j, price_c in enumerate(prices)
        ],
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )
    got = _oracle_rows("agg_spearman_corr", customer=customer, orders=orders)
    by_seg: dict[str, list[tuple[int, int]]] = {}
    for s, bal_c, prices in rows:
        by_seg.setdefault(segs[s], []).append((bal_c, sum(prices)))
    expect = []
    for seg in sorted(by_seg):
        xs = [x for x, _ in by_seg[seg]]
        ys = [y for _, y in by_seg[seg]]
        n = len(xs)
        u = [r - (n + 1) for r in _doubled_ranks(xs)]
        v = [r - (n + 1) for r in _doubled_ranks(ys)]
        su2 = sum(a * a for a in u)
        sv2 = sum(b * b for b in v)
        if su2 == 0 or sv2 == 0:
            rho = None
        else:
            suv = sum(a * b for a, b in zip(u, v))
            rho = math.floor(
                1_000_000.0 * suv / math.sqrt(float(su2) * float(sv2)) + 0.5
            )
        expect.append((seg, n, rho))
    assert got == expect
    for _seg, _n, rho in got:
        assert rho is None or -1_000_000 <= rho <= 1_000_000
    # doubled ranks always sum to n(n+1): the centering constant is free
    for seg in by_seg:
        xs = [x for x, _ in by_seg[seg]]
        assert sum(_doubled_ranks(xs)) == len(xs) * (len(xs) + 1)


# --- BPE merge candidates: frequency-weighted vocabulary pair counts ---------

words_strategy = st.lists(
    st.lists(
        st.text(alphabet="abc", min_size=1, max_size=5), min_size=1, max_size=8
    ),
    min_size=1,
    max_size=15,
)


@settings(max_examples=120, deadline=None)
@given(words_strategy)
def test_bpe_oracle_equals_python_mirror(docs):
    documents = pd.DataFrame(
        [(i + 1, " ".join(ws)) for i, ws in enumerate(docs)],
        columns=["doc_id", "text"],
    )
    got = _oracle_rows("text_bpe_merge_candidates", documents=documents)
    vocab: dict[str, int] = {}
    for ws in docs:
        for w in ws:
            vocab[w] = vocab.get(w, 0) + 1
    occ: dict[str, int] = {}
    sup: dict[str, set[str]] = {}
    for w, freq in vocab.items():
        if len(w) < 2:
            continue
        for i in range(len(w) - 1):
            pair = w[i : i + 2]
            occ[pair] = occ.get(pair, 0) + freq
            sup.setdefault(pair, set()).add(w)
    ranked = sorted(occ, key=lambda p: (-occ[p], p))[:20]
    expect = sorted((p, occ[p], len(sup[p])) for p in ranked)
    assert got == expect


# --- Source quota rollover: min-plus closed form vs sequential ledger --------

arrivals_strategy = st.dictionaries(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # source index
        st.integers(min_value=0, max_value=6),  # day offset
    ),
    st.integers(min_value=1, max_value=25),
    min_size=1,
    max_size=20,
)


@settings(max_examples=100, deadline=None)
@given(arrivals_strategy)
def test_quota_rollover_oracle_equals_sequential_ledger(counts):
    srcs = ["click", "view", "purchase"]
    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = []
    eid = 0
    for (s, off), cnt in sorted(counts.items()):
        for _ in range(cnt):
            eid += 1
            rows.append(
                (eid, base + dt.timedelta(days=off), eid % 7, srcs[s], 1.0)
            )
    events = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    got = _oracle_rows("stream_source_quota_rollover", events=events)
    offs = [off for (_, off) in counts]
    lo, hi = min(offs), max(offs)
    ndays = hi - lo + 1
    present = sorted({srcs[s] for (s, _) in counts})
    expect = []
    for name in present:
        arr = [0] * ndays
        for (s, off), cnt in counts.items():
            if srcs[s] == name:
                arr[off - lo] += cnt
        quota = (9 * sum(arr)) // (10 * ndays)
        carry = 0
        for d, a in enumerate(arr):
            avail = quota + carry
            adm = min(a, avail)
            carry = avail - adm
            day = (base + dt.timedelta(days=lo + d)).strftime("%Y-%m-%d")
            expect.append((name, day, a, quota, adm, a - adm, carry))
    assert got == sorted(expect)
    # closed form invariant: carry = d*Q - cumulative admitted >= 0
    assert all(r[6] >= 0 for r in expect)


# --- Curriculum schedule: largest-remainder exactness over deciles -----------

doc_shape_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=8),  # distinct tokens nd
        st.integers(min_value=0, max_value=7),  # extra repeats
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=100, deadline=None)
@given(doc_shape_strategy)
def test_curriculum_oracle_equals_python_mirror(shapes):
    epochs = 4
    docs = []
    for i, (nd, extra) in enumerate(shapes):
        toks = [f"t{j}" for j in range(nd)] + ["t0"] * extra
        docs.append((i + 1, " ".join(toks)))
    documents = pd.DataFrame(docs, columns=["doc_id", "text"])
    got = _oracle_rows("sample_curriculum_schedule", documents=documents)
    groups: dict[int, list[int]] = {}
    for nd, extra in shapes:
        nt = nd + extra
        s = (1_000_000 * nd) // nt
        g = groups.setdefault(s, [0, 0])
        g[0] += 1
        g[1] += nt
    n = sum(c for c, _ in groups.values())
    t = sum(tk for _, tk in groups.values())
    db: dict[int, list[int]] = {}
    cum = 0
    for s in sorted(groups, reverse=True):
        c, tk = groups[s]
        decile = 1 + (10 * cum) // n
        g = db.setdefault(decile, [0, 0])
        g[0] += c
        g[1] += tk
        cum += c
    budget = t // epochs
    expect = []
    for e in range(1, epochs + 1):
        adm = {d: v for d, v in db.items() if d <= (10 * e + 3) // 4}
        tadm = sum(v[1] for v in adm.values())
        fl = {d: (budget * v[1]) // tadm for d, v in adm.items()}
        rem = {d: (budget * v[1]) % tadm for d, v in adm.items()}
        extra_u = budget - sum(fl.values())
        order = sorted(adm, key=lambda d: (-rem[d], d))
        for d in adm:
            quota = fl[d] + (1 if order.index(d) < extra_u else 0)
            avail = adm[d][1]
            expect.append(
                (
                    e,
                    d,
                    adm[d][0],
                    avail,
                    quota,
                    min(quota, avail),
                    max(quota - avail, 0),
                )
            )
    assert got == sorted(expect)
    for e in range(1, epochs + 1):
        assert sum(r[4] for r in got if r[0] == e) == budget
