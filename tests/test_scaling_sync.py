"""SCALING.md ladder ↔ scaling-ladder-tool sync (round-7 item #6).

The exponent ladder's query selection used to be a hand-picked
``--only`` list, so a heavy query added in a later round could silently
miss its exponent row. The ladder is now auto-enrolling: the tool reads
the latest ``BENCH_r*.json`` and takes its top-N by normalized time,
and the committed SCALING.md table embeds a provenance marker naming
the bench file and N it was generated from. This test recomputes that
selection and asserts the committed table rows equal it — the
``test_ordering.py`` pattern applied to the ladder."""

from __future__ import annotations

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _last_auto_table(text: str):
    """(bench_name, top, query_names) for the LAST ladder:auto marker
    in SCALING.md — later rounds append newer tables below."""
    markers = list(
        re.finditer(r"<!-- ladder:auto bench=(\S+) top=(\d+) -->", text)
    )
    assert markers, "SCALING.md has no ladder:auto provenance marker"
    m = markers[-1]
    tail = text[m.end():]
    names = []
    for line in tail.splitlines():
        line = line.strip()
        if not line:
            if names:
                break
            continue
        cell = re.match(r"\|\s*`([a-zA-Z0-9_]+)`\s*\|", line)
        if cell:
            names.append(cell.group(1))
        elif names:
            break
    return m.group(1), int(m.group(2)), names


def test_committed_ladder_equals_tool_selection():
    import tools.scaling_ladder as ladder

    with open(os.path.join(REPO, "SCALING.md")) as f:
        text = f.read()
    bench_name, top, committed = _last_auto_table(text)
    bench_path = os.path.join(REPO, bench_name)
    assert os.path.exists(bench_path), bench_name
    expected = ladder.top_queries(bench_path, top)
    assert set(committed) == set(expected), (
        "SCALING.md ladder table is out of sync with "
        f"`python tools/scaling_ladder.py --bench {bench_name} --top {top} "
        "--markdown` — regenerate and paste"
    )
    # Staleness bound: the marker's bench may lag the newest usable
    # bench by at most ONE round. Exactly one round of lag is
    # unavoidable by construction — the driver records BENCH_rNN.json
    # AFTER the round's last commit, so the newest file at judge time
    # is always one newer than anything the builder could have read.
    # A 2+-round lag means a round skipped regeneration — that's the
    # silent-miss this test exists to catch.
    def _round_of(name: str) -> int:
        m = re.search(r"BENCH_r(\d+)", name)
        assert m, name
        return int(m.group(1))

    newest = os.path.basename(ladder.latest_bench())
    assert _round_of(bench_name) >= _round_of(newest) - 1, (
        f"ladder was generated from {bench_name} but {newest} exists — "
        "a round skipped regeneration; re-run the ladder and paste"
    )
