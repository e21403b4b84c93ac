"""Minimal stdlib xlsx reader — zip + XML, no third-party engine.

xlsx is a ZIP package of XML parts (ECMA-376 / ISO 29500, a public
spec): ``xl/workbook.xml`` names the sheets, ``xl/_rels/
workbook.xml.rels`` maps them to worksheet parts, ``xl/
sharedStrings.xml`` holds the deduplicated string table, and each
``xl/worksheets/sheetN.xml`` holds rows of typed cells.

This module exists so the Excel source surface (SURVEY §2.1 S1–S3,
reference `unified_code.py:168-202`) EXECUTES in environments without
openpyxl: ``sources/files.py`` prefers the pandas engine and falls
back here on ImportError. Coverage is the subset a converter pipeline
needs — shared strings, inline strings, numbers, booleans, formula
string results; styles/dates-as-styles/merged ranges are out of scope
(the pandas engine handles those when present).
"""

from __future__ import annotations

import zipfile
from xml.etree import ElementTree as ET

_MAIN = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_RELDOC = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"


def sheet_names(path: str) -> list[str]:
    """Sheet catalog WITHOUT parsing any rows (the S1 validate probe:
    cheap readability check, raises on non-zip / malformed packages)."""
    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        sheets = wb.find(f"{_MAIN}sheets")
        if sheets is None:
            return []
        return [s.get("name", "") for s in sheets]


def _col_index(ref: str) -> int | None:
    """'BC12' -> 54 (0-based column); None when the ref has no letters."""
    i = 0
    for ch in ref:
        if ch.isalpha():
            i = i * 26 + (ord(ch.upper()) - 64)
        else:
            break
    return i - 1 if i else None


def _shared_strings(z: zipfile.ZipFile) -> list[str]:
    if "xl/sharedStrings.xml" not in z.namelist():
        return []
    root = ET.fromstring(z.read("xl/sharedStrings.xml"))
    # an <si> may be plain <t> or rich-text runs; concatenating every
    # descendant <t> covers both
    return [
        "".join(t.text or "" for t in si.iter(f"{_MAIN}t")) for si in root
    ]


def _cell_value(c: ET.Element, shared: list[str]):
    t = c.get("t", "n")
    if t == "inlineStr":
        is_el = c.find(f"{_MAIN}is")
        if is_el is None:
            return None
        return "".join(tt.text or "" for tt in is_el.iter(f"{_MAIN}t"))
    v_el = c.find(f"{_MAIN}v")
    raw = v_el.text if v_el is not None else None
    if raw is None:
        return None
    if t == "s":
        return shared[int(raw)]
    if t == "b":
        return raw in ("1", "true")
    if t == "str":  # cached formula result, string-typed
        return raw
    f = float(raw)
    return int(f) if f.is_integer() else f


def read_rows(path: str) -> dict[str, list[list]]:
    """Parse every sheet into ``{sheet_name: [[cell, ...], ...]}``.

    Row widths follow the rightmost populated cell per row; absent
    cells are ``None`` (same observable shape pandas produces before
    header promotion).
    """
    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        target_of = {r.get("Id"): r.get("Target", "") for r in rels}
        shared = _shared_strings(z)
        out: dict[str, list[list]] = {}
        sheets = wb.find(f"{_MAIN}sheets")
        for s in sheets if sheets is not None else []:
            target = target_of[s.get(f"{_RELDOC}id")]
            if not target.startswith("xl/"):
                target = "xl/" + target.lstrip("/")
            ws = ET.fromstring(z.read(target))
            rows: list[list] = []
            for row in ws.iter(f"{_MAIN}row"):
                cells: dict[int, object] = {}
                for c in row:
                    ref = c.get("r") or ""
                    idx = _col_index(ref)
                    if idx is None:
                        idx = max(cells) + 1 if cells else 0
                    cells[idx] = _cell_value(c, shared)
                width = max(cells) + 1 if cells else 0
                rows.append([cells.get(i) for i in range(width)])
            out[s.get("name", "")] = rows
        return out


def rows_to_pandas(rows: list[list]):
    """Header-promote and dtype-infer like ``pd.read_excel`` does:
    first row is the header; int columns stay int64 unless a null or
    float forces float64; anything mixed is object."""
    import pandas as pd

    if not rows:
        return pd.DataFrame()
    header = [str(h) for h in rows[0]]
    width = len(header)
    data = [r + [None] * (width - len(r)) for r in rows[1:]]
    cols = list(zip(*data)) if data else [()] * width
    series = {}
    for name, vals in zip(header, cols):
        vals = list(vals)
        non_null = [v for v in vals if v is not None]
        if non_null and all(
            isinstance(v, int) and not isinstance(v, bool) for v in non_null
        ):
            dtype = "int64" if len(non_null) == len(vals) else "float64"
        elif non_null and all(
            isinstance(v, (int, float)) and not isinstance(v, bool)
            for v in non_null
        ):
            dtype = "float64"
        elif non_null and all(isinstance(v, bool) for v in non_null) and len(
            non_null
        ) == len(vals):
            dtype = "bool"
        else:
            dtype = "object"
        series[name] = pd.Series(vals, dtype=dtype)
    return pd.DataFrame(series)


def read_workbook(path: str, sheet_name: str | int | None = None):
    """``pd.read_excel``-shaped entry point: ``sheet_name=None`` →
    ``{name: DataFrame}``; an int or str selects one sheet."""
    all_rows = read_rows(path)
    if sheet_name is None:
        return {k: rows_to_pandas(v) for k, v in all_rows.items()}
    if isinstance(sheet_name, int):
        key = list(all_rows)[sheet_name]
    else:
        key = sheet_name
    return rows_to_pandas(all_rows[key])
