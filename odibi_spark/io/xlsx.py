"""Pure-Python .xlsx reader — the fallback when openpyxl is absent.

An .xlsx workbook is a zip archive of SpreadsheetML XML parts
(ECMA-376 / ISO 29500). This module reads the subset a data pipeline
actually meets — shared strings, inline strings, numbers, booleans,
and date cells (numeric serials whose cell style carries a date
number format) — and returns pandas DataFrames with the
``pd.read_excel`` keyword subset the excel bridge uses
(``sheet_name`` / ``header`` / ``skiprows`` / ``usecols``).

Reference parity: odibi/engine/pandas_engine.py
``_read_excel_with_patterns`` reads workbooks via pandas+openpyxl;
this keeps the same output contract without the dependency. Scale
note: Excel reads are inherently driver-side (a workbook is one
small file); the Spark side receives the frame via Arrow in
``io.read._read_excel``.
"""

from __future__ import annotations

import datetime as dt
import re
import zipfile
from xml.etree import ElementTree

_MAIN_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_RID = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"

# Built-in number formats that render as dates/times (ECMA-376 §18.8.30)
_DATE_BUILTIN_FMTS = set(range(14, 23)) | set(range(45, 48))


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _col_index(ref: str) -> int:
    """Cell reference column letters -> 0-based index ('BC12' -> 54)."""
    n = 0
    for ch in ref:
        if ch.isalpha():
            n = n * 26 + (ord(ch.upper()) - 64)
        else:
            break
    return n - 1


def _shared_strings(z: zipfile.ZipFile) -> list[str]:
    try:
        data = z.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    root = ElementTree.fromstring(data)
    out = []
    for si in root:
        # plain <t> or rich-text runs <r><t>: concatenate every text node
        out.append("".join(t.text or "" for t in si.iter() if _local(t.tag) == "t"))
    return out


def _date_style_indexes(z: zipfile.ZipFile) -> set[int]:
    """cellXfs indexes whose number format is a date format."""
    try:
        data = z.read("xl/styles.xml")
    except KeyError:
        return set()
    root = ElementTree.fromstring(data)
    custom_is_date: dict[int, bool] = {}
    for el in root.iter():
        if _local(el.tag) == "numFmt":
            code = el.get("formatCode", "")
            # drop quoted literals and [color]/[locale] blocks before
            # probing for date tokens, so '"years" 0.0' is not a date
            probe = re.sub(r'"[^"]*"|\[[^\]]*\]', "", code)
            custom_is_date[int(el.get("numFmtId", "0"))] = bool(
                re.search(r"[ymdhs]", probe, re.IGNORECASE)
            )
    out: set[int] = set()
    cellxfs = [el for el in root.iter() if _local(el.tag) == "cellXfs"]
    if cellxfs:
        xfs = [el for el in cellxfs[0] if _local(el.tag) == "xf"]
        for i, xf in enumerate(xfs):
            fid = int(xf.get("numFmtId", "0"))
            if fid in _DATE_BUILTIN_FMTS or custom_is_date.get(fid, False):
                out.add(i)
    return out


def _sheet_paths(z: zipfile.ZipFile) -> dict[str, str]:
    """Ordered {sheet name: zip path} from workbook.xml + its rels."""
    wb = ElementTree.fromstring(z.read("xl/workbook.xml"))
    rels = ElementTree.fromstring(z.read("xl/_rels/workbook.xml.rels"))
    targets = {}
    for rel in rels:
        tgt = rel.get("Target", "")
        if tgt.startswith("/"):
            tgt = tgt[1:]
        elif not tgt.startswith("xl/"):
            tgt = "xl/" + tgt
        targets[rel.get("Id")] = tgt
    out: dict[str, str] = {}
    for el in wb.iter():
        if _local(el.tag) == "sheet":
            out[el.get("name")] = targets[el.get(_RID)]
    return out


def _serial_to_datetime(serial: float) -> dt.datetime:
    # 1900 date system. Epoch 1899-12-30 absorbs Excel's phantom
    # 1900-02-29; exact for every serial >= 61 (all of 1900-03-01 on).
    return dt.datetime(1899, 12, 30) + dt.timedelta(days=serial)


def _cell_value(cell, strings: list[str], date_styles: set[int]):
    ctype = cell.get("t", "n")
    style = int(cell.get("s", "-1"))
    v_el = inline = None
    for child in cell:
        lt = _local(child.tag)
        if lt == "v":
            v_el = child
        elif lt == "is":
            inline = child
    if ctype == "inlineStr":
        if inline is None:
            return None
        return "".join(t.text or "" for t in inline.iter() if _local(t.tag) == "t")
    if v_el is None or v_el.text is None:
        return None
    raw = v_el.text
    if ctype == "s":
        return strings[int(raw)]
    if ctype == "str":  # cached formula result, already a string
        return raw
    if ctype == "b":
        return raw in ("1", "true")
    if ctype == "e":  # error cell (#DIV/0! etc.)
        return None
    num = float(raw)
    if style in date_styles:
        return _serial_to_datetime(num)
    if num == int(num) and "." not in raw and "e" not in raw.lower():
        return int(num)
    return num


def _read_grid(z: zipfile.ZipFile, sheet_path: str, strings, date_styles):
    """Sheet XML -> dense list-of-lists (None for absent cells)."""
    root = ElementTree.fromstring(z.read(sheet_path))
    rows: dict[int, dict[int, object]] = {}
    # SpreadsheetML r= attributes are optional; when absent, the row /
    # cell is the NEXT index after the previously seen one (sequential
    # semantics). Deriving fallbacks from dict size / max(cells) can
    # collide with explicitly numbered neighbors, so track last-seen.
    last_r = 0
    for row in root.iter(f"{_MAIN_NS}row"):
        r_attr = row.get("r")
        r = int(r_attr) if r_attr is not None else last_r + 1
        last_r = r
        cells: dict[int, object] = {}
        last_ci = -1
        for c in row:
            if _local(c.tag) != "c":
                continue
            ref = c.get("r")
            ci = _col_index(ref) if ref else last_ci + 1
            last_ci = ci
            cells[ci] = _cell_value(c, strings, date_styles)
        rows[r] = cells
    if not rows:
        return []
    ncol = max((max(c) + 1 for c in rows.values() if c), default=0)
    return [
        [rows.get(r, {}).get(i) for i in range(ncol)]
        for r in range(1, max(rows) + 1)
    ]


def read_xlsx(path, sheet_name=0, header=0, skiprows=None, usecols=None):
    """pd.read_excel-compatible (subset) pure-Python reader.

    ``sheet_name``: int index, sheet name, or None for a dict of all
    sheets (workbook order). ``header``: row index for column names or
    None. ``skiprows``: leading rows to drop before header handling.
    ``usecols``: list of column names to keep (post-header).
    """
    import pandas as pd

    with zipfile.ZipFile(path) as z:
        strings = _shared_strings(z)
        date_styles = _date_style_indexes(z)
        sheets = _sheet_paths(z)

        def build(sheet_path: str) -> pd.DataFrame:
            grid = _read_grid(z, sheet_path, strings, date_styles)
            if skiprows:
                grid = grid[int(skiprows):]
            if header is None:
                df = pd.DataFrame(grid)
            else:
                h = int(header)
                if len(grid) <= h:
                    return pd.DataFrame()
                cols = [
                    str(c) if c is not None else f"Unnamed: {i}"
                    for i, c in enumerate(grid[h])
                ]
                df = pd.DataFrame(grid[h + 1:], columns=cols)
            df = df.infer_objects()
            if usecols:
                df = df[list(usecols)]
            return df

        if sheet_name is None:
            return {name: build(p) for name, p in sheets.items()}
        if isinstance(sheet_name, int):
            names = list(sheets)
            if sheet_name >= len(names):
                raise ValueError(f"workbook has {len(names)} sheets, asked for index {sheet_name}")
            return build(sheets[names[sheet_name]])
        if sheet_name not in sheets:
            raise ValueError(f"no sheet named '{sheet_name}' (have: {sorted(sheets)})")
        return build(sheets[sheet_name])
