"""Minimal self-contained xlsx read/write (stdlib zipfile + ElementTree).

The reference ingests real .xlsx workbooks (tantalus/utils.py:6-24) through
pandas/openpyxl; this environment has no openpyxl, so this module implements
the small subset of SpreadsheetML (ECMA-376, a public standard) the ingest
path needs: multi-sheet workbooks of shared/inline strings and numbers.
The writer exists chiefly so tests can build golden fixtures without
third-party dependencies.

This is driver-side parsing by design: ingest workbooks are human-authored
sheets (hundreds of rows), not data-plane input. Anything at data scale
arrives as parquet/CSV and goes through ``spark.read``.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_RNS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_PKG_RNS = "{http://schemas.openxmlformats.org/package/2006/relationships}"

Cell = str | float | None


def _col_index(ref: str) -> int:
    """'A1' -> 0, 'B7' -> 1, 'AA3' -> 26."""
    letters = re.match(r"([A-Z]+)", ref).group(1)
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _col_letters(idx: int) -> str:
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def read_workbook(path: str) -> list[tuple[str, list[list[Cell]]]]:
    """Every sheet as (name, rectangular grid). Strings come back as str,
    numbers as float, empty cells as None."""
    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        targets = {
            r.get("Id"): r.get("Target")
            for r in rels.iter(f"{_PKG_RNS}Relationship")
        }
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            ss = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in ss.findall(f"{_NS}si"):
                shared.append(
                    "".join(t.text or "" for t in si.iter(f"{_NS}t")))
        sheets: list[tuple[str, list[list[Cell]]]] = []
        for sh in wb.find(f"{_NS}sheets"):
            target = targets[sh.get(f"{_RNS}id")]
            if not target.startswith("xl/"):
                target = "xl/" + target.lstrip("/")
            root = ET.fromstring(z.read(target))
            raw_rows: list[dict[int, Cell]] = []
            for row in root.iter(f"{_NS}row"):
                cells: dict[int, Cell] = {}
                next_ci = 0
                for c in row.findall(f"{_NS}c"):
                    # the r= cell reference is OPTIONAL in SpreadsheetML;
                    # producers that omit it write cells in column order
                    ref = c.get("r")
                    ci = _col_index(ref) if ref else next_ci
                    next_ci = ci + 1
                    kind = c.get("t")
                    if kind == "s":
                        v: Cell = shared[int(c.find(f"{_NS}v").text)]
                    elif kind in ("inlineStr", "str"):
                        v = "".join(t.text or "" for t in c.iter(f"{_NS}t"))
                    else:
                        ve = c.find(f"{_NS}v")
                        v = None if ve is None or ve.text is None else float(ve.text)
                    cells[ci] = v
                raw_rows.append(cells)
            width = max((max(r) + 1 for r in raw_rows if r), default=0)
            grid = [[r.get(i) for i in range(width)] for r in raw_rows]
            sheets.append((sh.get("name"), grid))
    return sheets


def write_workbook(path: str,
                   sheets: list[tuple[str, list[list[Cell]]]]) -> None:
    """Write a workbook of (name, grid) sheets: str cells as inline
    strings, int/float as numbers, None skipped."""

    def sheet_xml(grid: list[list[Cell]]) -> str:
        rows_xml = []
        for ri, row in enumerate(grid, start=1):
            cells = []
            for ci, v in enumerate(row):
                if v is None:
                    continue
                ref = f"{_col_letters(ci)}{ri}"
                if isinstance(v, (int, float)) and not isinstance(v, bool):
                    cells.append(f'<c r="{ref}"><v>{v}</v></c>')
                else:
                    cells.append(
                        f'<c r="{ref}" t="inlineStr"><is><t xml:space='
                        f'"preserve">{escape(str(v))}</t></is></c>')
            rows_xml.append(f'<row r="{ri}">{"".join(cells)}</row>')
        return (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<worksheet xmlns="{_NS[1:-1]}"><sheetData>'
            f'{"".join(rows_xml)}</sheetData></worksheet>'
        )

    n = len(sheets)
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        + "".join(
            f'<Override PartName="/xl/worksheets/sheet{i}.xml" ContentType='
            '"application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            for i in range(1, n + 1)
        )
        + "</Types>"
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{_PKG_RNS[1:-1]}">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>"
    )
    wb_sheets = "".join(
        f'<sheet name="{escape(name)}" sheetId="{i}" r:id="rId{i}"/>'
        for i, (name, _) in enumerate(sheets, start=1)
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{_NS[1:-1]}" xmlns:r="{_RNS[1:-1]}">'
        f"<sheets>{wb_sheets}</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{_PKG_RNS[1:-1]}">'
        + "".join(
            f'<Relationship Id="rId{i}" Type="http://schemas.openxmlformats.'
            f'org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i}.xml"/>'
            for i in range(1, n + 1)
        )
        + "</Relationships>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        for i, (_, grid) in enumerate(sheets, start=1):
            z.writestr(f"xl/worksheets/sheet{i}.xml", sheet_xml(grid))
