"""Minimal pure-stdlib XLSX writer/reader (ref api/export.py:88-473 and
reporting/kernel/excel.py — the reference exports COREP/Pillar 3 workbooks
with xlsxwriter and ingests legacy output with fastexcel; neither library
ships in this container, so this module implements the Office Open XML
SpreadsheetML subset those paths need with zipfile + ElementTree only).

Scope (deliberately small, enough for workbook export + reconciliation
re-ingestion round trips):
- write: multiple sheets, str/int/float/bool/None cells, inline strings
  (no sharedStrings table — inline `<is><t>` is valid OOXML and keeps the
  writer single-pass);
- read: sheet → list of rows, resolving BOTH inline strings and a
  sharedStrings part (files produced by Excel/xlsxwriter use the latter),
  numeric cells as float/int, boolean cells.

The workbook XML is driver-side only and template-sized (COREP sheets are
hundreds of cells) — never a distributed concern; big frames export via
parquet/CSV as in the reference.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_NS_R = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_NS_CT = "http://schemas.openxmlformats.org/package/2006/content-types"
_NS_PR = "http://schemas.openxmlformats.org/package/2006/relationships"


def _col_name(idx: int) -> str:
    """0-based column index → A1-style column letters."""
    name = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        name = chr(ord("A") + rem) + name
    return name


def _cell_ref(row: int, col: int) -> str:
    return f"{_col_name(col)}{row + 1}"


_INVALID_SHEET = re.compile(r"[\[\]*?/\\:]")


def _sheet_xml(rows: list[list]) -> str:
    out = [
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
        f'<worksheet xmlns="{_NS}"><sheetData>',
    ]
    for r, row in enumerate(rows):
        out.append(f'<row r="{r + 1}">')
        for c, v in enumerate(row):
            ref = _cell_ref(r, c)
            if v is None:
                continue
            if isinstance(v, bool):
                out.append(f'<c r="{ref}" t="b"><v>{int(v)}</v></c>')
            elif isinstance(v, (int, float)):
                out.append(f'<c r="{ref}"><v>{v!r}</v></c>')
            else:
                out.append(
                    f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
                    f"{escape(str(v))}</t></is></c>"
                )
        out.append("</row>")
    out.append("</sheetData></worksheet>")
    return "".join(out)


def write_xlsx(path: str, sheets: dict[str, list[list]]) -> str:
    """Write `sheets` (name → rows of cells) as a valid .xlsx file."""
    if not sheets:
        raise ValueError("write_xlsx needs at least one sheet")
    names = [
        _INVALID_SHEET.sub("_", n)[:31] or f"Sheet{i + 1}"
        for i, n in enumerate(sheets)
    ]
    ct = [
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
        f'<Types xmlns="{_NS_CT}">',
        '<Default Extension="rels" ContentType='
        '"application/vnd.openxmlformats-package.relationships+xml"/>',
        '<Default Extension="xml" ContentType="application/xml"/>',
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
        'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>',
    ]
    wb = [
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
        f'<workbook xmlns="{_NS}" xmlns:r="{_NS_R}"><sheets>',
    ]
    wb_rels = [
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
        f'<Relationships xmlns="{_NS_PR}">',
    ]
    for i, name in enumerate(names):
        ct.append(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" ContentType='
            '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
            'worksheet+xml"/>'
        )
        wb.append(
            f'<sheet name="{escape(name)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        )
        wb_rels.append(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.openxmlformats'
            '.org/officeDocument/2006/relationships/worksheet" Target='
            f'"worksheets/sheet{i + 1}.xml"/>'
        )
    ct.append("</Types>")
    wb.append("</sheets></workbook>")
    wb_rels.append("</Relationships>")
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{_NS_PR}">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", "".join(ct))
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", "".join(wb))
        z.writestr("xl/_rels/workbook.xml.rels", "".join(wb_rels))
        for i, rows in enumerate(sheets.values()):
            z.writestr(f"xl/worksheets/sheet{i + 1}.xml", _sheet_xml(rows))
    return path


def _parse_cell(cell: ET.Element, shared: list[str]):
    t = cell.get("t", "n")
    if t == "inlineStr":
        el = cell.find(f"{{{_NS}}}is/{{{_NS}}}t")
        return el.text or "" if el is not None else ""
    v = cell.find(f"{{{_NS}}}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "b":
        return v.text == "1"
    if t == "str":
        return v.text
    num = float(v.text)
    return int(num) if num.is_integer() and "." not in v.text and "e" not in v.text.lower() else num


def _ref_col(ref: str) -> int:
    col = 0
    for ch in ref:
        if ch.isalpha():
            col = col * 26 + (ord(ch.upper()) - ord("A") + 1)
        else:
            break
    return col - 1


def read_xlsx(path: str) -> dict[str, list[list]]:
    """Read every sheet of an .xlsx into name → rows (ragged rows padded
    with None up to the right-most populated cell)."""
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall(f"{{{_NS}}}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{{{_NS}}}t")))
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        targets = {
            rel.get("Id"): rel.get("Target") for rel in rels.iter(f"{{{_NS_PR}}}Relationship")
        }
        out: dict[str, list[list]] = {}
        for sheet in wb.iter(f"{{{_NS}}}sheet"):
            rid = sheet.get(f"{{{_NS_R}}}id")
            target = targets[rid]
            if not target.startswith("/"):
                target = "xl/" + target
            else:
                target = target.lstrip("/")
            root = ET.fromstring(z.read(target))
            rows: list[list] = []
            for row_el in root.iter(f"{{{_NS}}}row"):
                r = int(row_el.get("r", len(rows) + 1)) - 1
                while len(rows) <= r:
                    rows.append([])
                for cell in row_el.iter(f"{{{_NS}}}c"):
                    ref = cell.get("r", "")
                    c = _ref_col(ref) if ref else len(rows[r])
                    while len(rows[r]) <= c:
                        rows[r].append(None)
                    rows[r][c] = _parse_cell(cell, shared)
            out[sheet.get("name")] = rows
        return out


def xlsx_to_df(spark, path: str, sheet: str | None = None):
    """Legacy-output ingestion for reconciliation (ref api/reconciliation.py
    — the reference reads prior-run Excel with fastexcel): first row is the
    header, remaining rows data; ragged rows pad with None. Driver-side by
    design — legacy reconciliation files are report-sized."""
    import pandas as pd

    sheets = read_xlsx(path)
    name = sheet if sheet is not None else next(iter(sheets))
    rows = sheets[name]
    if not rows:
        raise ValueError(f"sheet {name!r} is empty")
    header = [str(h) for h in rows[0]]
    width = len(header)
    data = [
        (r + [None] * (width - len(r)))[:width] for r in rows[1:]
    ]
    return spark.createDataFrame(pd.DataFrame(data, columns=header))
