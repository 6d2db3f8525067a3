"""Pure-stdlib OOXML reader/writer (sources/xlsx.py — closes the
reference's Excel export/ingestion surface, ref api/export.py:88-473 +
api/reconciliation.py, without xlsxwriter/fastexcel)."""

from __future__ import annotations

import zipfile

from rwa_calculator_spark.sources.xlsx import read_xlsx, write_xlsx, xlsx_to_df


def test_write_read_roundtrip(tmp_path):
    p = str(tmp_path / "wb.xlsx")
    sheets = {
        "Summary": [
            ["exposure_class", "rwa", "is_floored", "note"],
            ["corporate", 1234.56, True, "a&b <c>"],
            ["retail", 7, False, None],
        ],
        "C 02.00": [["cell", "value"], ["r0010c0010", 99.25]],
        # name with characters Excel forbids — sanitised, not crashed
        "bad[name]/x": [["k"], ["v"]],
    }
    write_xlsx(p, sheets)
    back = read_xlsx(p)
    assert list(back) == ["Summary", "C 02.00", "bad_name__x"]
    assert back["Summary"][1] == ["corporate", 1234.56, True, "a&b <c>"]
    assert back["Summary"][2][:3] == ["retail", 7, False]
    assert back["C 02.00"][1] == ["r0010c0010", 99.25]
    # the file is a genuine zip package with the OOXML parts
    with zipfile.ZipFile(p) as z:
        names = set(z.namelist())
    assert {"[Content_Types].xml", "xl/workbook.xml", "_rels/.rels"} <= names


def test_read_shared_strings_variant(tmp_path):
    """Files produced by Excel/xlsxwriter use a sharedStrings part rather
    than inline strings — the reader resolves both."""
    p = str(tmp_path / "ss.xlsx")
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    with zipfile.ZipFile(p, "w") as z:
        z.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats'
            '.org/package/2006/content-types">'
            '<Default Extension="rels" ContentType="application/vnd.openxml'
            'formats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/xl/workbook.xml" ContentType="application/'
            'vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
            "</Types>",
        )
        z.writestr(
            "_rels/.rels",
            '<?xml version="1.0"?><Relationships xmlns="http://schemas.open'
            'xmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
            'officeDocument/2006/relationships/officeDocument" '
            'Target="xl/workbook.xml"/></Relationships>',
        )
        z.writestr(
            "xl/workbook.xml",
            f'<?xml version="1.0"?><workbook xmlns="{ns}" xmlns:r="http://'
            'schemas.openxmlformats.org/officeDocument/2006/relationships">'
            '<sheets><sheet name="Legacy" sheetId="1" r:id="rId1"/></sheets>'
            "</workbook>",
        )
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0"?><Relationships xmlns="http://schemas.open'
            'xmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
            'officeDocument/2006/relationships/worksheet" '
            'Target="worksheets/sheet1.xml"/></Relationships>',
        )
        z.writestr(
            "xl/sharedStrings.xml",
            f'<?xml version="1.0"?><sst xmlns="{ns}" count="2" uniqueCount="2">'
            "<si><t>exposure_reference</t></si><si><t>E1</t></si></sst>",
        )
        z.writestr(
            "xl/worksheets/sheet1.xml",
            f'<?xml version="1.0"?><worksheet xmlns="{ns}"><sheetData>'
            '<row r="1"><c r="A1" t="s"><v>0</v></c></row>'
            '<row r="2"><c r="A2" t="s"><v>1</v></c><c r="B2"><v>42.5</v></c></row>'
            "</sheetData></worksheet>",
        )
    back = read_xlsx(p)
    assert back["Legacy"][0] == ["exposure_reference"]
    assert back["Legacy"][1] == ["E1", 42.5]


def test_xlsx_to_df_and_export_excel(spark, tmp_path):
    """End-to-end: calculate → export_excel → re-ingest the workbook as a
    DataFrame (the reconciliation ingestion path)."""
    from rwa_calculator_spark.api import CreditRiskCalc
    from rwa_calculator_spark.engine.rulepack import CRR_PACK
    from tests.engine_fixtures import build_bundle

    bundle = build_bundle(spark, n_cp=50)
    calc = CreditRiskCalc(spark, bundle, CRR_PACK, cache_dir=str(tmp_path / "cache"))
    resp = calc.calculate()
    p = resp.export_excel(str(tmp_path / "summary.xlsx"))
    back = read_xlsx(p)
    assert set(back) == {"summary_class", "summary_approach", "manifest"}
    # workbook numbers tie out against the cached summary bit-exactly
    cached = {r.exposure_class: r.total_rwa for r in resp.scan_summary("class").collect()}
    header = back["summary_class"][0]
    ci, cv = header.index("exposure_class"), header.index("total_rwa")
    for row in back["summary_class"][1:]:
        assert cached[row[ci]] == row[cv]

    df = xlsx_to_df(spark, p, "summary_approach")
    assert df.count() == len(back["summary_approach"]) - 1
    assert "total_rwa" in df.columns


def test_corep_workbook_export(spark, sf_dir, tmp_path):
    """Quarterly-return workbook (ref reporting/corep/generator.py →
    Excel): a subset export round-trips through the OOXML reader — the
    metadata sheet leads, each template sheet carries the supervisor
    banner (long title + legal basis, DPM codes, published column labels —
    ref corep/templates.py) above the machine header, and a read-back cell
    ties to the query's own output (absent cells stay blank, never 0)."""
    from rwa_calculator_spark.plans import load_all
    from rwa_calculator_spark.reporting_workbook import (
        build_workbook_sheets,
        export_corep_workbook,
        sanitise_sheet_name,
    )
    from rwa_calculator_spark.sources.xlsx import read_xlsx

    subset = (("C 08.04", "corep_c08_04"), ("UK CR8", "pillar3_cr8"))
    path = export_corep_workbook(spark, sf_dir, str(tmp_path / "ret.xlsx"), subset)
    book = read_xlsx(path)
    assert list(book) == ["metadata", "C 08.04", "UK CR8"]
    assert book["metadata"][0] == ["key", "value"]
    reg = load_all()
    c4 = reg["corep_c08_04"].fn(spark, sf_dir)
    # banner rows: [title, basis] / DPM codes / labels / machine header
    assert "RWEA flow statements" in book["C 08.04"][0][0]
    assert "2021/451" in book["C 08.04"][0][1]
    assert book["C 08.04"][3] == c4.columns
    got = {(r[0], r[1]): r[2] for r in book["C 08.04"][4:]}
    for row in c4.collect():
        vals = list(row)
        assert got[(vals[0], vals[1])] == vals[2]
    # CR8's honestly-null driver rows stay blank in the sheet (the reader
    # drops trailing blank cells, so a short row IS the blank cell)
    header = book["UK CR8"][3]
    labels = book["UK CR8"][2]
    rwea_col = header.index("rwea")
    assert labels[rwea_col] == "Risk weighted exposure amount"
    by_ref = {
        r[0]: (r[rwea_col] if rwea_col < len(r) else None)
        for r in book["UK CR8"][4:]
    }
    assert by_ref["5"] in (None, "") and by_ref["6"] in (None, "")


def test_workbook_dpm_codes_and_labels(spark, sf_dir, tmp_path):
    """The C 08.01 sheet's banner carries the Annex II DPM codes extracted
    from the query's own column names and their published labels — the
    catalogue has no second hand-maintained column mapping to drift."""
    from rwa_calculator_spark.reporting_workbook import export_corep_workbook
    from rwa_calculator_spark.sources.xlsx import read_xlsx

    path = export_corep_workbook(
        spark, sf_dir, str(tmp_path / "c08.xlsx"), (("C 08.01", "corep_c08_01"),)
    )
    sheet = read_xlsx(path)["C 08.01"]
    codes, labels, header = sheet[1], sheet[2], sheet[3]
    by_col = dict(zip(header, zip(codes, labels)))
    assert by_col["rwea_0260"] == ("0260", "Risk weighted exposure amount")
    assert by_col["expected_loss_0280"] == ("0280", "Expected loss amount")
    assert by_col["dd_unfunded_0220"][0] == "0220"
    assert "double default" in by_col["dd_unfunded_0220"][1]
    assert by_col["avg_maturity_days_0250"][0] == "0250"
    # semantic (uncoded) columns still label from the shared glossary
    assert by_col["row_label"] == ("", "Template row")


def test_sheet_name_sanitised():
    from rwa_calculator_spark.reporting_workbook import sanitise_sheet_name

    assert sanitise_sheet_name("C 08.01 [IRB]: a/b\\c*?") == "C 08.01 _IRB__ a_b_c__"
    assert len(sanitise_sheet_name("x" * 60)) == 31
