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
