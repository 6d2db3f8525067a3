"""Quarterly-return workbook export (ref reporting/corep/generator.py:1-773
COREPGenerator → COREPTemplateBundle → Excel + reporting/kernel/excel.py
write_template_sheet/write_metadata_sheet): assemble the computed COREP and
Pillar 3 template estate into ONE .xlsx workbook — the deliverable a
reporting user actually files — via the stdlib OOXML writer.

Shape notes (Spark-first, 100 TB-safe): every sheet is a template-grain
AGGREGATE the registry queries already compute (sparse rows × fixed
columns, thousands of cells at most), so the per-sheet collect is
driver-sized by construction; the expensive part — the exposure-grain
pipeline each template aggregates — runs distributed inside the query.
The reference's kernel/excel.py writes polars frames through xlsxwriter;
here each sheet is header + rows through sources/xlsx.write_xlsx.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession

#: The estate, in the reference generator's filing order (generator.py:10-18
#: lists the C 08.04-07 / OF 02 / C 09 family; the Pillar 3 sheets follow
#: PS1/26 Annex XXII ordering). Sheet titles mirror the publishers' ids;
#: values are registry query names.
WORKBOOK_SHEETS: tuple[tuple[str, str], ...] = (
    ("C 07.00", "corep_c07"),
    ("C 08.01", "corep_c08_01"),
    ("C 08.02", "corep_c08_02"),
    ("C 08.03", "corep_c08_03"),
    ("C 08.04", "corep_c08_04"),
    ("C 08.05", "corep_c08_05"),
    ("C 08.06", "corep_c08_06"),
    ("C 08.07", "corep_c08_07"),
    ("C 09.00", "corep_c09"),
    ("C 34.00", "corep_c34"),
    ("OF 02.00", "corep_of02"),
    ("CRM substitution", "corep_crm_substitution"),
    ("UK OV1", "pillar3_ov1"),
    ("UK CR4", "pillar3_cr4"),
    ("UK CR5", "pillar3_cr5"),
    ("UK CR6", "pillar3_cr6"),
    ("UK CR6-A", "pillar3_cr6a"),
    ("UK CR7", "pillar3_cr7"),
    ("UK CR7-A", "pillar3_cr7a"),
    ("UK CR8", "pillar3_cr8"),
    ("UK CR9", "pillar3_cr9"),
    ("UK CR10", "pillar3_cr10"),
    ("UK CR10.1", "pillar3_cr10_1"),
    ("UK CMS1", "pillar3_cms1"),
    ("UK CMS2", "pillar3_cms2"),
    ("UK CCR2", "pillar3_ccr2"),
    ("IRB scope", "pillar3_irb_scope"),
    ("SA scope", "pillar3_sa_scope"),
)

_INVALID = re.compile(r"[\[\]:*?/\\]")


def sanitise_sheet_name(name: str) -> str:
    """Excel sheet-name rules (ref kernel/excel.py:77-80): strip the
    forbidden characters, cap at 31 chars."""
    return _INVALID.sub("_", name)[:31]


def build_workbook_sheets(
    spark: SparkSession,
    sf_dir: str,
    sheets: tuple[tuple[str, str], ...] = WORKBOOK_SHEETS,
) -> dict[str, list[list]]:
    """Compute each template query and shape it header-first for the OOXML
    writer, led by a metadata sheet (ref kernel/excel.py:131
    write_metadata_sheet — run context first so an auditor opening the file
    knows what produced it). Absent cells stay None (blank in the sheet,
    the absent-≠-zero rule), never 0.0."""
    from rwa_calculator_spark.plans import load_all
    from rwa_calculator_spark.reporting_labels import column_label, sheet_title

    reg = load_all()
    out: dict[str, list[list]] = {}
    meta = [["key", "value"], ["engine", "rwa_calculator_spark"], ["sf_dir", sf_dir]]
    for title, qname in sheets:
        df = reg[qname].fn(spark, sf_dir)
        rows = df.collect()  # template-grain: sparse rows × fixed columns
        # supervisor-readable banner (ref corep/templates.py label/DPM
        # catalogue): long title + legal basis, then per-column DPM codes
        # and published labels, then the machine header the reader keys on
        long_title, basis = sheet_title(title)
        codes, labels = zip(*(column_label(c) for c in df.columns))
        out[sanitise_sheet_name(title)] = [
            [long_title, basis],
            list(codes),
            list(labels),
            list(df.columns),
        ] + [list(r) for r in rows]
        meta.append([f"sheet:{sanitise_sheet_name(title)}", f"{qname} ({len(rows)} rows)"])
    return {"metadata": meta, **out}


def export_corep_workbook(
    spark: SparkSession,
    sf_dir: str,
    path: str,
    sheets: tuple[tuple[str, str], ...] = WORKBOOK_SHEETS,
) -> str:
    """Write the quarterly-return workbook and return its path."""
    from rwa_calculator_spark.sources.xlsx import write_xlsx

    return write_xlsx(path, build_workbook_sheets(spark, sf_dir, sheets))
