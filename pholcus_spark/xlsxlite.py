"""Minimal deterministic .xlsx writer — stdlib only (zipfile + XML).

An .xlsx file is a zip of XML parts (ECMA-376 / ISO 29500, the public
OOXML spec). This writer emits the smallest conforming subset: one
workbook, N worksheets, inline strings (no sharedStrings part, no
styles) — exactly what the reference's Excel output needs
(`app/pipeline/collector/output_excel.go:17-77`: a sheet per
namespace__subnamespace, a header row of ItemFields, string cells).

Determinism: fixed zip timestamps and fixed part order, so the same
rows produce byte-identical files (testable, diff-able, idempotent
re-export). All values are written as inline strings — the reference
writes `cell.Value` strings too (non-strings are JSON-stringified
upstream, `output_excel.go:55-60`).

Driver-scale by design, like the reference: pholcus buffers the whole
batch in `col.dataBuf` before writing; the Spark sink mirrors that by
streaming `toLocalIterator()` into the writer so only one partition is
resident. Excel is a human-consumption export, not a data-plane sink —
the scale path is parquet/Iceberg (`sinks.export_images_parquet`).
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.sax.saxutils import escape

_ILLEGAL_SHEET = re.compile(r"[\[\]:*?/\\]")
# control chars are invalid in XML 1.0 text; strip rather than entity
_ILLEGAL_XML = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f]")


def sheet_name(name: str) -> str:
    """Excel sheet-name rules: illegal chars replaced (the reference
    runs util.FileNameReplace on the subnamespace), max 31 chars,
    never empty."""
    clean = _ILLEGAL_SHEET.sub("_", name or "").strip("'") or "Sheet1"
    return clean[:31]


def _col_ref(idx: int) -> str:
    """0-based column index → A1-style letters."""
    out = ""
    idx += 1
    while idx:
        idx, r = divmod(idx - 1, 26)
        out = chr(ord("A") + r) + out
    return out


def _cell_xml(ref: str, value) -> str:
    if value is None:
        value = ""
    text = escape(_ILLEGAL_XML.sub("", str(value)))
    return (
        f'<c r="{ref}" t="inlineStr"><is>'
        f'<t xml:space="preserve">{text}</t></is></c>'
    )


class XlsxWriter:
    """Streaming sheet-at-a-time writer. Usage::

        w = XlsxWriter()
        w.add_sheet("site__detail", ["title", "Url"], iter_of_rows)
        data: bytes = w.save_bytes()       # or w.save(path)
    """

    def __init__(self):
        self._sheets: list[tuple[str, bytes]] = []
        self._names: set[str] = set()

    def add_sheet(self, name: str, header, rows) -> None:
        base = sheet_name(name)
        final, n = base, 1
        while final in self._names:  # dedup like AddSheet would error
            n += 1
            suffix = f"_{n}"
            final = base[: 31 - len(suffix)] + suffix
        self._names.add(final)
        buf = io.StringIO()
        buf.write(
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/'
            'spreadsheetml/2006/main"><sheetData>'
        )
        r = 1
        for row in ([list(header)] if header is not None else []):
            buf.write(f'<row r="{r}">')
            for i, v in enumerate(row):
                buf.write(_cell_xml(f"{_col_ref(i)}{r}", v))
            buf.write("</row>")
            r += 1
        for row in rows:
            buf.write(f'<row r="{r}">')
            for i, v in enumerate(row):
                buf.write(_cell_xml(f"{_col_ref(i)}{r}", v))
            buf.write("</row>")
            r += 1
        buf.write("</sheetData></worksheet>")
        self._sheets.append((final, buf.getvalue().encode("utf-8")))

    def save_bytes(self) -> bytes:
        if not self._sheets:
            self.add_sheet("Sheet1", None, [])
        n = len(self._sheets)
        ct = (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
            'content-types">'
            '<Default Extension="rels" ContentType="application/vnd.'
            'openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/xl/workbook.xml" ContentType="application/'
            "vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"
            '"/>'
            + "".join(
                f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
                'ContentType="application/vnd.openxmlformats-officedocument'
                '.spreadsheetml.worksheet+xml"/>'
                for i in range(n)
            )
            + "</Types>"
        )
        root_rels = (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/'
            'package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats'
            '.org/officeDocument/2006/relationships/officeDocument" '
            'Target="xl/workbook.xml"/></Relationships>'
        )
        wb = (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<workbook xmlns="http://schemas.openxmlformats.org/'
            'spreadsheetml/2006/main" xmlns:r="http://schemas.'
            'openxmlformats.org/officeDocument/2006/relationships"><sheets>'
            + "".join(
                # attribute context: '"' must be escaped too (escape()
                # alone covers only text content)
                f'<sheet name="{escape(nm, {chr(34): "&quot;"})}" '
                f'sheetId="{i + 1}" '
                f'r:id="rId{i + 1}"/>'
                for i, (nm, _) in enumerate(self._sheets)
            )
            + "</sheets></workbook>"
        )
        wb_rels = (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/'
            'package/2006/relationships">'
            + "".join(
                f'<Relationship Id="rId{i + 1}" Type="http://schemas.'
                "openxmlformats.org/officeDocument/2006/relationships/"
                f'worksheet" Target="worksheets/sheet{i + 1}.xml"/>'
                for i in range(n)
            )
            + "</Relationships>"
        )
        out = io.BytesIO()
        stamp = (1980, 1, 1, 0, 0, 0)  # fixed → byte-identical output
        with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:

            def put(arcname, data):
                zi = zipfile.ZipInfo(arcname, date_time=stamp)
                zi.compress_type = zipfile.ZIP_DEFLATED
                zi.external_attr = 0o600 << 16
                z.writestr(zi, data)

            put("[Content_Types].xml", ct)
            put("_rels/.rels", root_rels)
            put("xl/workbook.xml", wb)
            put("xl/_rels/workbook.xml.rels", wb_rels)
            for i, (_, sheet) in enumerate(self._sheets):
                put(f"xl/worksheets/sheet{i + 1}.xml", sheet)
        return out.getvalue()

    def save(self, path: str) -> None:
        data = self.save_bytes()
        with open(path, "wb") as f:
            f.write(data)


def read_xlsx(path_or_bytes) -> dict[str, list[list[str]]]:
    """Independent reader for tests: parses the zip + XML back into
    {sheet_name: [[cell, ...], ...]} without going through the writer's
    string building (ElementTree, namespace-aware)."""
    import xml.etree.ElementTree as ET

    ns = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    src = (
        io.BytesIO(path_or_bytes)
        if isinstance(path_or_bytes, (bytes, bytearray))
        else path_or_bytes
    )
    out: dict[str, list[list[str]]] = {}
    with zipfile.ZipFile(src) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        rel_ns = "{http://schemas.openxmlformats.org/package/2006/relationships}"
        rid_to_target = {
            r.get("Id"): r.get("Target") for r in rels.findall(f"{rel_ns}Relationship")
        }
        r_ns = (
            "{http://schemas.openxmlformats.org/officeDocument/2006/"
            "relationships}"
        )
        for sh in wb.find(f"{ns}sheets").findall(f"{ns}sheet"):
            target = rid_to_target[sh.get(f"{r_ns}id")]
            tree = ET.fromstring(z.read(f"xl/{target}"))
            rows = []
            for row in tree.find(f"{ns}sheetData").findall(f"{ns}row"):
                cells = []
                for c in row.findall(f"{ns}c"):
                    t = c.find(f"{ns}is/{ns}t")
                    cells.append(t.text or "" if t is not None else "")
                rows.append(cells)
            out[sh.get("name")] = rows
    return out
