"""Excel (.xlsx) scan/sink with the standard library only (SURVEY.md §2.1 S5).

The reference loads Excel workbooks through pandas ``pd.read_excel``
(ref /root/reference/preprocessing/correlation_graph_ui.py:84-87); this
environment has no openpyxl / spark-excel, so the interchange layer is a
minimal OOXML implementation: an .xlsx file is a ZIP of XML parts, and the
parts needed for tabular data are ``xl/worksheets/sheet1.xml`` (cell grid),
``xl/sharedStrings.xml`` (string pool) and ``xl/workbook.xml`` (sheet
names). That subset round-trips everything the reference's Excel path
consumes: one rectangular sheet, header row, numbers/strings/booleans.

Scale posture: Excel is an INTERCHANGE format — a single workbook is by
definition driver-sized (the format caps at 1,048,576 rows). ``read_excel``
parses on the driver and parallelizes the resulting rows; anything larger
arrives as CSV/Parquet. A directory of many workbooks distributes naturally
(one file per task) via ``read_excel_dir``.
"""

from __future__ import annotations

import re
import zipfile
import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape

from pyspark.sql import DataFrame, SparkSession

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    """Cell reference column letters -> 0-based index (A->0, AA->26)."""
    m = _CELL_REF.match(ref)
    idx = 0
    for ch in (m.group(1) if m else "A"):
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _parse_shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    root = ET.fromstring(data)
    out = []
    for si in root.findall(f"{_NS}si"):
        # a shared string is one <t> or a run of <r><t> rich-text fragments
        out.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
    return out


def _sheet_rows(zf: zipfile.ZipFile, sheet_part: str, shared: list[str]) -> list[list]:
    root = ET.fromstring(zf.read(sheet_part))
    rows: list[list] = []
    for row_el in root.iter(f"{_NS}row"):
        cells: dict[int, object] = {}
        for c in row_el.findall(f"{_NS}c"):
            ref = c.get("r") or "A1"
            ctype = c.get("t") or "n"
            v = c.find(f"{_NS}v")
            if ctype == "inlineStr":
                is_el = c.find(f"{_NS}is")
                val: object = "".join(
                    t.text or "" for t in (is_el.iter(f"{_NS}t") if is_el is not None else [])
                )
            elif v is None or v.text is None:
                val = None
            elif ctype == "s":
                val = shared[int(v.text)]
            elif ctype == "b":
                val = v.text == "1"
            elif ctype == "str":  # formula cached string result
                val = v.text
            elif ctype == "e":  # formula ERROR cell (#DIV/0! etc.) — null,
                val = None      # matching pandas NaN (r10 review: float()
                                # on '#DIV/0!' crashed the whole read)
            elif ctype == "d":  # ISO-8601 date cell: keep the literal text
                val = v.text
            else:  # 'n' numeric
                txt = v.text
                val = int(txt) if re.fullmatch(r"-?\d+", txt) else float(txt)
            cells[_col_index(ref)] = val
        width = max(cells) + 1 if cells else 0
        rows.append([cells.get(i) for i in range(width)])
    return rows


def _sheet_parts(zf: zipfile.ZipFile) -> list[str]:
    """Worksheet part names in workbook order (sheet1, sheet2, ...)."""
    # numeric sort (r10 review: lexicographic sorted() put sheet10.xml
    # before sheet2.xml, silently returning the WRONG sheet for any
    # workbook with 10+ sheets)
    parts = sorted(
        (n for n in zf.namelist() if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)),
        key=lambda n: int(re.search(r"(\d+)\.xml$", n).group(1)),
    )
    return parts


def read_excel(
    spark: SparkSession,
    path: str,
    sheet: int = 0,
    header: bool = True,
) -> DataFrame:
    """S5 — read one sheet of an .xlsx workbook into a DataFrame
    (pd.read_excel parity for the rectangular-table case). Parses on the
    driver (a workbook is <= ~1M rows by format cap), then parallelizes;
    schema comes from the parsed Python values via createDataFrame."""
    with zipfile.ZipFile(path) as zf:
        shared = _parse_shared_strings(zf)
        parts = _sheet_parts(zf)
        if not parts:
            raise ValueError(f"no worksheets found in {path!r}")
        rows = _sheet_rows(zf, parts[sheet], shared)
    if not rows:
        raise ValueError(f"sheet {sheet} of {path!r} is empty")
    if header:
        names = [str(h) if h is not None else f"col_{i}" for i, h in enumerate(rows[0])]
        data = rows[1:]
    else:
        names = [f"col_{i}" for i in range(len(rows[0]))]
        data = rows
    width = len(names)
    # pad ragged rows (trailing empty cells are omitted from the XML) and
    # TRUNCATE rows wider than the header (r10 review: a negative pad
    # count left the row long and createDataFrame crashed on field-count
    # mismatch — pandas also drops unheadered trailing cells)
    data = [r[:width] + [None] * (width - len(r)) for r in data]
    from pyspark.sql import types as T

    if not data:
        # header-only sheet: an empty all-string frame with the header's
        # columns (pandas parity), not an infer-from-empty crash
        schema = T.StructType([T.StructField(n, T.StringType()) for n in names])
        return spark.createDataFrame([], schema)
    if any(all(r[i] is None for r in data) for i in range(width)):
        # an ALL-empty column defeats createDataFrame's type inference
        # (CANNOT_DETERMINE_TYPE) — type each column from its observed
        # Python values instead; all-None -> string (r10 review follow-up)
        def _coltype(i: int):
            vals = [r[i] for r in data if r[i] is not None]
            if not vals:
                return T.StringType()
            if all(isinstance(v, bool) for v in vals):
                return T.BooleanType()
            if all(isinstance(v, int) and not isinstance(v, bool) for v in vals):
                return T.LongType()
            if all(
                isinstance(v, (int, float)) and not isinstance(v, bool) for v in vals
            ):
                return T.DoubleType()
            return T.StringType()

        schema = T.StructType(
            [T.StructField(n, _coltype(i)) for i, n in enumerate(names)]
        )
        conv = []
        for r in data:
            row = []
            for i in range(width):
                v, t = r[i], schema[i].dataType
                if v is None:
                    row.append(None)
                elif isinstance(t, T.DoubleType):
                    row.append(float(v))
                elif isinstance(t, T.StringType):
                    row.append(str(v))
                else:
                    row.append(v)
            conv.append(row)
        return spark.createDataFrame(conv, schema)
    return spark.createDataFrame(data, names)


def read_excel_dir(spark: SparkSession, paths: list[str], sheet: int = 0) -> DataFrame:
    """Many workbooks -> one DataFrame (unionByName). Each file parses
    independently; at scale, prefer staging to Parquet once."""
    dfs = [read_excel(spark, p, sheet=sheet) for p in paths]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out


# ---------------------------------------------------------------- writer

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
</workbook>"""

_WORKBOOK_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""


def _cell_xml(ref: str, value) -> str:
    if value is None:
        return ""
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{1 if value else 0}</v></c>'
    if isinstance(value, (int, float)):
        return f'<c r="{ref}"><v>{value}</v></c>'
    # inline strings avoid a sharedStrings part entirely
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{escape(str(value))}</t></is></c>'


def _col_letters(idx: int) -> str:
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def write_excel(df: DataFrame, path: str, max_rows: int = 1_048_575) -> None:
    """S5 sink — collect (interchange scale; format caps at ~1M rows) and
    write a minimal single-sheet .xlsx. Refuses oversized frames instead of
    silently truncating."""
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"write_excel refused: more than {max_rows} rows — Excel is an "
            "interchange format; write Parquet/CSV instead"
        )
    cols = df.columns
    body = []
    header_cells = "".join(
        _cell_xml(f"{_col_letters(j)}1", name) for j, name in enumerate(cols)
    )
    body.append(f'<row r="1">{header_cells}</row>')
    for i, r in enumerate(rows, start=2):
        cells = "".join(
            _cell_xml(f"{_col_letters(j)}{i}", r[j]) for j in range(len(cols))
        )
        body.append(f'<row r="{i}">{cells}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{''.join(body)}</sheetData></worksheet>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES)
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", _WORKBOOK)
        zf.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
