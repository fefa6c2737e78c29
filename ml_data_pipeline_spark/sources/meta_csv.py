"""Reference-compatible ``# META:`` CSV interchange (SURVEY.md §1.2, S6).

File format (ref /root/reference/utils/meta_tracker.py:8-17,66-101,132-153):

    # META: v1: dropped column x, imputed mean y
    # META: v2: label-encoded z
    col_a,col_b,...
    1,2,...

Loading parses every leading ``# META: vN: ...`` line into a version history
(the data itself is read by csv_io.read_csv, whose ``comment='#'`` option
skips these lines for free). Saving writes the header lines then the data.

Driver-side only: META headers are a few KB of text; the data path stays
distributed (read via Spark CSV, written per-partition then the header is
prepended to a single-file export — interchange format, interactive scale).
"""

from __future__ import annotations

import re

# colon after vN optional: the reference's legacy header form is
# ``# META: v1 dropped x`` (no colon) and meta_tracker.py accepts both
_META_LINE = re.compile(r"^#\s*META:\s*v(\d+):?\s*(.*)$")


def parse_meta_lines(lines: list[str]) -> dict[int, list[str]]:
    """``# META: vN: a, b`` → {N: [a, b]}. Blank lines inside the comment
    header are tolerated; parsing stops at the first non-blank non-comment
    line (META only appears in the file header)."""
    out: dict[int, list[str]] = {}
    for line in lines:
        if not line.strip():
            continue
        if not line.startswith("#"):
            break
        m = _META_LINE.match(line.strip())
        if m:
            version = int(m.group(1))
            changes = [c.strip() for c in m.group(2).split(",") if c.strip()]
            out[version] = changes
    return out


def format_meta_lines(history: dict[int, list[str]]) -> str:
    """Inverse of parse_meta_lines — header text ready to prepend."""
    return "".join(
        f"# META: v{v}: {', '.join(changes)}\n" for v, changes in sorted(history.items())
    )


def load_meta_header(path: str, max_lines: int = 1000) -> dict[int, list[str]]:
    """Read just the comment header of a local CSV (driver-side)."""
    lines: list[str] = []
    with open(path, encoding="utf-8") as f:
        for _ in range(max_lines):
            line = f.readline()
            if not line:
                break
            if not line.strip():
                continue  # blank line inside the comment header
            if not line.startswith("#"):
                break
            lines.append(line)
    return parse_meta_lines(lines)


def max_version(history: dict[int, list[str]]) -> int:
    return max(history) if history else 0


def load_description_sidecar(path: str) -> dict[str, str]:
    """S12 — column-description sidecar: ``name: description`` lines → dict
    (ref /root/reference/checking_data_formats_ui.py:240-269). Lines without
    a colon are skipped; whitespace trimmed; later duplicates win (matching
    the reference's dict build)."""
    out: dict[str, str] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            if ":" not in line:
                continue
            name, _, desc = line.partition(":")
            name, desc = name.strip(), desc.strip()
            if name:
                out[name] = desc
    return out


def apply_descriptions(df, descriptions: dict[str, str]):
    """Attach descriptions as column comments in StructField metadata —
    schema-level, zero execution cost."""
    from pyspark.sql import functions as F

    return df.select(
        *[
            F.col(c).alias(c, metadata={"comment": descriptions[c]})
            if c in descriptions
            else F.col(c)
            for c in df.columns
        ]
    )
