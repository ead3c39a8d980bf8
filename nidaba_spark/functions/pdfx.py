"""PDFX layout parsing: positioned glyph runs → reading-order lines.

Web-text analog of nidaba's page-layout analysis for the PDF payload
class (reference: nidaba/tasks/segmentation.py, tesseract layout
plugin — SURVEY.md §2A A9), in the spirit of pdfminer's
LTTextLine/LTTextBox grouping but fully specified here so the oracle
and the pipeline agree byte-for-byte (no pdfminer in the sandbox).

Input format (produced by the corpus generator, FIXTURES.md §1.1):

    PDFX
    page <width> <height>
    run <x> <y> "<words>"
    run <x> <y> "<words>"
    ...

Runs appear in ARBITRARY order (the generator shuffles them on write);
recovering reading order is the whole point of this operator.

Reading-order spec (deterministic):
  1. Pages are processed in input order; blocks of page i precede
     blocks of page i+1.
  2. Column split: ``split = width / 2``. ``left`` = runs with
     x < split, ``right`` = the rest. The page is two-column iff both
     sides are non-empty and ``min(x of right) - max(x of left) >=
     width / 8``; otherwise it is one column containing all runs.
  3. Within a column, runs are clustered into lines by y: sort by
     (y, x); runs join the current line while their y differs from the
     line's first y by <= 2.0 units.
  4. Within a line, runs are sorted by (x, text) and joined with a
     single space. Columns are emitted left column fully, then right.
  5. Each line becomes one block (kind ``pdf_line`` downstream); text
     is normalized with textnorm.normalize_text; empty lines dropped.

Malformed lines are skipped silently (never raises on arbitrary
bytes — hypothesis-tested).
"""

from __future__ import annotations

import re

from .textnorm import normalize_text

PDFX_MAGIC = b"PDFX\n"

_RUN_RE = re.compile(r'^run\s+(-?[0-9.]+)\s+(-?[0-9.]+)\s+"(.*)"\s*$')
_PAGE_RE = re.compile(r"^page\s+([0-9.]+)\s+([0-9.]+)\s*$")

_Y_TOL = 2.0


def is_pdfx(raw: bytes) -> bool:
    return raw.startswith(PDFX_MAGIC)


def _lines_for_column(runs: list[tuple[float, float, str]]) -> list[str]:
    """Cluster one column's (x, y, text) runs into reading-order lines."""
    out: list[str] = []
    cur: list[tuple[float, float, str]] = []
    cur_y: float | None = None
    for x, y, text in sorted(runs, key=lambda r: (r[1], r[0], r[2])):
        if cur_y is None or abs(y - cur_y) <= _Y_TOL:
            if cur_y is None:
                cur_y = y
            cur.append((x, y, text))
        else:
            out.append(" ".join(t for x_, y_, t in sorted(cur)))
            cur = [(x, y, text)]
            cur_y = y
    if cur:
        out.append(" ".join(t for x_, y_, t in sorted(cur)))
    return out


def parse_pdfx(body: str) -> list[str]:
    """Parse PDFX text → ordered list of normalized line texts."""
    pages: list[tuple[float, list[tuple[float, float, str]]]] = []
    width = 612.0
    runs: list[tuple[float, float, str]] = []
    for line in body.split("\n"):
        line = line.strip()
        m = _PAGE_RE.match(line)
        if m:
            if runs:
                pages.append((width, runs))
            width = float(m.group(1))
            runs = []
            continue
        m = _RUN_RE.match(line)
        if m:
            try:
                runs.append((float(m.group(1)), float(m.group(2)), m.group(3)))
            except ValueError:
                continue
    if runs:
        pages.append((width, runs))

    out: list[str] = []
    for width, page_runs in pages:
        split = width / 2.0
        left = [r for r in page_runs if r[0] < split]
        right = [r for r in page_runs if r[0] >= split]
        two_col = (
            left
            and right
            and (min(r[0] for r in right) - max(r[0] for r in left)) >= width / 8.0
        )
        columns = [left, right] if two_col else [page_runs]
        for col in columns:
            for text in _lines_for_column(col):
                norm = normalize_text(text)
                if norm:
                    out.append(norm)
    return out
