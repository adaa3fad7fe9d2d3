"""Minimal pure-Python PDF text-layer extractor (S2 fallback).

The container has no PyMuPDF, so the real-codec path of
``sources/pdf.py`` was previously untestable; this module closes the
text-layer case (reference `streamlit_app.py:62-66`: per-page
``get_text``) with ~150 lines of stdlib-only parsing:

- object scan: ``N 0 obj .. endobj`` pairs collected by regex (no xref
  walk — robust to generators with sloppy offsets);
- page tree walk: trailer ``/Root`` -> ``/Pages`` -> ``/Kids`` in
  document order (nested ``/Pages`` nodes supported);
- content streams: ``/Contents`` ref or array, ``/FlateDecode``
  inflated via zlib;
- text operators: literal ``(..)`` (with escapes + octal) and hex
  ``<..>`` strings shown by ``Tj``/``'``/``"``/``TJ``; ``Td``/``TD``/
  ``T*`` between shows emit a newline.

Scope (documented, deliberate): simple fonts with byte-oriented
encodings (latin-1 text), no CMap/ToUnicode, no encryption, no object
streams. That covers the text-layer PDFs a test fixture or a plain
generator produces; scanned PDFs have no text layer and go to the OCR
branch anyway (S4). Real clusters install PyMuPDF and take the gated
path in ``sources/pdf.py``.

:func:`make_pdf` is the matching tiny writer (valid xref, optional
Flate compression) used to build REAL pdf fixtures in tests.
"""

from __future__ import annotations

import re
import zlib

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b(.*?)endobj", re.S)
_STREAM_START_RE = re.compile(rb"stream\r?\n")
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\s+\d+\s+R)")
_STR_OR_OP_RE = re.compile(
    rb"(\((?:\\.|[^\\()])*\))|(<[0-9A-Fa-f\s]*>)|(TJ|Tj|T\*|Td|TD|'|\")"
)
_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _objects(data: bytes) -> dict[int, bytes]:
    return {int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(data)}


def _ref(body: bytes, key: bytes) -> int | None:
    m = re.search(re.escape(key) + rb"\s+(\d+)\s+\d+\s+R", body)
    return int(m.group(1)) if m else None


def _ref_list(body: bytes, key: bytes) -> list[int]:
    m = re.search(re.escape(key) + rb"\s*\[(.*?)\]", body, re.S)
    if m:
        return [int(r) for r in re.findall(rb"(\d+)\s+\d+\s+R", m.group(1))]
    single = _ref(body, key)
    return [single] if single is not None else []


def _decode_string(raw: bytes) -> str:
    body, out, i = raw[1:-1], bytearray(), 0
    while i < len(body):
        c = body[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= len(body):
                break
            e = body[i : i + 1]
            if e in _ESCAPES:
                out += _ESCAPES[e]
                i += 1
            elif e.isdigit():  # up to 3 octal digits
                j = i
                while j < len(body) and j - i < 3 and body[j : j + 1].isdigit():
                    j += 1
                out.append(int(body[i:j], 8) & 0xFF)
                i = j
            elif e in (b"\n", b"\r"):  # line continuation
                i += 1
            else:
                out += e
                i += 1
        else:
            out.append(c)
            i += 1
    return out.decode("latin-1")


def _decode_hex(raw: bytes) -> str:
    digits = re.sub(rb"\s", b"", raw[1:-1])
    if len(digits) % 2:
        digits += b"0"
    return bytes.fromhex(digits.decode("ascii")).decode("latin-1")


def _content_text(cs: bytes) -> str:
    out: list[str] = []
    for bt in re.finditer(rb"BT(.*?)ET", cs, re.S):
        pending: list[str] = []
        shown_in_block = False
        for m in _STR_OR_OP_RE.finditer(bt.group(1)):
            lit, hexs, op = m.group(1), m.group(2), m.group(3)
            if lit is not None:
                pending.append(_decode_string(lit))
            elif hexs is not None:
                pending.append(_decode_hex(hexs))
            elif op in (b"Tj", b"'", b'"'):
                if pending:
                    out.append(pending[-1])
                    shown_in_block = True
                pending = []
            elif op == b"TJ":
                out.append("".join(pending))
                shown_in_block = True
                pending = []
            else:  # Td / TD / T* — a line move; newline between shows
                if shown_in_block and out and not out[-1].endswith("\n"):
                    out.append("\n")
    return "".join(out)


def _page_leaves(objs: dict[int, bytes], node: int) -> list[int]:
    body = objs.get(node, b"")
    if b"/Kids" in body:
        leaves: list[int] = []
        for kid in _ref_list(body, b"/Kids"):
            leaves.extend(_page_leaves(objs, kid))
        return leaves
    return [node]


def _stream_bytes(body: bytes) -> bytes:
    m = _STREAM_START_RE.search(body)
    if not m:
        return b""
    start = m.end()
    # /Length is authoritative (the spec requires it): slicing by it is
    # the only way to keep stream data that ENDS in \r or \n — a
    # regex trimming "\r?\n endstream" eats a real trailing 0x0d and
    # truncates ~1/256 of Flate streams (confirmed crash). Fall back
    # to the endstream scan (trailing EOL stripped) only when /Length
    # is an indirect reference this mini-parser doesn't chase.
    lm = _LENGTH_RE.search(body[: m.start()])
    if lm:
        data = body[start : start + int(lm.group(1))]
    else:
        end = body.find(b"endstream", start)
        data = body[start : end if end != -1 else len(body)]
        if data.endswith(b"\n"):
            data = data[:-1]
        if data.endswith(b"\r"):
            data = data[:-1]
    if b"/FlateDecode" in body[: m.start()]:
        data = zlib.decompress(data)
    return data


def extract_pdf_pages_text(content: bytes) -> list[str]:
    """Per-page text of a text-layer PDF; [] when no pages resolve."""
    objs = _objects(content)
    root = None
    for m in re.finditer(rb"/Root\s+(\d+)\s+\d+\s+R", content):
        root = int(m.group(1))
    if root is None:  # no trailer? fall back to any catalog object
        for num, body in objs.items():
            if b"/Catalog" in body:
                root = num
                break
    if root is None:
        return []
    pages_root = _ref(objs.get(root, b""), b"/Pages")
    if pages_root is None:
        return []
    pages = []
    for leaf in _page_leaves(objs, pages_root):
        content_parts = [
            _stream_bytes(objs.get(c, b""))
            for c in _ref_list(objs.get(leaf, b""), b"/Contents")
        ]
        pages.append(_content_text(b"\n".join(content_parts)))
    return pages


def _escape_pdf_text(line: str) -> str:
    return line.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def make_pdf(pages: list[str], compress: bool = False) -> bytes:
    """Tiny but valid single-font PDF writer (test fixtures): one
    content stream per page, each text line a ``Tj`` with ``Td`` line
    moves; correct xref so real readers accept it too."""
    objs: list[bytes] = []  # bodies; object number = index + 1
    n_pages = len(pages)
    font_num = 3 + 2 * n_pages
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")  # 1
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )  # 2
    for i, text in enumerate(pages):
        page_num, content_num = 3 + 2 * i, 4 + 2 * i
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 {font_num} 0 R >> >> "
                f"/Contents {content_num} 0 R >>"
            ).encode()
        )
        ops = ["BT /F1 12 Tf 72 720 Td"]
        for j, line in enumerate(text.split("\n")):
            if j:
                ops.append("0 -14 Td")
            ops.append(f"({_escape_pdf_text(line)}) Tj")
        ops.append("ET")
        data = " ".join(ops).encode("latin-1")
        filt = b""
        if compress:
            data = zlib.compress(data)
            filt = b" /Filter /FlateDecode"
        objs.append(
            b"<< /Length %d%s >>\nstream\n%s\nendstream"
            % (len(data), filt, data)
        )
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for num, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n%s\nendobj\n" % (num, body)
    xref_at = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)
