"""Pure-Python PDF text-block decoder (reference §2 U4 — the last
partial).

The reference decodes its fixed-layout daily-report PDFs with PyMuPDF
(/root/reference/src/pdf/parse_incidents.py:23-38: ``fitz.open`` +
``page.get_text("blocks")``). PyMuPDF is not in this container, so
rounds 1-3 stubbed exactly that call. This module closes the gap with
a from-scratch decoder for standard text PDFs, built only on the
public PDF 1.x file format (ISO 32000 core subset) and ``zlib``:

- **object layer** — scans ``N G obj … endobj``, parses the PDF
  object grammar (dicts, arrays, names, numbers, literal ``(…)`` and
  hex ``<…>`` strings, indirect references, streams with direct or
  indirect ``/Length``), resolves the catalog → page-tree →
  per-page ``/Contents`` (single stream or array, nested ``/Kids``);
- **stream layer** — ``/FlateDecode`` via ``zlib`` (the filter every
  real-world text PDF uses), raw streams passed through;
- **text layer** — interprets the content-stream text operators:
  ``BT/ET`` text objects, ``Td``/``TD``/``Tm``/``T*`` line moves,
  ``TL`` leading, ``Tj``/``TJ``/``'``/``"`` show-text, with literal
  string escapes (``\\n \\r \\t \\b \\f \\( \\) \\\\``, octal,
  line continuations) and hex strings.

Block semantics: one ``BT … ET`` text object = one block, lines
joined by ``\\n`` with a trailing ``\\n`` — the shape report
generators emit (one text object per table row-group) and the shape
PyMuPDF's ``get_text("blocks")`` returns for them, so the
reference's downstream parse rules (``sources/pdf.py:
parse_report_blocks``) apply unchanged. PyMuPDF's geometric
re-clustering of free-form pages is out of scope: this decoder
targets the fixed-layout report PDFs the reference ingests.

``make_report_pdf`` writes a real (valid, Flate-compressed) PDF from
page/block text — the test fixture generator, letting the full
bytes→blocks→bronze path run with zero third-party dependencies and
letting the registry pin the decode against the SQL oracle.
"""

from __future__ import annotations

import re
import zlib

__all__ = ["pdf_pages_blocks", "make_report_pdf", "pdf_from_block_rows"]

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Ref:
    __slots__ = ("num",)

    def __init__(self, num: int):
        self.num = num


class _Stream:
    __slots__ = ("d", "raw")

    def __init__(self, d: dict, raw: bytes):
        self.d = d
        self.raw = raw


def _skip_ws(data: bytes, i: int) -> int:
    n = len(data)
    while i < n:
        c = data[i : i + 1]
        if c in b"%":  # comment to end of line
            while i < n and data[i : i + 1] not in b"\r\n":
                i += 1
        elif c in _WS:
            i += 1
        else:
            break
    return i


def _parse_string(data: bytes, i: int) -> tuple[bytes, int]:
    """Literal string ``(…)`` with nesting, escapes and octal."""
    assert data[i : i + 1] == b"("
    i += 1
    out = bytearray()
    depth = 1
    n = len(data)
    while i < n:
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            e = data[i : i + 1]
            if e == b"n":
                out += b"\n"
            elif e == b"r":
                out += b"\r"
            elif e == b"t":
                out += b"\t"
            elif e == b"b":
                out += b"\b"
            elif e == b"f":
                out += b"\f"
            elif e in b"01234567":
                oct_digits = e
                while (
                    len(oct_digits) < 3
                    and data[i + 1 : i + 2] in b"01234567"
                ):
                    i += 1
                    oct_digits += data[i : i + 1]
                out.append(int(oct_digits, 8) & 0xFF)
            elif e in b"\r\n":  # line continuation
                if e == b"\r" and data[i + 1 : i + 2] == b"\n":
                    i += 1
            else:  # \( \) \\ and unknown escapes: literal next char
                out += e
            i += 1
        elif c == 0x28:
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
            out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    raise ValueError("unterminated PDF string")


def _parse_hex_string(data: bytes, i: int) -> tuple[bytes, int]:
    j = data.index(b">", i)
    hexdigits = re.sub(rb"[^0-9A-Fa-f]", b"", data[i + 1 : j])
    if len(hexdigits) % 2:
        hexdigits += b"0"
    return bytes.fromhex(hexdigits.decode("ascii")), j + 1


_NAME_RE = re.compile(rb"/([^\x00\t\n\x0c\r ()<>\[\]{}/%]*)")
_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")


def _parse_value(data: bytes, i: int):
    """Parse one PDF object value at ``i``; returns (value, next_i)."""
    i = _skip_ws(data, i)
    c = data[i : i + 1]
    if c == b"<":
        if data[i + 1 : i + 2] == b"<":
            d: dict = {}
            i += 2
            while True:
                i = _skip_ws(data, i)
                if data[i : i + 2] == b">>":
                    return d, i + 2
                m = _NAME_RE.match(data, i)
                if not m:
                    raise ValueError(f"bad dict key at {i}")
                key = m.group(1).decode("latin-1")
                v, i = _parse_value(data, m.end())
                d[key] = v
        return _parse_hex_string(data, i)
    if c == b"(":
        return _parse_string(data, i)
    if c == b"/":
        m = _NAME_RE.match(data, i)
        return "/" + m.group(1).decode("latin-1"), m.end()
    if c == b"[":
        arr = []
        i += 1
        while True:
            i = _skip_ws(data, i)
            if data[i : i + 1] == b"]":
                return arr, i + 1
            v, i = _parse_value(data, i)
            arr.append(v)
    if data[i : i + 4] == b"true":
        return True, i + 4
    if data[i : i + 5] == b"false":
        return False, i + 5
    if data[i : i + 4] == b"null":
        return None, i + 4
    m = _NUM_RE.match(data, i)
    if m:
        # "N G R" indirect reference lookahead
        rest = _skip_ws(data, m.end())
        # token boundary after R required (r5, ADVICE): without it a
        # content-stream operator sequence like "1 0 0 RG" would
        # tokenize as a _Ref plus a stray "G"
        m2 = re.compile(rb"(\d+)\s+R(?![A-Za-z0-9])").match(data, rest) if data[
            rest : rest + 1
        ].isdigit() else None
        if m2 is not None and b"." not in m.group(0):
            return _Ref(int(m.group(0))), m2.end()
        tok = m.group(0)
        return (float(tok) if b"." in tok else int(tok)), m.end()
    raise ValueError(f"unparseable PDF value at offset {i}: {data[i:i+20]!r}")


_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")


def _scan_objects(data: bytes) -> dict[int, object]:
    """All indirect objects by number, xref-free (repair-mode scan —
    robust to both classic xref tables and cross-reference streams,
    neither of which needs parsing when every ``obj`` is scanned)."""
    objs: dict[int, object] = {}
    # compressed stream bodies can contain byte runs that look like
    # "N G obj" (r5, ADVICE): track each stream's extent and skip
    # matches that start inside one, and skip (rather than abort on)
    # candidates whose following bytes don't parse as a PDF value —
    # a real object header is always followed by one.
    skip_until = 0
    for m in _OBJ_RE.finditer(data):
        if m.start() < skip_until:
            continue
        num = int(m.group(1))
        try:
            v, i = _parse_value(data, m.end())
        except (ValueError, IndexError):
            continue
        i = _skip_ws(data, i)
        if data[i : i + 6] == b"stream":
            i += 6
            if data[i : i + 2] == b"\r\n":
                i += 2
            elif data[i : i + 1] == b"\n":
                i += 1
            length = v.get("Length") if isinstance(v, dict) else None
            if isinstance(length, int):
                raw = data[i : i + length]
                skip_until = i + length
            else:
                # indirect /Length (resolved later) or damaged dict:
                # fall back to scanning for endstream
                end = data.index(b"endstream", i)
                raw = data[i:end].rstrip(b"\r\n")
                skip_until = end
            v = _Stream(v, raw)
        objs[num] = v
    return objs


def _resolve(objs: dict, v):
    while isinstance(v, _Ref):
        v = objs.get(v.num)
    return v


def _stream_data(objs: dict, s: _Stream) -> bytes:
    raw = s.raw
    length = _resolve(objs, s.d.get("Length"))
    if isinstance(length, int) and length != len(raw):
        # raw was captured by endstream-scan with an indirect length:
        # re-trim to the declared length if plausible
        if length < len(raw):
            raw = raw[:length]
    filt = _resolve(objs, s.d.get("Filter"))
    filters = filt if isinstance(filt, list) else ([filt] if filt else [])
    for f in filters:
        if f == "/FlateDecode":
            raw = zlib.decompress(raw)
        elif f is None:
            pass
        else:
            raise NotImplementedError(f"unsupported PDF filter {f}")
    return raw


def _page_objects(objs: dict) -> list[dict]:
    """Pages in document order via the catalog's page tree (nested
    /Kids supported); falls back to scan order of /Type /Page dicts
    when the trailer/catalog is unusual."""
    root = None
    for v in objs.values():
        v = v.d if isinstance(v, _Stream) else v
        if isinstance(v, dict) and v.get("Type") == "/Catalog":
            root = v
            break
    pages: list[dict] = []
    if root is not None:
        def walk(node):
            node = _resolve(objs, node)
            if isinstance(node, _Stream):
                node = node.d
            if not isinstance(node, dict):
                return
            if node.get("Type") == "/Page":
                pages.append(node)
            else:
                for kid in _resolve(objs, node.get("Kids")) or []:
                    walk(kid)

        walk(root.get("Pages"))
    if not pages:
        pages = [
            v
            for v in objs.values()
            if isinstance(v, dict) and v.get("Type") == "/Page"
        ]
    return pages


def _tokenize_content(data: bytes):
    """Content-stream token iterator: operands + operator keywords."""
    i, n = 0, len(data)
    while i < n:
        i = _skip_ws(data, i)
        if i >= n:
            return
        c = data[i : i + 1]
        if c in b"(<[/" or c in b"+-." or c.isdigit():
            if c == b"[":
                # TJ arrays may contain strings and numbers
                v, i = _parse_value(data, i)
                yield v
            else:
                v, i = _parse_value(data, i)
                yield v
        else:
            j = i
            while j < n and data[j : j + 1] not in _WS + _DELIM:
                j += 1
            yield data[i:j].decode("latin-1")
            i = j


def _text_blocks_of_content(content: bytes) -> list[str]:
    """Interpret one page's content stream; one BT…ET text object →
    one block string (lines joined by \\n, trailing \\n)."""
    blocks: list[str] = []
    operands: list = []
    in_text = False
    lines: list[str] = []
    cur: list[str] = []
    ty = 0.0

    def endline():
        nonlocal cur
        lines.append("".join(cur))
        cur = []

    def show(s):
        if isinstance(s, bytes):
            cur.append(s.decode("latin-1"))

    for tok in _tokenize_content(content):
        if not isinstance(tok, str) or tok.startswith("/"):
            operands.append(tok)
            continue
        op = tok
        if op == "BT":
            in_text, lines, cur, ty = True, [], [], 0.0
        elif op == "ET":
            if in_text:
                if cur or lines:
                    endline()
                txt = "\n".join(lines)
                if txt.strip():
                    blocks.append(txt + "\n")
            in_text = False
        elif op in ("Td", "TD"):
            if len(operands) >= 2 and (cur or lines):
                new_ty = operands[-1]
                if isinstance(new_ty, (int, float)) and new_ty != 0:
                    endline()
        elif op == "Tm":
            if len(operands) >= 6 and (cur or lines):
                new_ty = operands[-1]
                if isinstance(new_ty, (int, float)) and new_ty != ty:
                    endline()
            if len(operands) >= 6 and isinstance(
                operands[-1], (int, float)
            ):
                ty = operands[-1]
        elif op == "T*":
            if cur or lines:
                endline()
        elif op == "Tj":
            if operands:
                show(operands[-1])
        elif op == "'":
            if cur or lines:
                endline()
            if operands:
                show(operands[-1])
        elif op == '"':
            if cur or lines:
                endline()
            if operands:
                show(operands[-1])
        elif op == "TJ":
            if operands and isinstance(operands[-1], list):
                for el in operands[-1]:
                    show(el)
        operands = []
    return blocks


def pdf_pages_blocks(content: bytes) -> list[list[str]]:
    """Decode a PDF: per page (document order), the list of text-block
    strings — the pure-Python stand-in for PyMuPDF's
    ``[p.get_text("blocks") for p in doc]`` on fixed-layout report
    PDFs (see module docstring for the block model)."""
    objs = _scan_objects(content)
    out: list[list[str]] = []
    for page in _page_objects(objs):
        contents = _resolve(objs, page.get("Contents"))
        streams = contents if isinstance(contents, list) else [contents]
        data = b"\n".join(
            _stream_data(objs, s)
            for s in (_resolve(objs, x) for x in streams)
            if isinstance(s, _Stream)
        )
        out.append(_text_blocks_of_content(data))
    return out


def pdf_from_block_rows(rows) -> bytes:
    """Assemble a report PDF from ``(page_number, block_idx,
    block_text)`` tuples (any order; block_text may carry the
    get_text-style trailing newline, which the writer strips — the
    decoder puts it back). Convenience over :func:`make_report_pdf`
    for building fixtures straight from a blocks relation."""
    by_page: dict[int, list[tuple[int, str]]] = {}
    for pno, bidx, btext in rows:
        by_page.setdefault(int(pno), []).append((int(bidx), btext))
    pages = []
    for pno in range(max(by_page) + 1 if by_page else 0):
        blocks = sorted(by_page.get(pno, []))
        pages.append(
            [t[:-1] if t.endswith("\n") else t for _, t in blocks]
        )
    return make_report_pdf(pages)


def _esc(s: str) -> bytes:
    return (
        s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
    ).encode("latin-1")


def make_report_pdf(pages: list[list[str]]) -> bytes:
    """Write a real, valid, Flate-compressed PDF: ``pages`` is a list
    of pages, each a list of block strings (lines separated by
    ``\\n``). Each block becomes one BT…ET text object with ``T*``
    line advances — exactly the fixed-layout report shape
    :func:`pdf_pages_blocks` decodes. Deterministic bytes for
    deterministic input."""
    objects: list[bytes] = []  # 1-indexed bodies, object n = index+1

    n_pages = len(pages)
    page_obj_nums = [4 + 2 * i for i in range(n_pages)]
    kids = b"[" + b" ".join(b"%d 0 R" % n for n in page_obj_nums) + b"]"
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")  # 1
    objects.append(
        b"<< /Type /Pages /Kids " + kids + b" /Count %d >>" % n_pages
    )  # 2
    objects.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>"
    )  # 3
    for i, blocks in enumerate(pages):
        content = bytearray()
        y = 770
        for blk in blocks:
            content += b"BT /F1 10 Tf 12 TL 1 0 0 1 36 %d Tm " % y
            for j, line in enumerate(blk.split("\n")):
                if j:
                    content += b"T* "
                content += b"(" + _esc(line) + b") Tj "
            content += b"ET\n"
            y -= 14 * (blk.count("\n") + 1) + 8
        comp = zlib.compress(bytes(content))
        objects.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> /Contents %d 0 R >>"
            % (page_obj_nums[i] + 1)
        )
        objects.append(
            b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(comp)
            + comp
            + b"\nendstream"
        )
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = []
    for n, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % n + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objects) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objects) + 1, xref_at)
    )
    return bytes(out)
