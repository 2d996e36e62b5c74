"""Pure-Python PDF text codec (PDF 1.4 subset) — writer + text extractor,
implemented from the public specification (ISO 32000-1 / the Adobe PDF
1.4 reference): COS object syntax (§7.3), cross-reference table +
trailer (§7.5), page tree (§7.7.3), content streams (§7.8), FlateDecode
(§7.4.4, via stdlib zlib), text-showing and text-positioning operators
(§9.4.2/9.4.3), and literal/hex string encodings with the full escape
set (§7.3.4).

Why it exists: scientific/web corpora arrive as PDFs, and "PDF → text"
is the first step of every document-ingestion pipeline; the container
ships no pdfminer/PyPDF, so — like the JPEG/PNG/GIF/WAV tiers — the
codec is from-spec. The WRITER exists for fixtures and the oracle
anchor (text layout is deterministic, so encode→extract round-trips
exactly); the EXTRACTOR is the production operator and is deliberately
tolerant: it scans `N G obj … endobj` spans rather than trusting the
xref byte offsets (real-world PDFs routinely carry broken xrefs; every
practical extractor does this), locates stream payloads by their
`stream`/`endstream` markers, and walks the page tree recursively.

Extraction model (the standard heuristic, stated so limits are explicit):
text inside BT…ET blocks is shown by Tj / ' / " / TJ; a line break is
emitted for each T*, Td, TD, or Tm between shows, and for the ' and "
operators' implicit T*. TJ kerning numbers are ignored (no
inter-glyph-space synthesis); fonts/encodings are not mapped (bytes are
decoded latin-1 — exact for the ASCII fixtures; real CID-keyed fonts
would need CMaps, out of scope and flagged in the operator docstring).

Scale note: like the other codecs this runs inside Arrow batches
(mapInPandas) — per-document work, embarrassingly parallel, no shuffle.
"""

from __future__ import annotations

import re
import zlib

# --------------------------------------------------------------------------
# Writer
# --------------------------------------------------------------------------

_ESCAPES = {
    ord("\\"): b"\\\\",
    ord("("): b"\\(",
    ord(")"): b"\\)",
    ord("\n"): b"\\n",
    ord("\r"): b"\\r",
    ord("\t"): b"\\t",
    ord("\b"): b"\\b",
    ord("\f"): b"\\f",
}


def _pdf_string(s: str) -> bytes:
    """Literal-string encoding (§7.3.4): escape the delimiter/backslash
    set, octal-escape anything outside printable ASCII."""
    out = bytearray(b"(")
    for b in s.encode("latin-1", "replace"):
        esc = _ESCAPES.get(b)
        if esc is not None:
            out += esc
        elif 32 <= b <= 126:
            out.append(b)
        else:
            out += b"\\%03o" % b
    out += b")"
    return bytes(out)


def encode_pdf(pages: list[list[str]], compress: bool = True) -> bytes:
    """Minimal deterministic PDF: one Catalog, one Pages node, one
    Helvetica font, one page + FlateDecode'd content stream per entry of
    ``pages`` (each entry = that page's text lines, drawn with
    ``BT … Tf/TL/Td, Tj + T* … ET``). Valid per spec: correct xref
    offsets, /Length on every stream, %%EOF trailer. ``pages=[]`` is
    legal (ADVICE r10: a token-less document typesets to an empty page
    tree — /Kids [] /Count 0 — and extracts back to zero pages)."""
    if not isinstance(pages, list) or any(not isinstance(p, list) for p in pages):
        raise ValueError("encode_pdf: pages must be a list of line-lists")
    n = len(pages)
    font_num = 3 + 2 * n
    objects: dict[int, bytes] = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids ["
        + b" ".join(b"%d 0 R" % (3 + 2 * i) for i in range(n))
        + b"] /Count %d >>" % n,
        font_num: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    }
    for i, lines in enumerate(pages):
        page_num, content_num = 3 + 2 * i, 4 + 2 * i
        objects[page_num] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 %d 0 R >> >> "
            b"/Contents %d 0 R >>" % (font_num, content_num)
        )
        ops = bytearray(b"BT /F1 12 Tf 14 TL 72 720 Td\n")
        for j, line in enumerate(lines):
            if j:
                ops += b"T*\n"
            ops += _pdf_string(line) + b" Tj\n"
        ops += b"ET"
        payload = bytes(ops)
        if compress:
            payload = zlib.compress(payload, 9)
            head = b"<< /Length %d /Filter /FlateDecode >>" % len(payload)
        else:
            head = b"<< /Length %d >>" % len(payload)
        objects[content_num] = head + b"\nstream\n" + payload + b"\nendstream"

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objects[num] + b"\nendobj\n"
    xref_at = len(out)
    size = max(objects) + 1
    out += b"xref\n0 %d\n" % size
    out += b"0000000000 65535 f \n"
    for num in range(1, size):
        out += b"%010d 00000 n \n" % offsets[num]
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (size, xref_at)
    )
    return bytes(out)


# --------------------------------------------------------------------------
# Extractor
# --------------------------------------------------------------------------

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)\bendobj", re.DOTALL)
_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Lexer:
    """Minimal COS tokenizer over one object body / content stream."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def _skip_ws(self) -> None:
        d, n = self.data, len(self.data)
        while self.pos < n:
            c = d[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # % comment → end of line
                while self.pos < n and d[self.pos] not in b"\r\n":
                    self.pos += 1
            else:
                return

    def next_token(self):
        """→ ('name'|'num'|'str'|'op'|'dict_open'|'dict_close'|
        'arr_open'|'arr_close', value) or None at end."""
        self._skip_ws()
        d, n = self.data, len(self.data)
        if self.pos >= n:
            return None
        c = d[self.pos]
        if d.startswith(b"<<", self.pos):
            self.pos += 2
            return ("dict_open", None)
        if d.startswith(b">>", self.pos):
            self.pos += 2
            return ("dict_close", None)
        if c == 0x5B:  # [
            self.pos += 1
            return ("arr_open", None)
        if c == 0x5D:  # ]
            self.pos += 1
            return ("arr_close", None)
        if c == 0x2F:  # /name
            self.pos += 1
            start = self.pos
            while self.pos < n and d[self.pos] not in _WS and d[self.pos] not in _DELIM:
                self.pos += 1
            return ("name", d[start : self.pos].decode("latin-1"))
        if c == 0x28:  # ( literal string
            return ("str", self._literal_string())
        if c == 0x3C:  # < hex string
            return ("str", self._hex_string())
        # number or operator/keyword
        start = self.pos
        while self.pos < n and d[self.pos] not in _WS and d[self.pos] not in _DELIM:
            self.pos += 1
        word = d[start : self.pos]
        if not word:  # lone delimiter we don't model ({ })
            self.pos += 1
            return ("op", d[start : start + 1].decode("latin-1"))
        try:
            return ("num", float(word))
        except ValueError:
            return ("op", word.decode("latin-1"))

    def _literal_string(self) -> str:
        d, n = self.data, len(self.data)
        assert d[self.pos] == 0x28
        self.pos += 1
        out = bytearray()
        depth = 1
        while self.pos < n:
            c = d[self.pos]
            if c == 0x5C:  # backslash
                self.pos += 1
                if self.pos >= n:
                    break
                e = d[self.pos]
                if e in b"nrtbf":
                    out += {0x6E: b"\n", 0x72: b"\r", 0x74: b"\t",
                            0x62: b"\b", 0x66: b"\f"}[e]
                    self.pos += 1
                elif e in b"01234567":
                    # §7.3.4: only 0-7 open an octal escape; \8 and \9
                    # are unknown escapes → the char itself (ADVICE r10)
                    oct_digits = bytearray()
                    while len(oct_digits) < 3 and self.pos < n and d[self.pos] in b"01234567":
                        oct_digits.append(d[self.pos])
                        self.pos += 1
                    out.append(int(bytes(oct_digits), 8) & 0xFF)
                elif e in b"\r\n":  # line continuation
                    self.pos += 1
                    if e == 0x0D and self.pos < n and d[self.pos] == 0x0A:
                        self.pos += 1
                else:  # \( \) \\ and unknown escapes → the char itself
                    out.append(e)
                    self.pos += 1
            elif c == 0x28:
                depth += 1
                out.append(c)
                self.pos += 1
            elif c == 0x29:
                depth -= 1
                self.pos += 1
                if depth == 0:
                    break
                out.append(c)
            else:
                out.append(c)
                self.pos += 1
        return out.decode("latin-1")

    def _hex_string(self) -> str:
        d, n = self.data, len(self.data)
        assert d[self.pos] == 0x3C
        self.pos += 1
        digits = bytearray()
        while self.pos < n and d[self.pos] != 0x3E:
            if d[self.pos : self.pos + 1].strip(b"\x00\t\n\x0c\r "):
                digits.append(d[self.pos])
            self.pos += 1
        self.pos += 1  # past >
        if len(digits) % 2:
            digits.append(0x30)  # odd count: final digit padded with 0 (§7.3.4.3)
        return bytes.fromhex(digits.decode("latin-1")).decode("latin-1")

    def parse_value(self, tok=None):
        """One COS value (dict/array/name/num/str/ref/keyword)."""
        tok = tok or self.next_token()
        if tok is None:
            return None
        kind, val = tok
        if kind == "dict_open":
            out = {}
            while True:
                k = self.next_token()
                if k is None or k[0] == "dict_close":
                    return out
                key = k[1] if k[0] == "name" else str(k[1])
                out[key] = self.parse_value()
        if kind == "arr_open":
            arr = []
            while True:
                t = self.next_token()
                if t is None or t[0] == "arr_close":
                    return arr
                arr.append(self.parse_value(t))
        if kind == "num":
            # possible indirect reference: NUM GEN R
            save = self.pos
            t2 = self.next_token()
            if t2 and t2[0] == "num":
                t3 = self.next_token()
                if t3 and t3 == ("op", "R"):
                    return ("ref", int(val))
                self.pos = save
            else:
                self.pos = save
            return val
        return val


def _parse_objects(data: bytes) -> dict[int, bytes]:
    """Tolerant object index: every ``N G obj … endobj`` span in the
    file, keyed by object number (later generations win — the
    incremental-update rule)."""
    return {int(m.group(1)): m.group(3) for m in _OBJ_RE.finditer(data)}


def _object_value(body: bytes):
    return _Lexer(body).parse_value()


_STREAM_RE = re.compile(rb"stream\r?\n")


def _stream_payload(
    body: bytes, obj_dict: dict, objects: dict[int, bytes] | None = None
) -> bytes | None:
    m = _STREAM_RE.search(body)
    if not m:
        return None
    length = obj_dict.get("Length")
    if objects is not None:
        length = _resolve(objects, length)
    if isinstance(length, (int, float)) and length >= 0:
        # the spec'd path: /Length is exact, and guessing instead would
        # corrupt any compressed payload that happens to END in EOL
        # bytes (measured: ~1% of zlib streams end in 0x0A/0x0D)
        payload = body[m.end() : m.end() + int(length)]
    else:
        # tolerant fallback (broken/absent /Length): scan to endstream,
        # then drop the EOL that the spec says precedes it
        end = body.rfind(b"endstream")
        payload = body[m.end() : end if end != -1 else len(body)]
        if payload.endswith(b"\r\n"):
            payload = payload[:-2]
        elif payload.endswith(b"\n") or payload.endswith(b"\r"):
            payload = payload[:-1]
    filt = obj_dict.get("Filter")
    filters = [filt] if isinstance(filt, str) else (filt or [])
    for f in filters:
        if f == "FlateDecode":
            payload = zlib.decompress(payload)
        else:
            raise ValueError(f"unsupported stream filter: {f}")
    return payload


def _resolve(objects: dict[int, bytes], v):
    while isinstance(v, tuple) and v and v[0] == "ref":
        num = v[1]
        if num not in objects:
            raise ValueError(f"dangling object reference: {num}")
        v = _object_value(objects[num])
    return v


def _page_content_text(content: bytes) -> str:
    """Run the text-operator subset over one (decoded) content stream →
    the page's text with the standard newline heuristic (see module
    docstring)."""
    lex = _Lexer(content)
    stack: list = []
    lines: list[str] = [""]
    in_text = False
    # `shown` = some show op already ran on this page: positioning ops
    # BEFORE the first show (the initial Td every writer emits) must not
    # open a blank line, while the same ops BETWEEN shows — even shows
    # of EMPTY strings — are genuine line breaks (property-fuzz caught
    # the empty-show case: page ['', ''] must round-trip to '\n').
    shown = False
    while True:
        tok = lex.next_token()
        if tok is None:
            break
        kind, val = tok
        if kind in ("str", "num", "name"):
            stack.append(val)
            continue
        if kind == "arr_open":
            stack.append(lex.parse_value(tok))
            continue
        if kind in ("dict_open",):
            stack.append(lex.parse_value(tok))
            continue
        op = val
        if op == "BT":
            in_text = True
            if lines[-1] != "":  # a new text object starts a new line
                lines.append("")
        elif op == "ET":
            in_text = False
        elif in_text:
            if op == "Tj" and stack:
                lines[-1] += str(stack[-1])
                shown = True
            elif op in ("'", '"') and stack:
                # implicit T* then show
                if shown:
                    lines.append(str(stack[-1]))
                else:
                    lines[-1] += str(stack[-1])
                shown = True
            elif op == "TJ" and stack and isinstance(stack[-1], list):
                lines[-1] += "".join(x for x in stack[-1] if isinstance(x, str))
                shown = True
            elif op in ("T*", "Td", "TD", "Tm"):
                if shown:
                    lines.append("")
        stack.clear()
    return "\n".join(lines)


def _walk_pages(objects: dict[int, bytes], node) -> list[dict]:
    node = _resolve(objects, node)
    if not isinstance(node, dict):
        raise ValueError("page-tree node is not a dictionary")
    if node.get("Type") == "Pages" or "Kids" in node:
        pages: list[dict] = []
        for kid in _resolve(objects, node.get("Kids", [])) or []:
            pages.extend(_walk_pages(objects, kid))
        return pages
    return [node]


_OBJ_HEAD_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")


def _object_span(data: bytes, off: int) -> tuple[int, bytes] | None:
    """Parse the object starting at byte ``off`` delimited by its OWN
    structure — the stream payload is skipped via /Length (or the
    ``endstream`` marker) before the ``endobj`` search — so payload
    bytes that merely look like ``endobj`` cannot truncate the span."""
    m = _OBJ_HEAD_RE.match(data, off)
    if not m:
        return None
    body_start = m.end()
    sm = _STREAM_RE.search(data, body_start)
    em = data.find(b"endobj", body_start)
    if sm is not None and (em == -1 or sm.start() < em):
        head = _object_value(data[body_start : sm.start()])
        length = head.get("Length") if isinstance(head, dict) else None
        if isinstance(length, (int, float)) and length >= 0:
            pay_end = sm.end() + int(length)
        else:  # indirect/absent /Length: scan for the marker instead
            es = data.find(b"endstream", sm.end())
            pay_end = es if es != -1 else len(data)
        em = data.find(b"endobj", pay_end)
    end = em if em != -1 else len(data)
    return int(m.group(1)), data[body_start:end]


def _parse_objects_xref(data: bytes) -> dict[int, bytes]:
    """Object index from the cross-reference table (§7.5) — the
    fallback when the tolerant ``N G obj … endobj`` regex scan mis-spans
    an object because a stream payload contains the ``endobj`` or
    ``N G obj`` byte patterns (ADVICE r10): offsets come from the last
    ``startxref``; each object is then span-delimited by its own
    /Length. Returns ``{}`` when no classic xref table is walkable
    (xref-stream PDFs), letting the caller surface the original error."""
    at = data.rfind(b"startxref")
    if at == -1:
        return {}
    m = re.match(rb"startxref\s+(\d+)", data[at:])
    if not m:
        return {}
    xref_at = int(m.group(1))
    if not 0 <= xref_at < len(data):
        return {}
    m = re.match(rb"\s*xref\b", data[xref_at:])
    if not m:
        return {}
    pos = xref_at + m.end()
    offsets: dict[int, int] = {}
    while True:
        sub = re.match(rb"\s*(\d+)\s+(\d+)\s*\r?\n", data[pos:])
        if not sub:
            break
        start, count = int(sub.group(1)), int(sub.group(2))
        pos += sub.end()
        for i in range(count):
            ent = re.match(rb"\s*(\d{10})\s+(\d{5})\s+([nf])", data[pos:])
            if not ent:
                return {}
            if ent.group(3) == b"n" and start + i > 0:
                offsets[start + i] = int(ent.group(1))
            pos += ent.end()
    objects: dict[int, bytes] = {}
    for num, off in offsets.items():
        span = _object_span(data, off)
        if span is not None and span[0] == num:
            objects[num] = span[1]
    return objects


def extract_pdf_text(data: bytes) -> list[str]:
    """PDF bytes → per-page extracted text (one string per page, lines
    joined by ``\\n``). Raises ValueError on anything unwalkable —
    callers (operators/multimodal.pdf_text) convert that into the
    per-row error field. A document the tolerant object scan cannot
    walk (or whose streams fail to inflate — the truncated-span
    signature) is retried once from the xref-table object index before
    the error surfaces (ADVICE r10)."""
    if not data.startswith(b"%PDF-"):
        raise ValueError("not a PDF: missing %PDF- header")
    objects = _parse_objects(data)
    try:
        if not objects:
            raise ValueError("no indirect objects found")
        return _extract_pages(data, objects)
    except (ValueError, zlib.error) as exc:
        fallback = _parse_objects_xref(data)
        if not fallback or fallback == objects:
            if isinstance(exc, zlib.error):
                raise ValueError(f"stream inflate failed: {exc}") from exc
            raise
        try:
            return _extract_pages(data, fallback)
        except zlib.error as exc2:
            raise ValueError(f"stream inflate failed: {exc2}") from exc2


def _extract_pages(data: bytes, objects: dict[int, bytes]) -> list[str]:
    root = None
    tm = re.search(rb"trailer(.*?)(?:startxref|\Z)", data, re.DOTALL)
    if tm:
        tdict = _object_value(tm.group(1))
        if isinstance(tdict, dict):
            root = tdict.get("Root")
    if root is None:  # xref-stream PDFs / broken trailer: scan for a Catalog
        for num, body in sorted(objects.items()):
            v = _object_value(body)
            if isinstance(v, dict) and v.get("Type") == "Catalog":
                root = ("ref", num)
                break
    if root is None:
        raise ValueError("no document catalog")
    catalog = _resolve(objects, root)
    if not isinstance(catalog, dict) or "Pages" not in catalog:
        raise ValueError("catalog has no /Pages")
    pages = _walk_pages(objects, catalog["Pages"])
    out: list[str] = []
    for page in pages:
        contents = page.get("Contents")
        parts: list[bytes] = []
        refs = contents if isinstance(contents, list) else [contents]
        for ref in refs:
            if ref is None:
                continue
            if not (isinstance(ref, tuple) and ref[0] == "ref"):
                raise ValueError("page /Contents is not a stream reference")
            body = objects.get(ref[1])
            if body is None:
                raise ValueError(f"dangling /Contents object: {ref[1]}")
            obj_dict = _object_value(body)
            payload = _stream_payload(
                body, obj_dict if isinstance(obj_dict, dict) else {}, objects
            )
            if payload is None:
                raise ValueError("page /Contents object has no stream")
            parts.append(payload)
        out.append(_page_content_text(b"\n".join(parts)))
    return out
