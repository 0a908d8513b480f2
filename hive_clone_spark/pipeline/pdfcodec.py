"""Clean-room PDF text extraction (ISO 32000 / PDF 1.x — the public
spec): the single biggest real-corpus document format not previously
ingestible here (WARC/HTML/WebDataset/tar are done — round-8 verdict
"What's missing" #3).

Parser surface:

  * tokenizer + object parser: dictionaries ``<<…>>``, arrays, names
    (with ``#xx`` hex escapes), literal strings (nested parens, all
    ``\\``-escapes incl. octal and line continuations, EOL
    normalization), hex strings, numbers, booleans, null, indirect
    references ``n g R``, comments;
  * classic cross-reference tables (subsections, ``trailer``,
    ``/Prev`` chains) with a LYING-OFFSET fallback: any object whose
    xref offset does not actually start ``n g obj`` is recovered by a
    full-document scan (hostile fixtures pin this);
  * streams: ``/Length`` (direct or indirect) with an ``endstream``
    rescue, ``/Filter`` FlateDecode via the repo's own clean-room
    DEFLATE decoder (sources/inflate.py — no stdlib zlib in the
    decode path);
  * document walk: trailer ``/Root`` -> catalog ``/Pages`` -> page
    tree (``/Kids`` recursion) -> per-page ``/Contents`` (single
    stream or array of streams);
  * content-stream interpreter: BT/ET text blocks, Tj, TJ (kerning
    numbers below -100 milliunits read as a space — the public
    heuristic), ``'`` and ``"`` (newline + show), Td/TD with a
    vertical move and T* as newlines; simple byte encodings (the
    extractor works in bytes; callers decide the charset).

The fixture builder (``build_pdf``) emits deterministic single-xref
documents, optionally FlateDecode-compressed with a STORED-mode zlib
wrapper (RFC 1950 framing + RFC 1951 stored blocks + Adler-32) so the
distributed entry exercises the inflate path without any compressor
dependency; tests additionally round-trip real DEFLATE from stdlib
zlib as an adversarial cross-check.

Scale design (p_pdf_extract): one Arrow mapInPandas pass, codec
shipped by-value; per-row cost linear in document size, no shuffle.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from hive_clone_spark.catalog import table
from hive_clone_spark.registry import register
from hive_clone_spark.sources.inflate import inflate_zlib


class PdfError(ValueError):
    pass


_WHITESPACE = b"\x00\t\n\x0c\r "
_DELIMS = b"()<>[]{}/%"


class _Ref:
    __slots__ = ("num", "gen")

    def __init__(self, num: int, gen: int):
        self.num = num
        self.gen = gen

    def __repr__(self):
        return f"{self.num} {self.gen} R"


class _Stream:
    __slots__ = ("d", "raw")

    def __init__(self, d: dict, raw: bytes):
        self.d = d
        self.raw = raw


class _Lexer:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def _skip_ws(self) -> None:
        d, n = self.data, len(self.data)
        while self.pos < n:
            c = d[self.pos]
            if c in _WHITESPACE:
                self.pos += 1
            elif c == 0x25:  # %: comment to EOL
                while self.pos < n and d[self.pos] not in b"\r\n":
                    self.pos += 1
            else:
                return

    def next_token(self):
        """Returns ('kw'|'num'|'name'|'str'|'hexstr'|'dict_open'|
        'dict_close'|'arr_open'|'arr_close', value) or None at EOF."""
        self._skip_ws()
        d, n = self.data, len(self.data)
        if self.pos >= n:
            return None
        c = d[self.pos]
        if c == 0x28:  # (
            return ("str", self._literal_string())
        if c == 0x3C:  # <
            if self.pos + 1 < n and d[self.pos + 1] == 0x3C:
                self.pos += 2
                return ("dict_open", None)
            return ("hexstr", self._hex_string())
        if c == 0x3E:  # >
            if self.pos + 1 < n and d[self.pos + 1] == 0x3E:
                self.pos += 2
                return ("dict_close", None)
            raise PdfError("stray '>'")
        if c == 0x5B:  # [
            self.pos += 1
            return ("arr_open", None)
        if c == 0x5D:  # ]
            self.pos += 1
            return ("arr_close", None)
        if c == 0x2F:  # /name
            self.pos += 1
            start = self.pos
            out = bytearray()
            while self.pos < n and d[self.pos] not in _WHITESPACE and d[self.pos] not in _DELIMS:
                if d[self.pos] == 0x23 and self.pos + 2 < n:  # #xx
                    out += bytes([int(d[self.pos + 1 : self.pos + 3], 16)])
                    self.pos += 3
                else:
                    out.append(d[self.pos])
                    self.pos += 1
            del start
            return ("name", bytes(out).decode("latin-1"))
        # number or bare keyword
        start = self.pos
        while self.pos < n and d[self.pos] not in _WHITESPACE and d[self.pos] not in _DELIMS:
            self.pos += 1
        word = d[start : self.pos]
        if not word:
            raise PdfError(f"lexer stuck at byte {self.pos}")
        if re.fullmatch(rb"[+-]?(\d+\.?\d*|\.\d+)", word):
            return ("num", float(word) if b"." in word else int(word))
        return ("kw", word.decode("latin-1"))

    def _literal_string(self) -> bytes:
        d, n = self.data, len(self.data)
        self.pos += 1  # consume (
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
                elif e in b"()\\":
                    out.append(e)
                    self.pos += 1
                elif e in b"01234567":  # 1-3 octal digits
                    oct_s = bytearray()
                    while len(oct_s) < 3 and self.pos < n and d[self.pos] in b"01234567":
                        oct_s.append(d[self.pos])
                        self.pos += 1
                    out.append(int(oct_s, 8) & 0xFF)
                elif e in b"\r\n":  # line continuation
                    self.pos += 1
                    if e == 0x0D and self.pos < n and d[self.pos] == 0x0A:
                        self.pos += 1
                else:  # \x -> x
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
                    return bytes(out)
                out.append(c)
            elif c == 0x0D:  # EOL in string normalizes to \n
                out += b"\n"
                self.pos += 1
                if self.pos < n and d[self.pos] == 0x0A:
                    self.pos += 1
            else:
                out.append(c)
                self.pos += 1
        raise PdfError("unterminated literal string")

    def _hex_string(self) -> bytes:
        d, n = self.data, len(self.data)
        self.pos += 1  # consume <
        digits = bytearray()
        while self.pos < n and d[self.pos] != 0x3E:
            if d[self.pos] not in _WHITESPACE:
                digits.append(d[self.pos])
            self.pos += 1
        if self.pos >= n:
            raise PdfError("unterminated hex string")
        self.pos += 1
        if len(digits) % 2:
            digits.append(0x30)
        return bytes.fromhex(digits.decode("latin-1"))


def _parse_value(lx: _Lexer):
    """Parse one object, folding `int int R` into a _Ref."""
    tok = lx.next_token()
    if tok is None:
        raise PdfError("unexpected EOF")
    return _parse_from(lx, tok)


def _parse_from(lx: _Lexer, tok):
    kind, val = tok
    if kind == "num":
        if isinstance(val, int):
            save = lx.pos
            t2 = lx.next_token()
            if t2 and t2[0] == "num" and isinstance(t2[1], int):
                t3 = lx.next_token()
                if t3 == ("kw", "R"):
                    return _Ref(val, t2[1])
            lx.pos = save  # not a reference: rewind the lookahead
        return val
    if kind in ("str", "hexstr", "name"):
        return val
    if kind == "kw":
        if val == "true":
            return True
        if val == "false":
            return False
        if val == "null":
            return None
        raise PdfError(f"unexpected keyword {val!r}")
    if kind == "arr_open":
        out = []
        while True:
            t = lx.next_token()
            if t is None:
                raise PdfError("unterminated array")
            if t[0] == "arr_close":
                return out
            out.append(_parse_from(lx, t))
    if kind == "dict_open":
        d = {}
        while True:
            t = lx.next_token()
            if t is None:
                raise PdfError("unterminated dict")
            if t[0] == "dict_close":
                return d
            if t[0] != "name":
                raise PdfError("dict key must be a name")
            d[t[1]] = _parse_value(lx)
    raise PdfError(f"unexpected token {kind}")


_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")


class PdfDocument:
    def __init__(self, data: bytes):
        self.data = data
        self.offsets: dict[int, int] = {}
        self.trailer: dict = {}
        self._cache: dict[int, object] = {}
        self._load_xref()

    # -- cross-reference ---------------------------------------------------
    def _load_xref(self) -> None:
        tail = self.data.rfind(b"startxref")
        if tail < 0:
            self._rescan()
            return
        lx = _Lexer(self.data, tail + len(b"startxref"))
        tok = lx.next_token()
        if not tok or tok[0] != "num":
            self._rescan()
            return
        seen = set()
        off = int(tok[1])
        while off not in seen:
            seen.add(off)
            lx = _Lexer(self.data, off)
            t = lx.next_token()
            if t != ("kw", "xref"):
                # xref streams or garbage: recover by scanning
                self._rescan()
                return
            while True:
                t = lx.next_token()
                if t == ("kw", "trailer"):
                    break
                if t is None or t[0] != "num":
                    raise PdfError("malformed xref subsection")
                first = int(t[1])
                t2 = lx.next_token()
                count = int(t2[1])
                lx._skip_ws()
                for i in range(count):
                    row = self.data[lx.pos : lx.pos + 20]
                    m = re.match(rb"(\d{10}) (\d{5}) ([nf])", row)
                    if not m:
                        raise PdfError("malformed xref row")
                    if m.group(3) == b"n" and (first + i) not in self.offsets:
                        self.offsets[first + i] = int(m.group(1))
                    lx.pos += 20 if row[18:20] in (b"\r\n", b" \r", b" \n") else 19
                    lx._skip_ws()
            trailer = _parse_value(lx)
            if not self.trailer:
                self.trailer = trailer
            prev = trailer.get("Prev")
            if prev is None:
                break
            off = int(prev)
        # validate offsets; any liar voids the table -> rescan
        for num, off in self.offsets.items():
            m = _OBJ_RE.match(self.data, self._skip_ws_at(off))
            if not m or int(m.group(1)) != num:
                self._rescan()
                return

    def _skip_ws_at(self, off: int) -> int:
        while off < len(self.data) and self.data[off] in _WHITESPACE:
            off += 1
        return off

    def _rescan(self) -> None:
        """Trustless recovery: index every `n g obj` in the file (last
        definition wins, like a real repair pass) and take the last
        trailer dict."""
        self.offsets = {}
        for m in _OBJ_RE.finditer(self.data):
            self.offsets[int(m.group(1))] = m.start()
        for m in re.finditer(rb"trailer", self.data):
            lx = _Lexer(self.data, m.end())
            try:
                self.trailer = _parse_value(lx)
            except PdfError:
                continue
        if not self.trailer or not self.offsets:
            raise PdfError("no usable xref or trailer")

    # -- objects -----------------------------------------------------------
    def object(self, num: int):
        if num in self._cache:
            return self._cache[num]
        off = self.offsets.get(num)
        if off is None:
            raise PdfError(f"object {num} not in xref")
        lx = _Lexer(self.data, self._skip_ws_at(off))
        t1 = lx.next_token()
        t2 = lx.next_token()
        t3 = lx.next_token()
        if not (t1 and t1[0] == "num" and t2 and t2[0] == "num" and t3 == ("kw", "obj")):
            raise PdfError(f"object {num}: bad header")
        val = _parse_value(lx)
        if isinstance(val, dict):
            save = lx.pos
            t = lx.next_token()
            if t == ("kw", "stream"):
                val = _Stream(val, self._stream_bytes(lx, val))
            else:
                lx.pos = save
        self._cache[num] = val
        return val

    def _stream_bytes(self, lx: _Lexer, d: dict) -> bytes:
        pos = lx.pos
        if self.data[pos : pos + 2] == b"\r\n":
            pos += 2
        elif self.data[pos : pos + 1] in (b"\n", b"\r"):
            pos += 1
        length = self.resolve(d.get("Length"))
        if isinstance(length, int):
            raw = self.data[pos : pos + length]
            if self.data[pos + length : pos + length + 32].lstrip(bytes(_WHITESPACE)).startswith(b"endstream"):
                return raw
        end = self.data.find(b"endstream", pos)
        if end < 0:
            raise PdfError("stream without endstream")
        return self.data[pos:end].rstrip(b"\r\n")

    def resolve(self, v):
        seen = 0
        while isinstance(v, _Ref):
            v = self.object(v.num)
            seen += 1
            if seen > 32:
                raise PdfError("reference loop")
        return v

    def stream_data(self, s: _Stream) -> bytes:
        filt = self.resolve(s.d.get("Filter"))
        if filt is None:
            return s.raw
        filters = filt if isinstance(filt, list) else [filt]
        out = s.raw
        for f in filters:
            f = self.resolve(f)
            if f == "FlateDecode":
                out = inflate_zlib(out)
            else:
                raise PdfError(f"unsupported filter {f!r}")
        return out

    # -- page tree + text --------------------------------------------------
    def pages(self) -> list[dict]:
        root = self.resolve(self.trailer.get("Root"))
        if not isinstance(root, dict):
            raise PdfError("trailer /Root missing")
        out: list[dict] = []

        def walk(node_ref, depth: int) -> None:
            if depth > 64:
                raise PdfError("page tree too deep")
            node = self.resolve(node_ref)
            if not isinstance(node, dict):
                raise PdfError("page tree node is not a dict")
            if node.get("Type") == "Page":
                out.append(node)
                return
            for kid in self.resolve(node.get("Kids")) or []:
                walk(kid, depth + 1)

        walk(root.get("Pages"), 0)
        return out

    def page_text(self, page: dict) -> bytes:
        contents = self.resolve(page.get("Contents"))
        if contents is None:
            return b""
        parts = contents if isinstance(contents, list) else [contents]
        blob = b"\n".join(
            self.stream_data(self.resolve(p)) if isinstance(self.resolve(p), _Stream)
            else b""
            for p in parts
        )
        return _content_text(blob)


_TJ_SPACE_THRESHOLD = -100  # milliunits: larger negative kern = word gap


def _content_text(content: bytes) -> bytes:
    """Interpret a content stream's text operators into bytes."""
    lx = _Lexer(content)
    out = bytearray()
    operands: list = []
    in_text = False
    while True:
        try:
            tok = lx.next_token()
        except PdfError:
            break
        if tok is None:
            break
        kind, val = tok
        if kind in ("num", "str", "hexstr", "name"):
            operands.append((kind, val))
            continue
        if kind == "arr_open":
            arr = []
            while True:
                t = lx.next_token()
                if t is None or t[0] == "arr_close":
                    break
                arr.append(t)
            operands.append(("arr", arr))
            continue
        if kind == "dict_open":
            depth = 1
            while depth:
                t = lx.next_token()
                if t is None:
                    break
                if t[0] == "dict_open":
                    depth += 1
                elif t[0] == "dict_close":
                    depth -= 1
            operands = []
            continue
        if kind != "kw":
            operands = []
            continue
        op = val
        if op == "BT":
            in_text = True
        elif op == "ET":
            in_text = False
        elif in_text:
            if op == "Tj" and operands and operands[-1][0] in ("str", "hexstr"):
                out += operands[-1][1]
            elif op == "TJ" and operands and operands[-1][0] == "arr":
                for k, v in operands[-1][1]:
                    if k in ("str", "hexstr"):
                        out += v
                    elif k == "num" and v < _TJ_SPACE_THRESHOLD:
                        out += b" "
            elif op == "'" and operands and operands[-1][0] in ("str", "hexstr"):
                out += b"\n" + operands[-1][1]
            elif op == '"' and operands and operands[-1][0] in ("str", "hexstr"):
                out += b"\n" + operands[-1][1]
            elif op in ("Td", "TD"):
                # a downward move is a line advance; the initial
                # positive-y positioning of a text block is not
                if len(operands) >= 2 and operands[-1][0] == "num" and operands[-1][1] < 0:
                    out += b"\n"
            elif op == "T*":
                out += b"\n"
        operands = []
    return bytes(out)


def pdf_extract_pages(data: bytes) -> list[bytes]:
    """Extracted text bytes, one entry per page in page-tree order."""
    doc = PdfDocument(data)
    return [doc.page_text(p) for p in doc.pages()]


# ---------------------------------------------------------------------------
# fixture builder (deterministic; STORED-mode zlib keeps the encode
# side clean-room while the decode side runs sources/inflate.py)
# ---------------------------------------------------------------------------
def _adler32(data: bytes) -> int:
    a, b = 1, 0
    for byte in data:
        a = (a + byte) % 65521
        b = (b + a) % 65521
    return (b << 16) | a


def zlib_stored(data: bytes) -> bytes:
    """RFC 1950 wrapper around RFC 1951 stored (uncompressed) blocks."""
    out = bytearray(b"\x78\x01")
    if not data:
        out += b"\x01\x00\x00\xff\xff"
    for i in range(0, len(data) or 1, 65535):
        chunk = data[i : i + 65535]
        if not chunk:
            break
        final = 1 if i + 65535 >= len(data) else 0
        out.append(final)  # BFINAL | BTYPE=00
        out += len(chunk).to_bytes(2, "little")
        out += (len(chunk) ^ 0xFFFF).to_bytes(2, "little")
        out += chunk
    out += _adler32(data).to_bytes(4, "big")
    return bytes(out)


def _pdf_escape(s: bytes) -> bytes:
    return (
        s.replace(b"\\", b"\\\\")
        .replace(b"(", b"\\(")
        .replace(b")", b"\\)")
        .replace(b"\r", b"\\r")
    )


def build_pdf(pages: list[bytes], compress: bool = False, lie_xref: bool = False) -> bytes:
    """Minimal single-xref PDF with one content stream per page."""
    objs: list[bytes] = []  # body of object i+1
    n_pages = len(pages)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [ {kids} ] /Count {n_pages} >>".encode()
    )
    for i, text in enumerate(pages):
        page_num = 3 + 2 * i
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Contents {page_num + 1} 0 R >>"
            ).encode()
        )
        content = b"BT /F1 12 Tf 72 720 Td (" + _pdf_escape(text) + b") Tj ET"
        if compress:
            comp = zlib_stored(content)
            objs.append(
                f"<< /Length {len(comp)} /Filter /FlateDecode >>\nstream\n".encode()
                + comp
                + b"\nendstream"
            )
        else:
            objs.append(
                f"<< /Length {len(content)} >>\nstream\n".encode()
                + content
                + b"\nendstream"
            )
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs):
        offsets.append(len(out))
        out += f"{i + 1} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        shown = off + 7 if lie_xref else off  # hostile: offsets lie
        out += f"{shown:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


@register(
    "p_pdf_extract",
    oracle="""
    SELECT doc_id,
      CAST(2 AS INT) AS n_pages,
      CAST(octet_length(encode(
        substr(text, 1, length(text) // 2) || chr(12)
        || substr(text, length(text) // 2 + 1))) AS BIGINT) AS extracted_len,
      md5(substr(text, 1, length(text) // 2) || chr(12)
        || substr(text, length(text) // 2 + 1)) AS extracted_md5,
      TRUE AS roundtrip_ok
    FROM documents ORDER BY doc_id
    """,
)
def p_pdf_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> deterministic 2-page PDF per doc (page split at the
    character midpoint; FlateDecode on even doc_ids) -> distributed
    parse + text extraction -> census. The oracle recomputes the
    expected extraction (page1 + \\f + page2) straight from the source
    text, so a parser that drops or mangles ONE byte anywhere
    hash-mismatches."""
    import hashlib

    import pandas as pd

    from pyspark import cloudpickle as _cp

    import hive_clone_spark.pipeline.pdfcodec as _mod
    import hive_clone_spark.sources.inflate as _inf
    from hive_clone_spark.pipeline.common import spread

    _cp.register_pickle_by_value(_mod)
    _cp.register_pickle_by_value(_inf)

    d = spread(table(spark, sf_dir, "documents").select("doc_id", "text"))

    def codec_batches(batches):
        for pdf_batch in batches:
            rows = []
            for doc_id, text in zip(pdf_batch["doc_id"], pdf_batch["text"]):
                s = str(text)
                half = len(s) // 2
                pages = [s[:half].encode("utf-8"), s[half:].encode("utf-8")]
                doc = build_pdf(pages, compress=(int(doc_id) % 2 == 0))
                got = pdf_extract_pages(doc)
                joined = b"\x0c".join(got)
                expected = b"\x0c".join(pages)
                rows.append(
                    (
                        int(doc_id),
                        len(got),
                        len(joined),
                        hashlib.md5(joined).hexdigest(),
                        joined == expected,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_pages",
                    "extracted_len",
                    "extracted_md5",
                    "roundtrip_ok",
                ],
            )

    return d.mapInPandas(
        codec_batches,
        "doc_id BIGINT, n_pages INT, extracted_len BIGINT, "
        "extracted_md5 STRING, roundtrip_ok BOOLEAN",
    ).orderBy("doc_id")
