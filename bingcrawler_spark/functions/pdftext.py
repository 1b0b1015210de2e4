"""S7 — PDF text extraction (PdfBox.java:15-48, used by
ProfileSimHashTask.java:94-124 to fingerprint downloaded paper PDFs).

The reference calls PDFBox's ``PDFTextStripper.getText`` on whole files.
This module implements the same capability for the input contract's PDF
subset as a from-scratch extractor over the classic text-showing subset of
ISO 32000: uncompressed content streams, ``BT``/``ET`` text objects,
``Tj`` / ``'`` / ``TJ`` show operators, ``Td``/``TD``/``T*`` line moves,
and full PDF string syntax (balanced parens, ``\\(`` ``\\)`` ``\\\\``
``\\n`` ``\\r`` ``\\t`` ``\\b`` ``\\f``, octal ``\\ddd``, and
backslash-newline continuations).  For top-to-bottom line-structured
pages — the shape paper PDFs produced by TeX/word processors take and the
shape the synth writer emits — the extraction matches PDFTextStripper's
text-per-line output: one emitted line per line move, lines joined by
newline with a trailing newline.

Encoded content streams are decoded before the scan — PDFBox reads them
natively (PdfBox.java:15-48), and virtually every real paper PDF encodes
its content, so capability parity requires reading them, not skipping
them.  Supported: ``/FlateDecode`` (zlib), ``/LZWDecode`` (from-scratch
ISO 32000-1 §7.4.4 early-change decoder), ``/ASCII85Decode`` and
``/ASCIIHexDecode`` transport wrappers, and filter CHAINS applied in
array order (``[/ASCII85Decode /FlateDecode]``), plus ``/DecodeParms``
predictors on Flate/LZW streams — the full PNG family (Predictor 10-15:
per-row None/Sub/Up/Average/Paeth filter bytes) and 8-bit TIFF
horizontal differencing (Predictor 2).  Streams carrying any other
filter (``/DCTDecode`` images etc.) or a TIFF predictor on sub-byte
components are skipped, and files that fail to parse at all yield
``None``, matching the reference's catch-and-skip on unreadable files
(ProfileSimHashTask.java:115-119).

``synth_pdf_bytes`` is the deterministic inverse used by tests and the s7
driver oracle: it writes a structurally complete PDF (header, catalog,
page tree, font, content stream with correct /Length, xref with real byte
offsets, trailer), so parse(write(lines)) == joined lines is checked
end-to-end on real file bytes.
"""

from __future__ import annotations

import base64
import re
import zlib

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_STREAM_START_RE = re.compile(rb"(?<!end)stream\r?\n")
# direct /Length only — an indirect '/Length 5 0 R' falls through to the
# endstream scan.  The \b pins the WHOLE digit run before the lookahead:
# without it the engine backtracks '15' -> '1' so '(?!\s+\d+\s+R)'
# passes and an indirect reference misparses as direct length 1.
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)\b(?!\s+\d+\s+R)")
# the /Filter value: a single name or an array of names
_FILTER_RE = re.compile(rb"/Filter\s*(\[[^\]]*\]|/[A-Za-z0-9]+)")
_OCTAL = "01234567"


# ----------------------------------------------------------- stream filters
#
# PDFBox decodes every standard filter natively (PdfBox.java:15-48 hands the
# whole file to PDFTextStripper); capability parity for the text-bearing
# subset needs the filters real content streams use: Flate, LZW (ISO
# 32000-1 §7.4.4, TIFF-style early-change codes), and the ASCII transport
# wrappers they get chained under ([/ASCII85Decode /FlateDecode]).


def _lzw_decode(body: bytes) -> bytes:
    """PDF LZWDecode: MSB-first variable-width codes 9→12 bits, Clear=256,
    EOD=257, EarlyChange=1 (the default — the code width grows one entry
    before the table strictly requires it, matching PDFBox's LZWFilter)."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width, prev = 9, None
    bitbuf = bitcnt = 0
    for byte in body:
        bitbuf = (bitbuf << 8) | byte
        bitcnt += 8
        while bitcnt >= width:
            code = (bitbuf >> (bitcnt - width)) & ((1 << width) - 1)
            bitcnt -= width
            if code == 256:
                del table[258:]
                width, prev = 9, None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
            elif code == len(table):  # KwKwK
                entry = prev + prev[:1]
            else:
                raise ValueError("corrupt LZW stream")
            out += entry
            if prev is not None:
                table.append(prev + entry[:1])
            prev = entry
            if len(table) >= (1 << width) - 1 and width < 12:
                width += 1
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    """Encoder twin of _lzw_decode (synth fixtures only): same
    early-change rule, Clear emitted up front and on table overflow."""
    res = bytearray()
    bitbuf = bitcnt = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, bitcnt
        bitbuf = (bitbuf << width) | code
        bitcnt += width
        while bitcnt >= 8:
            res.append((bitbuf >> (bitcnt - 8)) & 0xFF)
            bitcnt -= 8

    table = {bytes([i]): i for i in range(256)}
    next_code, width = 258, 9
    emit(256, width)
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = next_code
        next_code += 1
        # decoder-aligned early change: the decoder (like PDFBox) widens
        # when ITS table reaches (1<<width)-1 entries, and its table runs
        # one entry behind the encoder's — so the encoder widens at 1<<width
        if next_code >= (1 << width) and width < 12:
            width += 1
        w = bytes([ch])
        if next_code >= 4094:  # table full: reset, mirroring the decoder
            emit(256, width)
            table = {bytes([i]): i for i in range(256)}
            next_code, width = 258, 9
    if w:
        emit(table[w], width)
    emit(257, width)
    if bitcnt:
        res.append((bitbuf << (8 - bitcnt)) & 0xFF)
    return bytes(res)


def _a85_decode(body: bytes) -> bytes:
    """ASCII85Decode: whitespace-tolerant, 'z' groups, trailing '~>'."""
    body = re.sub(rb"\s+", b"", body)
    if body.endswith(b"~>"):
        body = body[:-2]
    return base64.a85decode(body)


def _ahx_decode(body: bytes) -> bytes:
    """ASCIIHexDecode: hex digits until '>'; odd final digit padded 0."""
    body = re.sub(rb"\s+", b"", body)
    end = body.find(b">")
    if end != -1:
        body = body[:end]
    if len(body) % 2:
        body += b"0"
    return bytes.fromhex(body.decode("ascii"))


_FILTER_DECODERS = {
    b"/FlateDecode": zlib.decompress,
    b"/LZWDecode": _lzw_decode,
    b"/ASCII85Decode": _a85_decode,
    b"/ASCIIHexDecode": _ahx_decode,
}


def _png_unpredict(data: bytes, columns: int, colors: int = 1, bpc: int = 8) -> bytes:
    """Undo PNG row prediction (ISO 32000-1 §7.4.4.4 via RFC 2083 §6):
    each row of columns·colors·bpc/8 bytes is preceded by one filter-type
    byte — None/Sub/Up/Average/Paeth.  PDF predictor values 10-15 all
    mean "PNG, per-row byte decides", so the decoder must handle every
    filter regardless of the declared value (PDFBox does the same).  A
    short final row is decoded as-is; a bad filter byte raises (corrupt
    stream → whole file unreadable, the py_pdf_text contract)."""
    bpp = max(1, (colors * bpc + 7) // 8)
    rowlen = columns * bpp
    out = bytearray()
    prev = bytes(rowlen)
    i, n = 0, len(data)
    while i < n:
        ft = data[i]
        row = bytearray(data[i + 1 : i + 1 + rowlen])
        i += 1 + len(row)
        if ft == 1:  # Sub
            for j in range(bpp, len(row)):
                row[j] = (row[j] + row[j - bpp]) & 0xFF
        elif ft == 2:  # Up
            for j in range(len(row)):
                row[j] = (row[j] + prev[j]) & 0xFF
        elif ft == 3:  # Average
            for j in range(len(row)):
                left = row[j - bpp] if j >= bpp else 0
                row[j] = (row[j] + ((left + prev[j]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for j in range(len(row)):
                a = row[j - bpp] if j >= bpp else 0
                b = prev[j]
                c = prev[j - bpp] if j >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                row[j] = (
                    row[j] + (a if pa <= pb and pa <= pc else b if pb <= pc else c)
                ) & 0xFF
        elif ft != 0:
            raise ValueError(f"bad PNG predictor filter byte {ft}")
        out += row
        prev = bytes(row)
    return bytes(out)


def _png_predict(data: bytes, columns: int, colors: int = 1, bpc: int = 8) -> bytes:
    """Forward PNG row prediction for the synthetic writer: rows cycle
    through Up/Sub/Paeth/None/Average filter bytes so the decoder's every
    arm is exercised by one fixture."""
    bpp = max(1, (colors * bpc + 7) // 8)
    rowlen = columns * bpp
    out = bytearray()
    prev = bytes(rowlen)
    cycle = (2, 1, 4, 0, 3)
    for r, start in enumerate(range(0, len(data), rowlen)):
        row = data[start : start + rowlen]
        ft = cycle[r % len(cycle)]
        out.append(ft)
        for j, v in enumerate(row):
            a = row[j - bpp] if j >= bpp else 0
            b = prev[j] if j < len(prev) else 0
            if ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            elif ft == 4:
                c = prev[j - bpp] if j >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else b if pb <= pc else c
            else:
                pred = 0
            out.append((v - pred) & 0xFF)
        prev = row + bytes(rowlen - len(row))
    return bytes(out)


def _tiff_unpredict(data: bytes, columns: int, colors: int = 1) -> bytes:
    """Undo TIFF predictor 2 (horizontal differencing, 8-bit components
    only): per row, each byte is a delta from the byte one component
    stride earlier.  No per-row filter bytes."""
    bpp = max(1, colors)
    rowlen = columns * bpp
    out = bytearray(data)
    for start in range(0, len(out), rowlen):
        end = min(start + rowlen, len(out))
        for j in range(start + bpp, end):
            out[j] = (out[j] + out[j - bpp]) & 0xFF
    return bytes(out)


def _iter_stream_bodies(data: bytes):
    """Yield decoded stream bodies in document order.

    The stream dict is the innermost ``<< ... >>`` immediately before the
    ``stream`` keyword.  A direct ``/Length`` slices the body exactly —
    required for Flate streams, whose compressed bytes may legally contain
    the word ``endstream`` — with an ``endstream`` scan as the fallback.
    ``/FlateDecode`` bodies are inflated; bodies under any other filter
    are skipped (images, embedded fonts)."""
    pos = 0
    while True:
        m = _STREAM_START_RE.search(data, pos)
        if not m:
            return
        start = m.end()
        # walk back to the MATCHING '<<' by depth, not the innermost one:
        # stream dicts routinely nest (/DecodeParms << /Predictor 12 >>),
        # and taking the innermost '<<' would hide /Filter from the checks
        # below, feeding deflate bytes to the text scanner as garbage.
        dict_end = data.rfind(b">>", 0, m.start())
        dict_start, depth, i = -1, 1, dict_end
        while depth and i > 0:
            open_p = data.rfind(b"<<", 0, i)
            close_p = data.rfind(b">>", 0, i)
            if open_p == -1:
                break
            if close_p > open_p:
                depth, i = depth + 1, close_p
            else:
                depth, i = depth - 1, open_p
                if depth == 0:
                    dict_start = open_p
        d = data[dict_start:dict_end] if dict_start != -1 else b""
        lm = _LENGTH_RE.search(d)
        if lm:
            end = start + int(lm.group(1))
            body = data[start:end]
        else:
            end = data.find(b"endstream", start)
            if end == -1:
                end = len(data)
            body = data[start:end]
        pos = end
        fm = _FILTER_RE.search(d)
        if fm is None and b"/Filter" in d:
            # /Filter present but not a parseable name/array (e.g. an
            # indirect '/Filter 5 0 R'): the body is encoded in a way we
            # cannot identify — skip it rather than feed encoded bytes
            # to the text scanner
            continue
        if fm:
            names = re.findall(rb"/[A-Za-z0-9]+", fm.group(1))
            if not all(n in _FILTER_DECODERS for n in names):
                # a filter we cannot decode (DCTDecode images, JBIG2...):
                # skip the stream whole rather than feed encoded bytes to
                # the text scanner
                continue
            pm = re.search(rb"/Predictor\s+(\d+)", d)
            pred = int(pm.group(1)) if pm else 1
            bm = re.search(rb"/BitsPerComponent\s+(\d+)", d)
            bpc = int(bm.group(1)) if bm else 8
            if pred > 1 and not (pred >= 10 or (pred == 2 and bpc == 8)):
                # TIFF predictor on sub-byte components — skip, stay
                # honest rather than mis-decode (PNG 10-15 and 8-bit
                # TIFF 2 are handled below)
                continue
            # chains apply in ARRAY ORDER ([/ASCII85Decode /FlateDecode]
            # = un-85 first, then inflate) — ISO 32000-1 §7.3.8.2.  A
            # decode error on a SUPPORTED filter propagates: the stream
            # is corrupt, so the whole file is unreadable → None,
            # matching the reference's catch-and-skip per file
            for n in names:
                body = _FILTER_DECODERS[n](body)
            if pred > 1 and (b"/FlateDecode" in names or b"/LZWDecode" in names):
                # /DecodeParms predictors belong to Flate/LZW (§7.4.4.1):
                # un-predict AFTER decompression
                cm = re.search(rb"/Columns\s+(\d+)", d)
                columns = int(cm.group(1)) if cm else 1
                km = re.search(rb"/Colors\s+(\d+)", d)
                colors = int(km.group(1)) if km else 1
                if pred >= 10:
                    body = _png_unpredict(body, columns, colors, bpc)
                else:
                    body = _tiff_unpredict(body, columns, colors)
        yield body


# ------------------------------------------------------------------ parser


def _scan_content(s: str):
    """Tokenize a decoded content stream: ('str', text), ('arr_open'|
    'arr_close', None), ('op', token) — numbers and names come out as ops
    and are ignored by the interpreter."""
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "(":
            i += 1
            depth, buf = 1, []
            while i < n and depth:
                ch = s[i]
                if ch == "\\":
                    nxt = s[i + 1] if i + 1 < n else ""
                    if nxt in "()\\":
                        buf.append(nxt)
                        i += 2
                    elif nxt in "nrtbf":
                        buf.append({"n": "\n", "r": "\r", "t": "\t",
                                    "b": "\b", "f": "\f"}[nxt])
                        i += 2
                    elif nxt and nxt in _OCTAL:
                        j = i + 1
                        o = ""
                        while j < n and len(o) < 3 and s[j] in _OCTAL:
                            o += s[j]
                            j += 1
                        buf.append(chr(int(o, 8)))
                        i = j
                    elif nxt == "\n":  # line continuation
                        i += 2
                    elif nxt == "\r":  # continuation, CR or CRLF EOL
                        i += 2
                        if i < n and s[i] == "\n":
                            i += 1
                    else:
                        buf.append(nxt)
                        i += 2
                elif ch == "(":
                    depth += 1
                    buf.append(ch)
                    i += 1
                elif ch == ")":
                    depth -= 1
                    if depth:
                        buf.append(ch)
                    i += 1
                else:
                    buf.append(ch)
                    i += 1
            yield ("str", "".join(buf))
        elif c == "[":
            yield ("arr_open", None)
            i += 1
        elif c == "]":
            yield ("arr_close", None)
            i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < n and not s[j].isspace() and s[j] not in "()[]":
                j += 1
            yield ("op", s[i:j])
            i = j


def py_pdf_text(data: bytes | None) -> str | None:
    """getText twin: walk every content stream's text operators in
    document order, inflating /FlateDecode streams.  Unreadable input →
    None (the reference's catch-and-continue)."""
    if data is None:
        return None
    try:
        if not data.lstrip()[:5].startswith(b"%PDF-"):
            return None
        lines: list[str] = []
        cur: list[str] = []
        for raw in _iter_stream_bodies(data):
            body = raw.decode("latin-1")
            last: str | None = None
            arr: list[str] | None = None
            for kind, val in _scan_content(body):
                if kind == "str":
                    if arr is not None:
                        arr.append(val)
                    else:
                        last = val
                elif kind == "arr_open":
                    arr = []
                elif kind == "arr_close":
                    last = "".join(arr or [])
                    arr = None
                elif kind == "op":
                    if val == "Tj":
                        if last is not None:
                            cur.append(last)
                    elif val == "'":
                        if cur:
                            lines.append("".join(cur))
                        cur = [last] if last is not None else []
                    elif val == "TJ":
                        if last is not None:
                            cur.append(last)
                    elif val in ("T*", "Td", "TD", "ET"):
                        if cur:
                            lines.append("".join(cur))
                            cur = []
        if cur:
            lines.append("".join(cur))
        return "\n".join(lines) + "\n" if lines else ""
    except Exception:
        return None


# ------------------------------------------------------------------ writer


def _esc(s: str) -> str:
    return s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")


def synth_pdf_bytes(lines: list[str], variant: int = 0) -> bytes:
    """Write a complete single-page PDF showing ``lines`` top-to-bottom.

    ``variant`` varies HOW the file is encoded without changing the
    extracted text: bit 0 set → line 1 (if present) is emitted as a
    mid-line-split ``TJ`` array; bit 1 set → line 2 (if present) uses the
    ``'`` (next-line-show) operator instead of ``T* ... Tj``; bit 2 set →
    the content stream is Flate-compressed (``/Filter /FlateDecode``),
    the form virtually every real paper PDF takes; bit 3 set →
    LZW-compressed instead (``/Filter /LZWDecode``, overrides bit 2);
    bit 4 set → the compressed body is additionally ASCII85-wrapped and
    the filter becomes the CHAIN ``[/ASCII85Decode /FlateDecode]`` (or
    ``/LZWDecode`` per bit 3); bit 4 without bits 2-3 → plain text under
    ``[/ASCII85Decode]``; bit 5 set → the content is PNG-row-predicted
    (``/DecodeParms << /Predictor 12 /Columns 24 >>``, rows cycling
    Up/Sub/Paeth/None/Average filter bytes) then Flate-compressed —
    overriding bits 2-3; bit 4 still ASCII85-wraps the result."""
    ops: list[str] = ["BT", "/F1 12 Tf", "72 720 Td", "14 TL"]
    for i, ln in enumerate(lines):
        use_tj = i == 1 and (variant & 1)
        use_quote = i == 2 and (variant & 2)
        if i == 0:
            pass  # position already set by Td
        elif use_quote:
            ops.append(f"({_esc(ln)}) '")
            continue
        else:
            ops.append("T*")
        if use_tj:
            cut = max(1, len(ln) // 2)
            ops.append(f"[({_esc(ln[:cut])}) -12 ({_esc(ln[cut:])})] TJ")
        else:
            ops.append(f"({_esc(ln)}) Tj")
    ops.append("ET")
    content = "\n".join(ops).encode("latin-1")
    chain: list[bytes] = []
    parms = b""
    if variant & 32:
        content = zlib.compress(_png_predict(content, columns=24))
        chain.append(b"/FlateDecode")
        parms = (
            b" /DecodeParms << /Predictor 12 /Colors 1"
            b" /BitsPerComponent 8 /Columns 24 >>"
        )
    elif variant & 8:
        content = _lzw_encode(content)
        chain.append(b"/LZWDecode")
    elif variant & 4:
        content = zlib.compress(content)
        chain.append(b"/FlateDecode")
    if variant & 16:
        content = base64.a85encode(content) + b"~>"
        chain.insert(0, b"/ASCII85Decode")
    if len(chain) > 1:
        filters = b" /Filter [" + b" ".join(chain) + b"]" + parms
    elif chain:
        filters = b" /Filter " + chain[0] + parms
    else:
        filters = b""

    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length " + str(len(content)).encode() + filters
        + b" >>\nstream\n" + content + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for k, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{k} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 " + str(len(objs) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        b"trailer\n<< /Size " + str(len(objs) + 1).encode()
        + b" /Root 1 0 R >>\nstartxref\n" + str(xref_at).encode()
        + b"\n%%EOF\n"
    )
    return bytes(out)


# ------------------------------------------------------------- Spark UDFs


@F.pandas_udf(T.StringType())
def pdf_text_udf(data: pd.Series) -> pd.Series:
    """S7 as an Arrow-batched UDF: pdf bytes → extracted text."""
    return data.map(py_pdf_text)


@F.pandas_udf(T.BinaryType())
def synth_pdf_udf(lines: pd.Series, variant: pd.Series) -> pd.Series:
    """Deterministic pdf writer for the s7 oracle round-trip."""
    return pd.Series(
        [
            synth_pdf_bytes(list(ls), int(v))
            for ls, v in zip(lines, variant)
        ]
    )
