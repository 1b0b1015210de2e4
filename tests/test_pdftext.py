"""S7 PDF extractor tests (PdfBox.java:15-48 capability over the
uncompressed text subset; writer∘parser identity is also oracle-checked
end-to-end by the s7_pdf_text driver query)."""

from bingcrawler_spark.functions.pdftext import py_pdf_text, synth_pdf_bytes

LINES = ["alpha beta gamma", "delta (a\\b) () eps", "zeta eta", "theta"]


def test_roundtrip_all_variants():
    """Tj, TJ-array split, ' (next-line-show), and /FlateDecode
    compression (variant bit 2) all extract the same text; escapes for
    parens and backslash survive."""
    want = "\n".join(LINES) + "\n"
    for v in range(8):
        assert py_pdf_text(synth_pdf_bytes(LINES, v)) == want


def test_flate_stream_handling():
    """Compressed PDFs really are compressed (raw operators absent from
    the file bytes), corrupt Flate data → None, and a stream under a
    non-Flate filter is skipped rather than scanned as garbage."""
    import zlib

    pdf = synth_pdf_bytes(LINES, 4)
    assert b"/Filter /FlateDecode" in pdf
    assert b"Tj" not in pdf.split(b"stream\n")[1].split(b"\nendstream")[0]
    # corrupt the deflate body -> unreadable file -> None
    body = pdf.split(b"stream\n")[1].split(b"\nendstream")[0]
    assert py_pdf_text(pdf.replace(body, b"\x00" * len(body))) is None
    # a DCTDecode (image) stream must be skipped, not decoded
    img = zlib.compress(b"BT (ghost) Tj ET")
    mixed = (
        b"%PDF-1.4\n1 0 obj << /Length " + str(len(img)).encode()
        + b" /Filter /DCTDecode >> stream\n" + img + b"\nendstream endobj\n"
        b"2 0 obj << /Length 15 >> stream\nBT (real) Tj ET\nendstream endobj\n"
        b"%%EOF"
    )
    assert py_pdf_text(mixed) == "real\n"


def test_string_escapes():
    """PDF string syntax: octal, \\n \\t, balanced unescaped parens, and
    backslash-newline continuation."""
    content = b"BT (a\\101b) Tj T* (t\\tn\\n) Tj T* ((nested)) Tj T* (co\\\nnt) Tj ET"
    pdf = (
        b"%PDF-1.4\n1 0 obj << /Length "
        + str(len(content)).encode()
        + b" >> stream\n"
        + content
        + b"\nendstream endobj\n%%EOF"
    )
    assert py_pdf_text(pdf) == "aAb\nt\tn\n\n(nested)\ncont\n"


def test_unreadable_inputs():
    """Non-PDF bytes and None → None (the reference's catch-and-skip,
    ProfileSimHashTask.java:115-119); a PDF with no text → ''."""
    assert py_pdf_text(b"not a pdf") is None
    assert py_pdf_text(None) is None
    assert py_pdf_text(synth_pdf_bytes([])) == ""


def test_structural_completeness():
    """The writer emits a full file: header, 5 objects, xref whose offsets
    actually point at the objects, trailer with root."""
    pdf = synth_pdf_bytes(["x y"])
    assert pdf.startswith(b"%PDF-1.4")
    assert pdf.rstrip().endswith(b"%%EOF")
    xref_at = int(pdf.split(b"startxref\n")[1].split(b"\n")[0])
    assert pdf[xref_at : xref_at + 4] == b"xref"
    # each xref offset lands on "<k> 0 obj"
    table = pdf[xref_at:].split(b"\n")[3:8]  # skip 'xref', '0 6', free entry
    for k, row in enumerate(table, start=1):
        off = int(row.split(b" ")[0])
        assert pdf[off:].startswith(f"{k} 0 obj".encode())


def test_nested_stream_dict_finds_outer_filter():
    """/DecodeParms << ... >> nests a dict INSIDE the stream dict; the
    matching '<<' must be found by depth, or /Filter is hidden and the
    deflate bytes get scanned as operator text (garbage, not None)."""
    import zlib

    content = zlib.compress(b"BT (nested) Tj ET")
    pdf = (
        b"%PDF-1.4\n1 0 obj << /Filter /FlateDecode "
        b"/DecodeParms << /Predictor 1 /Columns 4 >> /Length "
        + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream endobj\n%%EOF"
    )
    assert py_pdf_text(pdf) == "nested\n"


def test_lzw_roundtrip_and_edge_cases():
    """From-scratch ISO 32000-1 §7.4.4 LZW pair: KwKwK strings, code-width
    growth across 9→12 bits, and the 4094-entry table reset all round-trip;
    the decoder's early-change rule matches PDFBox (widen when the DECODER
    table reaches (1<<width)-1, one entry behind the encoder)."""
    import random

    from bingcrawler_spark.functions.pdftext import _lzw_decode, _lzw_encode

    rng = random.Random(7)
    cases = [
        b"",
        b"A",
        b"AAAAAAA",  # KwKwK immediately after clear
        b"TOBEORNOTTOBEORTOBEORNOT",
        bytes(rng.getrandbits(8) for _ in range(5000)),  # width growth
        b"ab" * 4000,
        bytes(range(256)) * 20,
        bytes(rng.getrandbits(8) for _ in range(40000)),  # table reset
    ]
    for c in cases:
        assert _lzw_decode(_lzw_encode(c)) == c


def test_ascii_transport_filters():
    import base64

    from bingcrawler_spark.functions.pdftext import _a85_decode, _ahx_decode

    assert _a85_decode(base64.a85encode(b"hello world") + b"~>") == b"hello world"
    assert _a85_decode(b"z~>") == b"\x00\x00\x00\x00"  # 'z' zero-group
    assert _ahx_decode(b"48 65 6C 6C 6F>") == b"Hello"
    assert _ahx_decode(b"486>") == b"H`"  # odd digit pads 0


def test_lzw_and_chained_filter_variants():
    """variant bits 3/4/5: /LZWDecode streams, [/ASCII85Decode
    /FlateDecode] / [/ASCII85Decode /LZWDecode] chains (applied in array
    order), and PNG-predicted Flate streams (/DecodeParms /Predictor 12,
    rows cycling Up/Sub/Paeth/None/Average filter bytes, optionally
    ASCII85-wrapped) all extract the same text as the raw form."""
    lines = ["alpha beta gamma", "delta (epsilon) zeta", "eta theta"]
    expected = "\n".join(lines) + "\n"
    for variant in range(64):
        assert py_pdf_text(synth_pdf_bytes(lines, variant)) == expected, variant


def test_png_predictor_roundtrip_and_edges():
    from bingcrawler_spark.functions.pdftext import (
        _png_predict,
        _png_unpredict,
        _tiff_unpredict,
    )

    data = bytes(range(256)) * 3 + b"short-final-row"
    for columns in (1, 3, 24, 1000):
        assert _png_unpredict(_png_predict(data, columns), columns) == data
    # multi-byte pixels: bpp = colors * bpc / 8 strides the Sub/Paeth refs
    assert (
        _png_unpredict(_png_predict(data, 8, colors=3), 8, colors=3) == data
    )
    # TIFF 2: horizontal differencing, no filter bytes
    diffed = bytearray(b"\x05\x01\x01\x01")  # row of 4, cols=4
    assert _tiff_unpredict(bytes(diffed), 4) == b"\x05\x06\x07\x08"


def test_unsupported_filter_and_predictor_skip_stream():
    """DCTDecode (or any undecodable filter) and sub-byte TIFF predictors
    skip the stream whole; a stream whose declared PNG predictor does not
    match its bytes is corrupt → the file reads as None (decode errors
    propagate, matching the reference's per-file catch)."""
    lines = ["alpha beta"]
    pdf = synth_pdf_bytes(lines, 0).replace(
        b"<< /Length", b"<< /Filter /DCTDecode /Length"
    )
    assert py_pdf_text(pdf) == ""
    # TIFF predictor on 4-bit components: not decodable here — skip
    pdf = synth_pdf_bytes(lines, 4).replace(
        b"<< /Length",
        b"<< /DecodeParms << /Predictor 2 /BitsPerComponent 4"
        b" /Columns 4 >> /Length",
    )
    assert py_pdf_text(pdf) == ""
    # PNG predictor declared over NON-predicted Flate bytes: the first
    # "filter byte" is arbitrary zlib output -> corrupt stream -> None
    pdf = synth_pdf_bytes(lines, 4).replace(
        b"<< /Length",
        b"<< /DecodeParms << /Predictor 12 /Columns 4 >> /Length",
    )
    assert py_pdf_text(pdf) in (None, "")
