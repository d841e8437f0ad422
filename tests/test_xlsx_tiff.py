"""Round-12 format-matrix completion: XLSX cell extraction, baseline
TIFF decode, ZIP central-directory manifests — the remaining admitted
extensions of the reference's format config made byte-real."""

from __future__ import annotations

import io
import zipfile

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from caseguarddatapipeline_spark.operators.xlsxops import (
    build_xlsx,
    extract_xlsx,
)

_SETTINGS = dict(
    deadline=None,
    max_examples=30,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_words = st.lists(
    st.text(
        alphabet=st.characters(min_codepoint=33, max_codepoint=500),
        min_size=1,
        max_size=12,
    ),
    min_size=1,
    max_size=40,
)


@given(words=_words)
@settings(**_SETTINGS)
def test_xlsx_roundtrip_property(words):
    text = " ".join(words)
    # the builder's column-A encoding assumes single-space-joined words
    words = text.split(" ")
    b = build_xlsx(text)
    out = extract_xlsx(b)
    assert out["text"] == text
    assert out["n_cells"] == len(words)
    assert out["n_shared"] == len(set(words))
    zf = zipfile.ZipFile(io.BytesIO(b))
    assert zf.testzip() is None
    assert "xl/sharedStrings.xml" in zf.namelist()


def test_xlsx_inline_and_numeric_cells():
    from caseguarddatapipeline_spark.operators import docxops as D

    sheet = (
        "<worksheet><sheetData>"
        '<row r="1"><c r="A1" t="inlineStr"><is><t>hi &amp; bye</t></is></c>'
        '<c r="B1"><v>42.5</v></c><c r="C1" s="1"/></row>'
        "</sheetData></worksheet>"
    )
    b = D._zip([("xl/worksheets/sheet1.xml", sheet.encode())])
    out = extract_xlsx(b)
    assert out["values"] == ["hi & bye", "42.5"]
    assert out["n_shared"] == 0  # no sharedStrings part: inline-only


def test_tiff_roundtrip_and_quirks():
    from caseguarddatapipeline_spark.operators import multimodal as M

    # builder round-trip on the fixture formula
    for did in (160, 161, 191):
        w, h = M._raster_dims(did)
        px = M._raster_pixels(did, w, h)
        w2, h2, arr = M._parse_tiff(M._build_tiff(px))
        assert (w2, h2) == (w, h)
        assert np.array_equal(arr, px.reshape(h, w * 3))
    # the fixture payload really is a TIFF and routes through dispatch
    payload = M._format_payload(160, "unused")
    assert payload[:4] == b"II\x2a\x00"
    fmt, w, h, arr = M._decode_raster(payload)
    assert fmt == "tiff" and (w, h) == M._raster_dims(160)
    assert M._decode_one(payload) == f"TIFF {w}x{h}"
    # non-baseline features fail loudly
    lzw = bytearray(payload)
    # Compression tag (259) value: flip 1 -> 5 (LZW) in the IFD entry
    idx = payload.find(b"\x03\x01\x03\x00\x01\x00\x00\x00\x01\x00")
    assert idx > 0
    lzw[idx + 8] = 5
    with pytest.raises(ValueError):
        M._parse_tiff(bytes(lzw))
    with pytest.raises(ValueError):
        M._parse_tiff(b"MM\x00\x2a garbage")  # big-endian unsupported


def test_tiff_multistrip_grayscale_whitezero():
    import struct

    from caseguarddatapipeline_spark.operators.multimodal import _parse_tiff

    h, w = 4, 6
    gray = (np.arange(h * w) % 256).astype(np.uint8).reshape(h, w)

    def entry(tag, typ, count, value):
        return struct.pack("<HHII", tag, typ, count, value)

    n = 9
    ifd_off = 8
    so_off = ifd_off + 2 + n * 12 + 4
    strips = [gray[i : i + 2].tobytes() for i in range(0, h, 2)]
    counts = [len(s) for s in strips]
    offs = []
    pos = so_off + 8 * len(strips)
    for c in counts:
        offs.append(pos)
        pos += c
    for photo, expect_gray in ((1, gray), (0, 255 - gray)):
        ifd = struct.pack("<H", n)
        ifd += entry(256, 4, 1, w) + entry(257, 4, 1, h)
        ifd += entry(258, 3, 1, 8) + entry(259, 3, 1, 1)
        ifd += entry(262, 3, 1, photo)
        ifd += entry(273, 4, len(strips), so_off)
        ifd += entry(277, 3, 1, 1) + entry(278, 4, 1, 2)
        ifd += entry(279, 4, len(strips), so_off + 4 * len(strips))
        ifd += struct.pack("<I", 0)
        b = (
            b"II\x2a\x00" + struct.pack("<I", ifd_off) + ifd
            + struct.pack(f"<{len(offs)}I", *offs)
            + struct.pack(f"<{len(counts)}I", *counts)
            + b"".join(strips)
        )
        w2, h2, arr = _parse_tiff(b)
        want = np.repeat(expect_gray.reshape(h, w, 1), 3, axis=2)
        assert (w2, h2) == (w, h)
        assert np.array_equal(arr, want.reshape(h, w * 3))


def test_zip_manifest_matches_archive():
    from caseguarddatapipeline_spark.operators import multimodal as M
    from caseguarddatapipeline_spark.operators.docxops import zip_manifest

    payload = M._format_payload(96, "some docx body text here")
    got = zip_manifest(payload)
    zf = zipfile.ZipFile(io.BytesIO(payload))
    want = [
        (i.filename, i.compress_type, i.file_size) for i in zf.infolist()
    ]
    assert got == want
    assert [g[0] for g in got] == [
        "[Content_Types].xml",
        "_rels/.rels",
        "word/document.xml",
    ]


_printable = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    max_size=500,
)


@given(text=_printable, enc=st.sampled_from(
    ["quoted-printable", "base64", "7bit"]))
@settings(**_SETTINGS)
def test_eml_roundtrip_property(text, enc):
    from caseguarddatapipeline_spark.operators.mailops import (
        build_eml,
        extract_eml,
    )

    out = extract_eml(build_eml(text, "subject here", encoding=enc))
    assert out["text"] == text
    assert out["encoding"] == enc
    assert out["n_headers"] == 7


@given(
    text=st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=600),
        max_size=300,
    )
)
@settings(**_SETTINGS)
def test_eml_qp_unicode_and_equals(text):
    # quoted-printable must survive '=' signs, trailing spaces, and
    # non-ASCII (UTF-8 bytes hex-escaped)
    from caseguarddatapipeline_spark.operators.mailops import (
        build_eml,
        extract_eml,
    )

    assert extract_eml(build_eml(text, "s"))["text"] == text


@given(
    text=st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=600),
        max_size=300,
    )
)
@settings(**_SETTINGS)
def test_rtf_roundtrip_property(text):
    from caseguarddatapipeline_spark.operators.rtfops import (
        build_rtf,
        extract_rtf,
    )

    assert extract_rtf(build_rtf(text))["text"] == text


def test_rtf_destination_skipping_and_unicode_fallback():
    from caseguarddatapipeline_spark.operators.rtfops import extract_rtf

    # \*-marked and named destinations are metadata, not text; \uN
    # consumes its fallback char per \uc
    raw = (
        b"{\\rtf1\\ansi{\\fonttbl{\\f0 X;}}{\\*\\generator Acme 1.0;}"
        b"{\\info{\\author nobody}}\\uc1 A\\u8364?B \\'e9 end}"
    )
    out = extract_rtf(raw)
    assert out["text"] == "A€B é end"
    with pytest.raises(ValueError):
        extract_rtf(b"{\\rtf1 unbalanced")
    with pytest.raises(ValueError):
        extract_rtf(b"not rtf at all")


@given(text=_printable)
@settings(**_SETTINGS)
def test_pptx_roundtrip_property(text):
    from caseguarddatapipeline_spark.operators.docxops import (
        build_pptx,
        extract_pptx_text,
    )

    b = build_pptx(text)
    out = extract_pptx_text(b)
    assert out["text"] == text
    assert out["n_paragraphs"] == 1 and out["n_runs"] == 1
    zf = zipfile.ZipFile(io.BytesIO(b))
    assert zf.testzip() is None
    assert "ppt/slides/slide1.xml" in zf.namelist()


def test_fixture_pptx_eml_rtf_payloads_are_real():
    from caseguarddatapipeline_spark.operators import multimodal as M
    from caseguarddatapipeline_spark.operators.docxops import (
        extract_pptx_text,
    )
    from caseguarddatapipeline_spark.operators.mailops import extract_eml
    from caseguarddatapipeline_spark.operators.rtfops import extract_rtf

    text = "some corpus body words here"
    p = M._format_payload(192, text)
    assert extract_pptx_text(p)["text"] == text
    assert M._decode_one(p) == text[:32]
    e = M._format_payload(224, text)
    assert e.startswith(b"From: ")
    got = extract_eml(e)
    assert got["text"] == text and got["subject"] == "case document 224"
    assert M._decode_one(e) == text[:32]
    r = M._format_payload(256, text)
    assert r.startswith(b"{\\rtf1")
    assert extract_rtf(r)["text"] == text
    assert M._decode_one(r) == text[:32]


@given(
    subject=_printable,
    body=st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=600),
        max_size=2000,
    ),
)
@settings(**_SETTINGS)
def test_msg_cfb_roundtrip_property(subject, body):
    """OLE2 compound container: header -> DIFAT -> FAT -> directory ->
    mini-stream/miniFAT walk must recover the UTF-16 property streams
    exactly, across mini-sector and sector boundaries."""
    from caseguarddatapipeline_spark.operators.cfbops import (
        build_msg,
        extract_msg,
    )

    out = extract_msg(build_msg(subject, body))
    assert out["subject"] == subject
    assert out["text"] == body
    assert out["n_streams"] == 3


def test_cfb_manifest_and_rejects():
    from caseguarddatapipeline_spark.operators import multimodal as M
    from caseguarddatapipeline_spark.operators.cfbops import (
        CfbParseError,
        cfb_manifest,
        extract_msg,
    )

    payload = M._format_payload(288, "corpus body here")
    names = [n for n, t, s in cfb_manifest(payload)]
    assert names == [
        "Root Entry",
        "__substg1.0_0037001F",
        "__substg1.0_1000001F",
        "__properties_version1.0",
    ]
    assert extract_msg(payload)["subject"] == "case document 288"
    assert M._decode_one(payload) == "corpus body here"[:32]
    with pytest.raises((CfbParseError, ValueError)):
        extract_msg(b"\xd0\xcf\x11\xe0 not really")
    with pytest.raises((CfbParseError, ValueError)):
        extract_msg(b"plain text")
