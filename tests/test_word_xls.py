"""Byte-real Word 97 / Excel 97 build → parse round-trips (round 13 —
the reference's legacy binary Office classes, verdict items 2-3).

Mirrors the MSG/XLSX treatment: the fixture generator emits a COMPLETE
OLE2 compound file, the parser walks it the way antiword / a BIFF
reader must (FIB → CLX → piece table; BOF → SST → BoundSheet8 → cell
records), and hypothesis drives arbitrary text through both — pieces
alternate cp1252/UTF-16 storage and SST strings alternate compressed/
wide, so every storage flag path is exercised."""

from __future__ import annotations

import struct

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from caseguarddatapipeline_spark.operators.biffops import (
    XlsParseError,
    _decode_rk,
    build_xls,
    extract_xls,
)
from caseguarddatapipeline_spark.operators.cfbops import build_cfb, _read_cfb
from caseguarddatapipeline_spark.operators.wordops import (
    DocParseError,
    build_doc,
    extract_doc,
)

_SETTINGS = dict(
    deadline=None,
    max_examples=40,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# \r-free text (the paragraph-mark round-trip maps \n <-> \r); includes
# non-cp1252 codepoints so pieces/strings are forced to UTF-16
_text = st.text(
    alphabet=st.characters(
        min_codepoint=32, max_codepoint=1200, exclude_characters="\r"
    ),
    max_size=2000,
)
_words = st.lists(
    st.text(
        alphabet=st.characters(min_codepoint=33, max_codepoint=1200),
        min_size=1,
        max_size=12,
    ),
    max_size=60,
).map(" ".join)


@given(text=_text)
@settings(**_SETTINGS)
def test_doc_roundtrip_property(text):
    out = extract_doc(build_doc(text))
    assert out["text"] == text.replace("\n", "\n")
    assert out["n_pieces"] == -(-(len(text.replace("\n", "\r")) + 1) // 120)


@given(text=_words)
@settings(**_SETTINGS)
def test_xls_roundtrip_property(text):
    words = text.split(" ") if text else []
    out = extract_xls(build_xls(text))
    assert out["values"] == words
    assert out["n_cells"] == len(words)
    assert out["n_shared"] == len(set(words))
    assert out["sum_numbers"] == len(words) * (len(words) + 1) / 2


def test_doc_piece_structure_and_storage_mix():
    # ASCII text: pieces alternate compressed/unicode deterministically
    text = "x" * 500
    out = extract_doc(build_doc(text))
    assert out["n_pieces"] == 5  # ceil(501/120)
    assert out["n_unicode"] == 2  # odd indices 1, 3
    # non-cp1252 char inside an even (compressed-slot) piece forces it
    # to UTF-16 — the per-piece fc flag, not the alternation, decides
    out2 = extract_doc(build_doc("Ω" + "x" * 499))
    assert out2["text"] == "Ω" + "x" * 499
    assert out2["n_unicode"] == 3


def test_doc_clx_prc_skip_and_rejects():
    # a Prc (clxt=1 grpprl block) before the Pcdt must be skipped
    doc = build_doc("hello piece world")
    _, rd = _read_cfb(doc)
    wd, table = rd("WordDocument"), rd("1Table")
    prc = b"\x01" + struct.pack("<H", 4) + b"\xde\xad\xbe\xef"
    patched_table = prc + table
    fib = bytearray(wd)
    struct.pack_into("<II", fib, 0x1A2, 0, len(patched_table))
    patched = build_cfb([("WordDocument", bytes(fib)), ("1Table", patched_table)])
    assert extract_doc(patched)["text"] == "hello piece world"

    with pytest.raises((DocParseError, ValueError)):
        extract_doc(build_cfb([("WordDocument", b"\x00" * 512)]))
    with pytest.raises((DocParseError, ValueError)):
        extract_doc(build_cfb([("NotWord", b"x" * 64)]))
    # encrypted flag set -> explicit reject, not garbage text
    enc = bytearray(wd)
    struct.pack_into("<H", enc, 0x0A, 0x0200 | 0x0100)
    with pytest.raises(DocParseError, match="encrypted"):
        extract_doc(build_cfb([("WordDocument", bytes(enc)), ("1Table", table)]))


def test_xls_rk_record_and_rejects():
    # hand-append an RK record (packed int, /100, truncated f64 forms)
    xls = build_xls("a b")
    _, rd = _read_cfb(xls)
    wb = rd("Workbook")
    eof_at = wb.rfind(struct.pack("<HH", 0x000A, 0))
    rk_int = struct.pack("<HH", 0x027E, 10) + struct.pack(
        "<HHHI", 5, 2, 15, (30 << 2) | 2
    )
    rk_div = struct.pack("<HH", 0x027E, 10) + struct.pack(
        "<HHHI", 6, 2, 15, (12345 << 2) | 3
    )
    f64_hi = struct.unpack("<Q", struct.pack("<d", 2.5))[0] >> 32 & 0xFFFFFFFC
    rk_f64 = struct.pack("<HH", 0x027E, 10) + struct.pack("<HHHI", 7, 2, 15, f64_hi)
    patched = build_cfb(
        [("Workbook", wb[:eof_at] + rk_int + rk_div + rk_f64 + wb[eof_at:])]
    )
    out = extract_xls(patched)
    # labels a,b + numbers 1+2 + RK 30 + 123.45 + 2.5
    assert out["sum_numbers"] == pytest.approx(3 + 30 + 123.45 + 2.5)
    assert _decode_rk(((-7) << 2) & 0xFFFFFFFF | 2) == -7.0

    with pytest.raises((XlsParseError, ValueError)):
        extract_xls(build_cfb([("Workbook", b"\x00" * 512)]))
    with pytest.raises(XlsParseError, match="Workbook"):
        extract_xls(build_cfb([("Book", b"\x00" * 512)]))  # BIFF5


def test_cfb_regular_stream_and_directory_tree():
    # streams >= the 4096 mini cutoff go through regular FAT sectors;
    # a larger set exercises the balanced sibling tree + multi-sector
    # directory/FAT bookkeeping
    big = bytes(range(256)) * 64  # 16 KiB
    streams = [(f"S{i:02d}", bytes([i]) * (i * 37 + 1)) for i in range(20)]
    streams.append(("BigOne", big))
    data = build_cfb(streams)
    _, rd = _read_cfb(data)
    assert rd("BigOne") == big
    for name, payload in streams:
        assert rd(name) == payload
    with pytest.raises(ValueError):
        build_cfb([("dup", b"a"), ("dup", b"b")])


def test_fixture_payloads_are_real_doc_xls():
    from caseguarddatapipeline_spark.operators import multimodal as M

    text = "corpus body for legacy office"
    doc = M._format_payload(320, text)
    assert doc[:8] == b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    assert extract_doc(doc)["text"] == text
    xls = M._format_payload(352, text)
    assert extract_xls(xls)["text"] == text
    # magic-byte dispatch resolves the OLE2 family member
    assert M._decode_one(doc) == text[:32]
    assert M._decode_one(xls) == text[:32]


# ---------------------------------------------------------------------------
# PowerPoint 97 (pptops) — same build → parse discipline
# ---------------------------------------------------------------------------

from caseguarddatapipeline_spark.operators.pptops import (  # noqa: E402
    PptParseError,
    build_ppt,
    extract_ppt,
)


@given(text=_text)
@settings(**_SETTINGS)
def test_ppt_roundtrip_property(text):
    out = extract_ppt(build_ppt(text))
    assert out["text"] == text
    assert out["n_atoms"] == -(-len(text.replace("\n", "\r")) // 120)


def test_ppt_atom_structure_and_rejects():
    out = extract_ppt(build_ppt("y" * 500))
    assert out["n_atoms"] == 5 and out["n_unicode"] == 2
    # non-cp1252 char in an even (bytes-slot) atom forces UTF-16
    out2 = extract_ppt(build_ppt("Ω" + "y" * 499))
    assert out2["n_unicode"] == 3

    with pytest.raises((PptParseError, ValueError)):
        extract_ppt(build_cfb([("Current User", b"\x00" * 32)]))
    # encrypted header token -> explicit reject
    doc = build_ppt("hello")
    _, rd = _read_cfb(doc)
    cu = bytearray(rd("Current User"))
    struct.pack_into("<I", cu, 12, 0xF3D1C4DF)  # encrypted token
    enc = build_cfb(
        [("Current User", bytes(cu)),
         ("PowerPoint Document", rd("PowerPoint Document"))]
    )
    with pytest.raises(PptParseError, match="encrypted"):
        extract_ppt(enc)
    # record overrunning its container must raise, not misparse
    pp = bytearray(rd("PowerPoint Document"))
    struct.pack_into("<I", pp, 4, 1 << 30)  # UserEditAtom len -> bogus
    with pytest.raises(PptParseError):
        extract_ppt(
            build_cfb(
                [("Current User", rd("Current User")),
                 ("PowerPoint Document", bytes(pp))]
            )
        )


def test_ppt_fixture_payload_and_dispatch():
    from caseguarddatapipeline_spark.operators import multimodal as M

    text = "legacy presentation body"
    ppt = M._format_payload(384, text)
    assert ppt[:8] == b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    assert extract_ppt(ppt)["text"] == text
    assert M._decode_one(ppt) == text[:32]


# ---------------------------------------------------------------------------
# Archive expansion (archiveops) — member fan-out with nested containers
# ---------------------------------------------------------------------------

from caseguarddatapipeline_spark.operators.archiveops import (  # noqa: E402
    ArchiveParseError,
    build_case_bundle,
    expand_zip,
)


@given(text=_text)
@settings(**_SETTINGS)
def test_zip_bundle_roundtrip_property(text):
    members = expand_zip(build_case_bundle(text))
    assert [m["member_format"] for m in members] == ["txt", "rtf", "docx"]
    assert "".join(m["member_text"] for m in members) == text
    n = len(text)
    assert len(members[0]["member_text"]) == n // 3
    assert len(members[1]["member_text"]) == 2 * n // 3 - n // 3


def test_zip_bundle_nested_container_and_rejects():
    # the third member is a COMPLETE nested OOXML archive — CPython's
    # zipfile must agree both levels are real ZIPs
    import io
    import zipfile

    bundle = build_case_bundle("alpha beta gamma delta epsilon zeta")
    with zipfile.ZipFile(io.BytesIO(bundle)) as z:
        assert z.testzip() is None
        inner = z.read("doc_part2.docx")
        with zipfile.ZipFile(io.BytesIO(inner)) as zi:
            assert zi.testzip() is None
            assert "word/document.xml" in zi.namelist()

    from caseguarddatapipeline_spark.operators.docxops import _zip

    with pytest.raises(ArchiveParseError, match="no parser"):
        expand_zip(_zip([("weird.bin", b"\x00\x01")]))


def test_zip_bundle_fixture_payload():
    from caseguarddatapipeline_spark.operators import multimodal as M

    text = "case bundle body text for the archive class"
    payload = M._format_payload(416, text)
    assert payload[:4] == b"PK\x03\x04"
    members = expand_zip(payload)
    assert "".join(m["member_text"] for m in members) == text
