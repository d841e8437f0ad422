"""Byte-real DOCX build → parse round-trip (round 12).

The builder's archives must be accepted by an INDEPENDENT reader
(CPython's zipfile — CRC-validated via testzip), and the extractor must
recover arbitrary text through the full container walk: EOCD → central
directory → raw-deflate inflate → w:t/w:p scan with entity unescaping."""

from __future__ import annotations

import io
import zipfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from caseguarddatapipeline_spark.operators.docxops import (
    DocxParseError,
    build_docx,
    extract_docx_text,
)

_SETTINGS = dict(
    deadline=None,
    max_examples=40,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# XML-visible characters included so escaping is exercised; control
# chars below 0x20 are not legal in XML 1.0 text, so start at space
_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=1000),
    max_size=1500,
)


@given(text=_text)
@settings(**_SETTINGS)
def test_docx_roundtrip_property(text):
    b = build_docx(text)
    out = extract_docx_text(b)
    assert out["text"] == text
    assert out["n_paragraphs"] == 1 and out["n_runs"] == 1
    # independent reader: the archive is a real ZIP with correct CRCs
    zf = zipfile.ZipFile(io.BytesIO(b))
    assert zf.testzip() is None
    assert set(zf.namelist()) == {
        "[Content_Types].xml",
        "_rels/.rels",
        "word/document.xml",
    }


@given(
    text=st.text(
        alphabet=st.sampled_from(list("ab &<>\"'")), max_size=200
    )
)
@settings(**_SETTINGS)
def test_docx_escape_heavy_roundtrip(text):
    assert extract_docx_text(build_docx(text))["text"] == text


def test_docx_multiparagraph_and_entities():
    t = "alpha beta gamma delta epsilon"
    out = extract_docx_text(build_docx(t, wrap=2))
    assert out["text"] == "alpha beta\ngamma delta\nepsilon"
    assert out["n_paragraphs"] == 3
    # numeric character references and br/tab elements
    xml_doc = (
        '<?xml version="1.0"?><w:document><w:body>'
        "<w:p><w:r><w:t>A&#66;&#x43;</w:t></w:r><w:r><w:t>-D</w:t>"
        "</w:r></w:p>"
        "<w:p><w:r><w:t>x</w:t><w:tab/><w:t>y</w:t><w:br/>"
        "<w:t>z</w:t></w:r></w:p>"
        "</w:body></w:document>"
    )
    import struct
    import zlib

    from caseguarddatapipeline_spark.operators import docxops as D

    b = D._zip([("word/document.xml", xml_doc.encode())])
    out = extract_docx_text(b)
    assert out["text"] == "ABC-D\nx\ty\nz"
    assert out["n_runs"] == 5
    assert struct is not None and zlib is not None


def test_docx_rejects_garbage_and_missing_member():
    from caseguarddatapipeline_spark.operators import docxops as D

    with pytest.raises((DocxParseError, ValueError)):
        extract_docx_text(b"not a zip at all")
    # a real zip without word/document.xml
    b = D._zip([("other.xml", b"<x/>")])
    with pytest.raises(DocxParseError):
        extract_docx_text(b)


def test_fixture_payload_is_real_docx():
    from caseguarddatapipeline_spark.operators import multimodal as M

    text = "hello docx body with several words in it"
    doc_id = 96
    assert M._format_ext(doc_id) == "docx"
    payload = M._format_payload(doc_id, text)
    assert payload[:4] == b"PK\x03\x04"
    assert extract_docx_text(payload)["text"] == text
    assert M._decode_one(payload) == text[:32]
    zf = zipfile.ZipFile(io.BytesIO(payload))
    assert zf.testzip() is None
