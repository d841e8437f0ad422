"""S5 SOAP fetch stage: end-to-end stub fetch, binary decode + format
dim resolution, dead-letter rows, and the octet-stream fallback."""

from __future__ import annotations

import base64

from caseguarddatapipeline_spark.operators.soap_fetch import s5_soap_fetch
from caseguarddatapipeline_spark.sources.soap import soap_fetch, with_decoded_payload


def test_s5_stub_fetch_end_to_end(spark, sf_dir):
    out = s5_soap_fetch(spark, sf_dir).collect()
    assert out and all(r["fetch_status"] == "ok" for r in out)
    # decode round-trip: payload length is reps × record length
    for r in out[:20]:
        doc_id = int(r["doc_code"].split("-")[1])
        reps = doc_id % 4 + 1
        rec = f"FILEDATA/{r['doc_code']}/{r['doc_format']};"
        assert r["n_bytes"] == reps * len(rec)
        assert r["preview"] == (rec * reps)[:24]
    # every manifest format resolved through the dim (no fallback rows)
    assert all(r["mime_type"] != "application/octet-stream" for r in out)


def test_soap_failures_become_dead_letter_rows(spark):
    manifest = spark.createDataFrame(
        [("DOC-1", "TEXT"), ("POISON-2", "TEXT"), ("DOC-3", "HTML")],
        "doc_code string, doc_format string",
    ).coalesce(1)

    def factory():
        def fetch(code: str, fmt: str) -> str:
            if code.startswith("POISON"):
                raise RuntimeError("SOAP fault")
            return base64.b64encode(f"{code}:{fmt}".encode()).decode()

        return fetch

    rows = {
        r["doc_code"]: r
        for r in with_decoded_payload(
            spark,
            soap_fetch(manifest, factory, sleep=lambda _s: None, max_attempts=2),
        ).collect()
    }
    assert rows["DOC-1"]["fetch_status"] == "ok"
    assert bytes(rows["DOC-1"]["payload"]) == b"DOC-1:TEXT"
    assert rows["DOC-1"]["mime_type"] == "text/plain"
    assert rows["DOC-1"]["extension"] == ".txt"
    assert rows["DOC-1"]["attempts"] == 1
    # dead-letter row: NULL payload, retry count shows exhaustion
    assert rows["POISON-2"]["fetch_status"] == "failed"
    assert rows["POISON-2"]["payload"] is None
    assert rows["POISON-2"]["attempts"] == 2
    assert rows["DOC-3"]["mime_type"] == "text/html"


def test_unknown_format_falls_back_to_octet_stream(spark):
    manifest = spark.createDataFrame(
        [("DOC-1", "WEIRD-FMT")], "doc_code string, doc_format string"
    )

    def factory():
        def fetch(code: str, fmt: str) -> str:
            return base64.b64encode(b"\x00\x01binary").decode()

        return fetch

    [row] = with_decoded_payload(spark, soap_fetch(manifest, factory)).collect()
    assert row["mime_type"] == "application/octet-stream"
    assert row["extension"] == ".bin"
    assert bytes(row["payload"]) == b"\x00\x01binary"
    assert row["n_bytes"] == 8
