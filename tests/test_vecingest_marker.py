"""Round-8 advice fix: a truncated or garbled _INGEST_BATCH marker must
FAIL FAST, not silently read as 'unset' — (None, -1) disabled both the
checkpoint-ownership gate and the replay/rollback gate and let the next
batch overwrite the marker."""

from __future__ import annotations

import pytest

from caseguarddatapipeline_spark.streaming.vecingest import (
    _read_marker,
    _write_marker,
)


def test_read_marker_roundtrip_and_fresh(tmp_path):
    base = str(tmp_path)
    assert _read_marker(base) == (None, -1)  # only FileNotFound means fresh
    _write_marker(base, "tok123", 7)
    assert _read_marker(base) == ("tok123", 7)


def test_read_marker_legacy_id_only(tmp_path):
    (tmp_path / "_INGEST_BATCH").write_text("42")
    assert _read_marker(str(tmp_path)) == ("legacy", 42)


@pytest.mark.parametrize("raw", ["", "tok:", "tok:abc", "garbled junk"])
def test_read_marker_unparseable_raises(tmp_path, raw):
    (tmp_path / "_INGEST_BATCH").write_text(raw)
    with pytest.raises(RuntimeError, match="unparseable"):
        _read_marker(str(tmp_path))
