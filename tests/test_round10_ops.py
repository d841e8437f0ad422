"""Round-10 operators: byte-real multimodal decode (PPM/BMP pixels, WAV
PCM samples) pinned against the fixture generator and brute-force
recomputation — the decoders must recover the LOGICAL image/samples from
real on-disk encodings, including BMP's bottom-up row order, BGR channel
order, and 4-byte row padding."""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

from caseguarddatapipeline_spark.operators import multimodal as M

TEXT = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"


def _logical(doc_id: int) -> np.ndarray:
    w, h = M._raster_dims(doc_id)
    j = np.arange(w * h * 3, dtype=np.int64)
    return ((doc_id * 3 + j) % 256).astype(np.uint8).reshape(h, w * 3)


def test_ppm_decode_recovers_logical_pixels():
    for doc_id in (5, 17, 29, 41, 53):
        assert M._format_ext(doc_id) == "ppm"
        w, h, arr = M._parse_ppm(M._format_payload(doc_id, TEXT))
        assert (w, h) == M._raster_dims(doc_id)
        assert np.array_equal(arr, _logical(doc_id))


def test_bmp_decode_recovers_logical_pixels_and_quirks_matter():
    """The BMP decoder must undo bottom-up rows AND BGR channels; a
    decoder that skipped either would return different bytes (the
    fixture pixels vary in both axes and per channel)."""
    for doc_id in (11, 23, 35, 47, 59):
        assert M._format_ext(doc_id) == "bmp"
        b = M._format_payload(doc_id, TEXT)
        w, h, arr = M._parse_bmp(b)
        assert (w, h) == M._raster_dims(doc_id)
        logical = _logical(doc_id)
        assert np.array_equal(arr, logical)
        # adversarial: naive decode (no flip, no swap) differs
        stride = (w * 3 + 3) // 4 * 4
        naive = np.frombuffer(
            b, dtype=np.uint8, count=stride * h, offset=54
        ).reshape(h, stride)[:, : w * 3]
        assert not np.array_equal(naive, logical)
        # ...and the logical image is format-independent: the PPM of the
        # same doc_id (hypothetically) would carry identical bytes
        assert np.array_equal(
            M._parse_ppm(
                f"P6\n{w} {h}\n255\n".encode() + logical.tobytes()
            )[2],
            arr,
        )


def test_bmp_decode_handles_padding_and_topdown():
    """Widths not divisible by 4 pad each row to a 4-byte boundary, and a
    negative height means top-down storage — both real-BMP cases the
    fixture's round widths never exercise."""
    w, h = 2, 2  # stride = 8, 2 pad bytes per row
    px = np.arange(w * h * 3, dtype=np.uint8).reshape(h, w, 3)
    stride = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + stride * h, 0, 0, 54)
        + struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 0, 0, 0, 0
        )
    )
    got_w, got_h, arr = M._parse_bmp(header + rows.tobytes())
    assert (got_w, got_h) == (w, h)
    assert np.array_equal(arr, px.reshape(h, w * 3))
    # top-down variant: negative height, rows NOT flipped on disk
    td_rows = np.zeros((h, stride), dtype=np.uint8)
    td_rows[:, : w * 3] = px[:, :, ::-1].reshape(h, w * 3)
    td_header = (
        b"BM"
        + struct.pack("<IHHI", 54 + stride * h, 0, 0, 54)
        + struct.pack(
            "<IiiHHIIiiII", 40, w, -h, 1, 24, 0, stride * h, 0, 0, 0, 0
        )
    )
    _, _, td_arr = M._parse_bmp(td_header + td_rows.tobytes())
    assert np.array_equal(td_arr, px.reshape(h, w * 3))


def test_wav_pcm_decode_returns_actual_samples():
    for doc_id in (2, 8, 14):
        assert M._format_ext(doc_id) == "wav"
        rate, samples = M._parse_wav_pcm(M._format_payload(doc_id, TEXT))
        assert rate == 8000
        assert samples.tobytes() == TEXT.encode()


def test_pixel_tiles_kernel_matches_bruteforce():
    doc_id = 17
    payload = M._format_payload(doc_id, TEXT)
    [out] = list(
        M._pixel_tiles_kernel(
            iter([pd.DataFrame({"doc_id": [doc_id], "payload": [payload]})])
        )
    )
    w, h = M._raster_dims(doc_id)
    assert len(out) == (h // 32) * (w // 32)
    logical = _logical(doc_id).astype(np.int64)
    for r in out.itertuples():
        tile = logical[
            r.tile_y * 32 : (r.tile_y + 1) * 32,
            r.tile_x * 96 : (r.tile_x + 1) * 96,
        ]
        assert (r.byte_sum, r.byte_min, r.byte_max) == (
            int(tile.sum()),
            int(tile.min()),
            int(tile.max()),
        )


def test_wav_frames_kernel_matches_bruteforce():
    doc_id = 2
    payload = M._format_payload(doc_id, TEXT)
    [out] = list(
        M._wav_frames_kernel(
            iter([pd.DataFrame({"doc_id": [doc_id], "payload": [payload]})])
        )
    )
    s = np.frombuffer(TEXT.encode(), dtype=np.uint8).astype(np.int64)
    assert len(out) == -(-len(s) // 80)
    for r in out.itertuples():
        fr = s[r.frame_index * 80 : (r.frame_index + 1) * 80]
        assert r.n_samples == len(fr)
        assert (r.sample_sum, r.sample_min, r.sample_max) == (
            int(fr.sum()),
            int(fr.min()),
            int(fr.max()),
        )


def _fixture_dims(doc_id: int) -> tuple[int, int]:
    if doc_id < M._BINFIX_N and doc_id % 3 == 1:
        # png class uses its own height modulus; jpg ids (>= 64) use
        # _raster_dims regardless of their %3 residue
        return 64 + (doc_id % 5) * 32, 64 + (doc_id % 4) * 32
    return M._raster_dims(doc_id)


def test_pixel_tile_stats_query_runs(spark, sf_dir):
    out = M.e4_pixel_tile_stats(spark, sf_dir)
    rows = out.collect()
    assert rows
    # 31 raster fixture docs (5 ppm + 5 bmp + 21 png) + the 32 round-12
    # baseline-JPEG docs (ids 64-95), every tile counted
    per_doc = {}
    fmts = set()
    for r in rows:
        per_doc.setdefault(r.doc_id, 0)
        per_doc[r.doc_id] += 1
        fmts.add(r.fmt)
        assert 0 <= r.byte_min <= r.byte_max <= 255
        assert r.byte_mean == round(r.byte_sum / 3072.0, 4)
    assert len(per_doc) == 31 + M._BINFIX_JPG_N + M._BINFIX_TIFF_N
    assert fmts == {"ppm", "bmp", "png", "jpg", "tiff"}
    for did, n in per_doc.items():
        w, h = _fixture_dims(did)
        assert n == (w // 32) * (h // 32)


def test_winnow_pairs_output_identical_to_bruteforce(spark, sf_dir):
    """winnow_pairs must emit exactly the pairs a brute-force
    shared-fingerprint count produces (df cap + tau applied in python
    sets) — the identity pin behind the round-10 bitmap-prune design
    record (the prune variant was output-identical too, but measured
    181 vs 103 s at 50× and was rejected; see winnow_pairs)."""
    from caseguarddatapipeline_spark.operators.dedup import (
        WINNOW_MAXDF,
        WINNOW_TAU,
        winnow_pairs,
    )
    from caseguarddatapipeline_spark.operators.textops import winnow_postings
    from caseguarddatapipeline_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    posts = winnow_postings(docs).collect()
    by_fp: dict[str, list[int]] = {}
    for r in posts:
        by_fp.setdefault(r.fp, []).append(r.doc_id)
    shared: dict[tuple[int, int], int] = {}
    for members in by_fp.values():
        if len(members) < 2 or len(members) > WINNOW_MAXDF:
            continue
        ms = sorted(members)
        for i, a in enumerate(ms):
            for b in ms[i + 1 :]:
                shared[(a, b)] = shared.get((a, b), 0) + 1
    expected = {p: n for p, n in shared.items() if n >= WINNOW_TAU}
    got = {
        (r.doc_a, r.doc_b): r.n_shared
        for r in winnow_pairs(docs).collect()
    }
    assert got == expected


def test_winnow_bitmap_bound_is_sound():
    """The rejected winnow prune's math, kept pinned because
    prefix/containment still rely on the same bound (_doc_stats): on
    dense fingerprint sets (forced bucket collisions)
    popcount(bm_a & ~bm_b) must never exceed |fps_a \\ fps_b| — an UPPER
    bound on the shared count even when the 256-bucket bitmap
    saturates."""
    import random

    rng = random.Random(7)
    for _ in range(50):
        fa = {rng.randrange(10_000) for _ in range(rng.randrange(1, 600))}
        fb = {rng.randrange(10_000) for _ in range(rng.randrange(1, 600))}

        def bm(fps):
            m = 0
            for f in fps:
                m |= 1 << (f % 256)
            return m

        miss_ab = bin(bm(fa) & ~bm(fb) & ((1 << 256) - 1)).count("1")
        assert miss_ab <= len(fa - fb)
        # ⇒ shared = |fa ∩ fb| ≤ |fa| − miss_ab
        assert len(fa & fb) <= len(fa) - miss_ab


def test_resize_kernel_matches_bruteforce():
    doc_id = 23  # bmp: the resize must see the flipped/swapped pixels
    payload = M._format_payload(doc_id, TEXT)
    [out] = list(
        M._resize_kernel(
            iter([pd.DataFrame({"doc_id": [doc_id], "payload": [payload]})])
        )
    )
    w, h = M._raster_dims(doc_id)
    small = (
        _logical(doc_id).reshape(h, w, 3)[::2, ::2, :].astype(np.int64)
    )
    r = out.iloc[0]
    assert (r.out_w, r.out_h) == (w // 2, h // 2)
    assert (r.byte_sum, r.byte_min, r.byte_max) == (
        int(small.sum()),
        int(small.min()),
        int(small.max()),
    )


def test_png_decode_recovers_logical_pixels_all_filters():
    """The fixture PNGs are complete real files (signature, CRC-valid
    chunks, stored-block zlib IDAT) whose rows cycle through ALL FIVE
    PNG filter types; the stdlib-only decoder must inflate and defilter
    back to the logical image byte-for-byte."""
    import zlib

    for doc_id in (1, 4, 7, 10, 13):
        assert M._format_ext(doc_id) == "png"
        b = M._format_payload(doc_id, TEXT)
        w, h = 64 + (doc_id % 5) * 32, 64 + (doc_id % 4) * 32
        got_w, got_h, arr = M._parse_png(b)
        assert (got_w, got_h) == (w, h)
        j = np.arange(w * h * 3, dtype=np.int64)
        logical = ((doc_id * 3 + j) % 256).astype(np.uint8).reshape(h, w * 3)
        assert np.array_equal(arr, logical)
        # the size formula the scan oracle states
        raw = h * (1 + 3 * w)
        assert len(b) == 63 + raw + 5 * ((raw + 65534) // 65535)
        # the IDAT really is a valid zlib stream of the filtered rows
        idat = b[8 + 25 + 8 : -12 - 4]
        assert zlib.decompress(idat) == M._png_filter_rows(
            logical.reshape(h, w, 3), h, w
        )


def test_png_decode_rejects_corrupt_crc():
    import pytest

    b = bytearray(M._format_payload(1, TEXT))
    b[40] ^= 0xFF  # flip a byte inside IDAT: its CRC must trip
    with pytest.raises(ValueError, match="CRC"):
        M._parse_png(bytes(b))


def test_png_filter_roundtrip_exhaustive():
    """Every filter type round-trips on adversarial pixel data (random
    bytes force the Paeth/Average tie-break and modular wrap paths)."""
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(10, 4, 3), dtype=np.uint8)
    stream = M._png_filter_rows(px, 10, 4)
    b = (
        b"\x89PNG\r\n\x1a\n"
        + M._png_chunk(
            b"IHDR",
            __import__("struct").pack(">II5B", 4, 10, 8, 2, 0, 0, 0),
        )
        + M._png_chunk(b"IDAT", M._zlib_stored(stream))
        + M._png_chunk(b"IEND", b"")
    )
    _, _, arr = M._parse_png(b)
    assert np.array_equal(arr, px.reshape(10, 12))


# ---- property-based round-trips (hypothesis): the decoders must invert
# the encoders for ARBITRARY dimensions and pixel/sample content, not
# just the fixture's formula images ----

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@st.composite
def _images(draw):
    w = draw(st.integers(min_value=1, max_value=9))
    h = draw(st.integers(min_value=1, max_value=9))
    data = draw(
        st.binary(min_size=w * h * 3, max_size=w * h * 3)
    )
    return w, h, np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)


@settings(max_examples=40, deadline=None)
@given(_images())
def test_property_png_roundtrip(img):
    import struct

    w, h, px = img
    b = (
        b"\x89PNG\r\n\x1a\n"
        + M._png_chunk(b"IHDR", struct.pack(">II5B", w, h, 8, 2, 0, 0, 0))
        + M._png_chunk(b"IDAT", M._zlib_stored(M._png_filter_rows(px, h, w)))
        + M._png_chunk(b"IEND", b"")
    )
    got_w, got_h, arr = M._parse_png(b)
    assert (got_w, got_h) == (w, h)
    assert np.array_equal(arr, px.reshape(h, w * 3))


@settings(max_examples=40, deadline=None)
@given(_images())
def test_property_bmp_roundtrip_with_padding(img):
    """Arbitrary widths exercise every row-padding case (0-3 pad
    bytes), plus the bottom-up flip and BGR swap."""
    import struct

    w, h, px = img
    stride = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)
    b = (
        b"BM"
        + struct.pack("<IHHI", 54 + stride * h, 0, 0, 54)
        + struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 0, 0, 0, 0
        )
        + rows.tobytes()
    )
    got_w, got_h, arr = M._parse_bmp(b)
    assert (got_w, got_h) == (w, h)
    assert np.array_equal(arr, px.reshape(h, w * 3))


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_property_wav_pcm_roundtrip(data):
    import struct

    b = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    rate, samples = M._parse_wav_pcm(b)
    assert rate == 8000
    assert samples.tobytes() == data


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=200_000))
def test_property_zlib_stored_is_valid_zlib(data):
    """The hand-built stored-block stream must be decompressible by the
    real inflater for any payload, including the multi-block (>65535)
    and empty cases, and its size must match the oracle formula."""
    import zlib

    out = M._zlib_stored(data)
    assert zlib.decompress(out) == data
    nblocks = max(1, -(-len(data) // 65535))
    assert len(out) == 2 + 5 * nblocks + len(data) + 4


def test_mulaw_table_matches_cpython_audioop():
    """Independent reference: the G.711 decode table must match CPython's
    C implementation (audioop.ulaw2lin) for all 256 code points — the
    SQL oracle restates the same bit recipe, so this pins engine, oracle,
    and the standard against each other."""
    import warnings

    import pytest

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        # removed from the stdlib in 3.13 — the table stays pinned by the
        # in-repo bit-recipe tests and the SQL oracle there
        audioop = pytest.importorskip("audioop")

    lut = M._mulaw_decode_table()
    ref = np.frombuffer(
        audioop.ulaw2lin(bytes(range(256)), 2), dtype="<i2"
    ).astype(np.int64)
    assert np.array_equal(lut, ref)


def test_mulaw_frames_kernel_matches_bruteforce():
    doc_id = 2
    payload = M._format_payload(doc_id, TEXT)
    [out] = list(
        M._mulaw_frames_kernel(
            iter([pd.DataFrame({"doc_id": [doc_id], "payload": [payload]})])
        )
    )
    lut = M._mulaw_decode_table()
    lin = lut[np.frombuffer(TEXT.encode(), dtype=np.uint8)]
    for r in out.itertuples():
        fr = lin[r.frame_index * 80 : (r.frame_index + 1) * 80]
        assert (r.linear_sum, r.linear_min, r.linear_max) == (
            int(fr.sum()),
            int(fr.min()),
            int(fr.max()),
        )
