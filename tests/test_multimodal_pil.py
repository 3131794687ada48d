"""PIL-gated real image decode/resize (VERDICT r12 item 5).

The fixture PNGs are built in-repo by ``synthesize_png`` (zlib +
hand-rolled chunks — no imaging library needed to CREATE them), so
the fixture itself is validated ungated; the real decode/resize pins
run wherever Pillow is importable and skip here (this container has
no PIL), mirroring the avro/protobuf availability gates.
"""

from __future__ import annotations

import struct
import zlib

import pytest

from cgtcalc_data_transformer_spark.operators import multimodal as mm

requires_pil = pytest.mark.skipif(
    not mm.pil_available(), reason="Pillow absent: real decode gated"
)


def _parse_png(data: bytes) -> tuple[int, int, bytes]:
    """Minimal independent PNG reader: signature + IHDR dims + the
    concatenated IDAT stream, enough to validate the fixture without
    any imaging library."""
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos, idat = 8, b""
    width = height = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        crc = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])[0]
        assert crc == (zlib.crc32(tag + body) & 0xFFFFFFFF), tag
        if tag == b"IHDR":
            width, height = struct.unpack(">II", body[:8])
        elif tag == b"IDAT":
            idat += body
        pos += 12 + length
    return width, height, idat


def test_synthesize_png_is_spec_valid():
    data = mm.synthesize_png(33, 17, seed=5)
    w, h, idat = _parse_png(data)
    assert (w, h) == (33, 17)
    raw = zlib.decompress(idat)
    # grayscale 8-bit: one filter byte + w pixels per scanline
    assert len(raw) == 17 * (1 + 33)
    # deterministic: same args → same bytes; different seed → different
    assert data == mm.synthesize_png(33, 17, seed=5)
    assert data != mm.synthesize_png(33, 17, seed=6)


def test_stub_decode_handles_png_payloads(spark):
    """The stub path must stay total on REAL binary payloads (not just
    the ASCII synthetic corpus): decode_assets over PNG bytes runs,
    keeps one row per asset, and is deterministic."""
    assets = mm.synthesize_image_assets(spark, n=12)
    rows = mm.decode_assets(assets, backend="stub").orderBy("asset_id").collect()
    assert len(rows) == 12
    assert all(r.modality == "image" and r.width >= 16 for r in rows)
    again = mm.decode_assets(assets, backend="stub").orderBy("asset_id").collect()
    assert rows == again


def test_unknown_backend_rejected(spark):
    assets = mm.synthesize_image_assets(spark, n=1)
    with pytest.raises(NotImplementedError):
        mm.decode_assets(assets, backend="ffmpeg")


@requires_pil
def test_pil_decode_true_dimensions():
    png = mm.synthesize_png(33, 17, seed=1)
    meta = mm._decode_pil(png)
    assert (meta["width"], meta["height"]) == (33, 17)
    assert meta["duration_ms"] == 0
    assert len(meta["feature_hash"]) == 8


@requires_pil
def test_pil_resize_roundtrip():
    png = mm.synthesize_png(40, 24, seed=2)
    out = mm._resize_pil(png, 224, 224)
    meta = mm._decode_pil(out)
    assert (meta["width"], meta["height"]) == (224, 224)


@requires_pil
def test_pil_backend_end_to_end(spark):
    """decode_assets(backend='pil') recovers every fixture's TRUE
    dimensions (the stub cannot — its dims are a header-hash fake)."""
    out = {
        r.asset_id: (r.width, r.height)
        for r in mm.multimodal_decode_real(spark, "").collect()
    }
    for i in range(64):
        assert out[i] == (16 + i % 33, 16 + i % 25)
