"""Interlaced (field) coding: --source-scan-type tff/bff splits each
frame into two half-height field pictures with field_seq VUI and
pic_timing SEIs (reference kvazaar_field_encoding_adapter,
src/kvazaar.c:294; tests/test_interlace.sh)."""

import numpy as np
import pytest

from kvazaar_tpu.api import Encoder
from kvazaar_tpu.bitstream.bits import split_annexb
from kvazaar_tpu.bitstream.decoder import decode_stream
from kvazaar_tpu.config import Config

pytestmark = pytest.mark.heavy


def _frames(n, w, h, seed=2):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    out = []
    for i in range(n):
        y = np.clip(120 + 40 * np.sin(xx / 8.0 + i)
                    * np.cos(yy / 5.0) + rng.normal(0, 4, (h, w)),
                    0, 255).astype(np.uint8)
        cb = rng.integers(100, 150, (h // 2, w // 2)).astype(np.uint8)
        cr = rng.integers(100, 150, (h // 2, w // 2)).astype(np.uint8)
        out.append((y, cb, cr))
    return out


@pytest.mark.parametrize("scan", ["tff", "bff"])
def test_field_coding_bit_exact(scan):
    w, h = 64, 128          # fields are 64x64
    cfg = Config(width=w, height=h, qp=30, intra_period=0,
                 intra_max_cu=16, intra_min_cu=16)
    cfg.set("source_scan_type", scan)
    cfg.validate()
    enc = Encoder(cfg)
    frames = _frames(3, w, h)
    stream = b""
    results = []
    for f in frames:
        results += enc.encode(*f)
        for chunks, info, rec in results[-2:]:
            pass
    for chunks, _info, _rec in results:
        stream += chunks
    assert len(results) == 6             # 2 fields per frame
    dec = decode_stream(stream, enc._intra.params)
    assert len(dec) == 6
    # Field pictures must carry the right source rows.
    off0 = 0 if scan == "tff" else 1
    for i, f in enumerate(frames):
        (ry, _, _), _fd = dec[2 * i]
        # Compare luma PSNR sanity: decoded field resembles its rows.
        src = f[0][off0::2].astype(np.int32)
        mse = float(((ry[:src.shape[0]].astype(np.int32)
                      - src) ** 2).mean())
        assert mse < 200.0, f"field {i} mismatch (mse {mse})"
    # Results carry per-field recon identical to the decode.
    for (chunks, info, rec), ((ry, rcb, rcr), _fd) in zip(results,
                                                          dec):
        np.testing.assert_array_equal(rec[0], ry[:rec[0].shape[0]])


def test_field_stream_has_pic_timing_seis():
    w, h = 64, 128
    cfg = Config(width=w, height=h, qp=32, intra_period=1,
                 intra_max_cu=16, intra_min_cu=16)
    cfg.set("source_scan_type", "tff")
    enc = Encoder(cfg.validate())
    stream = b""
    for f in _frames(1, w, h):
        for chunks, _i, _r in enc.encode(*f):
            stream += chunks
    nals = [t for t, _tid, _r in split_annexb(stream)]
    assert nals.count(39) >= 2           # prefix SEI per field
    # SPS VUI signals field_seq (bit-level check via params flag).
    assert enc._intra.params.source_scan_type == 1


def test_interlace_validation():
    with pytest.raises(ValueError):
        Config(width=64, height=66, qp=30).set(
            "source_scan_type", "tff").validate()
    with pytest.raises(ValueError):
        Config(width=64, height=128, qp=30, gop_len=8,
               intra_period=0).set("source_scan_type", "tff").validate()
