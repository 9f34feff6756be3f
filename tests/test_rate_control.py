"""Frame-level R-lambda rate control: the controller must steer the
produced bitrate toward the target across a short IPPP sequence
(analogue of the reference's tests/test_rate_control.sh)."""

import numpy as np

from kvazaar_tpu.encoder.rate_control import RateController


def test_controller_math_converges():
    rc = RateController(target_bps=1_000_000, fps=25, width=832,
                        height=480)
    # Simulated encoder: bits produced follow a power law of lambda.
    rng = np.random.default_rng(0)
    produced = []
    for i in range(60):
        lam, qp = rc.frame_lambda_qp(is_intra=(i == 0))
        bits = int(3.5e6 * lam ** -0.8 * rng.uniform(0.9, 1.1))
        rc.update(bits, lam)
        produced.append(bits)
    # Average of the second half within 25% of the per-frame target.
    avg = np.mean(produced[30:])
    target = 1_000_000 / 25
    assert abs(avg - target) / target < 0.25, (avg, target)


def test_controller_qp_bounds():
    rc = RateController(target_bps=100, fps=25, width=1920, height=1080)
    lam, qp = rc.frame_lambda_qp()
    assert 4 <= qp <= 47
    rc2 = RateController(target_bps=1e9, fps=25, width=64, height=64)
    lam2, qp2 = rc2.frame_lambda_qp()
    assert 4 <= qp2 <= 47
    assert qp2 < qp


def test_encoder_rate_control_small():
    """End-to-end: tiny all-intra clip under rate control lands near
    the target and the stream still decodes bit-exactly."""
    from kvazaar_tpu.api import Encoder
    from kvazaar_tpu.bitstream.decoder import decode_stream
    from kvazaar_tpu.config import Config

    rng = np.random.default_rng(1)
    yy, xx = np.mgrid[0:64, 0:64]
    cfg = Config(width=64, height=64, qp=30, intra_max_cu=16,
                 intra_min_cu=16, intra_period=1, bitrate=200_000,
                 framerate_num=25)
    enc = Encoder(cfg)
    stream = b""
    bits = []
    recons = []
    for i in range(6):
        y = np.clip(128 + 60 * np.sin(xx / 5.0 + i) * np.cos(yy / 7.0)
                    + rng.normal(0, 5, (64, 64)), 0, 255).astype(np.uint8)
        cb = np.full((32, 32), 108, np.uint8)
        cr = np.full((32, 32), 145, np.uint8)
        [(chunks, info, rec)] = enc.encode(y, cb, cr)
        stream += chunks
        bits.append(info.bits)
        recons.append(rec)
    target = 200_000 / 25
    avg_tail = np.mean(bits[2:])
    assert 0.3 * target < avg_tail < 3.0 * target, (avg_tail, target)
    # Conformance still holds with per-frame QP changes.
    frames = decode_stream(stream, enc._intra.params)
    assert len(frames) == 6
    for i, ((ry, rcb, rcr), _fd) in enumerate(frames):
        np.testing.assert_array_equal(ry, recons[i][0])
