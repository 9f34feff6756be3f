"""Pallas wavefront kernel == XLA scan, bit-identical.

The fused kernel (ops/wavefront_pallas.py) is the hot TPU recon path
and is normally gated to the TPU backend; here it runs in pallas
interpret mode so the CPU suite executes the same kernel logic and pins
its outputs (levels AND reconstruction, luma AND chroma) against the
lax.scan reference path for every supported shape class — the analogue
of the reference's generic-vs-SIMD equivalence suites
(/root/reference/tests/test_strategies.c:28-53).
"""

import numpy as np
import pytest

import kvazaar_tpu.ops.wavefront_pallas as wfp
from kvazaar_tpu.encoder.geometry import make_intra_plan
from kvazaar_tpu.encoder.intra_recon import reconstruct_frames

pytestmark = pytest.mark.smoke


def _sources(rng, b, w, h, chroma=True):
    ys = rng.integers(0, 256, (b, h, w)).astype(np.int32)
    cbs = crs = None
    if chroma:
        cbs = rng.integers(0, 256, (b, h // 2, w // 2)).astype(np.int32)
        crs = rng.integers(0, 256, (b, h // 2, w // 2)).astype(np.int32)
    return ys, cbs, crs


def _run_both(plan, ys, cbs, crs, modes, qp, **kw):
    """reconstruct_frames via the interpreted Pallas kernel vs the XLA
    scan (INTERPRET toggles the backend gate on CPU)."""
    from kvazaar_tpu.encoder.frame_encoder import chroma_qp
    import jax.numpy as jnp

    def j(a):
        return None if a is None else jnp.asarray(a)

    args = (j(ys), j(cbs), j(crs), j(modes), plan, qp, chroma_qp(qp), 8)
    kw = {k: j(v) if isinstance(v, np.ndarray) else v
          for k, v in kw.items()}
    wfp.INTERPRET = True
    try:
        got = reconstruct_frames(*args, **kw)
    finally:
        wfp.INTERPRET = False
    wfp.DISABLE = True      # force the scan even on a TPU backend
    try:
        want = reconstruct_frames(*args, **kw)
    finally:
        wfp.DISABLE = False
    return got, want


def _assert_equal(got, want):
    names = ("rec_y", "lv_y", "rec_cb", "lv_cb", "rec_cr", "lv_cr")
    for g, w, n in zip(got, want, names):
        assert (g is None) == (w is None), n
        if g is not None:
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w),
                                          err_msg=n)


@pytest.mark.parametrize("cu,w,h,qp", [
    (8, 32, 24, 32),
    (16, 64, 32, 22),
    (16, 48, 48, 37),
])
def test_intra_kernel_matches_scan(cu, w, h, qp):
    rng = np.random.default_rng(cu * 100 + qp)
    plan = make_intra_plan(w, h, cu, chroma=True)
    b = 2
    ys, cbs, crs = _sources(rng, b, w, h)
    modes = rng.integers(0, 35, (b, plan.blocks_y,
                                 plan.blocks_x)).astype(np.int32)
    got, want = _run_both(plan, ys, cbs, crs, modes, qp)
    _assert_equal(got, want)


def test_intra_kernel_luma_only():
    rng = np.random.default_rng(7)
    plan = make_intra_plan(32, 32, 16, chroma=False)
    ys, _, _ = _sources(rng, 1, 32, 32, chroma=False)
    modes = rng.integers(0, 35, (1, plan.blocks_y,
                                 plan.blocks_x)).astype(np.int32)
    got, want = _run_both(plan, ys, None, None, modes, 27)
    _assert_equal(got, want)


@pytest.mark.parametrize("cu", [8, 16])
def test_inter_kernel_matches_scan(cu):
    """P-frame form: inter mask + MC prediction planes stream through
    the kernel; inter blocks must take the MC pred + inter deadzone."""
    rng = np.random.default_rng(cu)
    w, h = 4 * cu, 2 * cu
    plan = make_intra_plan(w, h, cu, chroma=True)
    b = 1
    ys, cbs, crs = _sources(rng, b, w, h)
    modes = rng.integers(0, 35, (b, plan.blocks_y,
                                 plan.blocks_x)).astype(np.int32)
    is_inter = rng.integers(0, 2, (b, plan.blocks_y,
                                   plan.blocks_x)).astype(bool)
    mc_y = rng.integers(0, 256, ys.shape).astype(np.int32)
    mc_cb = rng.integers(0, 256, cbs.shape).astype(np.int32)
    mc_cr = rng.integers(0, 256, crs.shape).astype(np.int32)
    got, want = _run_both(plan, ys, cbs, crs, modes, 30,
                          is_inter=is_inter, mc_y=mc_y, mc_cb=mc_cb,
                          mc_cr=mc_cr)
    _assert_equal(got, want)


def test_supported_gate():
    """The gate must only admit what the kernel actually covers."""
    p16 = make_intra_plan(64, 64, 16, chroma=True)
    p32 = make_intra_plan(64, 64, 32, chroma=True)
    assert wfp.supported(p16, 8, False, False, False)
    assert wfp.supported(p16, 8, False, False, True)
    assert not wfp.supported(p32, 8, False, False, False)  # 32: scan
    assert not wfp.supported(p16, 10, False, False, False)
    assert not wfp.supported(p16, 8, True, False, False)
    assert not wfp.supported(p16, 8, False, True, False)
