"""Transfer packing roundtrips (ops/xfer.py): the device->host level
path must be EXACT — a wrong coefficient silently corrupts every
benched bitstream (the conformance oracle is the backstop; this is the
unit gate).  Analogue of the reference's generic-vs-SIMD equivalence
suites (/root/reference/tests/test_strategies.c:28-53) for the packing
'backend'."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from kvazaar_tpu.ops.xfer import (esc_capacity, pack_levels,
                                  unpack_levels)


def roundtrip(x, qp):
    nib, esc, ec = jax.jit(lambda v: pack_levels(v, qp))(jnp.asarray(x))
    nib, esc, ec = np.asarray(nib), np.asarray(esc), int(ec)
    if ec > esc_capacity(x.shape[0], qp):
        return None     # dense-fallback regime
    return unpack_levels(nib, esc, ec, x.shape[0])


@pytest.mark.smoke
@pytest.mark.parametrize("t,sparsity,escfrac,qp", [
    (59904, 0.6, 0.007, 22),     # noisy-content profile
    (12345, 0.95, 0.0, 32),      # clean content, odd length
    (257, 0.0, 0.12, 12),        # dense + many escapes, low QP
    (4096, 1.0, 0.0, 22),        # all zero
    (64, 0.5, 0.5, 0),           # escape-heavy
])
def test_pack_roundtrip(t, sparsity, escfrac, qp):
    rng = np.random.default_rng(t)
    x = np.zeros(t, np.int16)
    nzm = rng.random(t) > sparsity
    x[nzm] = rng.integers(-7, 8, nzm.sum())
    em = rng.random(t) < escfrac
    x[em] = rng.integers(-3000, 3000, em.sum())
    y = roundtrip(x, qp)
    if y is None:
        return          # overflow regime is the caller's dense path
    assert np.array_equal(y.astype(np.int32), x.astype(np.int32))


@pytest.mark.smoke
def test_escape_overflow_flagged():
    """esc_count must exceed capacity when content blows the escape
    budget — never silently corrupt."""
    t = 4096
    x = np.full(t, 300, np.int16)        # every coefficient escapes
    nib, esc, ec = jax.jit(lambda v: pack_levels(v, 30))(jnp.asarray(x))
    assert int(ec) > esc_capacity(t, 30)


@pytest.mark.smoke
def test_int16_escape_values():
    x = np.zeros(1024, np.int16)
    x[5] = 30000
    x[900] = -30000
    y = roundtrip(x, 0)
    assert y is not None and y.dtype == np.int16
    assert y[5] == 30000 and y[900] == -30000
