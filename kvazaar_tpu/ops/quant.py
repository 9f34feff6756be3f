"""HEVC quantization / dequantization (H.265 8.6.3) in JAX, batched.

Reference: src/strategies/generic/quant-generic.c (kvz_quant_generic,
kvz_dequant) and the scaling machinery in src/scalinglist.c.  We implement
the flat (default) scaling list; custom scaling lists become a per-
coefficient multiplier tensor later.

All arithmetic is int32/int64-exact; blocks are batched (..., N, N).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# g_quantScales / g_invQuantScales of the standard (per qp % 6).
QUANT_SCALES = np.array([26214, 23302, 20560, 18396, 16384, 14564],
                        dtype=np.int32)
INV_QUANT_SCALES = np.array([40, 45, 51, 57, 64, 72], dtype=np.int32)

QUANT_SHIFT = 14


def quant_params(qp: int, log2_size: int, bitdepth: int):
    """(scale, qbits, inv_scale, inv_shift) for a transform size."""
    transform_shift = 15 - bitdepth - log2_size  # MAX_TR_DYNAMIC_RANGE=15
    qbits = QUANT_SHIFT + qp // 6 + transform_shift
    inv_shift = bitdepth + log2_size - 5
    return (int(QUANT_SCALES[qp % 6]), qbits,
            int(INV_QUANT_SCALES[qp % 6]), inv_shift)


def quantize(coeff, qp: int, size: int, bitdepth: int = 8,
             intra=True):
    """Scalar (non-RDOQ) quantization, the reference's kvz_quant path.

    Rounding offset 171/512 for intra, 85/512 for inter, as in HM and
    the reference (src/strategies/generic/quant-generic.c).  `intra` may
    be a bool or a boolean array broadcastable against the leading axes
    of coeff (mixed P-frame batches).
    """
    log2n = size.bit_length() - 1
    scale, qbits, _, _ = quant_params(qp, log2n, bitdepth)
    if isinstance(intra, bool):
        offset = (171 if intra else 85) << (qbits - 9)
    else:
        offset = jnp.where(intra, 171, 85).astype(jnp.int32) << (qbits - 9)
        offset = offset[..., None, None]
    # int32-safe: |coeff| <= 32767 (transform output fits int16), so
    # |coeff|*scale + offset < 2^31.
    c = coeff.astype(jnp.int32)
    level = (jnp.abs(c) * scale + offset) >> qbits
    level = jnp.clip(level, 0, 32767)
    return jnp.where(c < 0, -level, level).astype(jnp.int32)


def dequantize(level, qp: int, size: int, bitdepth: int = 8):
    """Spec 8.6.3 scaling with flat scaling list m=16."""
    log2n = size.bit_length() - 1
    _, _, inv_scale, shift = quant_params(qp, log2n, bitdepth)
    # Spec computes ((level*16*levScale << qp/6) + 1<<(shift-1)) >> shift;
    # folding the *16 into the shift keeps everything int32-safe:
    # |level|*levScale<<8 <= 32767*72*256 < 2^31.  shift >= 5 always
    # (bitdepth >= 8, log2n >= 2), so shift-4 >= 1.
    l = level.astype(jnp.int32)
    d = (l * (inv_scale << (qp // 6)) + (1 << (shift - 5))) >> (shift - 4)
    return jnp.clip(d, -32768, 32767).astype(jnp.int32)
