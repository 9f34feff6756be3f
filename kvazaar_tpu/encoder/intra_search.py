"""Batched intra mode decision — all blocks, all 35 modes at once.

The reference searches one PU at a time with SATD over a rough mode list
then RDO refinement (src/search_intra.c:404-545).  TPU design: predict
every mode for every block of the frame in one einsum (the mode-weight
matmul of ops/intra.py), Hadamard-SATD them all, add lambda-weighted
mode-signalling bits, argmin.  Mode decisions use *original* neighbor
pixels (open-loop) so the search has no sequential dependencies; the
reconstruction pass (intra_recon.py) then honors the exact spec
dependencies for bit-exact conformance.  MPM costs come from a two-pass
scheme: pass 1 picks SATD-best modes, pass 2 re-costs with the MPMs
implied by pass-1 neighbors.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from kvazaar_tpu.constants import INTRA_DC, INTRA_PLANAR
from kvazaar_tpu.encoder.geometry import IntraFramePlan
from kvazaar_tpu.ops.exactmm import einsum_exact, einsum_exact_f32
from kvazaar_tpu.ops.intra import predict_all_modes


@functools.lru_cache(maxsize=None)
def _hadamard_np(n: int) -> np.ndarray:
    h = np.array([[1]], dtype=np.int32)
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    return h


def _hadamard8_np() -> np.ndarray:
    return _hadamard_np(8)


def satd8_batch(diff):
    """SATD over (..., S, S) int32 diffs as a sum of 8x8 Hadamard costs,
    normalized like the reference's satd_8x8 ((sum + 2) >> 2,
    src/strategies/generic/picture-generic.c).  4x4 blocks use the 4x4
    Hadamard with the reference's (sum + 1) >> 1 normalization
    (satd_4x4, same file)."""
    s = diff.shape[-1]
    if s == 4:
        h = jnp.asarray(_hadamard_np(4))
        t1 = einsum_exact("ij,...jk->...ik", h, diff, 1 << 10)
        t = einsum_exact("lk,...ik->...il", h, t1, 1 << 13)
        return (jnp.sum(jnp.abs(t), axis=(-2, -1)) + 1) >> 1
    assert s % 8 == 0
    h = jnp.asarray(_hadamard8_np())
    d = diff.reshape(*diff.shape[:-2], s // 8, 8, s // 8, 8)
    d = jnp.swapaxes(d, -3, -2)            # (..., s/8, s/8, 8, 8)
    # Exact on the MXU: diffs fit +-2^10, Hadamard intermediates +-2^14,
    # all partial sums < 2^24 (ops/exactmm.py).
    t1 = einsum_exact("ij,...jk->...ik", h, d, 1 << 10)
    t = einsum_exact("lk,...ik->...il", h, t1, 1 << 14)
    per_tile = (jnp.sum(jnp.abs(t), axis=(-2, -1)) + 2) >> 2
    return jnp.sum(per_tile, axis=(-2, -1))


def _mpm_triplet(cand_l, cand_a):
    """Vectorized H.265 8.4.2 MPM derivation over int32 arrays."""
    eq = cand_l == cand_a
    small = cand_l < 2
    # equal & angular
    m = cand_l
    e0, e1, e2 = m, 2 + ((m + 29) % 32), 2 + ((m - 1) % 32)
    # equal & non-angular
    p0, p1, p2 = (jnp.full_like(m, INTRA_PLANAR),
                  jnp.full_like(m, INTRA_DC), jnp.full_like(m, 26))
    # different
    d0, d1 = cand_l, cand_a
    has_planar = (cand_l == INTRA_PLANAR) | (cand_a == INTRA_PLANAR)
    has_dc = (cand_l == INTRA_DC) | (cand_a == INTRA_DC)
    d2 = jnp.where(~has_planar, INTRA_PLANAR,
                   jnp.where(~has_dc, INTRA_DC, 26))
    mpm0 = jnp.where(eq, jnp.where(small, p0, e0), d0)
    mpm1 = jnp.where(eq, jnp.where(small, p1, e1), d1)
    mpm2 = jnp.where(eq, jnp.where(small, p2, e2), d2)
    return mpm0, mpm1, mpm2


def mode_bits_table(modes_grid, cu_size: int, ctu_size: int = 64):
    """(By, Bx, 35) approximate signalling bits for each candidate mode
    given neighbor decisions (MPM flag + idx vs 5-bit remainder)."""
    by, bx = modes_grid.shape
    cand_l = jnp.concatenate(
        [jnp.full((by, 1), INTRA_DC, modes_grid.dtype),
         modes_grid[:, :-1]], axis=1)
    cand_a = jnp.concatenate(
        [jnp.full((1, bx), INTRA_DC, modes_grid.dtype),
         modes_grid[:-1, :]], axis=0)
    # Above neighbor outside the CTU row reverts to DC (8.4.2).
    rows = np.arange(by) * cu_size
    outside_ctu = jnp.asarray((rows % ctu_size) == 0)
    cand_a = jnp.where(outside_ctu[:, None], INTRA_DC, cand_a)
    m0, m1, m2 = _mpm_triplet(cand_l, cand_a)
    all_modes = jnp.arange(35, dtype=modes_grid.dtype)
    is0 = all_modes[None, None, :] == m0[..., None]
    is1 = all_modes[None, None, :] == m1[..., None]
    is2 = all_modes[None, None, :] == m2[..., None]
    return jnp.where(is0, 2.0, jnp.where(is1 | is2, 3.0, 6.0))


def search_frame_modes(frame, plan: IntraFramePlan, lambda_satd: float,
                       bitdepth: int = 8, two_pass: bool = True):
    """frame: (H, W) int32 coded-size luma.  Returns (By, Bx) int32 modes
    and the winning cost grid.

    two_pass: re-rank with MPM-aware signalling bits from pass-1
    neighbor decisions (--rd >= 1; rd 0 is the pure-SATD argmin,
    mirroring the reference's rough-search-only depth,
    src/search_intra.c:404 vs :573)."""
    s = plan.cu_size
    by, bx = plan.blocks_y, plan.blocks_x
    n = by * bx
    flat_ext = jnp.concatenate([frame.reshape(-1),
                                jnp.zeros((1,), frame.dtype)])
    steps = plan.step_of_block.ravel()
    slots = plan.slot_of_block.ravel()
    gidx = jnp.asarray(plan.luma.gather_idx[steps, slots])     # (N, R)
    noref = jnp.asarray(plan.luma.no_refs[steps, slots])       # (N,)
    refs = flat_ext[gidx]
    refs = jnp.where(noref[:, None], 1 << (bitdepth - 1), refs)

    preds = predict_all_modes(refs.astype(jnp.int32), s, luma=True,
                              bitdepth=bitdepth)               # (N,35,S,S)
    orig = frame.reshape(by, s, bx, s).transpose(0, 2, 1, 3)
    orig = orig.reshape(n, 1, s, s).astype(jnp.int32)
    satd = satd8_batch(preds - orig)                           # (N, 35)

    modes1 = jnp.argmin(satd, axis=-1).astype(jnp.int32).reshape(by, bx)
    if not two_pass:
        best1 = jnp.min(satd, axis=-1).astype(jnp.float32)
        return modes1, best1.reshape(by, bx)
    bits = mode_bits_table(modes1, s).reshape(n, 35)
    cost = satd.astype(jnp.float32) + lambda_satd * bits
    modes = jnp.argmin(cost, axis=-1).astype(jnp.int32).reshape(by, bx)
    best = jnp.min(cost, axis=-1).reshape(by, bx)
    return modes, best
