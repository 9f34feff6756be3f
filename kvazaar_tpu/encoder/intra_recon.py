"""Exact wavefront reconstruction pass (device, lax.scan).

Given the chosen intra modes, reconstruct the frame exactly as a decoder
will: each wavefront step predicts a batch of blocks from already-
reconstructed neighbor samples (gather maps from geometry.py), runs the
residual through forward transform → quant → dequant → inverse transform,
and scatters the clipped reconstruction back.  The quantized levels are
the syntax elements handed to the host CABAC stage.

This is the TPU replacement for the reference's per-LCU reconstruction
inside search (kvz_intra_recon_cu, src/intra.c:652; quantize loop
src/transform.c:424): one compiled lax.scan over ~O(W/S + 2H/S) steps
instead of a thread pool over LCUs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from kvazaar_tpu.encoder.geometry import IntraFramePlan, PlaneMaps
from kvazaar_tpu.ops.intra import predict_modes
from kvazaar_tpu.ops.quant import dequantize, quantize
from kvazaar_tpu.ops.transform import forward_transform, inverse_transform


def _blocks_by_step(plane: np.ndarray, maps: PlaneMaps, plan) -> np.ndarray:
    """Rearrange a (H, W) plane into (steps, slots, S, S) with zeros in
    pad slots (host-side, static) — a single gather through the plan's
    scatter indices (pads read the trailing zero element)."""
    s = maps.size
    flat_ext = np.concatenate([plane.reshape(-1),
                               np.zeros(1, plane.dtype)])
    return flat_ext[maps.scatter_idx].reshape(
        plan.n_steps, plan.n_slots, s, s)


def blocks_to_plane(blocks: np.ndarray, plan: IntraFramePlan,
                    size: int, width: int, height: int) -> np.ndarray:
    """Inverse of _blocks_by_step for device outputs (host-side): one
    vectorized scatter (pad slots land in the trash element)."""
    maps = plan.luma if size == plan.cu_size else plan.chroma
    out = np.zeros(height * width + 1, blocks.dtype)
    out[maps.scatter_idx.reshape(-1)] = blocks.reshape(-1)
    return out[:-1].reshape(height, width)


def _plane_step(recon_flat, gidx, noref, scatter, orig, modes, size,
                qp, bitdepth, luma):
    """One wavefront step for one plane.  Returns (new_recon_flat,
    levels)."""
    refs = recon_flat[gidx]
    refs = jnp.where(noref[:, None], 1 << (bitdepth - 1), refs)
    pred = predict_modes(refs.astype(jnp.int32), modes, size, luma=luma,
                         bitdepth=bitdepth)
    resid = orig.astype(jnp.int32) - pred
    coeff = forward_transform(resid, size, bitdepth)
    levels = quantize(coeff, qp, size, bitdepth, intra=True)
    dq = dequantize(levels, qp, size, bitdepth)
    rec_res = inverse_transform(dq, size, bitdepth)
    rec = jnp.clip(pred + rec_res, 0, (1 << bitdepth) - 1)
    # Pad slots all point at the trailing trash element, so indices are
    # NOT unique; plain scatter keeps the semantics defined.
    recon_flat = recon_flat.at[scatter.reshape(-1)].set(rec.reshape(-1))
    # Levels fit int16 (quant clips to +-32767): halve the device->host
    # transfer, which is a measured bottleneck over the device tunnel.
    return recon_flat, levels.astype(jnp.int16)


def reconstruct_frame(y, cb, cr, modes, plan: IntraFramePlan, qp: int,
                      qp_c: int, bitdepth: int = 8):
    """Run the wavefront over all planes.

    y: (H, W) int32; cb/cr: (H/2, W/2) or None; modes: (By, Bx) int32.
    Returns (recon_y, levels_y, recon_cb, levels_cb, recon_cr, levels_cr)
    with levels in (steps, slots, S, S) layout.
    """
    s = plan.cu_size
    chroma = cb is not None
    slot_ids = jnp.asarray(np.maximum(plan.block_of_slot, 0))

    def to_steps(plane, size):
        by, bx = plan.blocks_y, plan.blocks_x
        blocks = plane.reshape(by, size, bx, size).transpose(0, 2, 1, 3)
        return blocks.reshape(by * bx, size, size)[slot_ids]

    oy = to_steps(y.astype(jnp.int32), s)
    modes_steps = modes.reshape(-1)[slot_ids].astype(jnp.int32)
    g_y = jnp.asarray(plan.luma.gather_idx)
    n_y = jnp.asarray(plan.luma.no_refs)
    sc_y = jnp.asarray(plan.luma.scatter_idx)

    if chroma:
        sc2 = plan.chroma.size
        ocb = to_steps(cb.astype(jnp.int32), sc2)
        ocr = to_steps(cr.astype(jnp.int32), sc2)
        g_c = jnp.asarray(plan.chroma.gather_idx)
        n_c = jnp.asarray(plan.chroma.no_refs)
        sc_c = jnp.asarray(plan.chroma.scatter_idx)

    h, w = plan.height, plan.width
    rec_y0 = jnp.zeros((h * w + 1,), jnp.int32)
    if chroma:
        rec_c0 = jnp.zeros(((h // 2) * (w // 2) + 1,), jnp.int32)

    def step_fn(carry, xs):
        if chroma:
            ry, rcb, rcr = carry
            gy, ny, scy, o_y, gc, nc, scc, o_cb, o_cr, m = xs
        else:
            (ry,) = carry
            gy, ny, scy, o_y, m = xs
        ry, lv_y = _plane_step(ry, gy, ny, scy, o_y, m, s, qp,
                               bitdepth, True)
        if chroma:
            rcb, lv_cb = _plane_step(rcb, gc, nc, scc, o_cb, m, sc2,
                                     qp_c, bitdepth, False)
            rcr, lv_cr = _plane_step(rcr, gc, nc, scc, o_cr, m, sc2,
                                     qp_c, bitdepth, False)
            return (ry, rcb, rcr), (lv_y, lv_cb, lv_cr)
        return (ry,), (lv_y,)

    if chroma:
        xs = (g_y, n_y, sc_y, oy, g_c, n_c, sc_c, ocb, ocr, modes_steps)
        carry0 = (rec_y0, rec_c0, rec_c0)
    else:
        xs = (g_y, n_y, sc_y, oy, modes_steps)
        carry0 = (rec_y0,)

    carry, levels = jax.lax.scan(step_fn, carry0, xs)
    rdt = jnp.uint8 if bitdepth <= 8 else jnp.uint16
    rec_y = carry[0][:-1].reshape(h, w).astype(rdt)
    if chroma:
        rec_cb = carry[1][:-1].reshape(h // 2, w // 2).astype(rdt)
        rec_cr = carry[2][:-1].reshape(h // 2, w // 2).astype(rdt)
        return rec_y, levels[0], rec_cb, levels[1], rec_cr, levels[2]
    return rec_y, levels[0], None, None, None, None
