"""Batched inter search: exhaustive integer ME + subpel SATD refinement.

Reference behavior: search_pu_inter_ref (src/search_inter.c:1134) with
hexbs/tz integer search and search_frac (:965) subpel.  TPU design:
every block's full +-R SAD surface is computed densely (ops/inter.py),
the integer winner minimizes SAD + lambda*mvbits against a median
predictor from the pass-1 MV field (two-pass, no sequential deps), and
half- then quarter-pel refinement evaluates 8 MC+SATD candidates per
stage for all blocks at once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from kvazaar_tpu.encoder.geometry import IntraFramePlan
from kvazaar_tpu.encoder.intra_search import satd8_batch
from kvazaar_tpu.ops.inter import mc_luma, sad_full_search


def _mv_bits_est(dv):
    """Approximate signalling bits of one mvd component (EG1-shaped):
    1 bin for zero, else ~2*log2(|v|)+3."""
    a = jnp.abs(dv)
    nbits = 32 - jax.lax.clz(jnp.maximum(a, 1).astype(jnp.int32))
    return jnp.where(a == 0, 1, 2 * nbits + 1).astype(jnp.float32)


def _median3(a, b, c):
    return a + b + c - jnp.maximum(a, jnp.maximum(b, c)) \
        - jnp.minimum(a, jnp.minimum(b, c))


def _mv_pred_grid(mv_grid):
    """Median MV predictor from left/top/top-right pass-1 decisions
    (classic median predictor; only used for rate estimation)."""
    by, bx, _ = mv_grid.shape
    zero = jnp.zeros_like(mv_grid[:, :1])
    left = jnp.concatenate([zero[:, :1], mv_grid[:, :-1]], axis=1)
    top = jnp.concatenate([jnp.zeros_like(mv_grid[:1]), mv_grid[:-1]],
                          axis=0)
    topright = jnp.concatenate(
        [top[:, 1:], jnp.zeros_like(mv_grid[:, :1])], axis=1)
    return _median3(left, top, topright)


def search_inter_frame(cur, ref, plan: IntraFramePlan, lambda_satd: float,
                       me_range: int, bitdepth: int = 8,
                       subpel: bool = True):
    """cur/ref: (H, W) int32 (ref is the deblocked prior recon).

    Returns (mv (By, Bx, 2) int32 qpel, cost (By, Bx) f32 —
    SATD + lambda*mvbits of the winner).

    TPU shape: whole-plane shifted-diff SAD surfaces reduced with
    banded matmuls (ops/inter.py sad_surfaces), then a DENSE 7x7
    quarter-pel SATD grid from one window gather per block
    (refine_qpel_dense) — a superset of the reference's
    hexbs + half/quarter refinement candidates evaluated in two fused
    device passes instead of per-candidate gathers."""
    from kvazaar_tpu.ops.inter import (QPEL_OFFSETS, refine_qpel_dense,
                                       sad_surfaces)
    s = plan.cu_size
    by, bx = plan.blocks_y, plan.blocks_x
    n = by * bx
    r = me_range
    ys, xs = np.mgrid[0:by, 0:bx]
    x0s = jnp.asarray((xs * s).reshape(-1))
    y0s = jnp.asarray((ys * s).reshape(-1))
    cur_blocks = cur.reshape(by, s, bx, s).transpose(0, 2, 1, 3)
    cur_blocks = cur_blocks.reshape(n, s, s).astype(jnp.int32)

    sads = sad_surfaces(cur, ref, r, s, bitdepth)
    sads = sads.reshape(n, 2 * r + 1, 2 * r + 1)    # (N, Ddy, Ddx)

    # Pass 1: pure-SAD integer winner.
    flat = sads.reshape(n, -1)
    idx1 = jnp.argmin(flat, axis=-1)
    dy1 = idx1 // (2 * r + 1) - r
    dx1 = idx1 % (2 * r + 1) - r
    mv1 = jnp.stack([dx1, dy1], axis=-1).reshape(by, bx, 2) * 4

    # Pass 2: re-minimize with mv-rate vs the median predictor.
    pred = _mv_pred_grid(mv1).reshape(n, 1, 1, 2)
    dxs = (jnp.arange(-r, r + 1) * 4)[None, None, :]
    dys = (jnp.arange(-r, r + 1) * 4)[None, :, None]
    bits = _mv_bits_est(dxs - pred[..., 0]) + \
        _mv_bits_est(dys - pred[..., 1])
    cost = sads.astype(jnp.float32) + lambda_satd * bits
    idx2 = jnp.argmin(cost.reshape(n, -1), axis=-1)
    dy2 = idx2 // (2 * r + 1) - r
    dx2 = idx2 % (2 * r + 1) - r
    mv_int = jnp.stack([dx2, dy2], axis=-1).astype(jnp.int32) * 4
    pred_n = pred.reshape(n, 2)

    if not subpel:
        # Integer-pel only (--subme 0): cost = SATD at the int winner.
        preds = mc_luma(ref, x0s, y0s, mv_int, s, bitdepth)
        satd = satd8_batch(preds.reshape(n, s, s) - cur_blocks)
        rate = _mv_bits_est(mv_int[:, 0] - pred_n[:, 0]) + \
            _mv_bits_est(mv_int[:, 1] - pred_n[:, 1])
        cost_i = satd.astype(jnp.float32) + lambda_satd * rate
        return mv_int.reshape(by, bx, 2), cost_i.reshape(by, bx)

    satd49 = refine_qpel_dense(cur_blocks, ref, x0s, y0s, mv_int, s,
                               bitdepth)             # (N, 49)
    cands = mv_int[:, None, :] + jnp.asarray(QPEL_OFFSETS)[None]
    rate = _mv_bits_est(cands[..., 0] - pred_n[:, None, 0]) + \
        _mv_bits_est(cands[..., 1] - pred_n[:, None, 1])
    c = satd49.astype(jnp.float32) + lambda_satd * rate
    k = jnp.argmin(c, axis=-1)
    mv_q = jnp.take_along_axis(cands, k[:, None, None], axis=1)[:, 0]
    cost_q = jnp.min(c, axis=-1)
    return mv_q.reshape(by, bx, 2), cost_q.reshape(by, bx)


_MC_EXTEND = 72            # covers MV overreach for me_range <= 64


def _luma_hp_blocks(ref_y, x0s, y0s, mvs, size: int, bitdepth: int = 8,
                    ridx=None):
    """14-bit luma MC via precomputed quarter-pel phase planes: 16
    whole-plane separable interpolations + ONE stacked gather — the
    fast path for full-frame MC (per-block tap contractions batch
    poorly on TPU).  Bit-exact vs mc_luma_hp while the MV overreach
    beyond the frame stays within _MC_EXTEND pixels (config.validate
    caps me_range at 64)."""
    from kvazaar_tpu.ops.inter import (luma_phase_planes,
                                       mc_luma_phases_hp)
    e = _MC_EXTEND
    if ref_y.ndim == 3:
        # Static unroll over the (<=4) references: a vmap here would
        # batch the banded FIR matmuls, and batched bf16 dots are
        # unsupported on the CPU fallback backend.
        planes = jnp.stack([luma_phase_planes(ref_y[r], bitdepth, e)
                            for r in range(ref_y.shape[0])])
    else:
        planes = luma_phase_planes(ref_y, bitdepth, e)
    return mc_luma_phases_hp(planes, x0s, y0s, mvs, size, e, ridx)


def mc_planes_hp(ref_y, ref_cb, ref_cr, mv, plan: IntraFramePlan,
                 bitdepth: int = 8):
    """Full-frame MC at the 14-bit intermediate precision (bipred
    averaging inputs, 8.5.4.2.3.2).  Returns (hp_y (H, W), hp_cb,
    hp_cr) int32 planes."""
    from kvazaar_tpu.ops.inter import mc_chroma_hp, mc_luma_hp
    s = plan.cu_size
    by, bx = plan.blocks_y, plan.blocks_x
    n = by * bx
    ys, xs = np.mgrid[0:by, 0:bx]
    x0s = jnp.asarray((xs * s).reshape(-1))
    y0s = jnp.asarray((ys * s).reshape(-1))
    mvs = mv.reshape(n, 2)

    def to_plane(blocks, size, h, w):
        g = blocks.reshape(by, bx, size, size).transpose(0, 2, 1, 3)
        return g.reshape(h, w)

    py = to_plane(_luma_hp_blocks(ref_y, x0s, y0s, mvs, s, bitdepth),
                  s, plan.height, plan.width)
    if ref_cb is None:
        return py, None, None
    s2 = s // 2
    pcb = to_plane(mc_chroma_hp(ref_cb, x0s // 2, y0s // 2, mvs, s2,
                                bitdepth), s2, plan.height // 2,
                   plan.width // 2)
    pcr = to_plane(mc_chroma_hp(ref_cr, x0s // 2, y0s // 2, mvs, s2,
                                bitdepth), s2, plan.height // 2,
                   plan.width // 2)
    return py, pcb, pcr


def bi_mc_planes(ref0, ref1, mv0, mv1, dirs, plan: IntraFramePlan,
                 bitdepth: int = 8):
    """Final prediction planes for a B frame: per-CU L0 / L1 / BI
    select with the spec's rounding (uni: 8.5.4.2.3.1, bi: .2).

    ref0/ref1: (y, cb, cr) int32 planes; mv0/mv1: (By, Bx, 2);
    dirs: (By, Bx) 0/1/2."""
    from kvazaar_tpu.ops.inter import bi_average, uni_round
    s = plan.cu_size
    hp0 = mc_planes_hp(*ref0, mv0, plan, bitdepth)
    hp1 = mc_planes_hp(*ref1, mv1, plan, bitdepth)

    def sel(h0, h1, size):
        if h0 is None:
            return None
        d = jnp.kron(dirs, jnp.ones((size, size), dirs.dtype))
        return jnp.where(d == 0, uni_round(h0, bitdepth),
                         jnp.where(d == 1, uni_round(h1, bitdepth),
                                   bi_average(h0, h1, bitdepth)))

    return (sel(hp0[0], hp1[0], s), sel(hp0[1], hp1[1], s // 2),
            sel(hp0[2], hp1[2], s // 2))


def mc_planes(ref_y, ref_cb, ref_cr, mv, plan: IntraFramePlan,
              bitdepth: int = 8, ref_grid=None):
    """Full-frame MC prediction planes for final MVs.

    mv: (By, Bx, 2) qpel.  With stacked references ((R, H, W) planes)
    pass ref_grid (By, Bx) int32 L0 ref indices — each block gathers
    from its selected reference.  Returns (pred_y (H, W), pred_cb,
    pred_cr)."""
    s = plan.cu_size
    by, bx = plan.blocks_y, plan.blocks_x
    n = by * bx
    ys, xs = np.mgrid[0:by, 0:bx]
    x0s = jnp.asarray((xs * s).reshape(-1))
    y0s = jnp.asarray((ys * s).reshape(-1))
    mvs = mv.reshape(n, 2)
    ridx = None if ref_grid is None else ref_grid.reshape(n)
    from kvazaar_tpu.ops.inter import uni_round
    py = uni_round(_luma_hp_blocks(ref_y, x0s, y0s, mvs, s, bitdepth,
                                   ridx), bitdepth)

    def blocks_to_plane_j(blocks, size, h, w):
        g = blocks.reshape(by, bx, size, size).transpose(0, 2, 1, 3)
        return g.reshape(h, w)

    out_y = blocks_to_plane_j(py, s, plan.height, plan.width)
    if ref_cb is None:
        return out_y, None, None
    from kvazaar_tpu.ops.inter import mc_chroma
    s2 = s // 2
    pcb = mc_chroma(ref_cb, x0s // 2, y0s // 2, mvs, s2, bitdepth, ridx)
    pcr = mc_chroma(ref_cr, x0s // 2, y0s // 2, mvs, s2, bitdepth, ridx)
    out_cb = blocks_to_plane_j(pcb, s2, plan.height // 2, plan.width // 2)
    out_cr = blocks_to_plane_j(pcr, s2, plan.height // 2, plan.width // 2)
    return out_y, out_cb, out_cr


def mc_planes_cells(ref_y, ref_cb, ref_cr, mv_cells, bitdepth: int = 8):
    """Full-frame MC driven by an 8x8-cell motion field (h8, w8, 2) —
    serves every PU shape uniformly (interpolation is position-
    independent, so per-cell MC is bit-identical to per-PU MC).
    Returns (pred_y (H, W), pred_cb, pred_cr)."""
    from kvazaar_tpu.ops.inter import mc_chroma, uni_round
    h8, w8 = mv_cells.shape[:2]
    n = h8 * w8
    ys, xs = np.mgrid[0:h8, 0:w8]
    x0s = jnp.asarray((xs * 8).reshape(-1))
    y0s = jnp.asarray((ys * 8).reshape(-1))
    mvs = mv_cells.reshape(n, 2)
    py = uni_round(_luma_hp_blocks(ref_y, x0s, y0s, mvs, 8, bitdepth),
                   bitdepth)

    def to_plane(blocks, size, h, w):
        g = blocks.reshape(h8, w8, size, size).transpose(0, 2, 1, 3)
        return g.reshape(h, w)

    out_y = to_plane(py, 8, h8 * 8, w8 * 8)
    if ref_cb is None:
        return out_y, None, None
    pcb = mc_chroma(ref_cb, x0s // 2, y0s // 2, mvs, 4, bitdepth)
    pcr = mc_chroma(ref_cr, x0s // 2, y0s // 2, mvs, 4, bitdepth)
    return (out_y, to_plane(pcb, 4, h8 * 4, w8 * 4),
            to_plane(pcr, 4, h8 * 4, w8 * 4))


def search_inter_frame_smp(cur, ref, plan: IntraFramePlan,
                           lambda_satd: float, me_range: int,
                           bitdepth: int = 8, subpel: bool = True):
    """ME + partition decision over {2Nx2N, 2NxN, Nx2N} — the
    reference's SMP search (kvz_search_cu_smp, src/search_inter.c:1627)
    recast as quadrant aggregation of ONE dense half-size SAD surface
    tensor: SAD(shape) = sum of its quadrants' surfaces, so all three
    partitions share the integer search compute.

    Returns (part (By, Bx) int32 0/1/2,
             mv_pu (By, Bx, 2, 2) int32 qpel [PU0, PU1],
             cost (By, Bx) f32)."""
    from kvazaar_tpu.ops.inter import (QPEL_OFFSETS, refine_qpel_dense,
                                       sad_surfaces)
    s = plan.cu_size
    hs = s // 2
    by, bx = plan.blocks_y, plan.blocks_x
    n = by * bx
    r = me_range
    d = 2 * r + 1
    q = sad_surfaces(cur, ref, r, hs, bitdepth)
    q = q.reshape(by, 2, bx, 2, d, d)
    surf = {
        "full": q.sum(axis=(1, 3)),
        "top": q[:, 0].sum(axis=2), "bottom": q[:, 1].sum(axis=2),
        "left": q[:, :, :, 0].sum(axis=1),
        "right": q[:, :, :, 1].sum(axis=1),
    }

    # Pass-1 predictor from the full-shape SAD argmin (rate reference).
    flat = surf["full"].reshape(n, -1)
    idx1 = jnp.argmin(flat, axis=-1)
    mv1 = jnp.stack([idx1 % d - r, idx1 // d - r],
                    axis=-1).reshape(by, bx, 2) * 4
    pred = _mv_pred_grid(mv1).reshape(n, 2)
    dxs = (jnp.arange(-r, r + 1) * 4)[None, None, :]
    dys = (jnp.arange(-r, r + 1) * 4)[None, :, None]
    bits_grid = (_mv_bits_est(dxs - pred[:, None, None, 0])
                 + _mv_bits_est(dys - pred[:, None, None, 1]))

    def int_winner(sads):
        cost = sads.reshape(n, d, d).astype(jnp.float32) \
            + lambda_satd * bits_grid
        i = jnp.argmin(cost.reshape(n, -1), axis=-1)
        return jnp.stack([i % d - r, i // d - r],
                         axis=-1).astype(jnp.int32) * 4

    mv_int = {k: int_winner(v) for k, v in surf.items()}

    # Quadrant geometry for subpel SATD sums.
    qys, qxs = np.mgrid[0:2 * by, 0:2 * bx]
    qx0 = jnp.asarray((qxs * hs).reshape(-1))
    qy0 = jnp.asarray((qys * hs).reshape(-1))
    cq = cur.reshape(2 * by, hs, 2 * bx, hs).transpose(0, 2, 1, 3)
    cq = cq.reshape(4 * n, hs, hs).astype(jnp.int32)
    qoff = jnp.asarray(QPEL_OFFSETS)

    def refine_pairs(mvc, sel_quads):
        """Refine one half shape: mvc (N, 2) center; sel_quads: the 2
        quadrant flat indices per block (N, 2).  Returns (N, 2) qpel
        mv + (N,) cost."""
        qi = sel_quads.reshape(-1)
        blocks = cq[qi]
        centers = jnp.repeat(mvc, 2, axis=0)
        satd = refine_qpel_dense(blocks, ref, qx0[qi], qy0[qi],
                                 centers, hs, bitdepth)   # (2N, 49)
        satd = satd.reshape(n, 2, 49).sum(axis=1)
        cands = mvc[:, None, :] + qoff[None]
        rate = (_mv_bits_est(cands[..., 0] - pred[:, None, 0])
                + _mv_bits_est(cands[..., 1] - pred[:, None, 1]))
        c = satd.astype(jnp.float32) + lambda_satd * rate
        k = jnp.argmin(c, axis=-1)
        mvq = jnp.take_along_axis(cands, k[:, None, None],
                                  axis=1)[:, 0]
        return mvq, jnp.min(c, axis=-1)

    byi, bxi = np.mgrid[0:by, 0:bx]
    base = (2 * byi * (2 * bx) + 2 * bxi).reshape(-1)
    quads = {
        "top": np.stack([base, base + 1], axis=-1),
        "bottom": np.stack([base + 2 * bx, base + 2 * bx + 1], axis=-1),
        "left": np.stack([base, base + 2 * bx], axis=-1),
        "right": np.stack([base + 1, base + 2 * bx + 1], axis=-1),
        "full0": np.stack([base, base + 1], axis=-1),
        "full1": np.stack([base + 2 * bx, base + 2 * bx + 1], axis=-1),
    }
    if subpel:
        halves = {k: refine_pairs(mv_int[k], jnp.asarray(quads[k]))
                  for k in ("top", "bottom", "left", "right")}
        # Full shape: one 49-candidate argmin over all four quadrants.
        qi_all = jnp.asarray(
            np.concatenate([quads["full0"], quads["full1"]],
                           axis=-1)).reshape(-1)
        blocks = cq[qi_all]
        centers = jnp.repeat(mv_int["full"], 4, axis=0)
        satd = refine_qpel_dense(blocks, ref, qx0[qi_all], qy0[qi_all],
                                 centers, hs, bitdepth)
        satd = satd.reshape(n, 4, 49).sum(axis=1)
        cands = mv_int["full"][:, None, :] + qoff[None]
        rate = (_mv_bits_est(cands[..., 0] - pred[:, None, 0])
                + _mv_bits_est(cands[..., 1] - pred[:, None, 1]))
        cf = satd.astype(jnp.float32) + lambda_satd * rate
        kf = jnp.argmin(cf, axis=-1)
        mv_full = jnp.take_along_axis(cands, kf[:, None, None],
                                      axis=1)[:, 0]
        cost_full = jnp.min(cf, axis=-1)
    else:
        def int_cost(k):
            sads = surf[k].reshape(n, -1)
            cost = sads.astype(jnp.float32) \
                + lambda_satd * bits_grid.reshape(n, -1)
            return jnp.min(cost, axis=-1)
        halves = {k: (mv_int[k], int_cost(k))
                  for k in ("top", "bottom", "left", "right")}
        mv_full, cost_full = mv_int["full"], int_cost("full")

    # Partition decision: SMP pays the extra part_mode bin, a second
    # merge flag, and its own mv rate (inside the PU costs).
    extra = lambda_satd * 3.0
    cost_h = halves["top"][1] + halves["bottom"][1] + extra
    cost_v = halves["left"][1] + halves["right"][1] + extra
    costs = jnp.stack([cost_full, cost_h, cost_v])     # (3, N)
    part = jnp.argmin(costs, axis=0).astype(jnp.int32)
    best = jnp.min(costs, axis=0)
    mv0 = jnp.where((part == 1)[:, None], halves["top"][0],
                    jnp.where((part == 2)[:, None], halves["left"][0],
                              mv_full))
    mv1 = jnp.where((part == 1)[:, None], halves["bottom"][0],
                    jnp.where((part == 2)[:, None],
                              halves["right"][0], mv_full))
    mv_pu = jnp.stack([mv0, mv1], axis=1).reshape(by, bx, 2, 2)
    return part.reshape(by, bx), mv_pu, best.reshape(by, bx)
