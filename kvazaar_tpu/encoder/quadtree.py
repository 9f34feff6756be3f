"""Variable-CU quadtree search + data-driven wavefront reconstruction.

The reference searches the quadtree recursively per CTU with pruning
(search_cu, /root/reference/src/search.c:424-757).  TPU design: evaluate
ALL candidate CU sizes for the whole frame in parallel (three open-loop
mode searches), then choose the tree by a bottom-up segmented argmin
with lambda-weighted split-flag bits — evaluate-everything-then-argmin
replaces branch-and-prune (SURVEY.md §7).

Because the chosen tree is content-dependent, the reconstruction
schedule cannot be baked into the compiled program like the fixed-grid
path: a host-side planner (numpy) derives decode order, per-CU reference
availability/substitution (H.265 6.4.1, 8.4.4.2.2), and a wavefront
step assignment from the tree, and hands the device index tensors as
DATA.  The device program is compiled per (n_steps bucket, slot
capacities) and reused across frames.

Edge state generalizes the fixed-grid buffers: every reference sample
of any CU sits on a row y%8==7 (a CU bottom row) or a column x%8==7 (a
CU right column), so two flat buffers at 8-pixel granularity serve all
CU sizes (the mixed-size form of the reference's hor/ver boundary
buffers, src/encoderstate.h:170-186).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from kvazaar_tpu.encoder.geometry import make_intra_plan
from kvazaar_tpu.encoder.intra_search import search_frame_modes

SIZES = (8, 16, 32)


def search_quadtree(y, width: int, height: int, lambda_satd: float,
                    bitdepth: int = 8, min_cu: int = 8,
                    max_cu: int = 32, two_pass: bool = True,
                    rdo: bool = False, qp: int = 30,
                    lam_rd: float = None):
    """Open-loop mode search at every candidate CU size (device part).

    y: (H, W) int32 coded-size luma.  Returns (costs, modes): dicts
    size -> (H/s, W/s) grids of per-CU cost / best mode — SATD+lambda*
    modebits at rd<=1, true roundtrip SSD+lam*rate at rd 2 (the
    reference's search_intra_rdo depth, src/search_intra.c:573).
    64x64 CUs are evaluated as same-mode sums of the four 32x32 TBs
    (they force the TU split, 7.3.8.8).  The tree argmin happens on
    the host (choose_tree)."""
    from kvazaar_tpu.encoder.intra_search import (modes64_from_satd32,
                                                  rd_cost_given_modes)
    costs = {}
    modes = {}
    for s in SIZES:
        if s < min_cu or s > max_cu:
            continue
        plan = make_intra_plan(width, height, s, chroma=False)
        if s == 32 and max_cu >= 64:
            m, c, satd32 = search_frame_modes(
                y, plan, lambda_satd, bitdepth, two_pass,
                return_satd=True, rdo=rdo, qp=qp, lam_rd=lam_rd)
            m64, c64 = modes64_from_satd32(satd32, lambda_satd,
                                           two_pass)
            if rdo:
                # Keep the 64 level in the same RD units as the leaves:
                # roundtrip the four 32 TBs with the chosen 64 mode.
                m64up = jnp.repeat(jnp.repeat(m64, 2, 0), 2, 1)
                by32, bx32 = plan.blocks_y, plan.blocks_x
                pad = jnp.zeros((by32, bx32), jnp.int32)
                pad = pad.at[:m64up.shape[0], :m64up.shape[1]].set(
                    m64up)
                cg = rd_cost_given_modes(y, plan, pad, qp,
                                         lam_rd, bitdepth)
                by64, bx64 = m64.shape
                c64 = (cg[0::2, 0::2][:by64, :bx64]
                       + cg[0::2, 1::2][:by64, :bx64]
                       + cg[1::2, 0::2][:by64, :bx64]
                       + cg[1::2, 1::2][:by64, :bx64])
            modes[64], costs[64] = m64, c64
        else:
            m, c = search_frame_modes(y, plan, lambda_satd, bitdepth,
                                      two_pass, rdo=rdo, qp=qp,
                                      lam_rd=lam_rd)
        modes[s] = m
        costs[s] = c
    return costs, modes


def choose_tree(costs: dict, width: int, height: int,
                lambda_satd: float, percu_bits: float = 300.0,
                split_bits: float = 2.0) -> np.ndarray:
    """Bottom-up tree argmin (host numpy).  Each extra CU is charged
    flat structural bits beyond the mode (split flag, CBFs, last-sig
    coords — the reference charges these through CABAC-estimated RD
    costs in search_cu, src/search.c:424; a flat estimate keeps the
    argmin closed-form).  Returns size8 (H/8, W/8) uint8."""
    percu = lambda_satd * percu_bits
    split = lambda_satd * split_bits
    c = {s: np.asarray(v).astype(np.float64) for s, v in costs.items()}
    use8 = None
    if 8 in c and 16 in c:
        c8sum = (c[8][0::2, 0::2] + c[8][0::2, 1::2]
                 + c[8][1::2, 0::2] + c[8][1::2, 1::2] + 3 * percu)
        use8 = c8sum + split < c[16]
        c16 = np.where(use8, c8sum + split, c[16])
    elif 16 in c:
        c16 = c[16]
        use8 = np.zeros_like(c16, bool)
    use16 = None
    c32 = None
    if 32 in c and 16 in c:
        c16sum = (c16[0::2, 0::2] + c16[0::2, 1::2]
                  + c16[1::2, 0::2] + c16[1::2, 1::2] + 3 * percu)
        use16 = c16sum + split < c[32]
        c32 = np.where(use16, c16sum + split, c[32])
    elif 32 in c:
        c32 = c[32]
    elif 16 in c:
        use16 = np.ones((c16.shape[0] // 2, c16.shape[1] // 2), bool)

    # 64x64 level: full CTUs only (boundary CTUs take inferred splits).
    use32 = None
    if 64 in c and c32 is not None:
        by64, bx64 = c[64].shape
        c32sum = (c32[0::2, 0::2][:by64, :bx64]
                  + c32[0::2, 1::2][:by64, :bx64]
                  + c32[1::2, 0::2][:by64, :bx64]
                  + c32[1::2, 1::2][:by64, :bx64] + 3 * percu)
        use32 = c32sum + split < c[64]

    h8, w8 = height // 8, width // 8
    top = 32 if 32 in c else 16
    size8 = np.full((h8, w8), top, np.int32)
    eff32 = np.ones((h8, w8), bool)
    if use32 is not None:
        u64 = np.zeros((h8, w8), bool)
        full = np.kron(~use32, np.ones((8, 8), bool))
        u64[:full.shape[0], :full.shape[1]] = full
        size8 = np.where(u64, 64, size8)
        eff32 = ~u64
    if use16 is not None and 32 in c:
        u16 = np.kron(use16, np.ones((4, 4), bool))[:h8, :w8]
        size8 = np.where(eff32 & u16, 16, size8)
        eff16 = eff32 & u16
    else:
        eff16 = eff32
    if use8 is not None:
        u8 = np.kron(use8, np.ones((2, 2), bool))[:h8, :w8]
        size8 = np.where(eff16 & u8, 8, size8)
    return size8.astype(np.uint8)


# ---------------------------------------------------------------------
# Data-driven reconstruction (single frame; schedule tensors are traced
# inputs, so one compiled program per n_steps bucket serves all trees).
# ---------------------------------------------------------------------

def _class_pass(hbuf, vbuf, xs_c, s: int, qp: int, bitdepth: int,
                luma: bool, lossless: bool, signhide: bool,
                rdoq: bool = False, lam: float = 0.0,
                scaling_tab=None):
    """One wavefront step for one CU-size class.  hbuf/vbuf: flat edge
    buffers (+1 trash); xs_c: per-step slices of (origs (K,S,S), modes
    (K,), noref (K,), idx_h (K,R), idx_v, sel_h, wr_h (K,S), wr_v)."""
    from kvazaar_tpu.encoder.intra_recon import (_predict_select,
                                                 _scan_sel,
                                                 _tu_roundtrip)
    origs, modes, noref, idx_h, idx_v, sel_h, wr_h, wr_v = xs_c
    k, r = idx_h.shape
    refs = jnp.where(sel_h, hbuf[idx_h], vbuf[idx_v])
    refs = jnp.where(noref[:, None], 1 << (bitdepth - 1), refs)
    pred = _predict_select(refs, modes, s, luma, bitdepth)
    # Min luma CU is 8 here, so the DST-VII 4x4 intra-luma path never
    # arises; 4x4 chroma TBs use the DCT as the spec requires.
    scan_sel = _scan_sel(modes, s, luma) if signhide else None
    levels, rec, _ = _tu_roundtrip(origs.astype(jnp.int32), pred, s, qp,
                                bitdepth, True, lossless, scan_sel,
                                rdoq, lam, scaling_tab)
    hbuf = hbuf.at[wr_h.reshape(-1)].set(
        rec[:, -1, :].reshape(-1).astype(hbuf.dtype))
    vbuf = vbuf.at[wr_v.reshape(-1)].set(
        rec[:, :, -1].reshape(-1).astype(vbuf.dtype))
    return hbuf, vbuf, levels, rec


def reconstruct_frame_var(sched, qp: int, qp_c: int, width: int,
                          height: int, chroma: bool, bitdepth: int = 8,
                          lossless: bool = False,
                          signhide: bool = False, rdoq: bool = False,
                          lam: float = 0.0, scaling=None):
    """sched: jnp-ified VarPlan tensors — {'luma': {size: {arrays}},
    'chroma': {size: {arrays incl. origs_cb/origs_cr}}} (see
    var_schedule.ClassSched; 'origs' carry the source pixels, gathered
    host-side through the same pixel maps).

    Returns (rec_y (H, W), rec_cb, rec_cr, levels: dict) — recon
    assembled on device via the per-class pixel scatter maps; levels
    per class as (steps, K, S, S) int16 in schedule order."""
    lh_y = (height // 8) * width
    lv_y = (width // 8) * height
    carry0 = [jnp.zeros(lh_y + 1, jnp.int32),
              jnp.zeros(lv_y + 1, jnp.int32)]
    if chroma:
        wc, hc = width // 2, height // 2
        lh_c = (hc // 4) * wc
        lv_c = (wc // 4) * hc
        carry0 += [jnp.zeros(lh_c + 1, jnp.int32),
                   jnp.zeros(lv_c + 1, jnp.int32)] * 2

    lsizes = sorted(sched["luma"].keys())
    csizes = sorted(sched["chroma"].keys()) if chroma else []

    def xs_of(cs, okey):
        return (cs[okey], cs["modes"], cs["noref"], cs["idx_h"],
                cs["idx_v"], cs["sel_h"], cs["wr_h"], cs["wr_v"])

    xs = tuple(xs_of(sched["luma"][s], "origs") for s in lsizes)
    if chroma:
        xs += tuple(xs_of(sched["chroma"][s], "origs_cb")
                    for s in csizes)
        xs += tuple(xs_of(sched["chroma"][s], "origs_cr")
                    for s in csizes)

    def tab(size, comp, qq):
        if scaling is None:
            return None
        return (scaling.qc(size, True, comp)[qq % 6],
                scaling.qc(size, False, comp)[qq % 6],
                scaling.dqc(size, True, comp)[qq % 6],
                scaling.dqc(size, False, comp)[qq % 6])

    def step_fn(carry, xs_t):
        hy, vy = carry[0], carry[1]
        outs = []
        for i, s in enumerate(lsizes):
            hy, vy, lv, rec = _class_pass(
                hy, vy, xs_t[i], s, qp, bitdepth, True, lossless,
                signhide, rdoq, lam, tab(s, 0, qp))
            outs.append((lv, rec))
        new_carry = [hy, vy]
        if chroma:
            bufs = list(carry[2:])
            for p in range(2):              # cb then cr
                hb, vb = bufs[2 * p], bufs[2 * p + 1]
                for j, s in enumerate(csizes):
                    hb, vb, lv, rec = _class_pass(
                        hb, vb,
                        xs_t[len(lsizes) + p * len(csizes) + j], s,
                        qp_c, bitdepth, False, lossless, signhide,
                        rdoq, lam, tab(s, 1 + p, qp_c))
                    outs.append((lv, rec))
                bufs[2 * p], bufs[2 * p + 1] = hb, vb
            new_carry += bufs
        return new_carry, tuple(outs)

    _, outs = jax.lax.scan(step_fn, carry0, xs)

    def assemble(plane_len, classes, keys, off):
        flat = jnp.zeros(plane_len + 1, jnp.int32)
        for i, s in enumerate(keys):
            rec = outs[off + i][1]                   # (steps, K, S, S)
            pix = classes[s]["pix"]                  # (steps, K, S*S)
            flat = flat.at[pix.reshape(-1)].set(
                rec.reshape(-1).astype(jnp.int32))
        return flat[:plane_len]

    rec_y = assemble(width * height, sched["luma"], lsizes, 0) \
        .reshape(height, width)
    rec_cb = rec_cr = None
    levels = {"y": [outs[i][0] for i in range(len(lsizes))]}
    if chroma:
        nc = len(csizes)
        rec_cb = assemble(wc * hc, sched["chroma"], csizes,
                          len(lsizes)).reshape(hc, wc)
        rec_cr = assemble(wc * hc, sched["chroma"], csizes,
                          len(lsizes) + nc).reshape(hc, wc)
        levels["cb"] = [outs[len(lsizes) + j][0] for j in range(nc)]
        levels["cr"] = [outs[len(lsizes) + nc + j][0]
                        for j in range(nc)]
    return rec_y, rec_cb, rec_cr, levels
