"""Host-side wavefront planner for variable-CU quadtrees.

Given a chosen tree (size8 map), derive — in numpy, per frame — the
decode order (CTU raster, z-scan within, H.265 6.5.2), per-CU reference
availability (6.4.1 at 8x8-cell granularity) with substitution
(8.4.4.2.2) baked into gather indices, and a wavefront step assignment
(longest dependency chain with per-size slot capacities).  The result
is a set of index tensors the device reconstruction consumes as data —
the compiled program depends only on (n_steps bucket, capacities), not
on the tree.

Edge-buffer index spaces (trailing element = trash):
  hbuf: rows y % 8 == 7 (every CU bottom row) -> (y//8)*W + x
  vbuf: cols x % 8 == 7 (every CU right col)  -> (x//8)*H + y
Chroma uses the same structure at 4-pixel granularity.

This replaces the reference's per-CTU recursive reconstruction order
(kvz_intra_recon_cu, src/intra.c:652) and its WPP job DAG
(src/encoderstate.c:776-830) for content-dependent trees.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from kvazaar_tpu.encoder.geometry import z_order_index

SIZES = (8, 16, 32)


@dataclasses.dataclass
class ClassSched:
    """Per-(step, slot) tensors for one CU-size class and one plane."""
    size: int                 # block size on this plane
    valid: np.ndarray         # (steps, K) bool
    modes: np.ndarray         # (steps, K) int32
    noref: np.ndarray         # (steps, K) bool
    idx_h: np.ndarray         # (steps, K, R) int32 into Lh (+trash)
    idx_v: np.ndarray         # (steps, K, R) int32 into Lv (+trash)
    sel_h: np.ndarray         # (steps, K, R) bool
    wr_h: np.ndarray          # (steps, K, S) int32 into Lh+1
    wr_v: np.ndarray          # (steps, K, S) int32 into Lv+1
    pix: np.ndarray           # (steps, K, S*S) int32 into W*H (+trash)
    x0: np.ndarray            # (steps, K) int32 CU origin (this plane)
    y0: np.ndarray            # (steps, K) int32
    # Inter support (P/B variable trees): per-slot inter flag and, for
    # luma classes, the slot's 8x8-cell indices into the flat
    # (H/8)*(W/8) grid (+trash) — the scatter map for device-computed
    # per-TB cbf (deblock boundary strengths need it).
    inter: np.ndarray = None  # (steps, K) bool
    cell8: np.ndarray = None  # (steps, K, c*c) int32 into h8*w8 (+trash)
    # Compact upload form: per-ref-sample availability + the above-left
    # corner routing bit — the recon derives idx_h/idx_v/sel_h/noref
    # from these on device (uploading the derived maps cost ~7 MB/frame
    # through the ~20 MB/s tunnel).
    avail: np.ndarray = None     # (steps, K, R) uint8
    corner_h: np.ndarray = None  # (steps, K) bool


@dataclasses.dataclass
class VarPlan:
    n_steps: int
    width: int
    height: int
    luma: dict                # size -> ClassSched
    chroma: dict | None       # size//2 -> ClassSched


def _enumerate_cus(size8: np.ndarray):
    """CU list (x0, y0, size) in decode order (CTU64 raster, z within)."""
    h8, w8 = size8.shape
    cus = []
    for y8 in range(h8):
        for x8 in range(w8):
            s = int(size8[y8, x8])
            c = s // 8
            if y8 % c or x8 % c:
                continue
            key = ((y8 // 8), (x8 // 8),
                   z_order_index(x8 % 8, y8 % 8))
            cus.append((key, x8 * 8, y8 * 8, s))
    cus.sort()
    return [(x0, y0, s) for _key, x0, y0, s in cus]


def _ref_coords(x0: int, y0: int, s: int):
    """Spec-ordered reference sample coords (4S+1, 2): BL bottom-up,
    L bottom-up, corner, T, TR."""
    i = np.arange(4 * s + 1)
    xs = np.where(i <= 2 * s, x0 - 1, x0 + (i - (2 * s + 1)))
    ys = np.where(i <= 2 * s, y0 + 2 * s - 1 - i, y0 - 1)
    return xs, ys


def build_var_plan(size8: np.ndarray, mode_maps: dict, width: int,
                   height: int, chroma: bool, step_bucket: int = 32,
                   caps: dict | None = None,
                   inter8_map: np.ndarray | None = None,
                   cmode_maps: dict | None = None) -> VarPlan:
    """size8: (H/8, W/8) chosen CU size per cell; mode_maps:
    size -> (H/s, W/s) luma mode grids; inter8_map: optional (H/8, W/8)
    bool — CU-filled inter flags for P/B variable trees (inter CUs take
    the MC prediction instead of the wavefront intra path but still
    write their recon edges for intra neighbors); cmode_maps: optional
    size -> (H/s, W/s) EXPLICIT chroma mode grids (--rd 3), else
    chroma classes predict with the DM (luma) mode."""
    h8, w8 = size8.shape
    cus = _enumerate_cus(size8)
    n_cu = len(cus)

    # Decode-order index per cell + step assignment.
    order = np.zeros((h8, w8), np.int32)
    for k, (x0, y0, s) in enumerate(cus):
        c = s // 8
        order[y0 // 8:(y0 + s) // 8, x0 // 8:(x0 + s) // 8] = k

    caps = caps or {8: 16, 16: 8, 32: 4}
    step_of = np.zeros(n_cu, np.int32)
    counts: dict = {}
    recs = []   # (cu_idx, step, slot, x0, y0, s, xs, ys, avail)
    cell_step = np.full((h8, w8), -1, np.int32)
    for k, (x0, y0, s) in enumerate(cus):
        xs, ys = _ref_coords(x0, y0, s)
        inside = (xs >= 0) & (ys >= 0) & (xs < width) & (ys < height)
        xc = np.clip(xs, 0, width - 1) // 8
        yc = np.clip(ys, 0, height - 1) // 8
        avail = inside & (order[yc, xc] < k) & (cell_step[yc, xc] >= 0)
        dep = cell_step[yc[avail], xc[avail]]
        st = (int(dep.max()) + 1) if dep.size else 0
        while counts.get((st, s), 0) >= caps[s]:
            st += 1
        slot = counts.get((st, s), 0)
        counts[(st, s)] = slot + 1
        step_of[k] = st
        c = s // 8
        cell_step[y0 // 8:(y0 + s) // 8, x0 // 8:(x0 + s) // 8] = st
        # The above-left corner's owner may cross our top boundary
        # (legal for CUs left of us): decide per-CU whether the corner
        # sample lives on the owner's bottom row (hbuf) or right
        # column (vbuf).
        corner_on_h = True
        if x0 > 0 and y0 > 0:
            osz = int(size8[(y0 - 1) // 8, (x0 - 1) // 8])
            corner_on_h = ((y0 - 1) // osz * osz + osz == y0)
        recs.append((k, st, slot, x0, y0, s, xs, ys, avail,
                     corner_on_h))

    n_steps = int(step_of.max()) + 1 if n_cu else 1
    # Quantize to a coarse 1.5x ladder: every distinct n_steps is a
    # separate compiled recon program (XLA static shapes; 20-200 s per
    # compile through the remote-compile service) — per-frame content
    # variation must NOT trigger per-frame recompiles.  Padding cost is
    # bounded at +50% scan steps, amortized by the tiny per-step cost.
    b = max(step_bucket, 128)
    while b < n_steps:
        b = -(-(b * 3 // 2) // 64) * 64
    n_steps = b

    def make_class(size_luma: int, plane_w: int, plane_h: int,
                   gran: int, scale: int):
        """One ClassSched for luma (scale=1) or chroma (scale=2)."""
        s = size_luma // scale
        r = 4 * s + 1
        kcap = caps[size_luma]
        lh = (plane_h // gran) * plane_w
        lv = (plane_w // gran) * plane_h
        c8 = size_luma // 8
        cs = ClassSched(
            size=s,
            valid=np.zeros((n_steps, kcap), bool),
            modes=np.zeros((n_steps, kcap), np.int32),
            noref=np.ones((n_steps, kcap), bool),
            idx_h=np.full((n_steps, kcap, r), lh, np.int32),
            idx_v=np.full((n_steps, kcap, r), lv, np.int32),
            sel_h=np.ones((n_steps, kcap, r), bool),
            wr_h=np.full((n_steps, kcap, s), lh, np.int32),
            wr_v=np.full((n_steps, kcap, s), lv, np.int32),
            pix=np.full((n_steps, kcap, s * s), plane_w * plane_h,
                        np.int32),
            x0=np.zeros((n_steps, kcap), np.int32),
            y0=np.zeros((n_steps, kcap), np.int32),
            inter=np.zeros((n_steps, kcap), bool),
            cell8=(np.full((n_steps, kcap, c8 * c8), h8 * w8, np.int32)
                   if scale == 1 else None),
            avail=np.zeros((n_steps, kcap, r), np.uint8),
            corner_h=np.zeros((n_steps, kcap), bool),
        )
        yy, xx = np.meshgrid(np.arange(s), np.arange(s), indexing="ij")
        block_pix = (yy * plane_w + xx).ravel()
        mode_grid = mode_maps.get(size_luma)
        if scale == 2 and cmode_maps is not None \
                and size_luma in cmode_maps:
            mode_grid = cmode_maps[size_luma]
        for (k, st, slot, lx0, ly0, ls, lxs, lys, avail,
             corner_on_h) in recs:
            if ls != size_luma:
                continue
            x0, y0 = lx0 // scale, ly0 // scale
            # Scale the spec ref coords (chroma shares the tree).
            if scale == 1:
                xs, ys = lxs, lys
            else:
                xs, ys = _ref_coords(x0, y0, s)
                av = np.zeros(r, bool)
                av[:] = False
                # availability at chroma granularity mirrors luma cells
                inside = ((xs >= 0) & (ys >= 0) & (xs < plane_w)
                          & (ys < plane_h))
                xc = np.clip(xs * scale, 0, width - 1) // 8
                yc = np.clip(ys * scale, 0, height - 1) // 8
                av = inside & (order[yc, xc] < k)
                avail = av
            cs.valid[st, slot] = True
            cs.avail[st, slot] = avail.astype(np.uint8)
            cs.corner_h[st, slot] = corner_on_h
            cs.modes[st, slot] = int(
                mode_grid[ly0 // size_luma, lx0 // size_luma])
            cs.x0[st, slot] = x0
            cs.y0[st, slot] = y0
            if inter8_map is not None:
                cs.inter[st, slot] = bool(
                    inter8_map[ly0 // 8, lx0 // 8])
            if scale == 1:
                cyy, cxx = np.meshgrid(np.arange(c8), np.arange(c8),
                                       indexing="ij")
                cs.cell8[st, slot] = ((ly0 // 8 + cyy) * w8
                                      + lx0 // 8 + cxx).ravel()
            if avail.any():
                cs.noref[st, slot] = False
                first = int(np.argmax(avail))
                sub = np.where(avail, np.arange(r), -1)
                np.maximum.accumulate(sub, out=sub)
                sub[sub < 0] = first
                sxs, sys_ = xs[sub], ys[sub]
                # Route by region semantics: an available top/above-
                # right sample is always its owner's BOTTOM row (an
                # available owner cannot cross our top boundary) ->
                # hbuf; an available left-arm sample is its owner's
                # RIGHT column -> vbuf; the above-left corner's owner
                # may cross y0, so it routes by the per-CU owner check.
                # (mod-8 tests are wrong: a left-arm sample can sit at
                # y%8==7 inside a taller neighbor.)
                on_h = (sys_ == (y0 - 1)) & ((sxs >= x0) | corner_on_h)
                cs.idx_h[st, slot] = np.where(
                    on_h, (sys_ // gran) * plane_w + sxs, 0)
                cs.idx_v[st, slot] = np.where(
                    on_h, lv, (sxs // gran) * plane_h + sys_)
                cs.sel_h[st, slot] = on_h
                bad = ~on_h & (sxs != (x0 - 1))
                assert not bad.any(), "ref sample not on an edge"
            cs.wr_h[st, slot] = ((y0 + s - 1) // gran) * plane_w \
                + x0 + np.arange(s)
            cs.wr_v[st, slot] = ((x0 + s - 1) // gran) * plane_h \
                + y0 + np.arange(s)
            cs.pix[st, slot] = y0 * plane_w + x0 + block_pix
        return cs

    luma = {}
    chroma_d = {} if chroma else None
    # All classes are always present (possibly all-invalid) so the
    # compiled device program has a stable structure across frames.
    for s in SIZES:
        luma[s] = make_class(s, width, height, 8, 1)
        if chroma:
            chroma_d[s // 2] = make_class(s, width // 2, height // 2,
                                          4, 2)
    return VarPlan(n_steps=n_steps, width=width, height=height,
                   luma=luma, chroma=chroma_d)
