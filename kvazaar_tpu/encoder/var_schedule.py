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
    # Compact inter-CU batches for the scan-free direct pass (P/B
    # frames): size -> {x0, y0, valid, pix, cell8} with (steps_i,
    # kcap) shapes.  pix/cell8 are HOST maps (the device re-derives
    # them from x0/y0 — only x0/y0/valid upload).
    iluma: dict | None = None
    ichroma: dict | None = None
    isteps: int = 0
    # Real wavefront depth (<= n_steps): the scan executes only this
    # many steps (padded steps are no-ops; see reconstruct_frame_var).
    n_steps_real: int = 0


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
    chroma classes predict with the DM (luma) mode.

    Planning is batched numpy per size class; only the wavefront step
    assignment (a dependency-chain DP) iterates CUs, and its body is
    three array ops (1080p trees plan in ~0.2 s, was ~1.2 s)."""
    h8, w8 = size8.shape
    cus = _enumerate_cus(size8)
    n_cu = len(cus)

    # Decode-order index per cell.
    order = np.zeros((h8, w8), np.int32)
    for k, (x0, y0, s) in enumerate(cus):
        c = s // 8
        order[y0 // 8:(y0 + s) // 8, x0 // 8:(x0 + s) // 8] = k

    caps = caps or {8: 16, 16: 8, 32: 4}
    cu_x = np.fromiter((c[0] for c in cus), np.int32, n_cu)
    cu_y = np.fromiter((c[1] for c in cus), np.int32, n_cu)
    cu_s = np.fromiter((c[2] for c in cus), np.int32, n_cu)
    # Inter CUs have NO wavefront dependency (their prediction is MC,
    # not neighbor recon): they are excluded from the scan classes and
    # the step DP entirely — reconstruct_frame_var reconstructs them in
    # one parallel pass and pre-fills the edge buffers, so intra CUs
    # that reference inter neighbors see their edges at step 0 (decode-
    # order availability still gates every read).  This collapses
    # n_steps from O(W+2H) to the intra-only dependency chains.
    if inter8_map is not None:
        cu_inter = np.asarray(inter8_map, bool)[cu_y // 8, cu_x // 8]
    else:
        cu_inter = np.zeros(n_cu, bool)
    by_size = {s: np.flatnonzero((cu_s == s) & ~cu_inter)
               for s in SIZES}

    # Batched luma ref availability + owner CU ids per size class
    # (H.265 6.4.1 at cell granularity; cell_step>=0 in the old form
    # was redundant with order<k — decode order assigns monotonically).
    avail_of, owners_of = {}, {}
    for s, idxs in by_size.items():
        if not len(idxs):
            continue
        i = np.arange(4 * s + 1)
        xs = np.where(i <= 2 * s, cu_x[idxs, None] - 1,
                      cu_x[idxs, None] + (i - (2 * s + 1)))
        ys = np.where(i <= 2 * s, cu_y[idxs, None] + 2 * s - 1 - i,
                      cu_y[idxs, None] - 1)
        inside = (xs >= 0) & (ys >= 0) & (xs < width) & (ys < height)
        own = order[np.clip(ys, 0, height - 1) // 8,
                    np.clip(xs, 0, width - 1) // 8]
        av = inside & (own < idxs[:, None])
        avail_of[s] = av
        owners_of[s] = np.where(av, own, -1)

    # Above-left corner routing bit (vectorized; see derive()).
    osz = size8[np.clip(cu_y - 1, 0, None) // 8,
                np.clip(cu_x - 1, 0, None) // 8].astype(np.int32)
    corner_h_all = np.where(
        (cu_x > 0) & (cu_y > 0),
        ((cu_y - 1) // np.maximum(osz, 1) * osz + osz) == cu_y, True)

    # Sequential wavefront step assignment (dependency DP + per-size
    # slot capacities).
    pos_in_class = np.zeros(n_cu, np.int64)
    for s, idxs in by_size.items():
        pos_in_class[idxs] = np.arange(len(idxs))
    step_of = np.zeros(n_cu, np.int32)
    slot_of = np.zeros(n_cu, np.int32)
    counts: dict = {}
    for k in range(n_cu):
        if cu_inter[k]:
            continue                  # parallel direct pass, no step
        s = int(cu_s[k])
        row = owners_of[s][pos_in_class[k]]
        ow = row[row >= 0]
        ow = ow[~cu_inter[ow]]        # inter edges pre-filled: step 0
        st = int(step_of[ow].max()) + 1 if ow.size else 0
        while counts.get((st, s), 0) >= caps[s]:
            st += 1
        slot = counts.get((st, s), 0)
        counts[(st, s)] = slot + 1
        step_of[k] = st
        slot_of[k] = slot

    intra_ids = np.flatnonzero(~cu_inter)
    n_steps = (int(step_of[intra_ids].max()) + 1 if intra_ids.size
               else 1)
    # ONE static schedule depth: the recon loop executes a TRACED
    # n_steps_real trip count, so padding costs only schedule-array
    # bytes (~2 MB H2D), while every distinct padded depth is a
    # separate 16-22 s XLA compile through the remote service.  The
    # old content-dependent pow2 ladder recompiled whenever a frame's
    # intra-island chains crossed a bucket boundary — mid-stream.
    # 256 covers every tree seen in practice; pathological content
    # doubles (rare, compiled once).
    b = max(step_bucket, 256)
    while b < n_steps:
        b *= 2
    n_steps_real = n_steps     # executed trip count (fori_loop bound)
    n_steps = b                # padded static depth (compiled shapes)

    def make_class(size_luma: int, plane_w: int, plane_h: int,
                   gran: int, scale: int):
        """One ClassSched for luma (scale=1) or chroma (scale=2).
        Only the compact upload fields (+ pix, which the host levels
        scatter needs) are built — idx/sel/wr/cell8/noref are derived
        on device from (x0, y0, valid, avail, corner_h)."""
        s = size_luma // scale
        r = 4 * s + 1
        kcap = caps[size_luma]
        cs = ClassSched(
            size=s,
            valid=np.zeros((n_steps, kcap), bool),
            modes=np.zeros((n_steps, kcap), np.int32),
            noref=None, idx_h=None, idx_v=None, sel_h=None,
            wr_h=None, wr_v=None,
            pix=None,    # device-derived; levels scatter on device
            x0=np.zeros((n_steps, kcap), np.int32),
            y0=np.zeros((n_steps, kcap), np.int32),
            inter=np.zeros((n_steps, kcap), bool),
            cell8=None,
            avail=np.zeros((n_steps, kcap, r), np.uint8),
            corner_h=np.zeros((n_steps, kcap), bool),
        )
        idxs = by_size.get(size_luma, np.empty(0, np.int64))
        if not len(idxs):
            return cs
        st = step_of[idxs]
        sl = slot_of[idxs]
        lx0 = cu_x[idxs]
        ly0 = cu_y[idxs]
        x0 = lx0 // scale
        y0 = ly0 // scale
        if scale == 1:
            av = avail_of[size_luma]
        else:
            # Chroma availability at chroma granularity mirrors the
            # luma cells (chroma shares the tree).
            i = np.arange(r)
            xs = np.where(i <= 2 * s, x0[:, None] - 1,
                          x0[:, None] + (i - (2 * s + 1)))
            ys = np.where(i <= 2 * s, y0[:, None] + 2 * s - 1 - i,
                          y0[:, None] - 1)
            inside = ((xs >= 0) & (ys >= 0) & (xs < plane_w)
                      & (ys < plane_h))
            own = order[np.clip(ys * scale, 0, height - 1) // 8,
                        np.clip(xs * scale, 0, width - 1) // 8]
            av = inside & (own < idxs[:, None])
        mode_grid = mode_maps.get(size_luma)
        if scale == 2 and cmode_maps is not None \
                and size_luma in cmode_maps:
            mode_grid = cmode_maps[size_luma]
        cs.valid[st, sl] = True
        cs.avail[st, sl] = av.astype(np.uint8)
        cs.corner_h[st, sl] = corner_h_all[idxs]
        cs.modes[st, sl] = mode_grid[ly0 // size_luma,
                                     lx0 // size_luma]
        cs.x0[st, sl] = x0
        cs.y0[st, sl] = y0
        if inter8_map is not None:
            cs.inter[st, sl] = inter8_map[ly0 // 8, lx0 // 8]
        return cs

    # ---- Compact inter-CU batches (direct pass): chunked arange
    # step/slot per size with large caps; total slots ~= CU count
    # (work stays proportional to real CUs — padding a full grid
    # would run RDOQ over 3x the plane per size).  steps_i is ladder-
    # quantized so content variation reuses compiled programs. ----
    ICAPS = {8: 2048, 16: 512, 32: 128}
    iluma = ichroma = None
    steps_i = 0
    if inter8_map is not None:
        by_size_i = {s: np.flatnonzero((cu_s == s) & cu_inter)
                     for s in SIZES}
        # STATIC per-resolution row counts (worst case: every cell of
        # this size is an inter CU).  The device direct pass loops a
        # TRACED number of real rows ('rows'), so padding costs only
        # upload bytes and content never forces a recompile.
        rows_static = {s: -(-((width // s) * (height // s))
                            // ICAPS[s]) for s in SIZES}
        steps_i = max(rows_static.values())

        def make_inter_class(size_luma, plane_w, plane_h, scale):
            s = size_luma // scale
            kcap = ICAPS[size_luma]
            ns = rows_static[size_luma]
            idxs = by_size_i.get(size_luma,
                                 np.empty(0, np.int64))
            d = dict(
                x0=np.zeros((ns, kcap), np.int32),
                y0=np.zeros((ns, kcap), np.int32),
                valid=np.zeros((ns, kcap), bool),
                rows=np.array([max(-(-len(idxs) // kcap), 1)
                               if len(idxs) else 1], np.int32))
            k = len(idxs)
            if k:
                st = np.arange(k) // kcap
                sl = np.arange(k) % kcap
                d["x0"][st, sl] = cu_x[idxs] // scale
                d["y0"][st, sl] = cu_y[idxs] // scale
                d["valid"][st, sl] = True
            return d

        iluma = {s: make_inter_class(s, width, height, 1)
                 for s in SIZES}
        if chroma:
            ichroma = {s // 2: make_inter_class(s, width // 2,
                                                height // 2, 2)
                       for s in SIZES}

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
                   iluma=iluma, ichroma=ichroma, isteps=steps_i,
                   luma=luma, chroma=chroma_d,
                   n_steps_real=n_steps_real)
