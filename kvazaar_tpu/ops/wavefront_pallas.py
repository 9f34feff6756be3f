"""Fused Pallas TPU kernel for the intra wavefront reconstruction scan.

The XLA lax.scan form (encoder/intra_recon.py) pays ~34us/step of loop
overhead plus ~200 small dynamic-slice/update ops per step (measured:
the 224-step scan costs ~130 ms per 8-frame batch).  This kernel runs
the WHOLE wavefront as one pallas_call with a sequential grid over
steps, keeping the edge state resident in VMEM scratch and streaming
per-step inputs/outputs through the automatic grid pipeline.

Layout design (everything dictated by Mosaic's tiling rules):

- Edge state is stored per BLOCK, not per pixel: hrow[bid] = the
  reconstructed bottom row of block bid, vcol[bid] = its right column,
  each a (1, S*NB)-lane row in p-major order (lane = p*NB + b over the
  frame batch).  Block rows are read/written with single-sublane
  dynamic slices (the only dynamic indexing Mosaic allows freely).
  This is the TPU form of the reference's hor/ver boundary buffers
  (/root/reference/src/encoderstate.h:170-186).
- Compute is FEATURE-MAJOR: (features, K*NB lanes) — reference vectors
  (4S+1, K*NB), predictions (35*S*S, K*NB), pixels (S*S, K*NB).  All
  per-step work is then plain sublane slicing, MXU matmuls, and
  elementwise VPU ops; no lane-minor reshapes (unsupported).
- Lane-axis flips (spec orders the left reference arm bottom-up) are
  anti-identity matmuls; strided extractions (right column) and
  position spreads (DC/10/26 fixups) are one-hot matmuls; the 2-D DCT
  is two kron(T, I)/kron(I, T) matmuls per direction — the MXU does
  every data-movement job the VPU cannot.
- Integer exactness follows ops/exactmm.py: operands within +-256 go
  through bf16 MXU passes directly; wider data (transform
  intermediates) takes the hi/lo byte-split double matmul.

Covers: 8-bit, intra blocks, CU size <= 16, no sign hiding, no
transquant bypass.  Everything else falls back to the XLA scan with
bit-identical results (tests/test_wavefront_pallas.py pins equality).

Replaces the hot path of the reference's kvz_intra_recon_cu
(src/intra.c:652) + quantize loop (src/transform.c:424).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kvazaar_tpu.encoder.geometry import IntraFramePlan, PlaneMaps
from kvazaar_tpu.ops.intra import mode_weights_np
from kvazaar_tpu.ops.quant import quant_params
from kvazaar_tpu.ops.transform import dct_matrix_np

_F_L, _F_A, _F_AR, _F_BL, _F_AL = 1, 2, 4, 8, 16

# Test hooks (tests/test_wavefront_pallas.py pins kernel == XLA-scan
# bit-identity): INTERPRET=True runs pallas_call in interpret mode so
# the CPU suite executes the kernel; DISABLE=True forces the scan path
# even on TPU (the reference side of the A/B).  Production TPU runs
# compile the real Mosaic kernel (both False).
INTERPRET = False
DISABLE = False


def _schedule_np(plan: IntraFramePlan) -> np.ndarray:
    """(steps*slots*2,) int32: [block_id, avail_flags] per slot.  Pad
    slots point at the trash row (index NB) with flags 0, so they read
    mid-gray and write harmlessly — no conditionals in the kernel."""
    n_steps, n_slots = plan.n_steps, plan.n_slots
    nb_blocks = plan.blocks_y * plan.blocks_x
    sched = np.zeros((n_steps, n_slots, 2), np.int32)
    sched[:, :, 0] = nb_blocks
    for st in range(n_steps):
        for sl in range(n_slots):
            bid = plan.block_of_slot[st, sl]
            if bid < 0:
                continue
            by, bx = divmod(int(bid), plan.blocks_x)
            fl = 0
            for i, bit in enumerate((_F_L, _F_A, _F_AR, _F_BL, _F_AL)):
                if plan.avail[by, bx, i]:
                    fl |= bit
            sched[st, sl] = (int(bid), fl)
    return sched.reshape(-1)


@functools.lru_cache(maxsize=None)
def _weights_np(s: int, luma: bool):
    """W (35*S*S, cols) float32 (bf16-exact values) + per-row shift."""
    w, shifts = mode_weights_np(s, luma)        # (35, S*S, 2R), (35,)
    rlen = 4 * s + 1
    if not luma:
        w = w[:, :, :rlen]                       # chroma: unfiltered only
    wm = w.reshape(35 * s * s, w.shape[-1]).astype(np.float32)
    shift_row = np.repeat(shifts, s * s).astype(np.int32)[:, None]
    return wm, shift_row


@functools.lru_cache(maxsize=None)
def _consts_np(s: int, nb: int):
    """Constant matrices for one plane config (all one-hot/integer,
    bf16-exact)."""
    t = dct_matrix_np(s).astype(np.float32)
    eye = np.eye(s, dtype=np.float32)
    kron_t_i = np.kron(t, eye)                  # stage-1 fwd
    kron_i_t = np.kron(eye, t)                  # stage-2 fwd
    kron_tt_i = np.kron(t.T, eye)               # stage-1 inv
    kron_i_tt = np.kron(eye, t.T)               # stage-2 inv
    j2 = np.eye(2 * s, dtype=np.float32)[::-1].copy()   # arm flip
    js = np.eye(s, dtype=np.float32)[::-1].copy()       # single flip
    lanes = s * nb
    d1 = np.zeros((lanes, s), np.float32)       # Y[l, b] = chunk[l//nb, b]
    d1[np.arange(lanes), np.arange(lanes) // nb] = 1.0
    msel = np.zeros((lanes, nb), np.float32)    # row_T = sum(Y*msel, 1)
    msel[np.arange(lanes), np.arange(lanes) % nb] = 1.0
    scol = np.zeros((s, s * s), np.float32)     # right-col extractor
    scol[np.arange(s), np.arange(s) * s + (s - 1)] = 1.0
    rspr = np.zeros((s * s, s), np.float32)     # col spread p -> p//s
    rspr[np.arange(s * s), np.arange(s * s) // s] = 1.0
    return (kron_t_i, kron_i_t, kron_tt_i, kron_i_tt, j2, js, d1, msel,
            scol, rspr)


def _mm(a, b):
    """Exact MXU matmul for operands within +-256."""
    return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)


def _mm_i32(a, b):
    return _mm(a, b).astype(jnp.int32)


def _mm_split(m_bf16, x_i32):
    """Exact (m @ x) for |m| <= 255 one side, |x| < 2^23: hi/lo split of
    the data operand."""
    xh = (x_i32 >> 8).astype(jnp.bfloat16)
    xl = (x_i32 & 255).astype(jnp.bfloat16)
    rh = jnp.dot(m_bf16, xh, preferred_element_type=jnp.float32)
    rl = jnp.dot(m_bf16, xl, preferred_element_type=jnp.float32)
    return (rh.astype(jnp.int32) << 8) + rl.astype(jnp.int32)


def _round_shift(x, shift):
    return (x + (1 << (shift - 1))) >> shift


def _make_kernel(plan: IntraFramePlan, s: int, nb: int, luma: bool,
                 qp: int, bitdepth: int, inter: bool = False):
    k_slots = plan.n_slots
    bx_blocks = plan.blocks_x
    rlen = 4 * s + 1
    ss = s * s
    lanes = s * nb
    kb = k_slots * nb
    log2n = s.bit_length() - 1
    mid = 1 << (bitdepth - 1)
    maxpix = (1 << bitdepth) - 1
    scale, qbits, inv_scale, inv_shift = quant_params(qp, log2n, bitdepth)
    offset_q = 171 << (qbits - 9)                # intra rounding
    offset_q_inter = 85 << (qbits - 9)
    shift1 = log2n + bitdepth - 9
    shift2 = log2n + 6
    ishift1, ishift2 = 7, 20 - bitdepth

    def kernel(sched_ref, oy_ref, modes_ref, *rest):
        # P-frame variant streams two extra per-step refs right after
        # modes: ii_ref (1, KB) inter mask + mc_ref (SS, KB) MC pred.
        if inter:
            ii_ref, mc_ref = rest[0], rest[1]
            rest = rest[2:]
        (w_ref, shiftr_ref, m1_ref, m2_ref, m3_ref, m4_ref, j2_ref,
         js_ref, d1_ref, msel_ref, scol_ref, rspr_ref, lv_ref,
         rec_ref, hrow, vcol) = rest
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            hrow[:] = jnp.zeros_like(hrow)
            vcol[:] = jnp.zeros_like(vcol)

        j2 = j2_ref[:].astype(jnp.bfloat16)

        def load_chunk(buf, row_id):
            # (1, S*NB) p-major row -> (S, NB) feature-major chunk.
            row = buf[pl.ds(row_id, 1), :]
            return row.T.reshape(s, nb)

        refs_slots = []
        for k in range(k_slots):
            bid = sched_ref[(t * k_slots + k) * 2]      # block id
            fl = sched_ref[(t * k_slots + k) * 2 + 1]
            bid_top = jnp.maximum(bid - bx_blocks, 0)
            bid_tr = jnp.maximum(bid - bx_blocks + 1, 0)
            bid_al = jnp.maximum(bid - bx_blocks - 1, 0)
            bid_l = jnp.maximum(bid - 1, 0)
            bid_bl = jnp.maximum(bid + bx_blocks - 1, 0)
            top = load_chunk(hrow, bid_top)             # (S, NB)
            tr = load_chunk(hrow, bid_tr)
            corner = load_chunk(hrow, bid_al)[s - 1:s, :]   # (1, NB)
            left = load_chunk(vcol, bid_l)
            bl = load_chunk(vcol, bid_bl)
            a_l = (fl & _F_L) != 0
            a_a = (fl & _F_A) != 0
            a_ar = (fl & _F_AR) != 0
            a_bl = (fl & _F_BL) != 0
            a_al = (fl & _F_AL) != 0
            # Left arm into spec (bottom-up) order: one anti-identity
            # matmul (lane flips are not TPU-native; permutation
            # matmuls are).
            arm = jnp.concatenate([left, bl], axis=0)   # (2S, NB)
            arm = _mm_i32(j2, arm)
            bl_bu, l_bu = arm[:s], arm[s:]
            regions = [(a_bl, bl_bu), (a_l, l_bu), (a_al, corner),
                       (a_a, top), (a_ar, tr)]
            # Spec substitution 8.4.4.2.2 at region granularity (same
            # chain as the XLA scan's build_refs_edges).
            first = jnp.full((1, nb), mid, jnp.int32)
            for flag, reg in reversed(regions):
                first = jnp.where(flag, reg[:1, :], first)
            pieces = []
            carry = first
            for flag, reg in regions:
                filled = jnp.where(flag, reg,
                                   jnp.broadcast_to(carry, reg.shape))
                pieces.append(filled)
                carry = filled[-1:, :]
            refs_slots.append(jnp.concatenate(pieces, axis=0))  # (R,NB)
        refs = jnp.concatenate(refs_slots, axis=1)      # (R, K*NB)

        if luma:
            f = (refs[:-2] + 2 * refs[1:-1] + refs[2:] + 2) >> 2
            filt = jnp.concatenate([refs[:1], f, refs[-1:]], axis=0)
            refs2 = jnp.concatenate([refs, filt], axis=0)   # (2R, KB)
        else:
            refs2 = refs

        # All-35-modes prediction: one MXU matmul + per-row rounding
        # (weights/refs within +-256: direct bf16 is exact).
        raw = _mm_i32(w_ref[:], refs2)                  # (35*SS, KB)
        shiftr = shiftr_ref[:]
        pred35 = (raw + (1 << (shiftr - 1))) >> shiftr

        # Mode select: (35, SS, KB) masked reduction (exact in f32).
        modes_v = modes_ref[0]                          # (1, KB)
        m_iota = jax.lax.broadcasted_iota(jnp.int32, (35, 1, 1), 0)
        onehot = (modes_v[None] == m_iota).astype(jnp.float32)
        p3 = pred35.reshape(35, ss, kb).astype(jnp.float32)
        pred = jnp.sum(p3 * onehot, axis=0).astype(jnp.int32)  # (SS,KB)

        if luma and s < 32:
            # DC boundary smoothing + mode 10/26 edge filters
            # (ops/intra.py _apply_fixups, select-then-fix form).
            topr = refs[2 * s + 1: 3 * s + 1]           # (S, KB) x-major
            leftr = _mm_i32(js_ref[:], refs[s: 2 * s])  # top-down
            cornr = refs[2 * s: 2 * s + 1]              # (1, KB)
            dc = pred[(s // 2) * s + s // 2:
                      (s // 2) * s + s // 2 + 1]        # (1, KB)
            xi1 = jax.lax.broadcasted_iota(jnp.int32, (s, 1), 0)
            row0 = (topr + 3 * dc + 2) >> 2
            c00 = (leftr[:1] + 2 * dc + topr[:1] + 2) >> 2
            row0 = jnp.where(xi1 == 0, c00, row0)
            col0 = (leftr + 3 * dc + 2) >> 2
            p10r = jnp.clip(leftr[:1] + ((topr - cornr) >> 1), 0, maxpix)
            p26c = jnp.clip(topr[:1] + ((leftr - cornr) >> 1), 0, maxpix)
            pi = jax.lax.broadcasted_iota(jnp.int32, (ss, 1), 0)
            yi = pi // s
            xi = pi % s
            rspr = rspr_ref[:]
            zpad = jnp.zeros((ss - s, kb), jnp.int32)
            row0s = jnp.concatenate([row0, zpad], axis=0)
            p10s = jnp.concatenate([p10r, zpad], axis=0)
            col0s = _mm_i32(rspr, col0)                 # (SS, KB)
            p26s = _mm_i32(rspr, p26c)
            mv = modes_v                                # (1, KB)
            pred = jnp.where((mv == 1) & (yi == 0), row0s, pred)
            pred = jnp.where((mv == 1) & (xi == 0) & (yi != 0), col0s,
                             pred)
            pred = jnp.where((mv == 10) & (yi == 0), p10s, pred)
            pred = jnp.where((mv == 26) & (xi == 0), p26s, pred)

        # Inter blocks take the motion-compensated prediction (it has
        # no wavefront dependency; computed batched outside) and the
        # inter quantizer deadzone.
        offq = offset_q
        if inter:
            ii = ii_ref[0]                              # (1, KB)
            pred = jnp.where(ii != 0, mc_ref[0], pred)
            offq = jnp.where(ii != 0, offset_q_inter, offset_q)

        # ---- TU roundtrip, feature-major with kron-structured DCTs.
        orig = oy_ref[0]                                # (SS, KB)
        resid = orig - pred
        e = _round_shift(_mm_i32(m1_ref[:], resid), shift1)
        coeff = _round_shift(_mm_split(m2_ref[:].astype(jnp.bfloat16),
                                       e), shift2)

        lv = (jnp.abs(coeff) * scale + offq) >> qbits
        lv = jnp.clip(lv, 0, 32767)
        lv = jnp.where(coeff < 0, -lv, lv)

        dq = (lv * (inv_scale << (qp // 6))
              + (1 << (inv_shift - 5))) >> (inv_shift - 4)
        dq = jnp.clip(dq, -32768, 32767)

        ie = _round_shift(_mm_split(m3_ref[:].astype(jnp.bfloat16), dq),
                          ishift1)
        ie = jnp.clip(ie, -32768, 32767)
        ir = _round_shift(_mm_split(m4_ref[:].astype(jnp.bfloat16), ie),
                          ishift2)
        ir = jnp.clip(ir, -32768, 32767)

        rec = jnp.clip(pred + ir, 0, maxpix)            # (SS, KB)

        lv_ref[0] = lv.astype(jnp.int16)
        rec_ref[0] = rec.astype(jnp.uint8)

        # ---- Edge writes: bottom row / right column of every block
        # back into the block-row buffers (pad slots target the trash
        # row).  (S, NB) chunk -> (1, S*NB) row via one-hot matmul +
        # masked lane reduction (minor-dim merges are unsupported).
        bottom = rec[ss - s:, :]                        # (S, KB)
        rcol = _mm_i32(scol_ref[:], rec)                # (S, KB)
        d1 = d1_ref[:]
        msel = msel_ref[:].astype(jnp.int32)
        for k in range(k_slots):
            bid = sched_ref[(t * k_slots + k) * 2]
            for chunk, buf in ((bottom, hrow), (rcol, vcol)):
                ck = chunk[:, k * nb:(k + 1) * nb]      # (S, NB)
                y = _mm_i32(d1, ck)                     # (S*NB, NB)
                row_t = jnp.sum(y * msel, axis=1, keepdims=True)
                buf[pl.ds(bid, 1), :] = row_t.T

    return kernel


def wavefront_plane_pallas(origs_fm, modes_fm, plan: IntraFramePlan,
                           s: int, nb: int, luma: bool, qp: int,
                           bitdepth: int, ii_fm=None, mc_fm=None):
    """origs_fm: (steps, S*S, K*NB) int32 feature-major originals;
    modes_fm: (steps, 1, K*NB) int32.  P frames: ii_fm (steps, 1, K*NB)
    inter mask + mc_fm (steps, S*S, K*NB) MC prediction.  Returns
    (levels int16, rec uint8) in the same (steps, S*S, K*NB) layout —
    values identical to the XLA scan path."""
    n_steps = origs_fm.shape[0]
    k_slots = plan.n_slots
    ss = s * s
    kb = k_slots * nb
    lanes = s * nb
    nbp = plan.blocks_y * plan.blocks_x + 1
    inter = ii_fm is not None
    sched = jnp.asarray(_schedule_np(plan))
    wm, shiftr = _weights_np(s, luma)
    consts = _consts_np(s, nb)
    (m1, m2, m3, m4, j2, js, d1, msel, scol, rspr) = consts
    args = [jnp.asarray(origs_fm), jnp.asarray(modes_fm)]
    stream_specs = [
        pl.BlockSpec((1, ss, kb), lambda t, sched: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, kb), lambda t, sched: (t, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if inter:
        args += [jnp.asarray(ii_fm), jnp.asarray(mc_fm)]
        stream_specs += [
            pl.BlockSpec((1, 1, kb), lambda t, sched: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ss, kb), lambda t, sched: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    n_stream = len(args)
    args += [jnp.asarray(wm.astype(jnp.bfloat16)), jnp.asarray(shiftr),
             jnp.asarray(m1.astype(jnp.bfloat16)), jnp.asarray(m2),
             jnp.asarray(m3), jnp.asarray(m4),
             jnp.asarray(j2.astype(jnp.bfloat16)),
             jnp.asarray(js.astype(jnp.bfloat16)),
             jnp.asarray(d1.astype(jnp.bfloat16)),
             jnp.asarray(msel),
             jnp.asarray(scol.astype(jnp.bfloat16)),
             jnp.asarray(rspr.astype(jnp.bfloat16))]

    whole = lambda a: pl.BlockSpec(a.shape, lambda t, *_: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM)
    kernel = _make_kernel(plan, s, nb, luma, qp, bitdepth, inter)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=stream_specs + [whole(a) for a in args[n_stream:]],
        out_specs=[
            pl.BlockSpec((1, ss, kb), lambda t, sched: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ss, kb), lambda t, sched: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((nbp, lanes), jnp.int32),
            pltpu.VMEM((nbp, lanes), jnp.int32),
        ],
    )
    lv, rec = pl.pallas_call(
        kernel, grid_spec=gs,
        out_shape=[
            jax.ShapeDtypeStruct((n_steps, ss, kb), jnp.int16),
            jax.ShapeDtypeStruct((n_steps, ss, kb), jnp.uint8),
        ],
        interpret=INTERPRET,
    )(sched, *args)
    return lv, rec


def to_feature_major(steps_blocks, s: int):
    """(steps, K, NB, S, S) -> (steps, S*S, K*NB)."""
    st, k, nb = steps_blocks.shape[:3]
    x = steps_blocks.transpose(0, 3, 4, 1, 2)       # (st, S, S, K, NB)
    return x.reshape(st, s * s, k * nb)


def from_feature_major(x, k: int, nb: int, s: int):
    """(steps, S*S, K*NB) -> (steps, K, NB, S, S)."""
    st = x.shape[0]
    return x.reshape(st, s, s, k, nb).transpose(0, 3, 4, 1, 2)


def supported(plan: IntraFramePlan, bitdepth: int, lossless: bool,
              signhide: bool, inter: bool) -> bool:
    """Configs the fused kernel covers (intra AND inter blocks);
    everything else takes the XLA scan (same results)."""
    # cu_size 4 (the intra-NxN luma plan) needs the DST path the kernel
    # doesn't carry yet; it takes the XLA scan.
    return (bitdepth == 8 and not lossless and not signhide
            and plan.cu_size in (8, 16))
