"""Conformance-oracle decoder for the bitstreams this encoder emits.

The reference proves conformance by decoding its output with the HM
reference decoder (tests/util.sh:20-55).  No HEVC decoder exists in this
environment, so we implement the decode path ourselves: parse the Annex-B
stream (header fields + CABAC slice data via bitstream/syntax.py), then
reconstruct with the exact-integer ops — independently re-deriving
prediction from *decoded* syntax only.  Encoder recon must equal decoder
recon bit-for-bit; any divergence is a real conformance bug (availability
rules, context drift, arithmetic mismatch).

The reconstruction here deliberately reuses the same wavefront machinery
as the encoder but is driven purely by parsed FrameData (levels + modes),
i.e. it never sees the source pixels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from kvazaar_tpu.bitstream.bits import BitReader, split_annexb
from kvazaar_tpu.bitstream.cabac import CabacDecoder
from kvazaar_tpu.bitstream.contexts import Contexts
from kvazaar_tpu.bitstream.headers import StreamParams
from kvazaar_tpu.bitstream.syntax import FrameData, SliceDataDecoder
from kvazaar_tpu.constants import SLICE_I
from kvazaar_tpu.encoder.geometry import make_intra_plan
from kvazaar_tpu.encoder.intra_recon import _blocks_by_step
from kvazaar_tpu.ops.intra import predict_modes
from kvazaar_tpu.ops.quant import dequantize
from kvazaar_tpu.ops.transform import inverse_transform


def parse_slice_header_i(r: BitReader, p: StreamParams):
    """Parse the IDR I-slice header we emit; returns (slice QP,
    entry-point offsets)."""
    assert r.u(1) == 1            # first_slice_segment_in_pic_flag
    r.u(1)                        # no_output_of_prior_pics_flag
    assert r.ue() == 0            # slice_pic_parameter_set_id
    slice_type = r.ue()
    assert slice_type == 2
    if p.sao_enabled:
        r.u(1)
        if p.chroma_format_idc:
            r.u(1)
    qp = p.qp + r.se()
    if p.sao_enabled or p.deblock_enabled:
        r.u(1)
    entries = []
    if p.wpp:
        n = r.ue()
        if n:
            ln = r.ue() + 1
            entries = [r.u(ln) + 1 for _ in range(n)]
    assert r.bit() == 1           # byte alignment bit
    r.byte_align()
    return qp, entries


def decode_stream(stream: bytes, params: StreamParams):
    """Decode the (subset) stream → list of (recon_y, recon_cb, recon_cr)
    per frame, plus parsed FrameData per frame."""
    frames = []
    for nal_type, _tid, rbsp in split_annexb(stream):
        if nal_type in (19, 20):  # IDR slice
            r = BitReader(rbsp)
            qp, entries = parse_slice_header_i(r, params)
            chroma = params.chroma_format_idc != 0
            fd = FrameData.empty(params.width, params.height, chroma)
            cab = CabacDecoder(r)
            dec = SliceDataDecoder(params, fd, Contexts(SLICE_I, qp), cab)
            if params.wpp:
                # The header parse ended byte-aligned; the CabacDecoder
                # init then read 9 bits, so slice data begins at
                # bit_position - 9.
                start = (r.bit_position - 9) // 8
                sizes = entries + [len(rbsp) - start - sum(entries)]
                dec.decode_slice_data_wpp(rbsp, start, sizes)
            else:
                dec.decode_slice_data()
            recon = reconstruct_parsed(fd, params, qp)
            frames.append((recon, fd))
    return frames


def reconstruct_parsed(fd: FrameData, params: StreamParams, qp: int):
    """Wavefront reconstruction purely from parsed syntax (v1 subset:
    uniform CU size)."""
    from kvazaar_tpu.encoder.frame_encoder import chroma_qp
    depth = int(fd.depth8[0, 0])
    assert np.all(fd.depth8 == depth), "oracle supports uniform depth"
    s = params.ctu_size >> depth
    chroma = params.chroma_format_idc != 0
    plan = make_intra_plan(params.width, params.height, s, chroma)
    modes = fd.mode4[::s // 4, ::s // 4].astype(np.int32)

    lv_y = _blocks_by_step(fd.coeff_y, plan.luma, plan)
    lv_cb = lv_cr = None
    if chroma:
        lv_cb = _blocks_by_step(fd.coeff_cb, plan.chroma, plan)
        lv_cr = _blocks_by_step(fd.coeff_cr, plan.chroma, plan)

    out = _decode_recon_jit(plan, s, chroma, qp, chroma_qp(qp),
                            params.bitdepth, jnp.asarray(lv_y),
                            None if lv_cb is None else jnp.asarray(lv_cb),
                            None if lv_cr is None else jnp.asarray(lv_cr),
                            jnp.asarray(modes))
    rec_y, rec_cb, rec_cr = out[0], out[1], out[2]
    if params.deblock_enabled:
        from kvazaar_tpu.ops.deblock import deblock_frame
        rec_y, rec_cb, rec_cr = deblock_frame(
            rec_y, rec_cb, rec_cr, qp, s, params.bitdepth,
            params.deblock_beta_offset_div2,
            params.deblock_tc_offset_div2)
    rec_y = np.asarray(rec_y)
    rec_cb = None if rec_cb is None else np.asarray(rec_cb)
    rec_cr = None if rec_cr is None else np.asarray(rec_cr)
    return rec_y, rec_cb, rec_cr


def _plane_step_from_levels(recon_flat, gidx, noref, scatter, levels,
                            modes, size, qp, bitdepth, luma):
    refs = recon_flat[gidx]
    refs = jnp.where(noref[:, None], 1 << (bitdepth - 1), refs)
    pred = predict_modes(refs.astype(jnp.int32), modes, size, luma=luma,
                         bitdepth=bitdepth)
    dq = dequantize(levels, qp, size, bitdepth)
    res = inverse_transform(dq, size, bitdepth)
    rec = jnp.clip(pred + res, 0, (1 << bitdepth) - 1)
    return recon_flat.at[scatter.reshape(-1)].set(rec.reshape(-1))


def _decode_recon_impl(plan, s, chroma, qp, qp_c, bitdepth, lv_y, lv_cb,
                       lv_cr, modes):
    h, w = plan.height, plan.width
    modes_steps = jnp.asarray(
        np.zeros((plan.n_steps, plan.n_slots), np.int32))
    modes_steps = modes.reshape(-1)[
        jnp.asarray(np.maximum(plan.block_of_slot, 0))]
    g_y = jnp.asarray(plan.luma.gather_idx)
    n_y = jnp.asarray(plan.luma.no_refs)
    sc_y = jnp.asarray(plan.luma.scatter_idx)
    rec_y0 = jnp.zeros((h * w + 1,), jnp.int32)
    if chroma:
        g_c = jnp.asarray(plan.chroma.gather_idx)
        n_c = jnp.asarray(plan.chroma.no_refs)
        sc_c = jnp.asarray(plan.chroma.scatter_idx)
        rec_c0 = jnp.zeros(((h // 2) * (w // 2) + 1,), jnp.int32)
        sc2 = plan.chroma.size

    def step_fn(carry, xs):
        if chroma:
            ry, rcb, rcr = carry
            gy, ny, scy, ly, gc, nc, scc, lcb, lcr, m = xs
            ry = _plane_step_from_levels(ry, gy, ny, scy, ly, m, s, qp,
                                         bitdepth, True)
            rcb = _plane_step_from_levels(rcb, gc, nc, scc, lcb, m, sc2,
                                          qp_c, bitdepth, False)
            rcr = _plane_step_from_levels(rcr, gc, nc, scc, lcr, m, sc2,
                                          qp_c, bitdepth, False)
            return (ry, rcb, rcr), None
        (ry,) = carry
        gy, ny, scy, ly, m = xs
        ry = _plane_step_from_levels(ry, gy, ny, scy, ly, m, s, qp,
                                     bitdepth, True)
        return (ry,), None

    if chroma:
        xs = (g_y, n_y, sc_y, lv_y, g_c, n_c, sc_c, lv_cb, lv_cr,
              modes_steps)
        carry0 = (rec_y0, rec_c0, rec_c0)
    else:
        xs = (g_y, n_y, sc_y, lv_y, modes_steps)
        carry0 = (rec_y0,)
    carry, _ = jax.lax.scan(step_fn, carry0, xs)
    rec_y = carry[0][:-1].reshape(h, w)
    if chroma:
        return (rec_y, carry[1][:-1].reshape(h // 2, w // 2),
                carry[2][:-1].reshape(h // 2, w // 2))
    return (rec_y, None, None)


def _decode_recon_jit(plan, s, chroma, qp, qp_c, bitdepth, lv_y, lv_cb,
                      lv_cr, modes):
    # jit keyed on the static arguments via closure; plans are cached.
    return _decode_recon_impl(plan, s, chroma, qp, qp_c, bitdepth,
                              lv_y, lv_cb, lv_cr, modes)
