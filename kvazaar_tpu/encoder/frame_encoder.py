"""All-intra frame encoder: device search + wavefront recon + host CABAC.

Orchestration analogue of the reference's kvz_encode_one_frame
(src/encoderstate.c:1287) for I-frames: device programs produce modes,
levels, and reconstruction; the host serializes headers + slice data and
assembles Annex-B output.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from kvazaar_tpu.bitstream.bits import BitWriter, nal_unit
from kvazaar_tpu.bitstream.cabac import CabacEncoder
from kvazaar_tpu.bitstream.contexts import Contexts
from kvazaar_tpu.bitstream.headers import (StreamParams, write_pps,
                                           write_slice_header, write_sps,
                                           write_vps)
from kvazaar_tpu.bitstream import native
from kvazaar_tpu.bitstream.syntax import FrameData, SliceDataEncoder

_NATIVE_OK = native.available()
from kvazaar_tpu.config import Config
from kvazaar_tpu.constants import NAL_IDR_W_RADL, SLICE_I
from kvazaar_tpu.encoder.geometry import make_intra_plan
from kvazaar_tpu.ops.deblock import deblock_frame
from kvazaar_tpu.encoder.intra_recon import (blocks_to_plane,
                                             reconstruct_frame)
from kvazaar_tpu.encoder.intra_search import search_frame_modes

# H.265 Table 8-10: chroma QP mapping (4:2:0).
_CHROMA_QP_MAP = {30: 29, 31: 30, 32: 31, 33: 32, 34: 33, 35: 33, 36: 34,
                  37: 34, 38: 35, 39: 35, 40: 36, 41: 36, 42: 37, 43: 37}


def chroma_qp(qp: int) -> int:
    if qp < 30:
        return qp
    if qp > 43:
        return qp - 6
    return _CHROMA_QP_MAP[qp]


def qp_to_lambda(qp: int) -> float:
    """I-frame lambda, the reference's model (src/rate_control.c:176
    family): lambda = 0.57 * 2^((qp-12)/3)."""
    return 0.57 * 2.0 ** ((qp - 12) / 3.0)


def pad_to_multiple(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    h2 = -(-h // mult) * mult
    w2 = -(-w // mult) * mult
    if (h2, w2) == (h, w):
        return plane
    return np.pad(plane, ((0, h2 - h), (0, w2 - w)), mode="edge")


@dataclasses.dataclass
class FrameResult:
    nals: bytes              # slice NAL (headers are emitted separately)
    recon_y: np.ndarray      # coded-size reconstruction
    recon_cb: np.ndarray | None
    recon_cr: np.ndarray | None
    frame_data: FrameData
    bits: int


class IntraFrameEncoder:
    """Encodes I-frames for a fixed geometry/config."""

    def __init__(self, cfg: Config):
        import kvazaar_tpu
        kvazaar_tpu.enable_compile_cache()
        cfg.validate()
        self.cfg = cfg
        self.chroma = cfg.chroma_format == 420
        self.cu = cfg.intra_max_cu          # fixed CU size in v1
        self.bitdepth = cfg.input_bitdepth
        self.coded_w = -(-cfg.width // self.cu) * self.cu
        self.coded_h = -(-cfg.height // self.cu) * self.cu
        self.plan = make_intra_plan(self.coded_w, self.coded_h, self.cu,
                                    self.chroma)
        self.params = StreamParams(
            width=self.coded_w, height=self.coded_h,
            bitdepth=self.bitdepth,
            chroma_format_idc=1 if self.chroma else 0,
            qp=cfg.qp,
            deblock_enabled=cfg.deblock,
            wpp=cfg.wpp,
            conf_win=(0, self.coded_w - cfg.width, 0,
                      self.coded_h - cfg.height),
        )
        self.qp_c = chroma_qp(cfg.qp)
        lam = qp_to_lambda(cfg.qp)
        self.lambda_satd = math.sqrt(lam)
        self._device_encode = jax.jit(self._device_encode_impl)
        # Batched path: frames are independent in all-intra coding, so a
        # leading frame axis is the natural TPU throughput dimension (the
        # analogue of the reference's OWF frame pipelining,
        # src/encoderstate.c:790-806, recast as data parallelism).
        self._device_encode_batch = jax.jit(
            jax.vmap(self._device_encode_impl))
        self._host_pool = None

    def headers(self) -> bytes:
        return (write_vps(self.params) + write_sps(self.params)
                + write_pps(self.params))

    def _device_encode_impl(self, y, cb, cr):
        modes, _ = search_frame_modes(y, self.plan, self.lambda_satd,
                                      self.bitdepth)
        rec_y, lv_y, rec_cb, lv_cb, rec_cr, lv_cr = reconstruct_frame(
            y, cb, cr, modes, self.plan, self.cfg.qp, self.qp_c,
            self.bitdepth)
        if self.cfg.deblock:
            # In-loop filter as a batched post-pass: intra prediction
            # reads unfiltered samples (spec 8.4.4.2.1), so deblocking
            # never feeds the wavefront.
            rdt = rec_y.dtype
            dy, dcb, dcr = deblock_frame(rec_y, rec_cb, rec_cr,
                                         self.cfg.qp, self.cu,
                                         self.bitdepth)
            rec_y = dy.astype(rdt)
            if rec_cb is not None:
                rec_cb = dcb.astype(rdt)
                rec_cr = dcr.astype(rdt)
        return (rec_y, lv_y, rec_cb, lv_cb, rec_cr, lv_cr), modes

    def encode_frame(self, y: np.ndarray, cb=None, cr=None) -> FrameResult:
        """y: (H, W) source luma (uint8/uint16); cb/cr half size."""
        s = self.cu
        yp = pad_to_multiple(np.asarray(y, np.int32), s)
        cbp = crp = None
        if self.chroma:
            cbp = pad_to_multiple(np.asarray(cb, np.int32), s // 2)
            crp = pad_to_multiple(np.asarray(cr, np.int32), s // 2)
        (rec_y, lv_y, rec_cb, lv_cb, rec_cr, lv_cr), modes = \
            self._device_encode(yp, cbp, crp)
        return self._host_finalize(
            np.asarray(modes), np.asarray(lv_y),
            None if lv_cb is None else np.asarray(lv_cb),
            None if lv_cr is None else np.asarray(lv_cr),
            np.asarray(rec_y),
            None if rec_cb is None else np.asarray(rec_cb),
            None if rec_cr is None else np.asarray(rec_cr))


    def _host_finalize(self, modes, lv_y, lv_cb, lv_cr, rec_y, rec_cb,
                       rec_cr) -> FrameResult:
        s = self.cu
        fd = FrameData.empty(self.coded_w, self.coded_h, self.chroma)
        fd.depth8[:] = 6 - int(math.log2(s))
        fd.mode4[:] = np.kron(modes, np.ones((s // 4, s // 4), np.uint8))
        fd.coeff_y[:] = blocks_to_plane(lv_y, self.plan, s,
                                        self.coded_w, self.coded_h)
        if self.chroma:
            fd.coeff_cb[:] = blocks_to_plane(lv_cb, self.plan, s // 2,
                                             self.coded_w // 2,
                                             self.coded_h // 2)
            fd.coeff_cr[:] = blocks_to_plane(lv_cr, self.plan, s // 2,
                                             self.coded_w // 2,
                                             self.coded_h // 2)
        # Slice data first (entry-point offsets go into the header).
        sizes = []
        if _NATIVE_OK:
            if self.params.wpp:
                data, sizes = native.encode_slice_data_native_wpp(
                    self.params, fd, self.cfg.qp)
            else:
                data = native.encode_slice_data_native(self.params, fd,
                                                       self.cfg.qp)
        else:
            dw = BitWriter()
            enc = SliceDataEncoder(self.params, fd,
                                   Contexts(SLICE_I, self.cfg.qp),
                                   CabacEncoder(dw))
            if self.params.wpp:
                sizes = enc.encode_slice_data_wpp()
            else:
                enc.encode_slice_data()
                dw.align_zero()
            data = dw.get_bytes()
        w = BitWriter()
        write_slice_header(w, self.params, SLICE_I, NAL_IDR_W_RADL,
                           self.cfg.qp,
                           num_entry_points=max(len(sizes) - 1, 0),
                           entry_point_offsets=sizes[:-1])
        nal = nal_unit(w.get_bytes() + data, NAL_IDR_W_RADL)
        return FrameResult(nals=nal, recon_y=rec_y, recon_cb=rec_cb,
                           recon_cr=rec_cr, frame_data=fd,
                           bits=len(nal) * 8)

    def encode_frames(self, frames) -> list[FrameResult]:
        """Encode a batch of frames through one vmapped device program;
        host serialization fans out over a thread pool (the native CABAC
        releases the GIL)."""
        import concurrent.futures as cf
        s = self.cu
        ys = np.stack([pad_to_multiple(np.asarray(f[0], np.int32), s)
                       for f in frames])
        cbs = crs = None
        if self.chroma:
            cbs = np.stack([pad_to_multiple(np.asarray(f[1], np.int32),
                                            s // 2) for f in frames])
            crs = np.stack([pad_to_multiple(np.asarray(f[2], np.int32),
                                            s // 2) for f in frames])
        (rec_y, lv_y, rec_cb, lv_cb, rec_cr, lv_cr), modes = \
            self._device_encode_batch(ys, cbs, crs)
        modes = np.asarray(modes)
        rec_y = np.asarray(rec_y)
        lv_y = np.asarray(lv_y)
        if self.chroma:
            rec_cb, rec_cr = np.asarray(rec_cb), np.asarray(rec_cr)
            lv_cb, lv_cr = np.asarray(lv_cb), np.asarray(lv_cr)
        if self._host_pool is None:
            self._host_pool = cf.ThreadPoolExecutor(max_workers=4)
        futs = []
        for i in range(len(frames)):
            futs.append(self._host_pool.submit(
                self._host_finalize, modes[i], lv_y[i],
                lv_cb[i] if self.chroma else None,
                lv_cr[i] if self.chroma else None,
                rec_y[i],
                rec_cb[i] if self.chroma else None,
                rec_cr[i] if self.chroma else None))
        return [f.result() for f in futs]


def psnr(a: np.ndarray, b: np.ndarray, bitdepth: int = 8) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return 999.99
    peak = (1 << bitdepth) - 1
    return 10.0 * math.log10(peak * peak / mse)
