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
            conf_win=(0, self.coded_w - cfg.width, 0,
                      self.coded_h - cfg.height),
        )
        self.qp_c = chroma_qp(cfg.qp)
        lam = qp_to_lambda(cfg.qp)
        self.lambda_satd = math.sqrt(lam)
        self._device_encode = jax.jit(self._device_encode_impl)

    def headers(self) -> bytes:
        return (write_vps(self.params) + write_sps(self.params)
                + write_pps(self.params))

    def _device_encode_impl(self, y, cb, cr):
        modes, _ = search_frame_modes(y, self.plan, self.lambda_satd,
                                      self.bitdepth)
        return reconstruct_frame(y, cb, cr, modes, self.plan,
                                 self.cfg.qp, self.qp_c, self.bitdepth), \
            modes

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
        modes = np.asarray(modes)

        fd = FrameData.empty(self.coded_w, self.coded_h, self.chroma)
        depth = 6 - int(math.log2(s))
        fd.depth8[:] = depth
        fd.mode4[:] = np.kron(modes,
                              np.ones((s // 4, s // 4), np.uint8))
        fd.coeff_y[:] = blocks_to_plane(np.asarray(lv_y), self.plan, s,
                                        self.coded_w, self.coded_h)
        if self.chroma:
            fd.coeff_cb[:] = blocks_to_plane(
                np.asarray(lv_cb), self.plan, s // 2,
                self.coded_w // 2, self.coded_h // 2)
            fd.coeff_cr[:] = blocks_to_plane(
                np.asarray(lv_cr), self.plan, s // 2,
                self.coded_w // 2, self.coded_h // 2)

        w = BitWriter()
        write_slice_header(w, self.params, SLICE_I, NAL_IDR_W_RADL,
                           self.cfg.qp)
        header_bytes = w.get_bytes()   # slice header ends byte-aligned
        if _NATIVE_OK:
            data = native.encode_slice_data_native(self.params, fd,
                                                   self.cfg.qp)
        else:
            cab = CabacEncoder(w)
            enc = SliceDataEncoder(self.params, fd,
                                   Contexts(SLICE_I, self.cfg.qp), cab)
            enc.encode_slice_data()
            w.align_zero()
            data = w.get_bytes()[len(header_bytes):]
        nal = nal_unit(header_bytes + data, NAL_IDR_W_RADL)
        return FrameResult(
            nals=nal, recon_y=np.asarray(rec_y),
            recon_cb=None if rec_cb is None else np.asarray(rec_cb),
            recon_cr=None if rec_cr is None else np.asarray(rec_cr),
            frame_data=fd, bits=len(nal) * 8)


def psnr(a: np.ndarray, b: np.ndarray, bitdepth: int = 8) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return 999.99
    peak = (1 << bitdepth) - 1
    return 10.0 * math.log10(peak * peak / mse)
