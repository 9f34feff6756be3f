"""Public encoder API — the analogue of the reference's kvz_api vtable
(src/kvazaar.h:545-699, src/kvazaar.c): open an encoder from a Config,
feed frames, receive Annex-B chunks + reconstruction + per-frame info.

v1 scope: all-intra.  The feed/drain pipeline shape (async device compute
overlapping host CABAC of the previous frame) is preserved so inter/GOP
frames slot in without API changes.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from kvazaar_tpu.config import Config
from kvazaar_tpu.constants import NAL_IDR_W_RADL, SLICE_I
from kvazaar_tpu.encoder.frame_encoder import IntraFrameEncoder, psnr


@dataclasses.dataclass
class FrameInfo:
    """Per-frame results (reference: kvz_frame_info,
    src/kvazaar.h:492-526)."""
    poc: int
    qp: int
    nal_type: int
    slice_type: int
    bits: int
    psnr_y: float
    psnr_u: float
    psnr_v: float


class Encoder:
    """Streaming encoder: data = encoder.encode(frame); flush at end."""

    def __init__(self, cfg: Config):
        self.cfg = cfg.validate()
        self._intra = IntraFrameEncoder(cfg)
        self._poc = 0
        self._wrote_headers = False
        self._rc = None
        self._rc_lambda = None
        self._prev_qp = cfg.qp
        self._encoders = {cfg.qp: self._intra}
        if cfg.bitrate > 0:
            from kvazaar_tpu.encoder.rate_control import RateController
            fps = cfg.framerate_num / max(cfg.framerate_denom, 1)
            self._rc = RateController(cfg.bitrate, fps, cfg.width,
                                      cfg.height)

    def _encoder_for_qp(self, qp: int) -> "IntraFrameEncoder":
        """Per-QP compiled encoder (QP is static in the device
        programs); DPB handed over on switch."""
        if qp not in self._encoders:
            import dataclasses as dc
            cfg2 = dc.replace(self.cfg, qp=qp)
            enc2 = IntraFrameEncoder(cfg2)
            # One PPS in the stream: slice_qp_delta is coded against the
            # base config's init QP, not this encoder's QP.
            enc2.params.qp = self.cfg.qp
            self._encoders[qp] = enc2
        enc = self._encoders[qp]
        enc._dpb = self._intra._dpb if self._intra is not enc else \
            enc._dpb
        return enc

    def headers(self) -> bytes:
        return self._intra.headers()

    def encode(self, y: np.ndarray, cb=None, cr=None):
        """Encode one frame; returns (annexb_bytes, FrameInfo, recon).

        GOP control (low-delay IPPP, reference's --period semantics):
        intra_period == 1 → all-intra; N > 1 → IDR every N frames;
        0 → only the first frame is intra."""
        chunks = b""
        if not self._wrote_headers:
            chunks += self.headers()
            self._wrote_headers = True
        period = self.cfg.intra_period
        is_intra = (self._poc == 0 or period == 1
                    or (period > 1 and self._poc % period == 0))
        if self._rc is not None:
            lam, qp = self._rc.frame_lambda_qp(is_intra)
            # Clamp QP swings (keeps quality stable and bounds the
            # number of distinct compiled programs).
            qp = min(max(qp, self._prev_qp - 3), self._prev_qp + 3)
            self._rc_lambda = lam
            enc = self._encoder_for_qp(qp)
            self._prev_qp = qp
        else:
            enc = self._intra
        if is_intra:
            res = enc.encode_frame(y, cb, cr)
        else:
            res = enc.encode_p_frame(y, cb, cr, poc=self._poc,
                                     ref_poc=self._poc - 1)
        if self._rc is not None:
            self._rc.update(len(res.nals) * 8, self._rc_lambda)
            self._intra = enc     # DPB owner for the next frame
        h, w = y.shape
        rec_y = res.recon_y[:h, :w]
        rec_cb = rec_cr = None
        p_u = p_v = 0.0
        if res.recon_cb is not None:
            rec_cb = res.recon_cb[:h // 2, :w // 2]
            rec_cr = res.recon_cr[:h // 2, :w // 2]
            p_u = psnr(rec_cb, np.asarray(cb, np.int32),
                       self.cfg.input_bitdepth)
            p_v = psnr(rec_cr, np.asarray(cr, np.int32),
                       self.cfg.input_bitdepth)
        info = FrameInfo(
            poc=self._poc, qp=enc.cfg.qp,
            nal_type=NAL_IDR_W_RADL if is_intra else 1,
            slice_type=SLICE_I if is_intra else 1,
            bits=len(res.nals) * 8,
            psnr_y=psnr(rec_y, np.asarray(y, np.int32),
                        self.cfg.input_bitdepth),
            psnr_u=p_u, psnr_v=p_v)
        chunks += res.nals
        self._poc += 1
        return chunks, info, (rec_y, rec_cb, rec_cr)

    def encode_many(self, frames):
        """Encode a batch of frames through one vmapped device program
        (all-intra frames are independent).  Returns a list of
        (chunks, FrameInfo, recon) like encode()."""
        results = self._intra.encode_frames(frames)
        out = []
        for (y, cb, cr), res in zip(frames, results):
            chunks = b""
            if not self._wrote_headers:
                chunks += self.headers()
                self._wrote_headers = True
            h, w = y.shape
            rec_y = res.recon_y[:h, :w]
            rec_cb = rec_cr = None
            p_u = p_v = 0.0
            if res.recon_cb is not None:
                rec_cb = res.recon_cb[:h // 2, :w // 2]
                rec_cr = res.recon_cr[:h // 2, :w // 2]
                p_u = psnr(rec_cb, np.asarray(cb, np.int32),
                           self.cfg.input_bitdepth)
                p_v = psnr(rec_cr, np.asarray(cr, np.int32),
                           self.cfg.input_bitdepth)
            info = FrameInfo(
                poc=self._poc, qp=self.cfg.qp,
                nal_type=NAL_IDR_W_RADL, slice_type=SLICE_I,
                bits=len(res.nals) * 8,
                psnr_y=psnr(rec_y, np.asarray(y, np.int32),
                            self.cfg.input_bitdepth),
                psnr_u=p_u, psnr_v=p_v)
            chunks += res.nals
            self._poc += 1
            out.append((chunks, info, (rec_y, rec_cb, rec_cr)))
        return out
