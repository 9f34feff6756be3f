"""Rate control: the R-lambda model (reference: src/rate_control.c,
which cites Li et al., doi 10.1109/TIP.2014.2336550).

Host-side per-frame math (tiny), mirroring the reference's
picture-level allocation for low-delay coding: a target bitrate is
spread over frames; lambda = alpha * (bits-per-pixel)^beta with
post-frame alpha/beta adaptation from the actually produced bits; QP is
derived from lambda (kvz's lambda_to_qp clip rules, src/rate_control.c
:170-176).  Per-LCU allocation arrives with a later round; the frame
level is what the driver's bitrate config exercises.
"""

from __future__ import annotations

import dataclasses
import math


@dataclasses.dataclass
class RateControlState:
    target_bps: float
    fps: float
    alpha: float = 3.2003
    beta: float = -1.367
    buffer_bits: float = 0.0     # virtual buffer (+ = overspent)
    frames_coded: int = 0

    @property
    def bits_per_frame(self) -> float:
        return self.target_bps / self.fps


class RateController:
    """Frame-level R-lambda controller (reference:
    pic_allocate_bits src/rate_control.c:142, update_parameters :50)."""

    MIN_QP = 4
    MAX_QP = 47

    def __init__(self, target_bps: float, fps: float, width: int,
                 height: int):
        self.s = RateControlState(target_bps, fps)
        self.pixels = width * height

    def frame_lambda_qp(self, is_intra: bool = False):
        """(lambda, qp) for the next frame."""
        s = self.s
        # Smooth the buffer debt over a 16-frame window.
        target = s.bits_per_frame - s.buffer_bits / 16.0
        target = max(target, s.bits_per_frame * 0.1)
        bpp = target / self.pixels
        lam = s.alpha * (bpp ** s.beta)
        # I-frames get a lambda discount (they feed later frames).
        if is_intra:
            lam *= 0.57
        lam = min(max(lam, 0.1), 10000.0)
        qp = int(round(4.2005 * math.log(lam) + 13.7122))
        qp = min(max(qp, self.MIN_QP), self.MAX_QP)
        return lam, qp

    def update(self, used_bits: int, lam: float) -> None:
        """Post-frame alpha/beta adaptation (reference
        update_parameters, src/rate_control.c:50)."""
        s = self.s
        bpp = used_bits / self.pixels
        computed_lambda = s.alpha * (bpp ** s.beta)
        ln_ratio = math.log(lam) - math.log(computed_lambda)
        alpha_new = s.alpha + 0.1 * ln_ratio * s.alpha
        s.alpha = min(max(alpha_new, 0.05), 20.0)
        beta_new = s.beta + 0.05 * ln_ratio * math.log(max(bpp, 1e-6))
        s.beta = min(max(beta_new, -3.0), -0.1)
        s.buffer_bits += used_bits - s.bits_per_frame
        s.frames_coded += 1
