"""Pre-populate the persistent XLA compile cache with every program
bench.py touches, so a fresh-process bench run measures steady state
instead of remote compiles (VERDICT r4 item 2).

Runs each bench operating point for just enough frames to trigger all
content-dependent compiles (the var recon schedule is a single static
depth, so one GOP covers it).  Safe to re-run: warm programs load from
the cache in ~ms.

Usage: python tools/warm_cache.py [section ...]
Sections: headline ippp bd gop8 veryslow intra1080 ippp1080 (default:
all).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import kvazaar_tpu  # noqa: E402  (sets cache env before jax import)
kvazaar_tpu.enable_compile_cache()

import bench  # noqa: E402
from kvazaar_tpu.api import Encoder  # noqa: E402
from kvazaar_tpu.config import Config, config_from_preset  # noqa: E402


def _drain(enc, frames, n):
    for i in range(n):
        for _ in enc.encode(*frames[i % len(frames)]):
            pass
    for _ in enc.flush():
        pass


def warm_headline():
    frames = bench.synth_clip_natural(8, 832, 480)
    from kvazaar_tpu.encoder.frame_encoder import IntraFrameEncoder
    cfg = Config(width=832, height=480, qp=22, intra_max_cu=16,
                 intra_min_cu=16, intra_period=1)
    ife = IntraFrameEncoder(cfg)
    ife.encode_frames(frames)
    # conformance section decodes one stream — pure host, no compile.


def warm_ippp():
    frames = bench.synth_clip_natural(4, 832, 480)
    cfg = Config(width=832, height=480, qp=22, intra_period=0,
                 intra_max_cu=16, intra_min_cu=16)
    _drain(Encoder(cfg), frames, 4)


def warm_bd(mode):
    frames = bench.synth_clip_natural(4, 416, 240, seed=1)
    over = (dict(intra_period=0, gop_len=1, ref_frames=1)
            if mode == "ippp" else dict(intra_period=0))
    cfg = config_from_preset("medium", width=416, height=240, qp=22,
                             **over)
    enc = Encoder(cfg)
    _drain(enc, frames, 9 if mode == "gop8" else 4)
    enc.set_base_qp(27)     # QP is traced data: no recompile expected,
    enc.reset_stream()      # but exercise the switch path anyway
    _drain(enc, frames, 9 if mode == "gop8" else 2)


def warm_bd_intra():
    frames = bench.synth_clip_natural(2, 416, 240, seed=1)
    cfg = config_from_preset("medium", width=416, height=240, qp=22,
                             intra_period=1)
    _drain(Encoder(cfg), frames, 2)


def warm_veryslow():
    frames = bench.synth_clip_natural(8, 1920, 1080, seed=4)
    cfg = config_from_preset("veryslow", width=1920, height=1080,
                             qp=27)
    enc = Encoder(cfg)
    _drain(enc, frames, 9)      # IDR + one full GOP-8 + flush tail


def warm_intra1080():
    frames = bench.synth_clip_natural(4, 1920, 1080, seed=2)
    from kvazaar_tpu.encoder.frame_encoder import IntraFrameEncoder
    cfg = Config(width=1920, height=1080, qp=22, intra_max_cu=16,
                 intra_min_cu=16, intra_period=1)
    IntraFrameEncoder(cfg).encode_frames(frames)


def warm_ippp1080():
    frames = bench.synth_clip_natural(4, 1920, 1080, seed=2)
    cfg = Config(width=1920, height=1080, qp=22, intra_period=0,
                 intra_max_cu=16, intra_min_cu=16)
    _drain(Encoder(cfg), frames, 4)


SECTIONS = {
    "headline": warm_headline,
    "ippp": warm_ippp,
    "bd": lambda: warm_bd("ippp"),
    "gop8": lambda: warm_bd("gop8"),
    "bd_intra": warm_bd_intra,
    "veryslow": warm_veryslow,
    "intra1080": warm_intra1080,
    "ippp1080": warm_ippp1080,
}


def main():
    names = sys.argv[1:] or list(SECTIONS)
    for name in names:
        t0 = time.time()
        try:
            SECTIONS[name]()
            print(f"[warm] {name}: {time.time() - t0:.1f}s",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"[warm] {name} FAILED: {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
