"""Command-line front end (reference: src/encmain.c, src/cli.c).

Usage:
    python -m kvazaar_tpu -i in.yuv --input-res 832x480 -o out.hevc \
        [--qp 22] [--frames N] [--preset ultrafast] [--debug rec.yuv]
"""

from __future__ import annotations

import argparse
import sys
import time

from kvazaar_tpu.config import Config, config_from_preset
from kvazaar_tpu.io.yuv import read_frames, write_frame


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="kvazaar_tpu")
    ap.add_argument("-i", "--input", required=True)
    ap.add_argument("--input-res", required=True,
                    help="WxH of the raw input")
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument("-q", "--qp", type=int, default=22)
    ap.add_argument("-n", "--frames", type=int, default=None)
    ap.add_argument("--preset", default="ultrafast")
    ap.add_argument("--input-bitdepth", type=int, default=8)
    ap.add_argument("--input-format", default="P420",
                    choices=["P400", "P420"])
    ap.add_argument("--period", type=int, default=1,
                    help="intra period: 1=all-intra, N=IDR every N, "
                         "0=first frame only (low-delay IPPP)")
    ap.add_argument("--gop", type=int, default=0, choices=[0, 4, 8],
                    help="hierarchical B-pyramid GOP length "
                         "(requires --period 0)")
    ap.add_argument("--bitrate", type=int, default=0,
                    help="target bits/s (0 = fixed QP)")
    ap.add_argument("--tiles", default=None, metavar="WxH",
                    help="uniform tile grid, e.g. 3x3 (implies "
                         "--no-wpp; independent CABAC substreams "
                         "with entry points)")
    ap.add_argument("--hash", default="none",
                    choices=["none", "md5", "checksum"],
                    help="decoded-picture-hash SEI per frame")
    ap.add_argument("--debug", default=None,
                    help="write reconstruction YUV for comparison "
                         "(reference --debug)")
    ap.add_argument("--no-psnr", action="store_true")
    ap.add_argument("--set", action="append", default=[],
                    metavar="KEY=VALUE",
                    help="set any config option by name (the string-"
                         "keyed parser of the reference's "
                         "kvz_config_parse, src/cfg.c:358); e.g. "
                         "--set intra-max-cu=4 --set sao=1")
    return ap


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)
    w, h = (int(v) for v in args.input_res.split("x"))
    cfg = config_from_preset(args.preset, width=w, height=h, qp=args.qp,
                             input_bitdepth=args.input_bitdepth,
                             intra_period=args.period,
                             gop_len=args.gop,
                             bitrate=args.bitrate,
                             hash=args.hash,
                             chroma_format=420
                             if args.input_format == "P420" else 400)
    if args.tiles:
        cfg.set("tiles", args.tiles)
        cfg.wpp = False
    for kv in args.set:
        key, _, value = kv.partition("=")
        cfg.set(key, value)
    from kvazaar_tpu.api import Encoder   # deferred: jax import cost
    enc = Encoder(cfg)

    chroma = cfg.chroma_format == 420
    t0 = time.time()
    n = 0
    total_bits = 0
    psnr_acc = [0.0, 0.0, 0.0]
    dbg = open(args.debug, "wb") if args.debug else None
    with open(args.output, "wb") as out:
        dbg_pend = {}
        dbg_next = [0]

        def handle(results):
            nonlocal total_bits, n
            for chunks, info, rec in results:
                out.write(chunks)
                total_bits += info.bits
                psnr_acc[0] += info.psnr_y
                psnr_acc[1] += info.psnr_u
                psnr_acc[2] += info.psnr_v
                if dbg:
                    # --debug writes in DISPLAY order despite GOP
                    # reordering.
                    dbg_pend[info.poc] = rec
                    while dbg_next[0] in dbg_pend:
                        r = dbg_pend.pop(dbg_next[0])
                        write_frame(dbg, r[0], r[1], r[2],
                                    args.input_bitdepth)
                        dbg_next[0] += 1
                if not args.no_psnr:
                    print(f"POC {info.poc} QP {info.qp} "
                          f"({total_bits // 8} bytes total) "
                          f"PSNR Y {info.psnr_y:.4f} "
                          f"U {info.psnr_u:.4f} "
                          f"V {info.psnr_v:.4f}", file=sys.stderr)
                n += 1

        src = read_frames(args.input, w, h, args.input_bitdepth,
                          chroma, args.frames)
        for result in enc.encode_stream(src,
                                        need_recon=dbg is not None):
            handle([result])
    if dbg:
        dbg.close()
    dt = time.time() - t0
    if n:
        print(f" Processed {n} frames, {total_bits} bits "
              f"AVG PSNR Y {psnr_acc[0] / n:.4f} U {psnr_acc[1] / n:.4f} "
              f"V {psnr_acc[2] / n:.4f}", file=sys.stderr)
        print(f" Total time: {dt:.3f} s, FPS: {n / dt:.2f}",
              file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
