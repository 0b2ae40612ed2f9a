"""Command-line interface — the framework's replacement for the reference
GUI (SURVEY.md §2.6: the Qt app's three tabs map to the embed/extract/detect
subcommands; the video modules map to the video-* subcommands).

Every flag maps 1:1 onto a reference kwarg (alpha, kfrac, color, password,
thresh, frame-interval, font-size — ref: app_dct_svd_single.py:112-114,291,
video_dct_svd.pyc l.57) plus the TPU-specific ``--method`` selector.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from dctsvd_tpu.utils.config import (
    ALPHA_GUI_DEFAULT, ALPHA_VIDEO_DEFAULT,
    FONT_SIZE_DEFAULT, FRAME_INTERVAL_DEFAULT, K_FRAC_DEFAULT)


def _default_meta(out_path: str) -> str:
    """<out base>_meta.npz next to the output. os.path.splitext, not
    rsplit('.', 1): a dotted DIRECTORY ('results.v2/stego') must not be
    truncated into a sibling path."""
    return os.path.splitext(out_path)[0] + "_meta.npz"


def _add_common_embed(p):
    p.add_argument("--alpha", type=float, default=ALPHA_GUI_DEFAULT,
                   help="embedding strength (GUI default 0.12; "
                        "recommended 0.10-0.18 gray, 0.15-0.22 color)")
    p.add_argument("--kfrac", type=float, default=K_FRAC_DEFAULT)
    p.add_argument("--password", required=False)
    p.add_argument("--method", choices=["full", "blocked"], default="full",
                   help="full = reference-parity whole-frame DCT+SVD; "
                        "blocked = TPU throughput path (8x8 batched Jacobi)")


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="dctsvd-tpu",
        description="TPU-native DCT-SVD image/video watermarking")
    ap.add_argument("--profile", metavar="DIR", default=None,
                    help="write a jax.profiler trace of the command to DIR "
                         "(view with Perfetto/TensorBoard) and log stage "
                         "wall times")
    ap.add_argument("--log-level", default="INFO",
                    choices=["DEBUG", "INFO", "WARNING", "ERROR"])
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("embed", help="embed an image watermark")
    p.add_argument("cover")
    p.add_argument("watermark")
    p.add_argument("--out", default="stego.png")
    p.add_argument("--meta", default=None)
    p.add_argument("--color", action="store_true",
                   help="per-BGR-channel embed instead of Y-channel")
    _add_common_embed(p)

    p = sub.add_parser("extract", help="extract the watermark (password)")
    p.add_argument("stego")
    p.add_argument("meta")
    p.add_argument("--out", default="wm.png")
    p.add_argument("--password", required=False, default=None,
                   help="required for password-protected metas; omit for "
                        "open-mode metas")
    p.add_argument("--no-normalize", action="store_true")
    p.add_argument("--no-enhance", action="store_true",
                   help="skip the NLM->CLAHE->unsharp chain")

    p = sub.add_parser("detect", help="no-password NC detection")
    p.add_argument("stego")
    p.add_argument("meta")
    p.add_argument("--thresh", type=float, default=None,
                   help="decision threshold (default: 0.6 for parity "
                   "metas — the reference's — and the ROC-backed 0.30 "
                   "for blocked metas)")
    p.add_argument("--resync", action="store_true",
                   help="blocked metas: if the aligned score misses, "
                   "search candidate translations (the 8x8 block grid "
                   "makes an unaided blocked detect collapse under even "
                   "a 1 px shift; ~225 batched detects, one dispatch "
                   "per chunk)")
    p.add_argument("--resync-rot", type=float, default=0.0,
                   metavar="DEG",
                   help="with --resync: also search attacker rotations "
                   "within +-DEG degrees (counter-rotation resampling; "
                   "each candidate angle re-runs the shift scan, so "
                   "cost grows with DEG / --resync-rot-step)")
    p.add_argument("--resync-rot-step", type=float, default=0.05,
                   metavar="DEG",
                   help="angle grid resolution (default 0.05 deg — a "
                   "residual angle error dt misaligns a block at radius "
                   "r by ~r*dt px, and the grid tolerates <1 px)")

    p = sub.add_parser("embed-payload", help="embed text/JSON payload")
    p.add_argument("cover")
    p.add_argument("payload", help="text, or @file.json for JSON")
    p.add_argument("--out", default="stego.png")
    p.add_argument("--meta", default=None)
    p.add_argument("--repeat", type=int, default=8)
    _add_common_embed(p)

    p = sub.add_parser("extract-payload")
    p.add_argument("stego")
    p.add_argument("meta")
    p.add_argument("--password")

    p = sub.add_parser("video-embed", help="per-frame video embed")
    p.add_argument("host")
    p.add_argument("--watermark", help="watermark image path")
    p.add_argument("--text", help="text watermark instead of an image")
    p.add_argument("--out", default="marked.mp4")
    p.add_argument("--meta", default=None)
    p.add_argument("--alpha", type=float, default=ALPHA_VIDEO_DEFAULT)
    p.add_argument("--frame-interval", type=int,
                   default=FRAME_INTERVAL_DEFAULT)
    p.add_argument("--font-size", type=int, default=FONT_SIZE_DEFAULT)
    p.add_argument("--color", action="store_true")
    p.add_argument("--audio", action="store_true",
                   help="preserve audio via ffmpeg (graceful fallback); "
                        "implies the per-channel color embed (the "
                        "reference only ships color with-audio variants)")
    p.add_argument("--scheme", choices=["full", "blocked"], default="full",
                   help="full = reference-parity whole-frame SVD; blocked "
                        "= fused 8x8 throughput path")
    p.add_argument("--resume", action="store_true",
                   help="checkpointed segment writing; rerun with the same "
                        "args to continue an interrupted embed")

    p = sub.add_parser("video-extract")
    p.add_argument("video")
    p.add_argument("meta")
    p.add_argument("--out", default="wm.png")

    p = sub.add_parser("video-detect")
    p.add_argument("video")
    p.add_argument("--sample-rate", type=int, default=30)

    p = sub.add_parser("video-info")
    p.add_argument("video")

    return ap


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import logging

    from dctsvd_tpu.utils import profiling

    profiling.setup_logging(getattr(logging, args.log_level))
    with profiling.trace(args.profile):
        return _run(args)


def _run(args) -> int:
    if args.cmd == "embed":
        from dctsvd_tpu import api
        meta = args.meta or _default_meta(args.out)
        out, meta_p, ps, ss = api.embed(
            args.cover, args.watermark, args.out, meta, alpha=args.alpha,
            color=args.color, password=args.password, kfrac=args.kfrac,
            method=args.method)
        print(json.dumps({"stego": out, "meta": meta_p,
                          "psnr": round(ps, 2), "ssim": round(ss, 4)}))
    elif args.cmd == "extract":
        from dctsvd_tpu import api
        out = api.extract(args.stego, args.meta, args.out,
                          password=args.password,
                          normalize=not args.no_normalize,
                          enhance=not args.no_enhance)
        print(json.dumps({"watermark": out}))
    elif args.cmd == "detect":
        from dctsvd_tpu import api
        found, score = api.detect(args.stego, args.meta, thresh=args.thresh,
                                  resync=args.resync,
                                  rot_range=args.resync_rot,
                                  rot_step=args.resync_rot_step)
        print(json.dumps({"watermarked": found, "score": round(score, 4)}))
        return 0 if found else 1
    elif args.cmd == "embed-payload":
        from dctsvd_tpu import api
        payload = args.payload
        if payload.startswith("@"):
            with open(payload[1:]) as f:
                payload = json.load(f)
        meta = args.meta or _default_meta(args.out)
        out, meta_p, ps, ss = api.embed_payload(
            args.cover, payload, args.out, meta, alpha=args.alpha,
            password=args.password, kfrac=args.kfrac, repeat=args.repeat,
            method=args.method)
        print(json.dumps({"stego": out, "meta": meta_p,
                          "psnr": round(ps, 2)}))
    elif args.cmd == "extract-payload":
        from dctsvd_tpu import api
        got = api.extract_payload(args.stego, args.meta,
                                  password=args.password)
        print(json.dumps({"payload": got}))
    elif args.cmd == "video-embed":
        from dctsvd_tpu.models import video as m_video
        # validate the mode up front: cv2.imread(None) deep in the frame
        # loop is an opaque crash, and silently preferring one of two
        # given watermarks embeds something the user did not ask for
        if bool(args.watermark) == bool(args.text):
            print("error: video-embed needs exactly one of --watermark "
                  "or --text", file=sys.stderr)
            return 2
        meta = args.meta or _default_meta(args.out)
        kw = dict(alpha=args.alpha, frame_interval=args.frame_interval,
                  scheme=args.scheme, resume=args.resume)
        if args.text and args.audio:
            res = m_video.embed_text_watermark_video_color_with_audio(
                args.host, args.text, args.out, meta,
                font_size=args.font_size, **kw)
        elif args.audio:
            res = m_video.embed_watermark_video_color_with_audio(
                args.host, args.watermark, args.out, meta, **kw)
        elif args.text and args.color:
            res = m_video.embed_text_watermark_video_color(
                args.host, args.text, args.out, meta,
                font_size=args.font_size, **kw)
        elif args.text:
            res = m_video.embed_text_watermark_video(
                args.host, args.text, args.out, meta,
                font_size=args.font_size, **kw)
        elif args.color:
            res = m_video.embed_watermark_video_color(
                args.host, args.watermark, args.out, meta, **kw)
        else:
            res = m_video.embed_watermark_video(
                args.host, args.watermark, args.out, meta, **kw)
        print(json.dumps({"video": res[0], "meta": res[1]}))
    elif args.cmd == "video-extract":
        from dctsvd_tpu.models import video as m_video
        meta = m_video.extract_text_watermark_video(args.video, args.meta,
                                                    args.out)
        print(json.dumps({"watermark": args.out, "text": meta}))
    elif args.cmd == "video-detect":
        from dctsvd_tpu.models import video as m_video
        stats = m_video.detect_watermark_video(
            args.video, frame_sample_rate=args.sample_rate)
        stats.pop("frame_statistics", None)
        print(json.dumps(stats))
    elif args.cmd == "video-info":
        from dctsvd_tpu.io import video_io
        print(json.dumps(video_io.get_video_info(args.video)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
