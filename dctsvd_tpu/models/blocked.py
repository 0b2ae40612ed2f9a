"""Blocked (8×8) DCT–SVD watermarking — the TPU throughput path.

A scheme *variant* designed for the hardware rather than translated from the
reference (SURVEY.md §7 design stance, BASELINE.json north_star): the frame
becomes a ``[N, 8, 8]`` block tensor, the block DCT is one einsum against the
Kronecker DCT basis (MXU) straight off the free ``[H/8, 8, W/8, 8]`` view,
and the per-block SVD is the batched one-sided Jacobi kernel (ops/svd.py)
instead of a full-frame LAPACK factorization — the op that is >90 % of the
reference's runtime (SURVEY.md §3.1). Same security layer (keyed permutation
+ HMAC meta) and the same additive singular-value spread rule per block, so
the scheme keeps the reference's embedding semantics at block granularity.

Keyed permutation: the reference shuffles all H·W watermark pixels
(ref: app_dct_svd_single.py:66-80); that full-plane random gather cost more
than the SVD itself on hardware. The blocked scheme instead shuffles the
N block slots plus one shared intra-block pixel shuffle, both drawn from the
same password-derived PCG64 stream (utils/crypto.block_permutation_indices).
The intra-block unshuffle at extraction folds into the inverse-DCT matmul
for free (ops/dct.idct2_blocks_to_plane row_perm).

The watermark-side factors (permute → DCT → SVD) do not depend on the cover,
so serving pipelines compute a :class:`PreparedWatermark` ONCE and stream
frames through :func:`embed_gray_prepared` / :func:`embed_color_prepared` —
the same hoisting the reference's video path does with its single up-front
``svd(_dct2(wm))`` (ref: video_dct_svd.pyc l.84-101).

Extraction/detection parity is defined against this embedder (its own meta
``mode`` tags 'blocked-gray'/'blocked-color'); reference-meta compatibility
is the parity path's job (models/image.py).

All graphs take an optional leading batch dim (frames), which is also the
axis the distributed layer shards across chips (parallel/).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dctsvd_tpu.io import image_io, meta as metaio
from dctsvd_tpu.ops import color, dct, metrics, permute, svd
from dctsvd_tpu.utils import crypto
from dctsvd_tpu.utils.xfer import to_numpy
from dctsvd_tpu.utils.config import BLOCK, K_FRAC_DEFAULT


def k_of_block(kfrac: float, b: int = BLOCK) -> int:
    """Per-block truncation: K = max(1, int(kfrac · b)) leading singular
    values of each 8×8 block carry the mark (kfrac=0.6 -> 4 of 8)."""
    return max(1, int(kfrac * b))


def n_blocks_of(h: int, w: int, b: int = BLOCK) -> int:
    """Block count after reflect-padding to a multiple of b."""
    return (-(-h // b)) * (-(-w // b))


def _pad_to_blocks(x: jax.Array, b: int = BLOCK) -> Tuple[jax.Array, int, int]:
    h, w = x.shape[-2], x.shape[-1]
    ph = (-h) % b
    pw = (-w) % b
    if ph or pw:
        cfg = [(0, 0)] * (x.ndim - 2) + [(0, ph), (0, pw)]
        x = jnp.pad(x, cfg, mode="reflect")
    return x, h + ph, w + pw


def _pad_frames_to_blocks(x: jax.Array,
                          b: int = BLOCK) -> Tuple[jax.Array, int, int]:
    """Channels-last analog of _pad_to_blocks: pads H, W at axes -3/-2."""
    h, w = x.shape[-3], x.shape[-2]
    ph = (-h) % b
    pw = (-w) % b
    if ph or pw:
        cfg = ([(0, 0)] * (x.ndim - 3) + [(0, ph), (0, pw), (0, 0)])
        x = jnp.pad(x, cfg, mode="reflect")
    return x, h + ph, w + pw


# Fused-kernel sweep count for the serving path. End-to-end quality (stego
# PSNR, extraction NC, detect score, JPEG-q50/noise/crop robustness) was
# measured IDENTICAL to 4 decimal places at sweeps 3/4/5 on 1080p hardware
# (round-1 sweep study), and within 0.006 NC / 0.006 detect at sweeps 2
# (4K robustness sweep, rounds 2 and 3): embed and extract run the SAME
# schedule on nearby matrices, so the residual convergence bias cancels in
# (s_cw - sc) — the embed-time count rides the meta (embed_sweeps_used)
# precisely so both sides replay it. The kernel-default 4 is kept for
# cross-path workflows (ops/wm_pallas.py); serving takes the tier
# schedule below (s1.25 since round 5, s2 in rounds 2-4). The
# round-2 A/B that measured s2 == s3 in fps ran when the step was
# glue-bound; with the round-3 view-transpose work the kernels dominate
# again and s2 measures 492 vs s3's 393 fps on 1080p color (the marginal
# sweep is ~8.3 ms per 96-plane pass — tools/exp_sweepcost.py).
# Re-validated each round by the 4K robustness bench (bench.py --config
# robustness), which runs the fused path on hardware. DCTSVD_FUSED_SWEEPS
# overrides for sweep-count quality/perf studies.
#
# DEFAULT TIER s1.25 (one full 28-pair cyclic sweep + the first 7 pairs
# of a second) — promoted from s2 after the round-5 hardware tier study
# (tools/round5_tiers.sh, v5e 2026-08-19, one process per tier, full 4K
# robustness sweep incl. the new JPEG-q30 row, α 0.10–0.22):
#
#   tier   e+e fps  s+score   min detect  min NC   min SSIM  noise SSIM@α.13
#   s0.5     818      880       0.061     -0.215   -0.214    (disqualified)
#   s0.75    747      932       0.792      0.804    0.685    0.725
#   s1       681      828       0.789      0.809    0.797    0.857
#   s1.25    627      750       0.784      0.809    0.803    0.880
#   s1.75    544      637       (not re-run; bracketed by s1.25/s2)
#   s2       500      583       0.800      0.810    0.802    0.886
#
# s1.25 matches s2's quality floor on every table aggregate (min detect
# 0.784 vs 0.800 — both far above the 0.30 threshold; min extraction NC
# 0.809 vs 0.810; min SSIM 0.803 vs 0.802) and is within 0.006 SSIM of
# s2 per-cell at every α ≥ 0.13; the only cell where s2 still wins
# meaningfully is noise-σ5 extraction SSIM at the α=0.10 extreme (0.848
# vs 0.895). That buys +25 % throughput (627 vs 500 fps 1080p color,
# batch 128). s1 keeps a further +9 % for deployments that accept
# ~0.03 noise-extraction SSIM at the default α; s0.75 is detect-grade
# only (extraction under noise degrades visibly); s0.5 fails robustness
# outright (resize50 polarity inversion returns, detect min 0.06) —
# never ship it. s2 remains selectable as the max-quality tier.
# Extract/detect replay the embed-time schedule from the meta either
# way, so mixed-tier archives keep exact (s_cw − sc) cancellation.
import os as _os


def _parse_sweeps_env(raw: str):
    """DCTSVD_FUSED_SWEEPS accepts fractional tiers ('1.5' = one full
    28-pair cyclic sweep + the first 14 pairs of a second — the s1<->s2
    perf/quality interpolation, ops/wm_pallas._schedule). The value is
    quantized onto the pair grid HERE, at parse time, so the schedule the
    kernels run, the (sweeps, sweeps_xpairs) pair recorded in the meta,
    and the digest's pair count are all derived from the same exact
    number — a raw float flowing through would invite the silent
    embed/extract schedule mismatch the sweep comments warn about.
    Integral inputs stay ints (jit cache keys / metas byte-identical)."""
    from dctsvd_tpu.ops import wm_pallas
    return wm_pallas.sched_join(*wm_pallas.sched_split(float(raw)))


_FUSED_SWEEPS = _parse_sweeps_env(
    _os.environ.get("DCTSVD_FUSED_SWEEPS", "1.25"))


def embed_sweeps_used():
    """The Jacobi sweep schedule the NEXT embed will run: the fused-kernel
    sweep value (int, or a pair-grid float for fractional tiers), or 0 for
    the XLA fallback (converged jacobi_svd). Recorded in the meta — as the
    integer pair (sweeps, sweeps_xpairs) via embed_schedule_used — so
    extract/detect replay the same schedule: the low-sweep quality claim
    relies on the convergence residual cancelling in (s_cw − sc), which
    breaks silently if the two sides run different schedules (e.g. embed
    on TPU, extract via the CPU fallback)."""
    return _FUSED_SWEEPS if _use_fused() else 0


def embed_schedule_used() -> tuple:
    """embed_sweeps_used, split into the two integers that serialize it:
    (full sweeps, extra pairs 0..27). (0, 0) = XLA/converged embed."""
    from dctsvd_tpu.ops import wm_pallas
    v = embed_sweeps_used()
    return (0, 0) if not v else wm_pallas.sched_split(v)


def replay_sweeps(meta_sweeps):
    """FUSED-path sweep count for a meta embedded with ``meta_sweeps``
    (0 = converged/XLA embed -> the near-converged kernel default, whose
    spectra sit at the f32 floor). Callers pass ``meta.sweeps`` straight
    to extract/detect; _plane_spectrum applies this mapping on the fused
    branch and runs the exact pixel-domain replay (>0) or the converged
    DCT-domain SVD (0) on the XLA fallback."""
    from dctsvd_tpu.ops import wm_pallas
    return meta_sweeps if meta_sweeps > 0 else wm_pallas._SWEEPS_DEFAULT


_USE_FUSED_MEMO: list = []


def _use_fused() -> bool:
    """Fused Pallas kernels (ops/wm_pallas.py) on TPU backends; the XLA
    composition elsewhere (CPU tests, interpret-free portability).

    Decided ONCE per process: jit traces bake the branch in at first
    trace and replay it from the executable cache regardless of later
    env flips, so re-reading the env here could disagree with what the
    cached executables actually run — embed_sweeps_used() would then
    record the wrong schedule in the meta (the silent un-cancelled
    residual failure the sweep comments describe). Flip DCTSVD_FUSED
    only via a fresh process."""
    if not _USE_FUSED_MEMO:
        import os
        env = os.environ.get("DCTSVD_FUSED", "").strip().lower()
        if env in ("0", "false", "no", "off"):
            _USE_FUSED_MEMO.append(False)
        elif env in ("1", "true", "yes", "on"):
            _USE_FUSED_MEMO.append(True)
        else:
            _USE_FUSED_MEMO.append(
                jax.default_backend() in ("tpu", "axon"))
    return _USE_FUSED_MEMO[0]


def _plane_to_svd_blocks(plane: jax.Array, compute_uv: bool = True):
    """float plane [..., H, W] -> per-block DCT SVD (no blockify transpose)."""
    padded, hp, wp = _pad_to_blocks(plane)
    coefs = dct.dct2_plane_blocks(padded)
    return svd.jacobi_svd(coefs, compute_uv=compute_uv), (hp, wp)


def _plane_spectrum(plane: jax.Array,
                    sweeps: Optional[int] = None) -> jax.Array:
    """[..., H, W] plane (u8 or float) -> per-block singular values
    [..., N, 8].  u8 input widens inside the fused view transpose (free).

    ``sweeps`` is the embed-time schedule to REPLAY (``meta.sweeps``:
    >0 = that many fused-kernel cyclic sweeps, 0 = the meta was embedded
    by the converged XLA path) — None means "current serving default".
    On the fused path 0 maps to the near-converged kernel default
    (replay_sweeps).  On the XLA fallback a >0 count replays the fused
    schedule EXACTLY: the fused kernels run one-sided Jacobi on PIXEL
    blocks (module docstring) in the same cyclic pair order and
    Rutishauser updates as svd._jacobi_svd_xla, so running that on the
    same pixel blocks reproduces the partial-convergence residual up to
    rounding and (s_cw − sc) keeps cancelling across backends — a TPU
    fused embed extracted on a CPU host previously ran the converged
    DCT-domain SVD here, silently dropping the schedule and leaving the
    un-cancelled residual this module's sweep comments warn about
    (pinned by tests/test_wm_pallas.py::test_spectrum_replay_cross_path).
    """
    padded, _, _ = _pad_to_blocks(plane)
    if _use_fused():
        from dctsvd_tpu.ops import wm_pallas
        return wm_pallas.spectrum_plane_blocks.__wrapped__(
            padded,
            sweeps=(_FUSED_SWEEPS if sweeps is None
                    else replay_sweeps(sweeps)))
    if sweeps:
        blocks = dct.blockify(padded.astype(jnp.float32))
        return svd.jacobi_svd(blocks, sweeps=sweeps, compute_uv=False)
    coefs = dct.dct2_plane_blocks(padded.astype(jnp.float32))
    return svd.jacobi_svd(coefs, compute_uv=False)


def _scaled_sws(sw: jax.Array, alpha: jax.Array,
                mask: jax.Array) -> jax.Array:
    """α·mask·Sw collapsed to the [P, N, 8] layout the fused kernels take
    ([N, 8] gray gains a leading plane axis; deeper batches flatten)."""
    sws = (alpha * mask * sw).astype(jnp.float32)
    if sws.ndim == 2:
        sws = sws[None]
    elif sws.ndim > 3:
        sws = sws.reshape(-1, *sws.shape[-2:])
    return sws


def _embed_planes(planes: jax.Array, sw: jax.Array, alpha: jax.Array,
                  kfrac: float, out_u8: bool = False):
    """Cover-side blocked embed on [..., H, W] planes (u8 or float) against
    slot-ordered watermark SVs ``sw`` ([..., N, 8], leading dims must
    broadcast per channel). Returns (marked [..., H, W], sc [..., N, 8]).
    With ``out_u8`` the FUSED path clips+casts in VMEM and returns u8
    stego planes directly (color serving; gray needs float Y for the
    YCrCb recombine); the XLA fallback still returns float."""
    h, w = planes.shape[-2], planes.shape[-1]
    k = k_of_block(kfrac)
    mask = (jnp.arange(BLOCK) < k).astype(jnp.float32)
    padded, hp, wp = _pad_to_blocks(planes)

    if _use_fused():
        from dctsvd_tpu.ops import wm_pallas
        sws = _scaled_sws(sw, alpha, mask)
        marked, sc = wm_pallas.embed_plane_blocks.__wrapped__(
            padded, sws, k=k, sweeps=_FUSED_SWEEPS, out_u8=out_u8)
        return marked[..., :h, :w], sc

    coefs = dct.dct2_plane_blocks(padded.astype(jnp.float32))
    uc, sc, vct = svd.jacobi_svd(coefs, compute_uv=True)
    s_marked = sc + alpha * mask * sw
    cw = jnp.einsum("...nij,...nj,...njk->...nik", uc, s_marked, vct,
                    precision=jax.lax.Precision.HIGHEST)
    marked = dct.idct2_blocks_to_plane(cw, hp, wp)[..., :h, :w]
    return marked, sc


def _embed_frames(frames_bhwc: jax.Array, sw: jax.Array, alpha: jax.Array,
                  kfrac: float):
    """Channels-LAST serving embed: [..., H, W, C] u8/float frames in,
    (u8 stego in the same layout, sc [..., C, N, 8]) out. On the fused
    path the channel moveaxis rides the rank-6 view transpose (measured
    6.0 -> 4.6 ms in / 6.0 -> 2.5 ms out per 96-plane 1080p pass) and the
    kernel emits u8 directly; the XLA fallback takes the moveaxis route."""
    h, w = frames_bhwc.shape[-3], frames_bhwc.shape[-2]
    if _use_fused():
        from dctsvd_tpu.ops import wm_pallas
        k = k_of_block(kfrac)
        mask = (jnp.arange(BLOCK) < k).astype(jnp.float32)
        sws = _scaled_sws(sw, alpha, mask)
        padded, _, _ = _pad_frames_to_blocks(frames_bhwc)
        marked, sc = wm_pallas.embed_plane_blocks.__wrapped__(
            padded, sws, k=k, sweeps=_FUSED_SWEEPS, out_u8=True,
            channels_last=True)
        return marked[..., :h, :w, :], sc
    chans = jnp.moveaxis(frames_bhwc, -1, -3)
    marked, sc = _embed_planes(chans, sw, alpha, kfrac)
    stego = jnp.clip(marked, 0, 255).astype(jnp.uint8)
    return jnp.moveaxis(stego, -3, -1), sc


def _frames_spectrum(frames_bhwc: jax.Array,
                     sweeps: Optional[int] = None) -> jax.Array:
    """Channels-LAST per-block spectrum: [..., H, W, C] -> [..., C, N, 8]
    (fused path skips the moveaxis; see _frames_cols_view). ``sweeps``
    carries _plane_spectrum's replay semantics — in particular 0 (meta
    embedded by the converged XLA path) must map to the near-converged
    kernel default here too, never reach the kernel raw (a 0-sweep
    fori_loop would return unrotated column norms, not singular
    values)."""
    if _use_fused():
        from dctsvd_tpu.ops import wm_pallas
        padded, _, _ = _pad_frames_to_blocks(frames_bhwc)
        return wm_pallas.spectrum_plane_blocks.__wrapped__(
            padded,
            sweeps=(_FUSED_SWEEPS if sweeps is None
                    else replay_sweeps(sweeps)),
            channels_last=True)
    return _plane_spectrum(jnp.moveaxis(frames_bhwc, -1, -3), sweeps)


class BlockedEmbedResult(NamedTuple):
    stego_bgr: jax.Array   # [..., H, W, 3] u8
    sc: jax.Array          # [..., N, 8]  cover block singular values
    uw: jax.Array          # [..., N, 8, 8] natural block order
    vwt: jax.Array         # [..., N, 8, 8] natural block order
    sw: jax.Array          # [..., N, 8]  permuted slot order
    psnr: jax.Array
    ssim: jax.Array


class PreparedWatermark(NamedTuple):
    """Watermark-side SVD factors, computed ONCE per (watermark, key).

    ``sw`` is in permuted SLOT order (aligned with cover blocks at embed);
    ``uw``/``vwt`` are pre-gathered into NATURAL block order so extraction's
    only dynamic gather is the tiny [N, 8] singular-value reorder.
    ``inv_blk``/``inv_intra`` are the inverse permutations extraction needs.
    ``ebasis`` is the PIXEL-domain per-component reconstruction basis
    E[..., n, j, :, :] = IDCT_unshuffled(u_j·v_jᵀ) — with it, the whole
    extract tail (recon einsum + permuted IDCT) collapses to a k-term FMA
    per pixel (extract_gray_prepared), the serving fast path.
    """
    uw: jax.Array          # [..., N, 8, 8]
    sw: jax.Array          # [..., N, 8]
    vwt: jax.Array         # [..., N, 8, 8]
    inv_blk: jax.Array     # [N]
    inv_intra: jax.Array   # [64]
    ebasis: Optional[jax.Array]   # [..., N, 8, 8, 8]; None when prepared
                                  # with extract_basis=False (embed-only)


def prepare_extract_basis(uw_nat: jax.Array, vwt_nat: jax.Array,
                          inv_intra: jax.Array) -> jax.Array:
    """Pixel-domain basis: E[..., n, j, x, y] = Σ_{a,c} T[x,y,a,c] ·
    U[..., n, a, j] · Vt[..., n, j, c], T the intra-unshuffled IDCT tensor.
    Linear algebra hoisted out of the per-frame extract: recon then becomes
    wy_block = Σ_j ŝw[n, j] · E[n, j] (pure pixel-space FMAs, no DCT)."""
    t = dct.idct_pixel_tensor(BLOCK, row_perm=inv_intra)
    return jnp.einsum("xyac,...naj,...njc->...njxy", t, uw_nat, vwt_nat,
                      precision=jax.lax.Precision.HIGHEST)


def _prepare(wm_planes: jax.Array, blk_idx: jax.Array,
             intra_idx: jax.Array,
             extract_basis: bool = True) -> PreparedWatermark:
    padded, hp, wp = _pad_to_blocks(wm_planes)
    blocks = dct.blockify(padded)                       # one-time transpose
    blocks = permute.permute_block_tensor(blocks, blk_idx, intra_idx)
    coefs = dct.dct2_blocks(blocks)
    uw, sw, vwt = svd.jacobi_svd(coefs, compute_uv=True)
    inv_blk = jnp.argsort(blk_idx)
    inv_intra = jnp.argsort(intra_idx)
    uw_nat = jnp.take(uw, inv_blk, axis=-3)
    vwt_nat = jnp.take(vwt, inv_blk, axis=-3)
    ebasis = (prepare_extract_basis(uw_nat, vwt_nat, inv_intra)
              if extract_basis else None)
    return PreparedWatermark(uw_nat, sw, vwt_nat, inv_blk, inv_intra,
                             ebasis)


@functools.partial(jax.jit, static_argnames=("extract_basis",))
def prepare_wm_gray(wm_gray_u8: jax.Array, blk_idx: jax.Array,
                    intra_idx: jax.Array,
                    extract_basis: bool = True) -> PreparedWatermark:
    """Keyed block-permute + block-DCT + SVD of a gray watermark plane.

    ``extract_basis=False`` skips materializing the [N, 8, 8, 8] pixel
    reconstruction basis (ebasis=None) — an embed/detect-only service
    saves ~265 MB (4K gray) to ~800 MB (4K color) of HBM held for the
    PreparedWatermark's lifetime."""
    return _prepare(wm_gray_u8.astype(jnp.float32), blk_idx, intra_idx,
                    extract_basis)


@functools.partial(jax.jit, static_argnames=("extract_basis",))
def prepare_wm_color(wm_bgr_u8: jax.Array, blk_idx: jax.Array,
                     intra_idx: jax.Array,
                     extract_basis: bool = True) -> PreparedWatermark:
    """Per-BGR-channel prepared watermark (one shared permutation);
    ``extract_basis`` as in :func:`prepare_wm_gray`."""
    chans = jnp.moveaxis(wm_bgr_u8.astype(jnp.float32), -1, -3)
    return _prepare(chans, blk_idx, intra_idx, extract_basis)


@functools.partial(jax.jit, static_argnames=("kfrac", "with_metrics"))
def embed_gray_prepared(cover_bgr_u8: jax.Array, sw: jax.Array,
                        alpha: jax.Array, kfrac: float = K_FRAC_DEFAULT,
                        with_metrics: bool = True):
    """Cover-side blocked gray embed against a prepared watermark.

    Returns (stego_bgr u8, sc, psnr, ssim); psnr/ssim are -1 sentinels
    when ``with_metrics=False`` (throughput serving path; -1 is
    unreachable for real metrics and NaN-checker-safe).
    """
    y = color.luma_f32(cover_bgr_u8)
    y_marked, sc = _embed_planes(y, sw, alpha, kfrac)
    stego = color.replace_luma(y_marked, cover_bgr_u8)

    if with_metrics:
        ps = metrics.psnr(cover_bgr_u8, stego)
        ss = metrics.ssim(color.bgr_to_gray(cover_bgr_u8), y_marked)
    else:
        # -1 sentinel, not NaN: PSNR is never negative and a real
        # stego/cover SSIM is never -1, while a NaN constant would trip
        # the DCTSVD_DEBUG_CHECKS sanitizer on a deliberately-uncomputed
        # value and block the whole serving path in checked CI
        ps = ss = jnp.full(cover_bgr_u8.shape[:-3], -1.0, jnp.float32)
    return stego, sc, ps, ss


@functools.partial(jax.jit, static_argnames=("kfrac", "with_metrics"))
def embed_color_prepared(cover_bgr_u8: jax.Array, sw: jax.Array,
                         alpha: jax.Array, kfrac: float = K_FRAC_DEFAULT,
                         with_metrics: bool = True):
    """Cover-side blocked per-channel embed against a prepared watermark."""
    # u8 + channels-last end-to-end on the fused path: the view transpose
    # rides u8 (1/4 the HBM traffic, widen happens in VMEM), the channel
    # moveaxis rides the rank-6 view transpose, and the kernel clips+casts
    # the marked plane in VMEM (out_u8) — no frame-sized f32 tensor and no
    # standalone moveaxis pass ever hit HBM.
    stego, sc = _embed_frames(cover_bgr_u8, sw, alpha, kfrac)

    if with_metrics:
        ps = metrics.psnr(cover_bgr_u8, stego)
        ss = metrics.ssim(color.bgr_to_gray(cover_bgr_u8),
                          color.bgr_to_gray(stego))
    else:
        # -1 sentinel, not NaN: PSNR is never negative and a real
        # stego/cover SSIM is never -1, while a NaN constant would trip
        # the DCTSVD_DEBUG_CHECKS sanitizer on a deliberately-uncomputed
        # value and block the whole serving path in checked CI
        ps = ss = jnp.full(cover_bgr_u8.shape[:-3], -1.0, jnp.float32)
    return stego, sc, ps, ss


@functools.partial(jax.jit,
                   static_argnames=("kfrac", "normalize"))
def serve_verify_color_prepared(cover_bgr_u8: jax.Array, sw: jax.Array,
                                alpha: jax.Array, ebasis: jax.Array,
                                inv_blk: jax.Array,
                                kfrac: float = K_FRAC_DEFAULT,
                                normalize: bool = True):
    """Embed a frame batch AND extract from the produced stego in one
    dispatch — the serve+verify step production watermarking pipelines
    run per batch (embed, then confirm the mark recovers before
    shipping). Returns (stego u8 [..., H, W, 3], sc [..., 3, N, 8],
    recovered wm u8 [..., H, W, 3]).

    On the fused path the verification spectrum reads the embed kernel's
    u8 view output directly (bit-identical to re-transposing the stego —
    wm_pallas.roundtrip_frames_blocks), deleting one u8 view-transpose
    pass per batch vs the split embed/extract calls; results equal the
    split calls exactly (both run the materializing extract tail).
    Unaligned sizes and non-TPU backends compose the split calls."""
    h, w = cover_bgr_u8.shape[-3], cover_bgr_u8.shape[-2]
    aligned = h % BLOCK == 0 and w % BLOCK == 0
    if _use_fused() and aligned:
        from dctsvd_tpu.ops import wm_pallas
        k = k_of_block(kfrac)
        mask = (jnp.arange(BLOCK) < k).astype(jnp.float32)
        sws = _scaled_sws(sw, alpha, mask)
        stego, sc, s_cw = wm_pallas.roundtrip_frames_blocks.__wrapped__(
            cover_bgr_u8, sws, k=k, sweeps=_FUSED_SWEEPS)
        rec = _extract_tail_prepared(s_cw, sc, ebasis, inv_blk, alpha,
                                     kfrac, normalize, h, w, sw=sw,
                                     to_frames=True, out_u8=True,
                                     recompute=False)
        return stego, sc, rec
    stego, sc, _, _ = embed_color_prepared.__wrapped__(
        cover_bgr_u8, sw, alpha, kfrac=kfrac, with_metrics=False)
    rec = extract_color_prepared.__wrapped__(
        stego, sc, ebasis, inv_blk, alpha, kfrac=kfrac,
        normalize=normalize, sw=sw)
    return stego, sc, rec


@functools.partial(jax.jit,
                   static_argnames=("kfrac", "normalize"))
def serve_verify_detect_color_prepared(cover_bgr_u8: jax.Array,
                                       sw: jax.Array, alpha: jax.Array,
                                       ebasis: jax.Array,
                                       inv_blk: jax.Array,
                                       kfrac: float = K_FRAC_DEFAULT,
                                       normalize: bool = True):
    """Embed + extract-verify + detect-score a frame batch in ONE
    dispatch — the full per-batch production step (ship the stego only if
    the mark both recovers and scores). Returns (stego u8 [..., H, W, 3],
    sc [..., 3, N, 8], recovered wm u8 [..., H, W, 3], scores [...]).

    The detect tail re-uses the SAME stego spectrum the fused roundtrip
    kernel already computed for verification (s_cw) — scoring adds only
    the [.., 3, N, k] band-NC reduction, no third pass over the frames —
    and equals detect_color on the produced stego exactly (both sides
    compute the spectrum from the identical u8 view)."""
    h, w = cover_bgr_u8.shape[-3], cover_bgr_u8.shape[-2]
    k = k_of_block(kfrac)
    aligned = h % BLOCK == 0 and w % BLOCK == 0
    if _use_fused() and aligned:
        from dctsvd_tpu.ops import wm_pallas
        mask = (jnp.arange(BLOCK) < k).astype(jnp.float32)
        sws = _scaled_sws(sw, alpha, mask)
        stego, sc, s_cw = wm_pallas.roundtrip_frames_blocks.__wrapped__(
            cover_bgr_u8, sws, k=k, sweeps=_FUSED_SWEEPS)
        rec = _extract_tail_prepared(s_cw, sc, ebasis, inv_blk, alpha,
                                     kfrac, normalize, h, w, sw=sw,
                                     to_frames=True, out_u8=True,
                                     recompute=False)
    else:
        stego, sc, _, _ = embed_color_prepared.__wrapped__(
            cover_bgr_u8, sw, alpha, kfrac=kfrac, with_metrics=False)
        s_cw = _frames_spectrum(stego)
        rec = _extract_tail_prepared(s_cw, sc, ebasis, inv_blk, alpha,
                                     kfrac, normalize, h, w, sw=sw,
                                     to_frames=True, out_u8=True,
                                     recompute=False)
    # rectified at 0: a negative recovered component is physically
    # impossible watermark signal (singular values are non-negative)
    # and is exactly what scale-reduction attacks inject — it inflated
    # the scale damp and anti-correlated the NC (resize50 detect 0.17
    # -> 0.57 at alpha=0.10 rectified; every probed negative stays
    # 0.000 and the full ROC battery re-validates the 0.30 threshold)
    sw_hat = jnp.maximum((s_cw - sc)[..., :k], 0.0) \
        / jnp.maximum(alpha, 1e-8)
    scores = _band_nc(sw[..., :k], sw_hat,
                      -(-h // BLOCK), -(-w // BLOCK))
    return stego, sc, rec, jnp.mean(scores, axis=-1)


@functools.partial(jax.jit, static_argnames=("kfrac",))
def serve_detect_color_prepared(cover_bgr_u8: jax.Array, sw: jax.Array,
                                alpha: jax.Array, kfrac: float =
                                K_FRAC_DEFAULT):
    """Embed + detect-score a frame batch in ONE dispatch, WITHOUT
    materializing the extract image — the cheapest complete serving
    step when verification is the score alone (ship the stego iff its
    own detect clears the threshold; the recovered-watermark image is a
    human artifact that per-frame pipelines rarely need). Skipping the
    extract tail deletes its einsum + normalize + u8 passes per batch:
    586 vs 504 fps on the 1080p color serving step (batch 128, v5e,
    round-4 estimator).
    Returns (stego u8 [..., H, W, 3], sc [..., 3, N, 8], scores [...]);
    scores equal detect_color on the produced stego exactly."""
    h, w = cover_bgr_u8.shape[-3], cover_bgr_u8.shape[-2]
    k = k_of_block(kfrac)
    aligned = h % BLOCK == 0 and w % BLOCK == 0
    if _use_fused() and aligned:
        from dctsvd_tpu.ops import wm_pallas
        mask = (jnp.arange(BLOCK) < k).astype(jnp.float32)
        sws = _scaled_sws(sw, alpha, mask)
        stego, sc, s_cw = wm_pallas.roundtrip_frames_blocks.__wrapped__(
            cover_bgr_u8, sws, k=k, sweeps=_FUSED_SWEEPS)
    else:
        stego, sc, _, _ = embed_color_prepared.__wrapped__(
            cover_bgr_u8, sw, alpha, kfrac=kfrac, with_metrics=False)
        s_cw = _frames_spectrum(stego)
    # same rectified statistic as detect_color (see the note there)
    sw_hat = jnp.maximum((s_cw - sc)[..., :k], 0.0) \
        / jnp.maximum(alpha, 1e-8)
    scores = _band_nc(sw[..., :k], sw_hat,
                      -(-h // BLOCK), -(-w // BLOCK))
    return stego, sc, jnp.mean(scores, axis=-1)


@functools.partial(jax.jit, static_argnames=("kfrac",))
def embed_gray(cover_bgr_u8: jax.Array, wm_gray_u8: jax.Array,
               blk_idx: jax.Array, intra_idx: jax.Array, alpha: jax.Array,
               kfrac: float = K_FRAC_DEFAULT) -> BlockedEmbedResult:
    """Blocked gray embed: Y-channel, per-8×8-block singular value spread.

    Convenience form; serving pipelines should call :func:`prepare_wm_gray`
    once and :func:`embed_gray_prepared` per frame batch.
    """
    pw = prepare_wm_gray.__wrapped__(wm_gray_u8, blk_idx, intra_idx)
    stego, sc, ps, ss = embed_gray_prepared.__wrapped__(
        cover_bgr_u8, pw.sw, alpha, kfrac=kfrac)
    return BlockedEmbedResult(stego, sc, pw.uw, pw.vwt, pw.sw, ps, ss)


@functools.partial(jax.jit, static_argnames=("kfrac",))
def embed_color(cover_bgr_u8: jax.Array, wm_bgr_u8: jax.Array,
                blk_idx: jax.Array, intra_idx: jax.Array, alpha: jax.Array,
                kfrac: float = K_FRAC_DEFAULT) -> BlockedEmbedResult:
    """Blocked per-BGR-channel embed with one shared permutation."""
    pw = prepare_wm_color.__wrapped__(wm_bgr_u8, blk_idx, intra_idx)
    stego, sc, ps, ss = embed_color_prepared.__wrapped__(
        cover_bgr_u8, pw.sw, alpha, kfrac=kfrac)
    return BlockedEmbedResult(stego, sc, pw.uw, pw.vwt, pw.sw, ps, ss)


def _extract_planes(y: jax.Array, sc: jax.Array, uw_nat: jax.Array,
                    vwt_nat: jax.Array, inv_blk: jax.Array,
                    inv_intra: jax.Array, alpha: jax.Array, kfrac: float,
                    normalize: bool, h: int, w: int,
                    sw: Optional[jax.Array] = None,
                    sweeps: Optional[int] = None) -> jax.Array:
    _, hp, wp = _pad_to_blocks(y)
    s_cw = _plane_spectrum(y, sweeps)

    k = k_of_block(kfrac)
    mask = jnp.arange(BLOCK) < k
    raw = (s_cw - sc) / jnp.maximum(alpha, 1e-8)
    sw_hat, bad = _shrink_sw_hat(raw, sw, k)
    sw_hat = jnp.where(mask, sw_hat, 0.0)
    # slot order -> natural block order (the only dynamic gather, [N, 8])
    sw_nat = jnp.take(sw_hat, inv_blk, axis=-2)

    wm_blocks = jnp.einsum("...nij,...nj,...njk->...nik", uw_nat, sw_nat,
                           vwt_nat, precision=jax.lax.Precision.HIGHEST)
    # inverse DCT with the shared intra-block unshuffle folded in
    wy = dct.idct2_blocks_to_plane(wm_blocks, hp, wp,
                                   row_perm=inv_intra)[..., :h, :w]
    bad_nat = None if bad is None else jnp.take(bad, inv_blk, axis=-1)
    return _masked_normalize(wy, bad_nat, hp, wp, h, w, normalize)


# Measurement-only ablation switches for the estimator's round-4
# hardening passes (VERDICT r4 #5: itemize what each pass costs in the
# composed serving graph). Comma-separated names in
# DCTSVD_ESTIMATOR_ABLATE revert individual passes to their pre-hardening
# forms at TRACE time (zero runtime cost when unset; one process per
# ablation — tools/exp_estimator_ab.sh). Never set in production: each
# pass exists because a measured robustness failure required it
# (see the inline comments below).
#   compweights — shared per-block max-dev weight instead of
#                 per-component (reverts the resize50 polarity fix)
#   negprior    — keep the Cauchy weight for negative measurements
#   quantgate   — median-of-groups presence gate (knee 1.3/√gsz)
#                 instead of the quarter order statistic (1.8/√gsz)
#   rectify     — drop the non-negativity floor on the present path
_ESTIMATOR_ABLATE = frozenset(
    s for s in _os.environ.get("DCTSVD_ESTIMATOR_ABLATE", "").split(",")
    if s)


def _shrink_sw_hat(raw: jax.Array, sw: Optional[jax.Array],
                   k: int) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Wiener-style per-block shrinkage of the raw recovered estimate
    toward the stored Sw when the mark is PRESENT (VERDICT r3 #6), the
    round-3 clamp+erasure estimator when it is not. Returns
    ``(estimate, erasure_flags)`` — flags are a [..., N] bool (None when
    sw is None) that the normalization tail consumes; they are all-False
    whenever the presence switch engaged (the MAP blend already bounds
    every value, no masking needed).

    The embedded values are KNOWN at extraction (the meta stores Sw), so
    ŝw is a measurement of a known signal: the MAP blend
    ``ref + w·(raw − ref)`` with confidence ``w = 1/(1 + (dev/s)²)``
    keeps the measurement where it is plausible and falls back to the
    prior where the block's content was destroyed. ``dev`` is the
    block's worst per-component deviation from Sw; ``s`` is anchored on
    the GLOBAL mean top singular value of the watermark (per-block
    sw[n,0] can be legitimately tiny for dark watermark regions):
    measured JPEG-q50/noise deviations sit at 0.1–0.3 of that scale
    (w ≈ 0.92–0.99 — the measurement passes almost untouched), destroyed
    blocks at 10–1000× (w → 0 — repainted as the prior instead of the
    old neutral gray). The blend also bounds the output automatically
    (max |w·(raw−ref)| = s/2 at dev = s), so the min–max normalization
    needs no erasure mask: A/B vs the clamp+erasure pair on the 512²
    sweep (tools/exp_shrink.py) moved 25 %-crop extraction NC
    0.763 → 0.97+ with clean/JPEG/noise unchanged. Elementwise plus one
    small reduction — no sort/median — so the serving tail pays ~nothing.

    The prior is applied ONLY when the mark is actually present: a
    mark-free input (unrelated image, or the un-watermarked original —
    where EVERY block deviates hugely) would otherwise shrink wholesale
    to the stored Sw and extraction would "recover" a near-perfect
    watermark from an image that never carried it (measured NC 0.997 on
    an unrelated host). The same keyed block-to-block statistic the
    detector's presence gate uses (Pearson between recovered and stored
    top components over all blocks — genuine stegos ≥ 0.5 even under
    JPEG-q30 at α=0.10, mark-free inputs 0.00 ± 0.01) ramps the
    shrinkage in over ρ0 ∈ [0.2, 0.3]: present → full MAP blend,
    absent → the raw (honestly garbage) estimate.

    Caveat (the classic SVD-watermarking false-positive property,
    amplified by the blocked scheme): even the RAW estimate of a
    mark-free but profile-shaped delta (e.g. a brightened original —
    every block's ŝw_0 ≈ the same positive constant) reconstructs a
    recognizable low-rank watermark silhouette, because reconstruction
    runs through the stored watermark's own per-block bases and
    min–max normalization stretches whatever comes out. This is the
    data speaking through a non-blind basis, not a recoverable mark —
    ownership/presence decisions must use detect(), whose keyed-presence
    gate scores exactly these inputs 0.0 (see band_presence_damp)."""
    if sw is None:
        return raw, None
    ref = jnp.broadcast_to(sw, raw.shape)
    scale = (jnp.mean(ref[..., 0], axis=-1, keepdims=True)[..., None]
             + 1e-6)
    # Per-COMPONENT deviation/confidence, not one per-block max: a
    # resize-to-50%-and-restore attack collapses the sub-dominant
    # singular components of every block (raw_j ≈ −sc_j·loss/α, a large
    # NEGATIVE value ∝ the cover's own energy) while leaving component 0
    # well-correlated; a shared per-block weight let that moderate-dev
    # (~1.5·scale → w≈0.3) negative bias through on all components and
    # the three biased components outvoted component 0 — the extracted
    # image came out polarity-INVERTED (NC −0.52, round-4 hardware
    # robustness table). Per-component weights keep component 0 nearly
    # raw (w≈0.9) and push the destroyed components toward the prior.
    # Components ≥ k were never embedded (their raw is noise/α); they are
    # zeroed downstream, so their weight is irrelevant — use 0.
    comp = jnp.arange(BLOCK) < k
    devk = jnp.where(comp, jnp.abs(raw - ref), 0.0)      # [..., N, 8]
    dev = jnp.max(devk, axis=-1, keepdims=True)          # worst of :k
    if "compweights" in _ESTIMATOR_ABLATE:               # pre-round-4 form
        wgt = jnp.where(comp, 1.0 / (1.0 + (dev / scale) ** 2), 0.0)
    else:
        wgt = jnp.where(comp, 1.0 / (1.0 + (devk / scale) ** 2), 0.0)
    # A NEGATIVE measured component is maximally implausible (singular
    # values are non-negative) — it is energy the attack removed from
    # the cover, not watermark signal. Send it fully to the prior
    # rather than letting the Cauchy weight average it in.
    if "negprior" not in _ESTIMATOR_ABLATE:
        wgt = jnp.where(raw < 0.0, 0.0, wgt)
    # ρ0 as a high ORDER STATISTIC over 16 contiguous block-groups of
    # per-group Pearson, never one global correlation: (a) a global
    # Pearson is not robust — a 25%-crop's destroyed blocks carry huge
    # raw values that crush the covariance and read a genuine damaged
    # stego as mark-free (measured: crop extraction fell to −0.13);
    # (b) masking the correlation to blocks that agree with Sw conditions
    # on the outcome and manufactures ρ0 ≈ 1 for ANY input (measured:
    # unrelated images leaked back to 0.997). Contiguous n-ranges are
    # spatial row bands, so localized damage kills a minority of groups.
    # The statistic is the ⌈ng/4⌉-th LARGEST group Pearson (round 4;
    # was the median): presence is engaged when a QUARTER of the image
    # still demonstrably carries the mark, so majority-damage stegos
    # (62–75 % row crops) keep the MAP blend — their destroyed blocks
    # repaint as the prior through the per-component confidence instead
    # of the cruder clamp+erasure fallback (crop62 extraction NC
    # 0.56 → 0.91, crop75 0.46 → 0.92, measured at 128²–512²; 96² keeps
    # the fallback — its knee is honestly out of reach under majority
    # damage); mark-free inputs are ~0 in every group, so any quantile
    # reads ~0.
    n = raw.shape[-2]
    gsz = max(1, n // 16)
    ng = n // gsz
    a0 = ref[..., : ng * gsz, 0].reshape(*ref.shape[:-2], ng, gsz)
    b0 = raw[..., : ng * gsz, 0].reshape(*raw.shape[:-2], ng, gsz)
    if "quantgate" in _ESTIMATOR_ABLATE:  # round-4's pre-hardening median
        m = -(-ng // 2)
    else:
        m = -(-ng // 4)                   # quarter of the groups, ≥ 1
    rho0 = jnp.sort(metrics.nc(a0, b0), axis=-1)[..., ng - m]
    # Size-aware engage threshold: a null per-group Pearson has
    # std ≈ 1/√gsz, so on small images (96², gsz=9) a fixed 0.20 knee
    # false-fired on ~3 % of mark-free inputs — fabricated watermarks at
    # NC 0.99 (round-4 review). The quarter-order-statistic gate gives a
    # mark-free image ~ng/m times the median gate's chances to clear the
    # knee, so the knee moves out with it: 1.8/√gsz ≈ 2.4 null σ at
    # gsz=9 → per-image false-engage P(Binom(16, .009) ≥ 4) ≈ 1e-5
    # (1,000-input mark-free sweep, 250 × {64², 96², 128², 256²}, five
    # content families incl. perturbed originals: worst extraction NC
    # BIT-IDENTICAL to the median gate — zero added engagements; the
    # 0.54–0.59 worst case both gates share is the documented
    # silhouette-through-the-stored-basis caveat below, not a gate
    # leak). Still far below genuine ρ0
    # (≈0.9 clean, ≥0.5 attacked) wherever groups are big enough to
    # measure presence; undersized images fall back to the clamp path.
    knee = 1.3 if "quantgate" in _ESTIMATOR_ABLATE else 1.8
    engage = rho0 >= 0.20 + knee / jnp.sqrt(jnp.float32(gsz))
    # Singular values are non-negative by definition: a strongly negative
    # blended estimate can only be residual attack damage (energy LOSS in
    # the cover, not watermark signal), so floor the present-path
    # estimate at 0. Clean/JPEG/noise estimates are positive anyway
    # (raw ≈ ref ± small noise) — the floor touches nothing there.
    shrunk = ref + wgt * (raw - ref)
    if "rectify" not in _ESTIMATOR_ABLATE:
        shrunk = jnp.maximum(shrunk, 0.0)
    # Absent path = the round-3 estimator verbatim (clamp to the
    # plausible per-block range + erasure flags consumed by the masked
    # normalization): a majority-damaged genuine stego (≥50 % crop)
    # disengages presence, and the raw estimate's destroyed-block
    # outliers (10–1000× scale) would crush the min–max window
    # (measured: 62.5 %-crop NC fell to −0.54 without it vs the
    # clamp+erasure path's +0.56). Mark-free inputs can't leak the
    # watermark's shape through the ±c·Sw clamp because every block of
    # theirs is erasure-flagged (dev ≫ 2·scale) and repainted at the
    # window midpoint by the masked normalization.
    clamped = jnp.clip(raw, -0.5 * ref, 1.5 * ref)
    eng3 = engage[..., None, None]
    est = jnp.where(eng3, shrunk, clamped)
    bad = (dev[..., 0] > 2.0 * scale[..., 0]) & ~engage[..., None]
    return est, bad


def _masked_normalize(wy: jax.Array, bad_nat: Optional[jax.Array],
                      hp: int, wp: int, h: int, w: int,
                      normalize: bool) -> jax.Array:
    """Min–max normalization to [0, 255] (the reference's extract
    epilogue, app_dct_svd_single.py:218-221) with erasure handling for
    the absent-path estimate: pixels of flagged blocks are excluded from
    the window and repainted at its midpoint, so clamp-bounded outliers
    cannot crush the intact blocks' contrast (and a fully-flagged
    mark-free input renders flat — no watermark silhouette).
    ``bad_nat`` is the NATURAL-block-order erasure mask ([..., N]) or
    None (presence engaged / no sw: plain min–max)."""
    if bad_nat is None:
        if not normalize:
            return wy
        lo = jnp.min(wy, axis=(-2, -1), keepdims=True)
        hi = jnp.max(wy, axis=(-2, -1), keepdims=True)
        return (wy - lo) * (255.0 / jnp.maximum(hi - lo, 1e-12))
    mask8 = jnp.broadcast_to(bad_nat[..., None, None],
                             (*bad_nat.shape, BLOCK, BLOCK))
    mask = dct.unblockify(mask8.astype(jnp.float32), hp, wp)[..., :h, :w]
    bad_pix = mask > 0.5
    if not normalize:
        return jnp.where(bad_pix, 0.0, wy)
    lo = jnp.min(jnp.where(bad_pix, jnp.inf, wy), axis=(-2, -1),
                 keepdims=True)
    hi = jnp.max(jnp.where(bad_pix, -jnp.inf, wy), axis=(-2, -1),
                 keepdims=True)
    # every block flagged (mark-free input) -> fall back to the plain
    # window; the repaint below then flattens the whole plane
    ok = jnp.isfinite(lo) & jnp.isfinite(hi)
    lo = jnp.where(ok, lo, jnp.min(wy, axis=(-2, -1), keepdims=True))
    hi = jnp.where(ok, hi, jnp.max(wy, axis=(-2, -1), keepdims=True))
    wy = jnp.where(bad_pix, (lo + hi) * 0.5, wy)
    return (wy - lo) * (255.0 / jnp.maximum(hi - lo, 1e-12))


def _permute_slots(x: jax.Array, idx: jax.Array) -> jax.Array:
    """``take(x, idx, axis=-2)`` via a lead-axis gather. XLA's TPU gather
    is row-overhead-bound: on [96, 32400, 4] f32 the straight axis=-2
    take measured 13.2 ms (~66 MB!), while hoisting N to the lead axis so
    each gathered row is lead·k elements measured 2.5 ms INCLUDING both
    transposes (tools/exp_gather.py, v5e)."""
    *lead, n, k = x.shape
    p = 1
    for d in lead:
        p *= d
    xt = jnp.transpose(x.reshape(p, n, k), (1, 0, 2))
    y = jnp.take(xt, idx, axis=0)
    return jnp.transpose(y, (1, 0, 2)).reshape(*lead, n, k)


def _normalize_blocks(blocks: jax.Array, bad_nat: Optional[jax.Array],
                      normalize: bool) -> jax.Array:
    """Block-level form of :func:`_masked_normalize` for block-aligned
    planes: identical arithmetic (min/max over good pixels equals the
    min/max over good blocks' per-block extrema; min/max reductions are
    order-exact in floating point), no plane-sized mask, and the
    reductions run on the [..., N, 64] tensor the recon einsum just
    produced. ``blocks`` [..., N, 64]; ``bad_nat`` [..., N] or None."""
    if bad_nat is None:
        if not normalize:
            return blocks
        lo = jnp.min(blocks, axis=(-2, -1), keepdims=True)
        hi = jnp.max(blocks, axis=(-2, -1), keepdims=True)
        return (blocks - lo) * (255.0 / jnp.maximum(hi - lo, 1e-12))
    bad = bad_nat[..., None]
    if not normalize:
        return jnp.where(bad, 0.0, blocks)
    bmin = jnp.min(blocks, axis=-1)                      # [..., N]
    bmax = jnp.max(blocks, axis=-1)
    lo = jnp.min(jnp.where(bad_nat, jnp.inf, bmin), axis=-1, keepdims=True)
    hi = jnp.max(jnp.where(bad_nat, -jnp.inf, bmax), axis=-1, keepdims=True)
    ok = jnp.isfinite(lo) & jnp.isfinite(hi)
    lo = jnp.where(ok, lo, jnp.min(bmin, axis=-1, keepdims=True))
    hi = jnp.where(ok, hi, jnp.max(bmax, axis=-1, keepdims=True))
    lo, hi = lo[..., None], hi[..., None]                # [..., 1, 1]
    blocks = jnp.where(bad, (lo + hi) * 0.5, blocks)
    return (blocks - lo) * (255.0 / jnp.maximum(hi - lo, 1e-12))


def _normalize_blocks_recompute(produce, bad_nat: Optional[jax.Array],
                                normalize: bool,
                                out_u8: bool) -> jax.Array:
    """Recompute form of :func:`_normalize_blocks`: ``produce()``
    rebuilds the [..., N, 64] reconstruction (a k-term broadcast-sum, so
    XLA fuses it straight into each consuming reduction/epilogue)
    instead of materializing it once in f32. NOT the production default:
    it won tail-only microbenches (its original 26.9x 'win' was mostly a
    first-position eager-compile artifact — tools/exp_tail2.py) but
    measures equal-or-worse inside the full extract graph at every
    batch size, because each pass re-reads the pixel basis per frame
    (see _extract_tail_prepared's recompute note for the end-to-end
    numbers). Kept selectable for future toolchain A/Bs."""
    if not normalize:
        blocks = produce()
        if bad_nat is not None:
            blocks = jnp.where(bad_nat[..., None], 0.0, blocks)
        if out_u8:
            blocks = jnp.clip(blocks, 0, 255).astype(jnp.uint8)
        return blocks
    if bad_nat is None:
        lo = jnp.min(produce(), axis=(-2, -1), keepdims=True)
        hi = jnp.max(produce(), axis=(-2, -1), keepdims=True)
    else:
        bmin = jnp.min(produce(), axis=-1)               # [..., N]
        bmax = jnp.max(produce(), axis=-1)
        lo = jnp.min(jnp.where(bad_nat, jnp.inf, bmin), axis=-1,
                     keepdims=True)
        hi = jnp.max(jnp.where(bad_nat, -jnp.inf, bmax), axis=-1,
                     keepdims=True)
        ok = jnp.isfinite(lo) & jnp.isfinite(hi)
        lo = jnp.where(ok, lo, jnp.min(bmin, axis=-1, keepdims=True))
        hi = jnp.where(ok, hi, jnp.max(bmax, axis=-1, keepdims=True))
        lo, hi = lo[..., None], hi[..., None]            # [..., 1, 1]
    scale = 255.0 / jnp.maximum(hi - lo, 1e-12)
    blocks = produce()
    if bad_nat is not None:
        blocks = jnp.where(bad_nat[..., None], (lo + hi) * 0.5, blocks)
    blocks = (blocks - lo) * scale
    if out_u8:
        blocks = jnp.clip(blocks, 0, 255).astype(jnp.uint8)
    return blocks


def _unblockify_to_frames(blocks: jax.Array, hp: int, wp: int) -> jax.Array:
    """[..., C, N, 8, 8] pixel blocks -> [..., H, W, C] frames in ONE
    rank-6 transpose (unblockify with the channel moveaxis folded in —
    the output-side analog of wm_pallas._frames_cols_view)."""
    *lead, c, n, b, _ = blocks.shape
    hb, wb = hp // b, wp // b
    x = blocks.reshape(*lead, c, hb, wb, b, b)
    nd = x.ndim
    perm = (*range(nd - 5), nd - 4, nd - 2, nd - 3, nd - 1, nd - 5)
    return jnp.transpose(x, perm).reshape(*lead, hp, wp, c)


def _extract_planes_prepared(planes: jax.Array, sc: jax.Array,
                             ebasis: jax.Array, inv_blk: jax.Array,
                             alpha: jax.Array, kfrac: float,
                             normalize: bool, h: int, w: int,
                             sw: Optional[jax.Array] = None,
                             sweeps: Optional[int] = None,
                             recompute: bool = False) -> jax.Array:
    """Serving-path extract tail: spectrum -> ŝw gather -> k-term
    pixel-basis FMA. No per-frame DCT/recon linear algebra at all."""
    s_cw = _plane_spectrum(planes, sweeps)
    return _extract_tail_prepared(s_cw, sc, ebasis, inv_blk, alpha, kfrac,
                                  normalize, h, w, sw=sw, out_u8=True,
                                  recompute=recompute)


def _extract_tail_prepared(s_cw: jax.Array, sc: jax.Array,
                           ebasis: jax.Array, inv_blk: jax.Array,
                           alpha: jax.Array, kfrac: float,
                           normalize: bool, h: int, w: int,
                           sw: Optional[jax.Array] = None,
                           to_frames: bool = False,
                           out_u8: bool = False,
                           recompute: bool = False) -> jax.Array:
    """Extract tail from an already-computed stego spectrum s_cw
    [..., N, 8] (lets channels-last callers feed _frames_spectrum).

    With ``to_frames`` the result comes back channels-LAST
    ([..., H, W, C] from [..., C, N, 8] input) with the channel moveaxis
    folded into the unblockify transpose (one rank-6 pass). ``out_u8``
    clips+casts before the output transpose (identical values to the
    callers' clip/cast epilogue — normalize maps into [0, 255] already).

    ``recompute`` picks the reconstruction/normalize formulation for
    block-aligned sizes. False (default) materializes the [..., N, 64]
    reconstruction once via einsum; True recomputes the k-term
    contraction per consumer instead. The recompute form won a
    TAIL-ONLY microbench decisively (exp_tail: 4x at b=8 against the
    honest pre-flip number) but does NOT survive end-to-end
    measurement: inside the full extract graph it is a wash at b=1
    (11.7 vs 11.5 ms) and loses from b=8 up (40.1 vs 37.5 ms; tail-only
    b=16: 242.8 vs 44.6 ms — it re-reads the [3, N, k, 64] pixel basis
    once per FRAME per pass), and composed embed+extract graphs also
    prefer the einsum (516.9 vs 503.5 fps on the 1080p serving step,
    where XLA fuses the small-k einsum into its consumers). Kept as a
    selectable formulation for future A/Bs (tools/exp_tail.py,
    tools/exp_tail2.py document the methodology traps: first-position
    eager-compile pollution and tail-only-vs-composed divergence).
    Outputs agree within a couple of u8 quanta between the two forms.
    """
    k = k_of_block(kfrac)
    hp, wp = h + (-h) % BLOCK, w + (-w) % BLOCK
    raw = (s_cw - sc) / jnp.maximum(alpha, 1e-8)
    est, bad = _shrink_sw_hat(raw, sw, k)
    sw_hat = est[..., :k]
    if bad is None:
        sw_nat = _permute_slots(sw_hat, inv_blk)
        bad_nat = None
    else:
        # one gather for both: the bad mask rides as a (k+1)-th column
        combo = jnp.concatenate(
            [sw_hat, bad.astype(jnp.float32)[..., None]], axis=-1)
        combo = _permute_slots(combo, inv_blk)
        sw_nat, bad_nat = combo[..., :k], combo[..., k] > 0.5
    # The contraction runs with the block's 64 pixels FLATTENED on the
    # minor axis: with 8-sized minor dims XLA hands the dot output a
    # T(8,128)-padded layout at 4K (16x expansion -> 11.9 GB HBM OOM,
    # seen for both the '...njxy->...nxy' and the fused-to-plane rank-6
    # forms); a 64-wide minor pads only 2x. The [.., N, 64] -> [.., N,
    # 8, 8] split afterwards is free.
    eb = ebasis[..., :k, :, :]
    eb64 = eb.reshape(*eb.shape[:-2], BLOCK * BLOCK)
    if (hp, wp) == (h, w):
        # Block-aligned sizes (all the serving shapes): normalize on the
        # [..., N, 64] block tensor BEFORE the unblockify transpose —
        # min/max over all pixels == min/max over per-block extrema.
        # With ``out_u8`` the clip+cast also happens pre-transpose, so
        # the unblockify moves u8 bytes (1/4 the traffic).
        if recompute:
            def produce():
                # broadcast-sum, not dot: an elementwise producer fuses
                # into the consuming reduction/epilogue without a
                # [N, 64] f32 store
                return jnp.sum(sw_nat[..., :, None] * eb64, axis=-2)

            blocks = _normalize_blocks_recompute(produce, bad_nat,
                                                 normalize, out_u8)
        else:
            blocks = jnp.einsum("...nj,...njp->...np", sw_nat, eb64)
            blocks = _normalize_blocks(blocks, bad_nat, normalize)
            if out_u8:
                blocks = jnp.clip(blocks, 0, 255).astype(jnp.uint8)
        blocks = blocks.reshape(*blocks.shape[:-1], BLOCK, BLOCK)
        if to_frames:
            return _unblockify_to_frames(blocks, hp, wp)
        return dct.unblockify(blocks, hp, wp)
    blocks = jnp.einsum("...nj,...njp->...np", sw_nat, eb64)
    blocks = blocks.reshape(*blocks.shape[:-1], BLOCK, BLOCK)
    wy = dct.unblockify(blocks, hp, wp)[..., :h, :w]
    wy = _masked_normalize(wy, bad_nat, hp, wp, h, w, normalize)
    if out_u8:
        wy = jnp.clip(wy, 0, 255).astype(jnp.uint8)
    return jnp.moveaxis(wy, -3, -1) if to_frames else wy


@functools.partial(jax.jit,
                   static_argnames=("kfrac", "normalize", "sweeps",
                                    "recompute"))
def extract_gray_prepared(stego_bgr_u8: jax.Array, sc: jax.Array,
                          ebasis: jax.Array, inv_blk: jax.Array,
                          alpha: jax.Array, kfrac: float = K_FRAC_DEFAULT,
                          normalize: bool = True,
                          sw: Optional[jax.Array] = None,
                          sweeps: Optional[int] = None,
                          recompute: bool = False) -> jax.Array:
    """Gray extract against a PreparedWatermark's pixel basis (serving
    fast path; same result as extract_gray). Pass ``sw`` (the stored
    watermark SVs, slot order) to clamp outliers from locally-destroyed
    blocks — see _shrink_sw_hat. ``recompute`` selects the tail
    formulation (default False = materializing einsum, the measured
    winner end-to-end; see _extract_tail_prepared)."""
    h, w = stego_bgr_u8.shape[-3], stego_bgr_u8.shape[-2]
    y = color.luma_f32(stego_bgr_u8)
    return _extract_planes_prepared(y, sc, ebasis, inv_blk, alpha, kfrac,
                                    normalize, h, w, sw=sw, sweeps=sweeps,
                                    recompute=recompute)


@functools.partial(jax.jit,
                   static_argnames=("kfrac", "normalize", "sweeps",
                                    "recompute"))
def extract_color_prepared(stego_bgr_u8: jax.Array, sc: jax.Array,
                           ebasis: jax.Array, inv_blk: jax.Array,
                           alpha: jax.Array, kfrac: float = K_FRAC_DEFAULT,
                           normalize: bool = True,
                           sw: Optional[jax.Array] = None,
                           sweeps: Optional[int] = None,
                           recompute: bool = False) -> jax.Array:
    h, w = stego_bgr_u8.shape[-3], stego_bgr_u8.shape[-2]
    # stego spectrum straight off the channels-last frames (no moveaxis);
    # the output-side channel moveaxis rides the unblockify transpose
    s_cw = _frames_spectrum(stego_bgr_u8, sweeps)
    return _extract_tail_prepared(s_cw, sc, ebasis, inv_blk, alpha, kfrac,
                                  normalize, h, w, sw=sw, to_frames=True,
                                  out_u8=True, recompute=recompute)


@functools.partial(jax.jit,
                   static_argnames=("kfrac", "normalize", "sweeps"))
def extract_gray(stego_bgr_u8: jax.Array, sc: jax.Array, uw: jax.Array,
                 vwt: jax.Array, inv_blk: jax.Array, inv_intra: jax.Array,
                 alpha: jax.Array, kfrac: float = K_FRAC_DEFAULT,
                 normalize: bool = True,
                 sw: Optional[jax.Array] = None,
                 sweeps: Optional[int] = None) -> jax.Array:
    h, w = stego_bgr_u8.shape[-3], stego_bgr_u8.shape[-2]
    y = color.luma_f32(stego_bgr_u8)
    wy = _extract_planes(y, sc, uw, vwt, inv_blk, inv_intra, alpha,
                         kfrac, normalize, h, w, sw=sw, sweeps=sweeps)
    return jnp.clip(wy, 0, 255).astype(jnp.uint8)


@functools.partial(jax.jit,
                   static_argnames=("kfrac", "normalize", "sweeps"))
def extract_color(stego_bgr_u8: jax.Array, sc: jax.Array, uw: jax.Array,
                  vwt: jax.Array, inv_blk: jax.Array, inv_intra: jax.Array,
                  alpha: jax.Array, kfrac: float = K_FRAC_DEFAULT,
                  normalize: bool = True,
                  sw: Optional[jax.Array] = None,
                  sweeps: Optional[int] = None) -> jax.Array:
    h, w = stego_bgr_u8.shape[-3], stego_bgr_u8.shape[-2]
    chans = jnp.moveaxis(stego_bgr_u8, -1, -3)      # u8: 1/4 the bytes
    wm = _extract_planes(chans, sc, uw, vwt, inv_blk, inv_intra, alpha,
                         kfrac, normalize, h, w, sw=sw, sweeps=sweeps)
    return jnp.moveaxis(jnp.clip(wm, 0, 255), -3, -1).astype(jnp.uint8)


def band_scale_damp(sw_bands: jax.Array, hat_bands: jax.Array) -> jax.Array:
    """Per-band scale-consistency weight in [0, 1] for the detect
    statistic (shared by the single-chip and plane-sharded paths).

    The band NC is scale-INVARIANT, so it is blind to the one signature
    that separates a genuine recovered watermark from an unrelated-content
    delta: magnitude. A genuine ŝw = (s_cw − sc)/α measures ≈ ‖Sw‖ per
    band (ratio 0.61–1.02 across clean/JPEG-q50/noise-σ5 and the intact
    bands of a 25 %-crop, alpha grid 0.10–0.22), while an unrelated
    image's delta is content-scale divided by a small α — band ratios
    1.8–9.4× at α=0.10. Without this gate, unrelated-host deltas scored
    up to ±0.79 through the NC's residual sensitivity to the shared
    within-block singular-value profile (ROC characterization, round 4);
    with it the worst unrelated score drops to 0.47 while every positive
    is untouched (their damp ≈ 1). One-sided: only OVER-scaled bands are
    damped, so a heavily-attenuated genuine mark (ratio < 1) never loses
    score. 1/(1 + log2(r)^4): flat through r ≤ ~1.3, half-weight at
    r = 2, ~0.06 at r = 4."""
    r = (jnp.linalg.norm(hat_bands, axis=-1)
         / (jnp.linalg.norm(sw_bands, axis=-1) + 1e-8))
    over = jnp.maximum(0.0, jnp.log2(jnp.maximum(r, 1e-9)))
    return 1.0 / (1.0 + over ** 4)


def band_presence_damp(sw_bands: jax.Array,
                       hat_bands: jax.Array) -> jax.Array:
    """Per-band watermark-PRESENCE weight in [0, 1]: the keyed
    block-to-block gate that closes the detector's remaining
    false-positive class (round-4 ROC characterization).

    The band NC and the scale gate both measure agreement with Sw's
    MAGNITUDE STRUCTURE — the within-block singular-value profile plus
    overall scale — which any energy-raising perturbation of the
    UN-watermarked original also matches: a +6 brightness shift, a JPEG
    re-encode, or σ3 noise on the clean host scored 0.93–0.998 against
    its own meta (their delta spectrum is profile-shaped, and at the
    magnitude-matched point even the residual ratio dips to ~0.4). What
    none of them can fake is Sw's BLOCK-TO-BLOCK variation, which the
    keyed permutation makes independent of any content: ρ0 = Pearson
    (over the band's blocks) between the top components ŝw[:, 0] and
    Sw[:, 0] measures exactly that. Measured (512², alpha 0.10–0.22):
    genuine stegos ρ0 = 0.53–0.97 even under JPEG-q30; every mark-free
    negative (self, brightness +3/+6/+12/+24, JPEG-q70 or σ3 of the
    original, unrelated content) ρ0 = 0.00 ± 0.01. Only the j=0
    component is used — under attack the sub-dominant components'
    deviations (divided by α) swamp their small keyed variation (ŝw_j≥1
    SNR ~0.06 at JPEG-q50/α=0.10 vs ~1 for j=0).

    The engage knee is SIZE-AWARE: ρ0 is a per-band sample Pearson with
    null σ ≈ 1/√m (m = blocks per band), so a fixed 0.05 knee let 3.5 %
    of mark-free 96² images (9-block bands) clear the 0.30 threshold
    (worst 0.65, measured round 4). 0.05 + 1.3/√m keeps the knee ~4
    null σ out at every size — production sizes are unaffected (1080p
    bands: m = 2025, knee 0.079) while small images lose a little TPR
    under heavy attack instead of leaking false positives."""
    m = sw_bands.shape[-2]
    knee = 0.05 + 1.3 / jnp.sqrt(jnp.float32(m))
    rho0 = metrics.nc(sw_bands[..., 0], hat_bands[..., 0])
    return jnp.clip((rho0 - knee) / 0.30, 0.0, 1.0)


def _band_nc(sw: jax.Array, sw_hat: jax.Array, hb: int, wb: int,
             grid: int = 4) -> jax.Array:
    """Median over a grid of spatial bands of gated NCs: per band,
    NC · scale-consistency (:func:`band_scale_damp`) · keyed-presence
    (:func:`band_presence_damp`).

    A global NC over all blocks is dragged negative by localized damage
    (cropping/blanking 25% of a frame scored −0.26 on an otherwise intact
    stego — measured). Carving the block grid into ``grid × grid`` spatial
    bands, scoring each separately (~2k samples per 1080p band — low
    variance) and taking the MEDIAN makes the score immune to any minority
    of destroyed bands — a 25% row or column crop kills at most 4 of 16 —
    while matching the global NC for uniform attacks (JPEG/noise) and
    staying ~0 on clean hosts. The two gates close the scale-invariance
    and profile-matching false-positive classes the round-4 ROC
    characterization found (see their docstrings); on the measured
    battery every positive (clean/JPEG-q50/q30/noise-σ5/crop ×
    alpha 0.10–0.22) keeps ≥ 0.82 while every negative scores 0.00.
    Caveat, documented: a watermark with NO block-to-block variation (a
    constant image) is indistinguishable in principle from a brightness
    shift and scores 0 — it also carries no recoverable information.
    """
    sw = jnp.broadcast_to(sw, sw_hat.shape)
    *lead, n, b = sw_hat.shape
    g = max(1, min(grid, hb, wb))
    gh, gw = hb // g, wb // g

    def to_bands(x):
        x = x.reshape(*lead, hb, wb, b)[..., :g * gh, :g * gw, :]
        x = x.reshape(*lead, g, gh, g, gw, b)
        x = jnp.swapaxes(x, -4, -3)                  # [..., g, g, gh, gw, b]
        return x.reshape(*lead, g * g, gh * gw, b)

    sw_b, hat_b = to_bands(sw), to_bands(sw_hat)
    sw_f = sw_b.reshape(*sw_b.shape[:-2], -1)
    hat_f = hat_b.reshape(*hat_b.shape[:-2], -1)
    bands = (metrics.nc(sw_f, hat_f)
             * band_scale_damp(sw_f, hat_f)
             * band_presence_damp(sw_b, hat_b))
    return jnp.median(bands, axis=-1)


@functools.partial(jax.jit, static_argnames=("kfrac", "sweeps"))
def detect_gray(stego_bgr_u8: jax.Array, sc: jax.Array,
                sw: jax.Array, alpha: jax.Array,
                kfrac: float = K_FRAC_DEFAULT,
                sweeps: Optional[int] = None) -> jax.Array:
    """Median-of-band NC between stored and recovered per-block singular
    values (the blocked analog of the reference's detect, made robust to
    localized damage — see _band_nc). The correlation is restricted to
    the k EMBEDDED components per block: rows >= k carry no mark (the
    embed masks them), so including them only adds uncorrelated
    codec/attack noise to the score."""
    h, w = stego_bgr_u8.shape[-3], stego_bgr_u8.shape[-2]
    k = k_of_block(kfrac)
    y = color.luma_f32(stego_bgr_u8)
    s_cw = _plane_spectrum(y, sweeps)
    # rectified at 0: a negative recovered component is physically
    # impossible watermark signal (singular values are non-negative)
    # and is exactly what scale-reduction attacks inject — it inflated
    # the scale damp and anti-correlated the NC (resize50 detect 0.17
    # -> 0.57 at alpha=0.10 rectified; every probed negative stays
    # 0.000 and the full ROC battery re-validates the 0.30 threshold)
    sw_hat = jnp.maximum((s_cw - sc)[..., :k], 0.0) \
        / jnp.maximum(alpha, 1e-8)
    return _band_nc(sw[..., :k], sw_hat, -(-h // BLOCK), -(-w // BLOCK))


@functools.partial(jax.jit, static_argnames=("kfrac", "sweeps"))
def detect_color(stego_bgr_u8: jax.Array, sc: jax.Array,
                 sw: jax.Array, alpha: jax.Array,
                 kfrac: float = K_FRAC_DEFAULT,
                 sweeps: Optional[int] = None) -> jax.Array:
    h, w = stego_bgr_u8.shape[-3], stego_bgr_u8.shape[-2]
    k = k_of_block(kfrac)
    s_cw = _frames_spectrum(stego_bgr_u8, sweeps)   # no moveaxis pass
    # rectified at 0: a negative recovered component is physically
    # impossible watermark signal (singular values are non-negative)
    # and is exactly what scale-reduction attacks inject — it inflated
    # the scale damp and anti-correlated the NC (resize50 detect 0.17
    # -> 0.57 at alpha=0.10 rectified; every probed negative stays
    # 0.000 and the full ROC battery re-validates the 0.30 threshold)
    sw_hat = jnp.maximum((s_cw - sc)[..., :k], 0.0) \
        / jnp.maximum(alpha, 1e-8)
    scores = _band_nc(sw[..., :k], sw_hat, -(-h // BLOCK), -(-w // BLOCK))
    return jnp.mean(scores, axis=-1)


# ---------------------------------------------------------------------------
# Translation resynchronization (detect under geometric misalignment)
# ---------------------------------------------------------------------------
#
# An 8x8-blocked scheme is structurally alignment-sensitive: translating
# the stego by even 1 px moves every block's content off the grid the
# stored sc/Sw were computed on, and the detect score collapses to ~0
# (measured — see bench.py --config robustness shift rows). The fix is a
# search, not a smarter statistic: detect is cheap (values-only spectrum,
# thousands of imgs/s/chip batched), so scoring every candidate
# realignment as ONE batched detect and taking the max recovers the
# aligned score at ~the cost of `candidates/batch-throughput`. A
# sub-block translation needs only the 8x8 intra-block offsets; larger
# translations additionally shift the block INDEX grid, which scrambles
# the keyed block permutation exactly like a wrong password — scores
# stay ~0 — so whole-block offsets must be part of the search radius,
# not inferred. Rotation has no ROLL-based realignment (the displacement
# varies across the frame), but it does have a resampling one: counter-
# rotating the stego about its center with the same bilinear warp an
# attacker used restores the block grid everywhere at once, so rotation
# becomes one more search axis (rot_range/rot_step below) — candidate
# angle × candidate shift, every cell scored by the same batched detect.
# The angle grid must be FINE: a residual angle error of dθ misaligns a
# block at radius r by ~r·dθ px and the grid tolerates well under 1 px,
# so recovering rotation at 1080p (corner radius ~1100 px) needs steps
# of ~0.05° — which is why the angle axis is opt-in (rot_range=0 keeps
# the cheap translation-only search) and why the 0.0 candidate is always
# in the grid (derotation by 0 is exact, so an unrotated stego can never
# score worse than the translation-only search).

@functools.partial(jax.jit, static_argnames=("color_frames",))
def _derotate(img: jax.Array, angle_deg: jax.Array,
              color_frames: bool = False) -> jax.Array:
    """Inverse-rotate ``img`` about its center by ``angle_deg`` degrees —
    the realignment candidate for a stego an attacker rotated with
    ``cv2.getRotationMatrix2D((w/2, h/2), angle_deg, 1.0)`` + warpAffine
    (bilinear): matches cv2's own inverse warp to ~1e-5 (probed on this
    toolchain). ``angle_deg`` is dynamic, so the whole angle grid replays
    one executable per image shape. _derotate(x, 0.0) is exactly x
    (integer-tap bilinear), keeping the 0-angle candidate lossless."""
    h, w = ((img.shape[-3], img.shape[-2]) if color_frames
            else (img.shape[-2], img.shape[-1]))
    # cv2 convention: rotation center (w/2, h/2), y-down coords; the
    # inverse map for attacker angle a samples source coords rotated by
    # +a: src = R(+a)·(dst − c) + c with R = [[cos, sin], [−sin, cos]].
    th = jnp.deg2rad(angle_deg.astype(jnp.float32))
    c, s = jnp.cos(th), jnp.sin(th)
    cy, cx = h * 0.5, w * 0.5
    yy = jnp.arange(h, dtype=jnp.float32)[:, None] - cy
    xx = jnp.arange(w, dtype=jnp.float32)[None, :] - cx
    src_x = jnp.broadcast_to(c * xx + s * yy + cx, (h, w))
    src_y = jnp.broadcast_to(-s * xx + c * yy + cy, (h, w))

    def rot_plane(p):
        return jax.scipy.ndimage.map_coordinates(
            p.astype(jnp.float32), [src_y, src_x], order=1,
            mode="constant", cval=0.0)

    out = (jax.vmap(rot_plane, in_axes=-1, out_axes=-1)(img)
           if color_frames else rot_plane(img))
    if jnp.issubdtype(img.dtype, jnp.integer):
        out = jnp.clip(jnp.round(out), 0, 255)
    return out.astype(img.dtype)


def _resync_angles(rot_range: float, rot_step: float):
    """Candidate attacker angles: 0 first (lossless identity), then the
    ± grid out to rot_range, nearest-first so equal scores keep the
    smallest-magnitude estimate."""
    if rot_range <= 0.0:
        return [0.0]
    n = int(round(rot_range / rot_step))
    out = [0.0]
    for k in range(1, n + 1):
        out += [k * rot_step, -k * rot_step]
    return out


def _resync_shifts(window: int, block_radius: int):
    """Candidate ROLL offsets covering every attacker translation with
    |t| <= 8*block_radius + window - 1 per axis (window=8 spans all
    sub-block offsets; block_radius adds whole-block rings)."""
    r = BLOCK * block_radius + (window - 1)
    return [(dy, dx) for dy in range(-r, r + 1)
            for dx in range(-r, r + 1)]


@functools.partial(jax.jit, static_argnames=("kfrac", "sweeps",
                                             "color_frames"))
def _detect_shift_chunk(img: jax.Array, sc: jax.Array, sw: jax.Array,
                        alpha: jax.Array, shifts: jax.Array,
                        kfrac: float = K_FRAC_DEFAULT,
                        sweeps: Optional[int] = None,
                        color_frames: bool = False) -> jax.Array:
    """Detect scores for a [S, 2] array of roll offsets of ONE image
    ([H, W] luma plane, or [H, W, 3] BGR u8 when color_frames): the rolls
    stack into the leading batch axis and ride the existing batched
    detect tail (one spectrum kernel launch for the whole chunk). The
    offsets are a DYNAMIC argument — every chunk of the search replays
    one executable per (image shape, chunk length) instead of recompiling
    per shift tuple."""
    axes = (-3, -2) if color_frames else (-2, -1)
    stack = jax.vmap(lambda s: jnp.roll(img, (s[0], s[1]), axis=axes)
                     )(shifts)
    h, w = (img.shape[-3], img.shape[-2]) if color_frames \
        else (img.shape[-2], img.shape[-1])
    k = k_of_block(kfrac)
    if color_frames:
        s_cw = _frames_spectrum(stack, sweeps)
    else:
        s_cw = _plane_spectrum(stack, sweeps)
    sw_hat = jnp.maximum((s_cw - sc)[..., :k], 0.0) \
        / jnp.maximum(alpha, 1e-8)
    scores = _band_nc(sw[..., :k], sw_hat, -(-h // BLOCK), -(-w // BLOCK))
    if color_frames:
        scores = jnp.mean(scores, axis=-1)
    return scores


def _detect_resync(img, sc, sw, alpha, *, kfrac, sweeps, window,
                   block_radius, chunk, color_frames,
                   rot_range=0.0, rot_step=0.05):
    shifts = np.asarray(_resync_shifts(window, block_radius), np.int32)
    # pad to a chunk multiple with (0, 0) so every chunk replays the SAME
    # executable (duplicate aligned candidates cost nothing and can only
    # tie, never beat, the true argmax)
    pad = (-len(shifts)) % chunk
    if pad:
        shifts = np.concatenate([shifts, np.zeros((pad, 2), np.int32)])
    best_score, best_shift, best_angle = -np.inf, (0, 0), 0.0

    def scan(angles):
        nonlocal best_score, best_shift, best_angle
        for a in angles:
            cand = img if a == 0.0 else _derotate(
                img, jnp.float32(a), color_frames=color_frames)
            for i in range(0, len(shifts), chunk):
                part = shifts[i:i + chunk]
                scores = np.asarray(_detect_shift_chunk(
                    cand, sc, sw, jnp.float32(alpha), jnp.asarray(part),
                    kfrac=kfrac, sweeps=sweeps, color_frames=color_frames))
                j = int(np.argmax(scores))
                if float(scores[j]) > best_score:
                    best_score = float(scores[j])
                    best_shift, best_angle = tuple(part[j]), a

    scan(_resync_angles(rot_range, rot_step))
    if rot_range > 0.0 and best_angle != 0.0:
        # refine around the coarse argmax at step/5: an attacker angle
        # OFF the coarse grid leaves a residual of up to step/2, which
        # at large frames already mis-tiles the outer blocks (~r·dθ px);
        # the fine pass recovers it for +8 candidates instead of a 5×
        # finer full grid
        fine = rot_step / 5.0
        scan([best_angle + k * fine
              for k in (-4, -3, -2, -1, 1, 2, 3, 4)])
    # the roll/derotation that realigned is the INVERSE of the attacker
    # translation; the angle grid is already in attacker units
    return (best_score, (-int(best_shift[0]), -int(best_shift[1])),
            float(best_angle))


def detect_gray_resync(stego_bgr_u8: jax.Array, sc: jax.Array,
                       sw: jax.Array, alpha, kfrac: float = K_FRAC_DEFAULT,
                       sweeps: Optional[int] = None, window: int = BLOCK,
                       block_radius: int = 0, chunk: int = 64,
                       rot_range: float = 0.0, rot_step: float = 0.05):
    """Geometry-searching detect on ONE [H, W, 3] frame: max detect
    score over every candidate realignment (see module section comment).
    Returns (score, (ty, tx), angle) — the estimated attacker translation
    in pixels and rotation in degrees ((0, 0), 0.0 for an aligned stego;
    boundary blocks wrap/zero-fill and damage at most one block ring,
    which the median-of-bands statistic absorbs). Defaults scan the 15×15
    sub-block offsets (~225 detects, one jit per chunk); raise
    ``block_radius`` to chase whole-block translations and set
    ``rot_range`` > 0 to add the counter-rotation axis (each candidate
    angle re-runs the full shift scan, so cost scales with
    2·rot_range/rot_step + 1 — ~41 derotations + ~9k batched detects at
    the ±1°/0.05° default, a few seconds at 1080p)."""
    y = color.luma_f32(stego_bgr_u8)
    return _detect_resync(y, sc, sw, alpha, kfrac=kfrac, sweeps=sweeps,
                          window=window, block_radius=block_radius,
                          chunk=chunk, color_frames=False,
                          rot_range=rot_range, rot_step=rot_step)


def detect_color_resync(stego_bgr_u8: jax.Array, sc: jax.Array,
                        sw: jax.Array, alpha,
                        kfrac: float = K_FRAC_DEFAULT,
                        sweeps: Optional[int] = None, window: int = BLOCK,
                        block_radius: int = 0, chunk: int = 64,
                        rot_range: float = 0.0, rot_step: float = 0.05):
    return _detect_resync(stego_bgr_u8, sc, sw, alpha, kfrac=kfrac,
                          sweeps=sweeps, window=window,
                          block_radius=block_radius, chunk=chunk,
                          color_frames=True,
                          rot_range=rot_range, rot_step=rot_step)


# ---------------------------------------------------------------------------
# Host orchestration (called from dctsvd_tpu.api for method='blocked')
# ---------------------------------------------------------------------------

# Blocked-meta digest schema version, written as `digest_v` in the meta.
#   v1 (pre round 3, implicit — metas carry no digest_v key): HMAC over
#      Sc/Uw/Vwt only, matching the parity modes' reference coverage.
#   v2: HMAC additionally covers Sw + mode/alpha/kfrac/sweeps/shape,
#      with sweeps packed as the FULL-sweep count (integral tiers only).
#   v3: identical coverage, but the sweeps slot packs the schedule's
#      TOTAL PAIR COUNT (full*28 + extra) so fractional tiers — which a
#      v2 digest could not represent — are authenticated exactly; the
#      meta additionally carries `sweeps_xpairs`.
# extract_array verifies whichever version the meta declares, so v1/v2
# metas written by earlier builds keep loading instead of failing with a
# misleading wrong-password error (a silent format break otherwise).
DIGEST_V = 3


def _digest_v1(key: bytes, sc: np.ndarray, uw: np.ndarray,
               vwt: np.ndarray) -> bytes:
    """Legacy blocked-meta HMAC (digest_v absent): Sc/Uw/Vwt only. Kept
    solely to VERIFY old metas — new metas always write DIGEST_V."""
    return crypto.meta_digest(
        key, [sc.tobytes(), uw.tobytes(), vwt.tobytes()])


def _digest_scalars(key: bytes, sc, uw, vwt, sw, *, mode: str,
                    alpha: float, kfrac: float, packed_sweeps: int,
                    shape) -> bytes:
    import struct
    scalars = (mode.encode() + struct.pack(
        "<ddqqq", float(alpha), float(kfrac), int(packed_sweeps),
        int(shape[0]), int(shape[1])))
    return crypto.meta_digest(
        key, [sc.tobytes(), uw.tobytes(), vwt.tobytes(), sw.tobytes(),
              scalars])


def _digest(key: bytes, sc: np.ndarray, uw: np.ndarray,
            vwt: np.ndarray, sw: np.ndarray, *, mode: str, alpha: float,
            kfrac: float, sweeps: int, xpairs: int = 0,
            version: int = DIGEST_V, shape) -> bytes:
    """Blocked-meta HMAC. Unlike the parity modes (whose coverage is
    pinned to the reference's Sc/Uw/Vwt order — io/meta.py docstring),
    the blocked scheme is this framework's own mode tag, so it
    authenticates EVERYTHING extraction consumes: a tampered Sw used to
    blank the output via the clamp, a flipped sweep schedule silently
    broke the residual cancellation, and an edited alpha rescaled the
    result — all behind a passing digest check. v3 packs the schedule as
    its total PAIR count (integer, exact for fractional tiers); the v2
    form packed the full-sweep count and is kept to VERIFY v2 metas."""
    from dctsvd_tpu.ops import wm_pallas
    if version >= 3:
        packed = (int(sweeps) * len(wm_pallas.PAIRS) + int(xpairs))
    else:
        packed = int(sweeps)   # v2: integral tiers only, by construction
    return _digest_scalars(key, sc, uw, vwt, sw, mode=mode, alpha=alpha,
                           kfrac=kfrac, packed_sweeps=packed, shape=shape)


def _indices(key, h: int, w: int):
    """key=None -> identity permutation (legacy open mode)."""
    if key is None:
        return (jnp.arange(n_blocks_of(h, w)),
                jnp.arange(BLOCK * BLOCK))
    blk, intra = crypto.block_permutation_indices(
        key, n_blocks_of(h, w), BLOCK * BLOCK)
    return jnp.asarray(blk), jnp.asarray(intra)


def embed_paths(cover: np.ndarray, wm_resized: np.ndarray, out_path: str,
                meta_path: str, *, alpha: float, color: bool, key: bytes,
                nonce: bytes, kfrac: float, payload_type: str = "image",
                extra_meta: Optional[dict] = None):
    """``wm_resized``: H×W×3 BGR for image payloads, or an H×W gray plane
    (e.g. a payload bit-plane) which skips the gray conversion."""
    h, w = cover.shape[:2]
    blk_idx, intra_idx = _indices(key, h, w)
    if color:
        res = embed_color(jnp.asarray(cover), jnp.asarray(wm_resized),
                          blk_idx, intra_idx, jnp.float32(alpha),
                          kfrac=kfrac)
        mode = metaio.MODE_BLOCKED_COLOR
    else:
        from dctsvd_tpu.ops import color as c_ops
        wm_in = jnp.asarray(wm_resized)
        wm_gray = c_ops.bgr_to_gray(wm_in) if wm_in.ndim == 3 else wm_in
        res = embed_gray(jnp.asarray(cover), wm_gray,
                         blk_idx, intra_idx, jnp.float32(alpha), kfrac=kfrac)
        mode = metaio.MODE_BLOCKED_GRAY
    sc = np.asarray(res.sc)
    uw = np.asarray(res.uw)
    vwt = np.asarray(res.vwt)
    sw = np.asarray(res.sw)
    out_path = metaio.default_stego_path(out_path)
    image_io.write_png(out_path, to_numpy(res.stego_bgr))
    sweeps, xpairs = embed_schedule_used()
    kw = dict(mode=mode, payload_type=payload_type,
              Sc=sc, Uw=uw, Vwt=vwt, Sw=sw,
              shape=np.asarray((h, w)), alpha=float(alpha),
              kfrac=float(kfrac), block=BLOCK,
              sweeps=sweeps, sweeps_xpairs=xpairs)
    if extra_meta:
        kw.update(extra_meta)
    if key is not None:
        kw["nonce"] = np.frombuffer(nonce, dtype=np.uint8)
        kw["digest_v"] = DIGEST_V
        kw["digest"] = np.frombuffer(
            _digest(key, sc, uw, vwt, sw, mode=mode, alpha=float(alpha),
                    kfrac=float(kfrac), sweeps=sweeps, xpairs=xpairs,
                    shape=(h, w)),
            dtype=np.uint8)
    meta_path = metaio._npz_path(meta_path)   # savez appends .npz itself
    np.savez_compressed(meta_path, **kw)
    return out_path, meta_path, float(res.psnr), float(res.ssim)


def extract_array(stego: np.ndarray, meta: metaio.Meta, key: bytes, *,
                  normalize: bool = True) -> np.ndarray:
    """HMAC-gated blocked extraction to a u8 array (gray plane or BGR)."""
    h, w = meta.shape
    sc = meta.arrays["Sc"]
    uw = meta.arrays["Uw"]
    vwt = meta.arrays["Vwt"]
    if meta.digest is not None:
        if key is None:
            raise ValueError("This meta requires a password.")
        if meta.digest_v >= 2:
            expected = _digest(key, sc, uw, vwt, meta.arrays["Sw"],
                               mode=meta.mode, alpha=float(meta.alpha),
                               kfrac=float(meta.kfrac),
                               sweeps=int(meta.sweeps),
                               xpairs=int(meta.sweeps_xpairs),
                               version=meta.digest_v, shape=(h, w))
        else:
            # pre-digest_v meta (earlier build): Sc/Uw/Vwt-only coverage.
            # Verified as written so old metas keep extracting; their
            # Sw/alpha/kfrac/sweeps ride UNauthenticated (legacy trust
            # assumption — re-embed to get full coverage).
            expected = _digest_v1(key, sc, uw, vwt)
        if not crypto.digests_equal(expected, meta.digest):
            raise ValueError(
                "Wrong password or corrupted meta (HMAC verification "
                f"failed; meta digest schema v{meta.digest_v}).")
    else:
        key = None                     # open-mode meta: identity indices
    blk_idx, intra_idx = _indices(key, h, w)
    inv_blk = jnp.argsort(blk_idx)
    inv_intra = jnp.argsort(intra_idx)
    fn = extract_color if meta.mode == metaio.MODE_BLOCKED_COLOR else extract_gray
    wm = fn(jnp.asarray(stego), jnp.asarray(sc), jnp.asarray(uw),
            jnp.asarray(vwt), inv_blk, inv_intra, jnp.float32(meta.alpha),
            kfrac=meta.kfrac, normalize=normalize,
            sw=jnp.asarray(meta.arrays["Sw"]),
            sweeps=meta.sched())
    return to_numpy(wm)


def extract_paths(stego: np.ndarray, meta: metaio.Meta, out_path: str,
                  key: bytes, *, normalize: bool, enhance: bool) -> str:
    wm_np = extract_array(stego, meta, key, normalize=normalize)
    if enhance:
        from dctsvd_tpu.models import enhance as m_enhance
        wm_np = (m_enhance.enhance_color_np(wm_np)
                 if meta.mode == metaio.MODE_BLOCKED_COLOR
                 else m_enhance.enhance_gray_np(wm_np))
    out_path = metaio.default_wm_path(out_path)
    image_io.write_png(out_path, wm_np)
    return out_path


def detect_paths(stego: np.ndarray, meta: metaio.Meta, thresh: float,
                 resync: bool = False, block_radius: int = 0,
                 rot_range: float = 0.0, rot_step: float = 0.05):
    """``resync=True`` always runs the translation search and returns the
    best realigned score (detect_gray_resync): the caller explicitly asked
    for it, and a translated stego can DEGRADE without missing the
    threshold (e.g. 3 px at 512² scores ~0.66 vs 0.30 — still "detected",
    but the caller wants the aligned ~0.99 and the recovered shift). The
    (0, 0) candidate is in the search and scores are exact, so an aligned
    stego returns the identical score it always did and the result is
    never worse than the plain detect. ``rot_range`` > 0 adds the counter-
    rotation axis to the search (attacker angle within ±rot_range°,
    resolved to rot_step). resync=False stays the single-dispatch fast
    path."""
    is_color = meta.mode == metaio.MODE_BLOCKED_COLOR
    fn = detect_color if is_color else detect_gray
    sc = jnp.asarray(meta.arrays["Sc"])
    sw = jnp.asarray(meta.arrays["Sw"])
    score = float(fn(jnp.asarray(stego), sc, sw,
                     jnp.float32(meta.alpha), kfrac=meta.kfrac,
                     sweeps=meta.sched()))
    if resync:
        rfn = detect_color_resync if is_color else detect_gray_resync
        score2, _shift, _angle = rfn(jnp.asarray(stego), sc, sw,
                                     meta.alpha, kfrac=meta.kfrac,
                                     sweeps=meta.sched(),
                                     block_radius=block_radius,
                                     rot_range=rot_range,
                                     rot_step=rot_step)
        score = max(score, score2)
    return bool(score >= thresh), score
