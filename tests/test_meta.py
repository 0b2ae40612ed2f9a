"""Meta serialization (io/meta.py): the (sweeps, sweeps_xpairs) integer
pair that carries fractional Jacobi schedules, schema back-compat, and the
pairs-per-sweep constant pin."""

import os

import numpy as np
import pytest

from dctsvd_tpu.io import meta as metaio
from dctsvd_tpu.ops import wm_pallas


def test_pairs_per_sweep_pin():
    """io/meta.py duplicates the pairs-per-sweep constant rather than
    importing the Pallas stack into the IO layer; this pin is the
    contract that keeps the two in lockstep."""
    assert metaio._PAIRS_PER_SWEEP == len(wm_pallas.PAIRS) == 28


def _mk_meta(sweeps=0, xpairs=0):
    return metaio.Meta(mode="blocked_gray", payload_type="image",
                       alpha=0.1, kfrac=1.0, shape=(64, 64), nonce=None,
                       digest=None, arrays={}, sweeps=sweeps,
                       sweeps_xpairs=xpairs)


def test_meta_sched_values():
    """Meta.sched(): the in-process sweep value the kernel layer takes —
    int for integral schedules (0 = converged/XLA embed), the pair-grid
    float otherwise, normalized the same way as wm_pallas.sched_join."""
    assert _mk_meta(0, 0).sched() == 0
    v2 = _mk_meta(2, 0).sched()
    assert v2 == 2 and isinstance(v2, int)
    assert _mk_meta(1, 14).sched() == 1.5
    assert _mk_meta(1, 7).sched() == 1.25
    # un-normalized pair counts normalize instead of producing a value
    # sched_split could not reproduce
    assert _mk_meta(1, 28).sched() == 2
    # sched values round-trip through the kernel layer's splitter
    for full in range(3):
        for xp in (0, 1, 7, 14, 21, 27):
            v = _mk_meta(full, xp).sched()
            assert wm_pallas.sched_split(v) == (full, xp)


def test_image_meta_xpairs_roundtrip(tmp_path):
    """sweeps_xpairs rides save->load exactly; metas written by builds
    that predate the key load as 0 extra pairs (integral schedule)."""
    p = str(tmp_path / "m.npz")
    np.savez_compressed(p, mode="blocked_gray", payload_type="image",
                        alpha=0.1, kfrac=1.0, shape=np.asarray((64, 64)),
                        sweeps=np.int64(1), sweeps_xpairs=np.int64(14),
                        Sc=np.ones((2, 2), np.float32))
    m = metaio.load_meta(p)
    assert (m.sweeps, m.sweeps_xpairs) == (1, 14)
    assert m.sched() == 1.5
    # the key is a recognized scalar, not leaked into arrays
    assert "sweeps_xpairs" not in m.arrays and "Sc" in m.arrays

    legacy = str(tmp_path / "legacy.npz")
    np.savez_compressed(legacy, mode="blocked_gray", payload_type="image",
                        alpha=0.1, kfrac=1.0, shape=np.asarray((64, 64)),
                        sweeps=np.int64(2),
                        Sc=np.ones((2, 2), np.float32))
    ml = metaio.load_meta(legacy)
    assert (ml.sweeps, ml.sweeps_xpairs) == (2, 0)
    assert ml.sched() == 2 and isinstance(ml.sched(), int)


def test_video_meta_xpairs_roundtrip(tmp_path):
    p = str(tmp_path / "vm.npz")
    vm = metaio.VideoMeta(
        frame_indices=np.asarray([0, 5], np.int64),
        s_orig=np.ones((2, 4), np.float32),
        uw=np.eye(4, dtype=np.float32), sw=np.ones(4, np.float32),
        vtw=np.eye(4, dtype=np.float32), alpha=0.05, frame_interval=5,
        watermark_shape=(4, 4), sweeps=1, sweeps_xpairs=21)
    ret = metaio.save_video_meta(p, vm)
    back = metaio.load_video_meta(ret)
    assert (back.sweeps, back.sweeps_xpairs) == (1, 21)
    assert back.sched() == 1.75
