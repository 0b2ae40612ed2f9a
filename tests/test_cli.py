import json

import cv2
import numpy as np
import pytest

from dctsvd_tpu import cli


@pytest.fixture()
def imgs(tmp_path, make_image):
    cp = str(tmp_path / "c.png")
    wp = str(tmp_path / "w.png")
    cv2.imwrite(cp, make_image(96, 96))
    cv2.imwrite(wp, make_image(32, 32, blur=False))
    return cp, wp


def test_cli_embed_detect_extract(tmp_path, imgs, capsys):
    cp, wp = imgs
    out = str(tmp_path / "s.png")
    rc = cli.main(["embed", cp, wp, "--out", out, "--password", "pw",
                   "--alpha", "0.12"])
    assert rc == 0
    res = json.loads(capsys.readouterr().out)
    assert res["psnr"] > 20

    rc = cli.main(["detect", res["stego"], res["meta"]])
    det = json.loads(capsys.readouterr().out)
    assert rc == 0 and det["watermarked"]

    rc = cli.main(["extract", res["stego"], res["meta"], "--out",
                   str(tmp_path / "x.png"), "--password", "pw",
                   "--no-enhance"])
    ex = json.loads(capsys.readouterr().out)
    assert rc == 0
    assert cv2.imread(ex["watermark"]) is not None


def test_cli_detect_clean_exits_nonzero(tmp_path, imgs, capsys):
    cp, wp = imgs
    out = str(tmp_path / "s.png")
    cli.main(["embed", cp, wp, "--out", out, "--password", "pw"])
    res = json.loads(capsys.readouterr().out)
    rc = cli.main(["detect", cp, res["meta"]])
    capsys.readouterr()
    assert rc == 1


def test_cli_payload(tmp_path, imgs, capsys):
    cp, _ = imgs
    out = str(tmp_path / "s.png")
    cli.main(["embed-payload", cp, "cli secret", "--out", out,
              "--password", "p", "--alpha", "0.15"])
    res = json.loads(capsys.readouterr().out)
    cli.main(["extract-payload", res["stego"], res["meta"],
              "--password", "p"])
    got = json.loads(capsys.readouterr().out)
    assert got["payload"] == "cli secret"


def test_cli_video(tmp_path, imgs, capsys, rng):
    from dctsvd_tpu.io import video_io
    cp, wp = imgs
    clip = str(tmp_path / "v.mp4")
    base = cv2.imread(cp)
    with video_io.VideoWriter(clip, 24.0, 96, 96) as w:
        for i in range(12):
            w.write(np.roll(base, i, axis=1))
    out = str(tmp_path / "marked.mp4")
    cli.main(["video-embed", clip, "--watermark", wp, "--out", out,
              "--frame-interval", "4"])
    res = json.loads(capsys.readouterr().out)
    cli.main(["video-extract", res["video"], res["meta"], "--out",
              str(tmp_path / "vw.png")])
    capsys.readouterr()
    cli.main(["video-info", clip])
    info = json.loads(capsys.readouterr().out)
    assert info["total_frames"] == 12
    rc = cli.main(["video-detect", clip, "--sample-rate", "4"])
    det = json.loads(capsys.readouterr().out)
    assert "watermark_likelihood" in det


def test_cli_video_embed_requires_watermark_or_text(tmp_path, capsys):
    """Neither or both of --watermark/--text is a usage error (rc 2), not
    an opaque cv2 crash deep in the frame loop (code-review r3)."""
    rc = cli.main(["video-embed", str(tmp_path / "host.mp4"),
                   "--out", str(tmp_path / "o.mp4")])
    assert rc == 2
    assert "exactly one of" in capsys.readouterr().err
    rc = cli.main(["video-embed", str(tmp_path / "host.mp4"),
                   "--watermark", "w.png", "--text", "hi",
                   "--out", str(tmp_path / "o.mp4")])
    assert rc == 2


def test_cli_default_meta_in_dotted_dir(tmp_path, imgs, capsys):
    """rsplit('.') on the whole path used to drop a dotted DIRECTORY
    ('results.v2/stego' -> sibling 'results_meta.npz')."""
    import os
    cp, wp = imgs
    d = tmp_path / "results.v2"
    d.mkdir()
    out = str(d / "stego.png")
    rc = cli.main(["embed", cp, wp, "--out", out, "--password", "pw",
                   "--method", "blocked"])
    assert rc == 0
    res = json.loads(capsys.readouterr().out)
    assert os.path.dirname(res["meta"]) == str(d)
    assert os.path.exists(res["meta"])


def test_text_fallback_clamps_wide_text():
    """The no-PIL rasterizer must clamp, not wrap, when the text is wider
    than the canvas (negative slice starts painted at the right edge and
    dropped most characters)."""
    from dctsvd_tpu.models import text as m_text
    w, h = 16, 16
    n = 20
    canvas = None
    # drive the fallback directly: simulate PIL absence via monkey-free
    # call of the except-branch logic by invoking with a size the PIL
    # path also handles, then force the fallback through a bad font_size
    # type is intrusive — instead call the module's fallback by blocking
    # _render_pil
    orig = m_text._render_pil
    m_text._render_pil = lambda *a, **k: (_ for _ in ()).throw(RuntimeError)
    try:
        canvas = m_text.create_text_watermark("A" * n, (w, h), font_size=8)
    finally:
        m_text._render_pil = orig
    assert canvas.shape == (h, w)
    assert canvas.sum() > 0          # something rendered
    assert canvas[:, :w // 2].sum() > 0   # starts at the LEFT, not wrapped
