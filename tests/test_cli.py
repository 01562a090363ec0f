"""CLI surface tests (argument plumbing; the heavy model/pipeline calls are
stubbed — full-pipeline numerics are covered by test_pipeline/test_goldens)."""

import os

import numpy as np
import pytest


def _write_clip(tmp_path, name, t=3, s=8, seed=0):
    import cv2

    d = tmp_path / name
    d.mkdir()
    rs = np.random.RandomState(seed)
    for i in range(t):
        img = (rs.rand(s, s, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(d / f"{i:02d}.png"), img)
    return str(d)


def test_cli_batched_input_dirs_and_ddim_flags(tmp_path, monkeypatch):
    """--input-dirs stacks same-shape clips into (B,T,h,w,3), --sampler ddim
    maps a numeric --steps to the reference's exact-stride 'ddimN' respacing
    and auto-scales tau to the respaced trajectory fraction."""
    import flair_tpu.cli as cli

    d1 = _write_clip(tmp_path, "clipA", seed=1)
    d2 = _write_clip(tmp_path, "clipB", seed=2)

    seen = {}

    def fake_build_model(task, ckpt, exact_dcn=False):
        return object(), {}

    class FakeApply:
        params = {}

        def __call__(self, *a, **k):
            raise AssertionError("not called in stubbed run")

    def fake_wrap(d, model, params):
        return FakeApply()

    def fake_restore_video(frames, cfg, model_apply, **kw):
        seen["frames_shape"] = np.asarray(frames).shape
        seen["cfg"] = cfg
        seen["sampler"] = kw.get("sampler")
        seen["eta"] = kw.get("eta")
        b, t = frames.shape[:2]
        return np.zeros((b, t, cfg.output_size, cfg.output_size, 3),
                        np.float32)

    monkeypatch.setattr(cli, "build_model", fake_build_model)
    import flair_tpu.pipeline.video as pv
    import flair_tpu.pipeline.wrappers as pw

    monkeypatch.setattr(pw, "wrap_bicubic_model", fake_wrap)
    monkeypatch.setattr(pv, "restore_video", fake_restore_video)

    out_dir = str(tmp_path / "out")
    rc = cli.main([
        "x8_bicubic", "--input-dirs", f"{d1},{d2}", "--output-dir", out_dir,
        "--sampler", "ddim", "--steps", "25", "--no-face",
    ])
    assert rc == 0
    assert seen["frames_shape"] == (2, 3, 8, 8, 3)
    assert seen["sampler"] == "ddim"
    assert seen["cfg"].steps == "ddim25"
    # tau 5 (of the 100-step default trajectory) → 1 at 25 steps
    assert seen["cfg"].tau == 1
    assert os.path.exists(os.path.join(out_dir, "clipA", "0000.png"))
    assert os.path.exists(os.path.join(out_dir, "clipB", "0002.png"))


def test_cli_input_dirs_basename_collision_disambiguated(
        tmp_path, monkeypatch):
    """Clips whose directories share a basename must not overwrite each
    other's outputs (cli.py clip_names dedupe)."""
    import flair_tpu.cli as cli

    (tmp_path / "runA").mkdir()
    (tmp_path / "runB").mkdir()
    d1 = _write_clip(tmp_path / "runA", "frames", seed=1)
    d2 = _write_clip(tmp_path / "runB", "frames", seed=2)

    def fake_build_model(task, ckpt, exact_dcn=False):
        return object(), {}

    def fake_wrap(d, model, params):
        return lambda *a, **k: None

    def fake_restore_video(frames, cfg, model_apply, **kw):
        b, t = frames.shape[:2]
        return np.zeros((b, t, cfg.output_size, cfg.output_size, 3),
                        np.float32)

    monkeypatch.setattr(cli, "build_model", fake_build_model)
    import flair_tpu.pipeline.video as pv
    import flair_tpu.pipeline.wrappers as pw

    monkeypatch.setattr(pw, "wrap_bicubic_model", fake_wrap)
    monkeypatch.setattr(pv, "restore_video", fake_restore_video)

    out_dir = str(tmp_path / "out")
    rc = cli.main([
        "x8_bicubic", "--input-dirs", f"{d1},{d2}", "--output-dir", out_dir,
        "--no-face",
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(out_dir, "frames", "0000.png"))
    assert os.path.exists(os.path.join(out_dir, "frames_1", "0000.png"))


def test_tile_config_env_fallbacks(monkeypatch):
    """FLAIR_DCN_TILE is the advertised no-code-edit knob: malformed
    values must warn and fall back, not crash mid-trace."""
    from flair_tpu.models.vsrpp import _tile_config

    default = _tile_config(16)
    monkeypatch.setenv("FLAIR_DCN_TILE", "4,4")  # too few fields
    assert _tile_config(16) == default
    monkeypatch.setenv("FLAIR_DCN_TILE", "4x4,24,64,16")  # non-numeric
    assert _tile_config(16) == default
    monkeypatch.setenv("FLAIR_DCN_TILE", "4,8,8,64,8,lane")
    assert _tile_config(16)[:4] == ((4, 8), (24, 64), 8, True)
    # int8 window dots ride their own env toggle
    monkeypatch.setenv("FLAIR_DCN_INT8", "1")
    assert _tile_config(16)[4] is True
    monkeypatch.setenv("FLAIR_DCN_INT8", "0")
    assert _tile_config(16)[4] is False


def test_cli_rejects_mismatched_clip_shapes(tmp_path, monkeypatch):
    import flair_tpu.cli as cli

    d1 = _write_clip(tmp_path, "a", s=8)
    d2 = _write_clip(tmp_path, "b", s=16)
    with pytest.raises(SystemExit):
        cli.main(["x8_bicubic", "--input-dirs", f"{d1},{d2}", "--no-face"])
