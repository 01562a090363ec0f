"""Command-line interface mirroring the reference demo surface.

`python -m flair_tpu.cli <task> --input-dir ... --output-dir ...`
with the four demo tasks and their default hyper-parameters
(scripts/video_sample.py:265-556). PNG I/O via cv2 on host.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
from pathlib import Path

import numpy as np


def load_frames(input_dir: str) -> np.ndarray:
    """Natural-sorted PNG frames → (T, h, w, 3) RGB in [0, 1]
    (video_sample.py:337-345)."""
    import cv2
    import re

    def natkey(p):
        return [int(s) if s.isdigit() else s for s in re.split(r"(\d+)", p.name)]

    paths = sorted(Path(input_dir).glob("*.png"), key=natkey)
    if not paths:
        raise FileNotFoundError(f"no PNG frames in {input_dir}")
    frames = []
    for p in paths:
        img = cv2.imread(str(p), cv2.IMREAD_COLOR)
        frames.append(cv2.cvtColor(img, cv2.COLOR_BGR2RGB))
    return np.stack(frames).astype(np.float32) / 255.0


def save_frames(frames01: np.ndarray, output_dir: str) -> None:
    """(T, H, W, 3) [0,1] → PNGs (video_sample.py:487-492)."""
    import cv2

    os.makedirs(output_dir, exist_ok=True)
    for i, f in enumerate(frames01):
        img = (np.clip(f, 0, 1) * 255).astype(np.uint8)
        cv2.imwrite(
            str(Path(output_dir) / f"{i:04d}.png"),
            cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
        )


def build_model(task: str, checkpoint: str | None, *, dtype=None,
                exact_dcn: bool = False):
    """Construct the task's denoiser and parameters.

    With ``checkpoint``: load a converted (orbax/npz) or torch state dict via
    flair_tpu.utils.checkpoint. Without: random init (shape-correct end-to-end
    runs; quality requires released weights, README of the reference)."""
    import jax
    import jax.numpy as jnp

    from .models.registry import get_model
    from .pipeline.video import TASK_CONFIGS

    cfg = TASK_CONFIGS[task]
    dtype = dtype or jnp.bfloat16
    # exact_dcn: per-sample gather DCN instead of the flow-anchored patch
    # path (identical for the SR3 UNet, which the patch covers exactly;
    # escape hatch for the ADM UNet's rare |residue| > 6 samples — PERF.md)
    dcn = None if exact_dcn else "auto"
    if cfg.model_name == "bicubic_unet":
        model = get_model("bicubic_unet", dtype=dtype, dcn_patch_size=dcn)
        b, t = 1, 2
        x = jnp.zeros((b, t, 512, 512, 3))
        lvl = jnp.ones((b, t))
        lr = jnp.zeros((b, t, 512, 512, 3))
        init_args = (x, lvl, lr)
    else:
        model = get_model("blur_unet", dtype=dtype, dcn_patch_size=dcn)
        b, t = 1, 2
        x = jnp.zeros((b, t, 512, 512, 3))
        ts = jnp.zeros((b, t), jnp.int32)
        lr = jnp.zeros((b, t, 512, 512, 3))
        init_args = (x, ts, lr)

    if checkpoint:
        from .utils.checkpoint import load_params

        params = load_params(checkpoint, model, init_args)
    else:
        # no weights: materialise shape-correct random params WITHOUT
        # compiling a full 512² init forward (eval_shape is trace-only; a
        # real model.init costs minutes of XLA compile at this size)
        import numpy as np

        shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), *init_args)
        rng = np.random.default_rng(0)

        def make(s):
            if s.shape and s.shape[-1] != 0 and "float" in str(s.dtype):
                return jnp.asarray(
                    rng.standard_normal(s.shape, dtype=np.float32) * 0.02,
                    s.dtype,
                )
            return jnp.zeros(s.shape, s.dtype)

        params = jax.tree_util.tree_map(make, shapes)
    return model, params


def build_face_stack(task: str, *, checkpoint_dir: str | None = None,
                     output_size: int = 512):
    """Construct detector + CodeFormer + ParseNet appliers for the demo path
    (reference: FaceRestoreHelper init at video_sample.py:332, CodeFormer load
    at :351-359, fusion wiring at :446-479).

    Returns (face_helper, codeformer_apply, parsenet_apply). Weights load from
    ``checkpoint_dir`` ({retinaface,codeformer,parsenet}.{npz|pt...}) when
    given; random init otherwise (wiring-correct; quality requires released
    weights, as in the reference's auto-download path).
    """
    import jax
    import jax.numpy as jnp

    from .face.helper import FaceRestoreHelper
    from .models.codeformer import CodeFormer
    from .models.parsenet import ParseNet
    from .models.retinaface import RetinaFace, RetinaFaceDetector

    def _params(init_fn, name):
        if checkpoint_dir:
            import os as _os

            from .utils.checkpoint import load_params

            for ext in (".npz", ".pt", ".pth", ""):
                path = _os.path.join(checkpoint_dir, name + ext)
                if _os.path.exists(path):
                    return load_params(path, model_name=name)
        return init_fn(jax.random.PRNGKey(0))

    det_model = RetinaFace(network="resnet50")
    det_params = _params(
        lambda r: det_model.init(r, jnp.zeros((1, output_size, output_size, 3))),
        "retinaface",
    )
    detector = RetinaFaceDetector(det_model, det_params, network="resnet50")
    helper = FaceRestoreHelper(detector, face_size=output_size)

    # init with w=1.0 so the lazily-built SFT fuse blocks get params
    # (the demo applies CodeFormer with w=1, adain=True, video_sample.py:451)
    cf = CodeFormer(dtype=jnp.bfloat16)
    cf_params = _params(
        lambda r: cf.init(r, jnp.zeros((1, 512, 512, 3)), w=1.0, adain=True),
        "codeformer",
    )

    # params-threaded appliers (.apply_p/.params): inside the steps
    # sampler's update program the face nets are traced inline, and
    # closure-captured params would embed as HLO constants — the compile
    # wall documented in PERF.md. restore_video picks these up when present.
    def cf_apply_p(p, x):
        return cf.apply(p, x, w=1.0, adain=True)[0]

    codeformer_apply = jax.jit(lambda x: cf_apply_p(cf_params, x))
    codeformer_apply.apply_p = cf_apply_p
    codeformer_apply.params = cf_params

    pn = ParseNet(dtype=jnp.bfloat16)
    pn_params = _params(
        lambda r: pn.init(r, jnp.zeros((1, 512, 512, 3))), "parsenet"
    )

    def pn_apply_p(p, x):
        return pn.apply(p, x)[0]

    parsenet_apply = jax.jit(lambda x: pn_apply_p(pn_params, x))
    parsenet_apply.apply_p = pn_apply_p
    parsenet_apply.params = pn_params

    return helper, codeformer_apply, parsenet_apply


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="flair_tpu", description=__doc__)
    sub = p.add_subparsers(dest="task", required=True)
    for task in ("x8_bicubic", "x16_bicubic", "gaussian", "jpeg"):
        sp = sub.add_parser(task)
        sp.add_argument("--input-dir", default=f"/root/reference/data/{task}")
        sp.add_argument("--input-dirs", default=None,
                        help="comma-separated clip dirs restored BATCHED "
                             "through one compiled program pair (serving "
                             "throughput; clips must share frame count and "
                             "resolution). Outputs go to "
                             "<output-dir>/<clip-name>/")
        sp.add_argument("--output-dir", default=f"./results/{task}")
        sp.add_argument("--checkpoint", default=None)
        sp.add_argument("--steps", default=None)
        sp.add_argument("--w", type=float, default=None)
        sp.add_argument("--rho", type=float, default=None)
        sp.add_argument("--noise-level", type=float, default=None)
        sp.add_argument("--zeta", type=float, default=None)
        sp.add_argument("--tau", type=int, default=None)
        sp.add_argument("--jpeg-qf", type=int, default=None)
        sp.add_argument("--frames", type=int, default=None,
                        help="restore only the first N frames")
        sp.add_argument("--exact-dcn", action="store_true",
                        help="per-sample gather deformable conv (exact for "
                             "any residue magnitude; slower on TPU)")
        sp.add_argument("--no-face", action="store_true",
                        help="disable the CodeFormer face prior")
        sp.add_argument("--face-checkpoint-dir", default=None,
                        help="dir with converted retinaface/codeformer/"
                             "parsenet weights")
        sp.add_argument("--t-start", type=int, default=-1)
        sp.add_argument("--window", type=int, default=10)
        sp.add_argument("--overlap", type=int, default=3)
        sp.add_argument("--sampler", choices=("steps", "scan", "scan_p", "ddim"),
                        default="steps",
                        help="'steps': two jitted programs per guided step "
                             "(compile-robust, default); 'ddim': same "
                             "dispatch with the standard η-DDIM update — "
                             "the fast serving path (pair with --steps 25); "
                             "'scan_p': whole window as one program with all "
                             "data as arguments (no dispatch overhead); "
                             "'scan': legacy monolithic program "
                             "(bit-identical)")
        sp.add_argument("--eta", type=float, default=0.0,
                        help="DDIM stochasticity η (only with --sampler ddim)")

    args = p.parse_args(argv)

    import jax

    # persistent XLA compile cache (remote compiles take minutes here; the
    # bench and pipeline share these programs)
    cache = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from .diffusion import make_task_diffusion
    from .pipeline.video import TASK_CONFIGS, restore_video
    from .pipeline.wrappers import wrap_bicubic_model, wrap_blur_model

    cfg = TASK_CONFIGS[args.task]
    steps = args.steps
    if steps is not None and args.sampler == "ddim" and steps.isdigit():
        # `--sampler ddim --steps 25` → the reference's exact-stride "ddimN"
        # respacing (respace.py:23-31)
        steps = f"ddim{steps}"
    overrides = {
        k: v
        for k, v in dict(
            steps=steps, w=args.w, rho=args.rho,
            noise_level=args.noise_level, zeta=args.zeta, tau=args.tau,
            jpeg_qf=args.jpeg_qf,
        ).items()
        if v is not None
    }
    if args.t_start != -1:
        overrides["t_start"] = args.t_start
    cfg = dataclasses.replace(cfg, **overrides)

    clip_names = None
    if args.input_dirs:
        dirs = [s.strip() for s in args.input_dirs.split(",") if s.strip()]
        clip_names = [Path(s).name or f"clip{i}" for i, s in enumerate(dirs)]
        # basenames can collide (/a/frames, /b/frames) — disambiguate so
        # one clip's outputs don't silently overwrite another's
        seen: dict = {}
        for i, name in enumerate(clip_names):
            if name in seen:
                clip_names[i] = f"{name}_{i}"
            seen[name] = i
        clips = [load_frames(s) for s in dirs]
        if args.frames:
            clips = [c[: args.frames] for c in clips]
        shapes = {c.shape for c in clips}
        if len(shapes) != 1:
            p.error(f"--input-dirs clips differ in shape: {sorted(shapes)}")
        frames = np.stack(clips)  # (B, T, h, w, 3)
    else:
        frames = load_frames(args.input_dir)
        if args.frames:
            frames = frames[: args.frames]

    d = make_task_diffusion(cfg.task, cfg.steps)
    if args.tau is None and d.num_timesteps != 100:
        # default guidance windows (tau, demo defaults video_sample.py:499-556)
        # are stated in 100-respaced-step units; keep the same FRACTION of the
        # trajectory when the user respaces (e.g. ddim25 → tau 5 → 1)
        from .pipeline.video import scale_tau

        cfg = dataclasses.replace(cfg, tau=scale_tau(cfg.tau, d.num_timesteps))
    model, params = build_model(args.task, args.checkpoint,
                                exact_dcn=args.exact_dcn)
    wrap = (
        wrap_bicubic_model if cfg.model_name == "bicubic_unet" else wrap_blur_model
    )
    model_apply = wrap(d, model, params)

    face_helper = codeformer_apply = parsenet_apply = None
    if not args.no_face:
        face_helper, codeformer_apply, parsenet_apply = build_face_stack(
            args.task,
            checkpoint_dir=args.face_checkpoint_dir,
            output_size=cfg.output_size,
        )

    out = restore_video(
        frames, cfg, model_apply, diffusion=d,
        face_helper=face_helper,
        codeformer_apply=codeformer_apply,
        parsenet_apply=parsenet_apply,
        win=args.window, overlap=args.overlap,
        sampler=args.sampler, eta=args.eta,
    )
    if clip_names is not None:
        for name, clip in zip(clip_names, out):
            save_frames(clip, os.path.join(args.output_dir, name))
        print(f"wrote {out.shape[0]} clips x {out.shape[1]} frames to "
              f"{args.output_dir}")
    else:
        save_frames(out, args.output_dir)
        print(f"wrote {out.shape[0]} frames to {args.output_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
