"""Generate golden restoration outputs from the REFERENCE pipeline.

VERDICT r2 item 5 / BASELINE.md:20-23: the reference publishes no numbers
and no released weights are reachable here, so the golden procedure is —
run the reference demo driver semantics (scripts/video_sample.py:361-487
windowing + gaussian_diffusion.py:423-689 guided sampling with the
reference's OWN SpacedDiffusion + SRConv) on CPU at reduced size/steps
with a real, seeded-random reference sr3.UNet; archive its outputs + the
converted flax weights; every future round scores our restore_video
against the archive (tests/test_goldens.py) with tools/metrics.py.

Deterministic: rho=0 removes in-loop noise; torch.randn is stubbed to
zeros for the q_sample init on both sides.

Usage:  python tools/make_goldens.py            # writes goldens/x8_s64/
        python tools/make_goldens.py --check    # also run ours + report
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SIZE, FACTOR, T, WIN, OV, STEPS = 64, 8, 5, 3, 1, 4
W, RHO, ZETA, TAU = 0.85, 0.0, -1, 0
OUT_DIR = os.path.join(ROOT, "goldens", "x8_s64")
# x16 variant: same SRConv family at stride 16 (demo w=.7 rho=.85,
# video_sample.py:521-532); rho forced 0 for determinism like x8
X16_W = 0.7

# gaussian-task golden (BlurUNet + pseudoSR null-space consistency with the
# demo's active γ-schedule: noise_level=2.55, ζ=1 — video_sample.py:499-520)
G_SIZE, G_FACTOR, G_T, G_WIN, G_OV, G_STEPS = 64, 4, 5, 3, 1, 4
G_W, G_RHO, G_ZETA, G_TAU, G_NL = 0.75, 0.25, 1.0, 0, 2.55
G_OUT_DIR = os.path.join(ROOT, "goldens", "gaussian_s64")
# jpeg task adds the differentiable JPEG round-trip inside the consistency
# op (demo: w=.5 rho=.5 sigma=12.75 zeta=1 qf=60, video_sample.py:543-556)
J_W, J_RHO, J_NL, J_QF = 0.5, 0.5, 12.75, 60
J_OUT_DIR = os.path.join(ROOT, "goldens", "jpeg_s64")


def build_reference_unet():
    import torch
    from ref_shim import install_reference_shims

    install_reference_shims()
    torch.cuda.is_available = lambda: True  # unet.py:362 gates deform_align
    from guided_diffusion.sr3 import UNet as RefUNet

    torch.manual_seed(0)
    ref = RefUNet(
        in_channel=6, out_channel=3, inner_channel=32, norm_groups=16,
        channel_mults=(1, 2), attn_res=(32,), vsrpp_res=(64,),
        spatial_attn=False, temporal_attn=True, res_blocks=1, dropout=0.0,
        image_size=SIZE, cross_frame_module=True, num_frames=WIN, head_dim=8,
    ).eval()
    with torch.no_grad():
        # zero-init gates would silence the temporal paths entirely
        for _, p in ref.named_parameters():
            if p.abs().sum() == 0:
                p.normal_(0, 0.05)
    return ref


def run_reference(ref, degraded01, *, factor=FACTOR, w=W):
    """Faithful replication of the demo windowed driver over the reference's
    SpacedDiffusion.sample (the same replication the slow agreement test
    validates against restore_video, tests/test_convert_parity.py:260)."""
    import torch
    import torchvision.transforms.functional as VF

    from guided_diffusion import gaussian_diffusion as gd
    from guided_diffusion import respace as rsp
    from guided_diffusion import restore_util as ru

    from flair_tpu.pipeline.video import window_slices

    dcfg = dict(
        model_mean_type=gd.ModelMeanType.EPSILON,
        model_var_type=gd.ModelVarType.FIXED_SMALL,
        loss_type=gd.LossType.MSE,
        rescale_timesteps=False,
    )
    betas = gd.get_named_beta_schedule("face_bicubic", 2000)
    ref_d = rsp.SpacedDiffusion(
        use_timesteps=rsp.space_timesteps(2000, str(STEPS)), betas=betas,
        **dcfg)

    def bicubic_kernel(x, a=-0.5):
        if abs(x) <= 1:
            return (a + 2) * abs(x) ** 3 - (a + 3) * abs(x) ** 2 + 1
        if 1 < abs(x) < 2:
            return (a * abs(x) ** 3 - 5 * a * abs(x) ** 2
                    + 8 * a * abs(x) - 4 * a)
        return 0

    k = np.zeros(factor * 4)
    for i in range(factor * 4):
        k[i] = bicubic_kernel(
            (1 / factor) * (i - np.floor(factor * 4 / 2) + 0.5))
    k = k / k.sum()
    A = ru.SRConv(torch.from_numpy(k).float(), 3, SIZE,
                  torch.device("cpu"), stride=factor)

    dg = torch.from_numpy(degraded01.transpose(0, 3, 1, 2))[None]
    randn_orig, has_rl = torch.randn, hasattr(torch, "randn_like")
    randn_like_orig = torch.randn_like
    torch.randn = lambda *a, **kw: torch.zeros(
        *a, **{k_: v for k_, v in kw.items() if k_ != "generator"})
    torch.randn_like = lambda x: torch.zeros_like(x)
    try:
        prev = None
        rec = []
        for idx, length in window_slices(T, WIN, OV):
            sl = dg[:, idx: idx + length]
            init = VF.resize(sl.squeeze(0), (SIZE, SIZE),
                             VF.InterpolationMode.BICUBIC).clamp(0, 1)[None]
            sl_pm = (sl - 0.5) / 0.5
            init_pm = (init - 0.5) / 0.5
            noise = ref_d.q_sample(
                init_pm.reshape(length, 3, SIZE, SIZE),
                torch.full((length,), ref_d.num_timesteps - 1,
                           dtype=torch.long),
            )
            mk = {"low_res_input": init_pm, "num_frames": length,
                  "rnn_input": init_pm}
            rfn = lambda x: A.A_pinv(  # noqa: E731
                A.A(x.reshape(x.shape[0], -1))
                - sl_pm.reshape(x.shape[0], -1)
            ).reshape(*x.size())
            with torch.no_grad():
                out = ref_d.sample(
                    ref, noise, model_kwargs=mk, restore_fn=rfn,
                    face_restore_helper=None,
                    aux_model=lambda x0, t, xt: x0, post_fn=None,
                    clip_denoised=True, sample_mode="ddpm", w=w, tau=TAU,
                    rho=RHO, noise_level=0.0, prev_recon=prev, zeta=ZETA,
                    t_start=-1, aligned=True,
                )
            out = out.reshape(1, length, 3, SIZE, SIZE)
            if prev is not None:
                out = out[:, OV:]
            prev = out[:, -OV:].clone()
            rec.append(((out.clamp(-1, 1) + 1) / 2).numpy())
        return np.concatenate(rec, 1)[0].transpose(0, 2, 3, 1)
    finally:
        torch.randn = randn_orig
        if has_rl:
            torch.randn_like = randn_like_orig


def run_ours(variables, degraded01, *, task="x8_bicubic",
             factor=FACTOR, w=W, steps=str(STEPS), sampler="steps"):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from flair_tpu.diffusion import GuidanceConfig, make_task_diffusion
    from flair_tpu.models.sr3 import BicubicUNet
    from flair_tpu.pipeline.video import TASK_CONFIGS, restore_video
    from flair_tpu.pipeline.wrappers import wrap_bicubic_model

    cfg = dataclasses.replace(
        TASK_CONFIGS[task], output_size=SIZE, input_size=SIZE // factor,
        steps=steps, w=w, rho=RHO, zeta=ZETA, tau=TAU, noise_level=0.0,
        vsrpp_bg_weight=0.0,
    )
    d = make_task_diffusion(cfg.task, cfg.steps)
    model = BicubicUNet(
        inner_channel=32, norm_groups=16, channel_mults=(1, 2),
        attn_res=(32,), vsrpp_res=(64,), image_size=SIZE, res_blocks=1,
        num_frames=WIN, head_dim=8, temporal_attn=True,
        cross_frame_module=True,
    )
    model_apply = wrap_bicubic_model(d, model, variables)

    normal_orig = jax.random.normal

    def zeros_normal(key, shape=None, dtype=jnp.float32):
        return jnp.zeros(shape if shape is not None else (), dtype)

    jax.random.normal = zeros_normal
    try:
        return restore_video(
            degraded01, cfg, model_apply, diffusion=d,
            guidance=GuidanceConfig(use_aux=False, w=w, rho=RHO, tau=TAU,
                                    zeta=ZETA, noise_level=0.0),
            win=WIN, overlap=OV, pad_tail=False, sampler=sampler,
        )
    finally:
        jax.random.normal = normal_orig


def make_respace_divergence() -> dict:
    """VERDICT r3 #6: the serving headline's 4× comes from respacing 100
    DDPM steps to 25 DDIM steps (respace.py:7-66 sanctions respacing;
    nothing sanctions it for free). Quantify its quality cost at golden
    scale: run OUR pipeline from the ARCHIVED x8_s64 weights + input at
    the reference serving schedule (DDPM-100, deterministic ρ=0 — exactly
    η=0 DDIM on the 100-step trajectory) and at the bench headline
    schedule (guided DDIM-25, η=0); archive the DDPM-100 float output and
    record PSNR(DDIM-25, DDPM-100) so the serving config carries a
    measured divergence bound (tests/test_goldens.py asserts the floor).
    """
    gold = os.path.join(ROOT, "goldens", "x8_s64")
    if not os.path.exists(os.path.join(gold, "meta.json")):
        raise SystemExit("x8_s64 goldens missing; run make_goldens first")
    from flair_tpu.utils.checkpoint import unflatten_params

    meta_x8 = json.load(open(os.path.join(gold, "meta.json")))
    degraded01 = np.load(os.path.join(gold, "degraded01.npy"))
    variables = unflatten_params(dict(np.load(os.path.join(gold, "params.npz"))))
    out_dir = os.path.join(ROOT, "goldens", "respace_x8_s64")

    print("# running DDPM-100 (reference serving schedule)...", file=sys.stderr)
    ddpm100 = run_ours(variables, degraded01, w=meta_x8["w"],
                       steps="100", sampler="steps")
    print("# running guided DDIM-25 (bench headline schedule)...",
          file=sys.stderr)
    ddim25 = run_ours(variables, degraded01, w=meta_x8["w"],
                      steps="ddim25", sampler="ddim")

    from metrics import psnr, ssim

    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, "ddpm100.npy"), ddpm100.astype(np.float32))
    meta = {
        "task": "x8_bicubic",
        "size": meta_x8["size"], "factor": meta_x8["factor"],
        "frames": meta_x8["frames"], "win": meta_x8["win"],
        "overlap": meta_x8["overlap"],
        "w": meta_x8["w"], "rho": RHO, "zeta": ZETA, "tau": TAU,
        "weights": "goldens/x8_s64/params.npz (shared archive)",
        "psnr_ddim25_vs_ddpm100": round(psnr(ddim25, ddpm100), 3),
        "ssim_ddim25_vs_ddpm100": round(float(ssim(ddim25, ddpm100)), 5),
        "procedure": ("VERDICT r3 #6: same archived weights/input, "
                      "restore_video at steps='100' (ρ=0 DDPM ≡ η=0 DDIM "
                      "on the 100-step trajectory) vs steps='ddim25' "
                      "sampler='ddim' η=0; PSNR between the two"),
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print(json.dumps({k: meta[k] for k in (
        "psnr_ddim25_vs_ddpm100", "ssim_ddim25_vs_ddpm100")}))
    print(f"wrote {out_dir}", file=sys.stderr)
    return meta


def build_reference_blur_unet():
    import torch
    from ref_shim import install_reference_shims

    install_reference_shims()
    torch.cuda.is_available = lambda: True
    from guided_diffusion.unet_new import UNetModel as RefUNet

    torch.manual_seed(0)
    ref = RefUNet(
        image_size=G_SIZE, in_channels=6, model_channels=32, out_channels=6,
        num_res_blocks=1, attention_resolutions=(2,), rnn_resolutions=(1,),
        channel_mult=(1, 2), num_heads=1, num_head_channels=8,
        use_scale_shift_norm=True, resblock_updown=True, temporal_block=True,
    ).eval()
    # the reference hardcodes emb_layers=Linear(512,512) in
    # AttentionbottleBlock (unet_new.py:399), valid only at
    # model_channels=128; re-size for the scaled config
    ref.middle_block[2].emb_layers[1] = torch.nn.Linear(128, 64)
    with torch.no_grad():
        for _, p in ref.named_parameters():
            if p.abs().sum() == 0:
                p.normal_(0, 0.05)
    return ref


def run_reference_gaussian(ref, degraded01, *, w=G_W, rho=G_RHO,
                           noise_level=G_NL, jpeg_qf=-1):
    """The demo's gaussian-task windowed driver (video_sample.py:371-487)
    against the reference's SpacedDiffusion + pseudoSR."""
    import torch
    import torch.nn.functional as F
    import torchvision.transforms.functional as VF

    from guided_diffusion import gaussian_diffusion as gd
    from guided_diffusion import pseudoSR as ref_ps
    from guided_diffusion import respace as rsp

    from flair_tpu.operators.factory import load_blur_kernel
    from flair_tpu.pipeline.video import window_slices

    dcfg = dict(
        model_mean_type=gd.ModelMeanType.EPSILON,
        model_var_type=gd.ModelVarType.LEARNED_RANGE,
        loss_type=gd.LossType.RESCALED_MSE,
        rescale_timesteps=False,
    )
    betas = gd.get_named_beta_schedule("face_blur", 1000)
    ref_d = rsp.SpacedDiffusion(
        use_timesteps=rsp.space_timesteps(1000, str(G_STEPS)), betas=betas,
        **dcfg)

    if jpeg_qf != -1:
        from guided_diffusion.jpeg import jpeg_decode, jpeg_encode

    conf = ref_ps.Get_pseudoSR_Conf(G_FACTOR)
    conf.sigmoid_range_limit = False
    conf.input_range = np.array(None)
    A = ref_ps.pseudoSR(
        conf, upscale_kernel=load_blur_kernel(3), kernel_indx=10
    ).WrapArchitecture_PyTorch()

    dg = torch.from_numpy(degraded01.transpose(0, 3, 1, 2))[None]
    randn_orig = torch.randn
    randn_like_orig = torch.randn_like
    torch.randn = lambda *a, **kw: torch.zeros(
        *a, **{k_: v for k_, v in kw.items() if k_ != "generator"})
    torch.randn_like = lambda x: torch.zeros_like(x)
    try:
        prev = None
        rec = []
        for idx, length in window_slices(G_T, G_WIN, G_OV):
            sl = dg[:, idx: idx + length]
            init = F.interpolate(
                sl.squeeze(0), (G_SIZE, G_SIZE), mode="area"
            ).clamp(0, 1)[None]
            sl_pm = (sl - 0.5) / 0.5
            init_pm = (init - 0.5) / 0.5
            noise = ref_d.q_sample(
                init_pm.reshape(length, 3, G_SIZE, G_SIZE),
                torch.full((length,), ref_d.num_timesteps - 1,
                           dtype=torch.long),
            )
            rnn = VF.normalize(
                VF.resize(
                    VF.normalize(
                        sl_pm.reshape(length, 3, *sl_pm.shape[-2:]),
                        0.5, 0.5),
                    (G_SIZE, G_SIZE), VF.InterpolationMode.BICUBIC),
                -1, 2,
            ).view(1, length, 3, G_SIZE, G_SIZE).clamp(-1, 1)
            mk = {"low_res_input": init_pm, "num_frames": length,
                  "enable_cross_frames": True, "vsrpp_weights": 1.0,
                  "rnn_input": rnn}
            rfn = lambda x: A.A_pinv(  # noqa: E731
                sl_pm.reshape(-1, 3, *sl_pm.shape[-2:]), x,
                jpeg_encode=(lambda im: jpeg_encode(im, jpeg_qf))
                if jpeg_qf != -1 else None,
                jpeg_decode=(lambda im: jpeg_decode(im, jpeg_qf))
                if jpeg_qf != -1 else None)
            with torch.no_grad():
                out = ref_d.sample(
                    ref, noise, model_kwargs=mk, restore_fn=rfn,
                    face_restore_helper=None,
                    aux_model=lambda x0, t, xt: x0, post_fn=None,
                    clip_denoised=True, sample_mode="ddpm", w=w, tau=G_TAU,
                    rho=rho, noise_level=noise_level, prev_recon=prev,
                    zeta=G_ZETA, t_start=-1, aligned=True,
                )
            out = out.reshape(1, length, 3, G_SIZE, G_SIZE)
            if prev is not None:
                out = out[:, G_OV:]
            prev = out[:, -G_OV:].clone()
            rec.append(((out.clamp(-1, 1) + 1) / 2).numpy())
        return np.concatenate(rec, 1)[0].transpose(0, 2, 3, 1)
    finally:
        torch.randn = randn_orig
        torch.randn_like = randn_like_orig


def run_ours_gaussian(variables, degraded01, *, task="gaussian", w=G_W,
                      rho=G_RHO, noise_level=G_NL, jpeg_qf=-1,
                      steps=str(G_STEPS), sampler="steps"):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from flair_tpu.diffusion import GuidanceConfig, make_task_diffusion
    from flair_tpu.models.adm import BlurUNet
    from flair_tpu.pipeline.video import TASK_CONFIGS, restore_video
    from flair_tpu.pipeline.wrappers import wrap_blur_model

    cfg = dataclasses.replace(
        TASK_CONFIGS[task], output_size=G_SIZE,
        input_size=G_SIZE // G_FACTOR, steps=steps,
        w=w, rho=rho, zeta=G_ZETA, tau=G_TAU, noise_level=noise_level,
        jpeg_qf=jpeg_qf,
    )
    d = make_task_diffusion(cfg.task, cfg.steps)
    model = BlurUNet(
        image_size=G_SIZE, in_channels=6, model_channels=32, out_channels=6,
        num_res_blocks=1, attention_resolutions=(2,), rnn_resolutions=(1,),
        channel_mult=(1, 2), num_heads=1, num_head_channels=8,
        use_scale_shift_norm=True, resblock_updown=True, temporal_block=True,
        temporal_frames=5,
    )
    model_apply = wrap_blur_model(d, model, variables)

    normal_orig = jax.random.normal

    def zeros_normal(key, shape=None, dtype=jnp.float32):
        return jnp.zeros(shape if shape is not None else (), dtype)

    jax.random.normal = zeros_normal
    try:
        return restore_video(
            degraded01, cfg, model_apply, diffusion=d,
            guidance=GuidanceConfig(
                use_aux=False, w=w, rho=rho, tau=G_TAU, zeta=G_ZETA,
                noise_level=noise_level),
            win=G_WIN, overlap=G_OV, pad_tail=False, sampler=sampler,
        )
    finally:
        jax.random.normal = normal_orig


def make_respace_divergence_gaussian() -> dict:
    """VERDICT r4 #7: the x8 divergence golden bounds DDIM-25 against
    DDPM-100 for the x8 schedule family only (linspace 1e-6→1e-2, 2000
    steps); the gaussian/jpeg demos ride the OTHER family (`face_blur`,
    1000 steps — gaussian_diffusion.py:24-36) whose respacing behaves
    differently. Same procedure from the archived gaussian_s64 weights:
    archive the DDPM-100 float output, record PSNR(DDIM-25, DDPM-100)."""
    gold = os.path.join(ROOT, "goldens", "gaussian_s64")
    if not os.path.exists(os.path.join(gold, "meta.json")):
        raise SystemExit("gaussian_s64 goldens missing; run make_goldens "
                         "--task=gaussian first")
    from flair_tpu.utils.checkpoint import unflatten_params

    meta_g = json.load(open(os.path.join(gold, "meta.json")))
    degraded01 = np.load(os.path.join(gold, "degraded01.npy"))
    variables = unflatten_params(
        dict(np.load(os.path.join(gold, "params.npz"))))
    out_dir = os.path.join(ROOT, "goldens", "respace_gaussian_s64")

    print("# running gaussian DDPM-100 (reference serving schedule)...",
          file=sys.stderr)
    ddpm100 = run_ours_gaussian(
        variables, degraded01, w=meta_g["w"], rho=meta_g["rho"],
        noise_level=meta_g["noise_level"], steps="100", sampler="steps")
    print("# running gaussian guided DDIM-25 (bench headline schedule)...",
          file=sys.stderr)
    ddim25 = run_ours_gaussian(
        variables, degraded01, w=meta_g["w"], rho=meta_g["rho"],
        noise_level=meta_g["noise_level"], steps="ddim25", sampler="ddim")

    from metrics import psnr, ssim

    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, "ddpm100.npy"), ddpm100.astype(np.float32))
    meta = {
        "task": "gaussian",
        "size": meta_g["size"], "factor": meta_g["factor"],
        "frames": meta_g["frames"], "win": meta_g["win"],
        "overlap": meta_g["overlap"],
        "w": meta_g["w"], "rho": meta_g["rho"],
        "zeta": meta_g["zeta"], "tau": meta_g["tau"],
        "noise_level": meta_g["noise_level"],
        "weights": "goldens/gaussian_s64/params.npz (shared archive)",
        "psnr_ddim25_vs_ddpm100": round(psnr(ddim25, ddpm100), 3),
        "ssim_ddim25_vs_ddpm100": round(float(ssim(ddim25, ddpm100)), 5),
        "procedure": ("VERDICT r4 #7: same archived weights/input, "
                      "restore_video at steps='100' (ρ-rule on the "
                      "face_blur/1000 schedule) vs steps='ddim25' "
                      "sampler='ddim' η=0; PSNR between the two"),
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print(json.dumps({k: meta[k] for k in (
        "psnr_ddim25_vs_ddpm100", "ssim_ddim25_vs_ddpm100")}))
    print(f"wrote {out_dir}", file=sys.stderr)
    return meta


def make_gaussian_golden(check: bool, *, jpeg: bool = False) -> dict:
    import cv2
    import torch

    from flair_tpu.utils.checkpoint import flatten_params
    from flair_tpu.utils.convert import convert_blur_unet

    ref = build_reference_blur_unet()
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = convert_blur_unet(
        state, channel_mult=(1, 2), num_res_blocks=1,
        attention_ds=(2,), rnn_ds=(1,),
    )
    task = "jpeg" if jpeg else "gaussian"
    w, rho, nl, qf = ((J_W, J_RHO, J_NL, J_QF) if jpeg
                      else (G_W, G_RHO, G_NL, -1))
    out_dir = J_OUT_DIR if jpeg else G_OUT_DIR
    rs = np.random.RandomState(0)
    degraded01 = rs.rand(
        G_T, G_SIZE // G_FACTOR, G_SIZE // G_FACTOR, 3).astype(np.float32)

    print(f"# running reference {task} driver...", file=sys.stderr)
    ref_out = run_reference_gaussian(ref, degraded01, w=w, rho=rho,
                                     noise_level=nl, jpeg_qf=qf)

    os.makedirs(out_dir, exist_ok=True)
    for i, f in enumerate(ref_out):
        cv2.imwrite(
            os.path.join(out_dir, f"ref_{i:03d}.png"),
            cv2.cvtColor((np.clip(f, 0, 1) * 255).round().astype(np.uint8),
                         cv2.COLOR_RGB2BGR),
        )
    np.save(os.path.join(out_dir, "degraded01.npy"), degraded01)
    np.savez(os.path.join(out_dir, "params.npz"),
             **flatten_params(variables))
    meta = {
        "task": task,
        "size": G_SIZE, "factor": G_FACTOR, "frames": G_T, "win": G_WIN,
        "overlap": G_OV, "steps": G_STEPS,
        "w": w, "rho": rho, "zeta": G_ZETA, "tau": G_TAU,
        "noise_level": nl, "jpeg_qf": qf,
        "model": "unet_new.UNetModel mc=32 cm=(1,2) attn=(2,) rnn=(1,) tf=5",
        "seed": 0,
        "procedure": f"BASELINE.md:20-23 reduced-step CPU golden ({task})",
    }
    if check:
        print(f"# running our {task} pipeline...", file=sys.stderr)
        ours = run_ours_gaussian(variables, degraded01, task=task, w=w,
                                 rho=rho, noise_level=nl, jpeg_qf=qf)
        from metrics import psnr, ssim

        meta["psnr_vs_ref_float"] = round(psnr(ours, ref_out), 3)
        meta["ssim_vs_ref_float"] = round(float(ssim(ours, ref_out)), 5)
        print(json.dumps({k: meta[k] for k in
                          ("psnr_vs_ref_float", "ssim_vs_ref_float")}))
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print(f"wrote {out_dir}", file=sys.stderr)
    return meta


def main() -> int:
    check = "--check" in sys.argv

    # this machine's sitecustomize registers the axon TPU plugin at
    # interpreter startup; the goldens are a CPU procedure — pin the
    # platform BEFORE the first backend touch (tests/conftest.py pattern)
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    task = "all"
    for a in sys.argv[1:]:
        if a.startswith("--task="):
            task = a.split("=", 1)[1]
    if task in ("gaussian", "all"):
        make_gaussian_golden(check)
    if task in ("jpeg", "all"):
        make_gaussian_golden(check, jpeg=True)
    if task == "respace":
        # divergence goldens reuse the archived x8_s64/gaussian_s64
        # weights — run AFTER (or without regenerating) those goldens
        make_respace_divergence()
        make_respace_divergence_gaussian()
        return 0
    if task == "respace_gaussian":
        make_respace_divergence_gaussian()
        return 0
    if task not in ("x8", "x16", "all"):
        return 0

    ref = build_reference_unet()
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    from flair_tpu.utils.checkpoint import flatten_params
    from flair_tpu.utils.convert import convert_bicubic_unet

    variables = convert_bicubic_unet(state, channel_mults=(1, 2),
                                     res_blocks=1)

    variants = []
    if task in ("x8", "all"):
        variants.append(("x8_bicubic", 8, W, OUT_DIR))
    if task in ("x16", "all"):
        variants.append(("x16_bicubic", 16, X16_W,
                         os.path.join(ROOT, "goldens", "x16_s64")))

    import cv2

    for vtask, factor, w, out_dir in variants:
        rs = np.random.RandomState(0)
        degraded01 = rs.rand(T, SIZE // factor, SIZE // factor, 3).astype(
            np.float32)

        print(f"# running reference driver ({vtask})...", file=sys.stderr)
        ref_out = run_reference(ref, degraded01, factor=factor, w=w)

        os.makedirs(out_dir, exist_ok=True)
        for i, f in enumerate(ref_out):
            cv2.imwrite(
                os.path.join(out_dir, f"ref_{i:03d}.png"),
                cv2.cvtColor(
                    (np.clip(f, 0, 1) * 255).round().astype(np.uint8),
                    cv2.COLOR_RGB2BGR),
            )
        np.save(os.path.join(out_dir, "degraded01.npy"), degraded01)
        np.savez(os.path.join(out_dir, "params.npz"),
                 **flatten_params(variables))
        meta = {
            "task": vtask,
            "size": SIZE, "factor": factor, "frames": T, "win": WIN,
            "overlap": OV, "steps": STEPS,
            "w": w, "rho": RHO, "zeta": ZETA, "tau": TAU,
            "model": ("sr3.UNet ic=32 cm=(1,2) attn=(32,) vsrpp=(64,) "
                      "nf=3 hd=8"),
            "seed": 0,
            "procedure": "BASELINE.md:20-23 reduced-step CPU golden",
        }

        if check:
            print(f"# running our pipeline ({vtask})...", file=sys.stderr)
            ours = run_ours(variables, degraded01, task=vtask,
                            factor=factor, w=w)
            from metrics import psnr, ssim

            meta["psnr_vs_ref_float"] = round(psnr(ours, ref_out), 3)
            meta["ssim_vs_ref_float"] = round(float(ssim(ours, ref_out)), 5)
            print(json.dumps({k: meta[k] for k in
                              ("psnr_vs_ref_float", "ssim_vs_ref_float")}))

        with open(os.path.join(out_dir, "meta.json"), "w") as f:
            json.dump(meta, f, indent=1)
        print(f"wrote {out_dir}", file=sys.stderr)
    if task == "all":
        make_respace_divergence()
        make_respace_divergence_gaussian()
    return 0


if __name__ == "__main__":
    sys.exit(main())
