"""Weight-conversion parity: load the reference torch module with random
weights, convert with flair_tpu.utils.convert, and compare full forward
outputs (SURVEY.md §4 layer-2 parity strategy; reference load sites
video_sample.py:327-359, facelib/*/__init__.py)."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _import_reference(modname):
    from ref_shim import install_reference_shims

    install_reference_shims()
    import importlib

    return importlib.import_module(modname)


@pytest.mark.slow
def test_codeformer_conversion_full_forward_parity():
    """Reference CodeFormer (torch, random init) vs our flax CodeFormer with
    converted weights: out / logits / lq_feat must agree (codeformer.py:
    692-753 forward; fuse hooks at :659-675)."""
    torch = pytest.importorskip("torch")
    try:
        ref_mod = _import_reference("guided_diffusion.codeformer")
    except Exception as e:
        pytest.skip(f"reference not importable: {e}")

    torch.manual_seed(0)
    ref = ref_mod.CodeFormer(
        dim_embd=512, n_head=8, n_layers=9, codebook_size=1024,
        connect_list=["32", "64", "128", "256"],
    ).eval()
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    from flair_tpu.models.codeformer import CodeFormer
    from flair_tpu.utils.convert import convert_codeformer

    variables = convert_codeformer(state)
    model = CodeFormer()

    x = np.random.RandomState(0).rand(1, 512, 512, 3).astype(np.float32) * 2 - 1
    with torch.no_grad():
        t_out, t_logits, t_lq = ref(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), w=1.0, adain=True
        )
    j_out, j_logits, j_lq = model.apply(
        variables, jnp.asarray(x), w=1.0, adain=True
    )

    np.testing.assert_allclose(
        np.asarray(j_lq), t_lq.numpy().transpose(0, 2, 3, 1), atol=2e-3,
        err_msg="encoder latent mismatch",
    )
    np.testing.assert_allclose(
        np.asarray(j_logits), t_logits.numpy(), atol=2e-2,
        err_msg="transformer logits mismatch",
    )
    np.testing.assert_allclose(
        np.asarray(j_out), t_out.numpy().transpose(0, 2, 3, 1), atol=5e-2,
        err_msg="generator output mismatch",
    )


@pytest.mark.slow
def test_parsenet_conversion_full_forward_parity():
    """Reference ParseNet (torch, random init + random BN stats) vs our flax
    ParseNet with converted weights (parsenet.py:140-194)."""
    torch = pytest.importorskip("torch")
    try:
        ref_mod = _import_reference("guided_diffusion.facelib.parsing.parsenet")
    except Exception as e:
        pytest.skip(f"reference not importable: {e}")

    torch.manual_seed(0)
    ref = ref_mod.ParseNet(in_size=512, out_size=512, parsing_ch=19).eval()
    # randomise BN running stats so the conversion of batch_stats is load-bearing
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)
    state = {
        k: v.detach().numpy()
        for k, v in ref.state_dict().items()
        if "num_batches_tracked" not in k
    }

    from flair_tpu.models.parsenet import ParseNet
    from flair_tpu.utils.convert import convert_parsenet

    variables = convert_parsenet(state)
    model = ParseNet()

    x = np.random.RandomState(1).rand(1, 512, 512, 3).astype(np.float32) * 2 - 1
    with torch.no_grad():
        t_mask, t_img = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    j_mask, j_img = model.apply(variables, jnp.asarray(x))

    np.testing.assert_allclose(
        np.asarray(j_mask), t_mask.numpy().transpose(0, 2, 3, 1), atol=2e-3,
        err_msg="parse mask logits mismatch",
    )
    np.testing.assert_allclose(
        np.asarray(j_img), t_img.numpy().transpose(0, 2, 3, 1), atol=2e-3,
        err_msg="parse out_img mismatch",
    )


@pytest.mark.slow
def test_bicubic_unet_conversion_full_forward_parity():
    """Reference sr3.UNet (torch, random init, randomised zero-init gates so
    the temporal paths are live) vs our BicubicUNet with converted weights:
    full forward incl. 3-D conv, temporal attention and VSR++ with SPyNet
    flows + deformable alignment (sr3.py:317-525, unet.py:313-758)."""
    torch = pytest.importorskip("torch")
    from ref_shim import install_reference_shims

    install_reference_shims()
    torch.cuda.is_available = lambda: True  # unet.py:362 gates deform_align
    try:
        from guided_diffusion.sr3 import UNet as RefUNet
    except Exception as e:
        pytest.skip(f"reference not importable: {e}")

    torch.manual_seed(0)
    ref = RefUNet(
        in_channel=6, out_channel=3, inner_channel=32, norm_groups=16,
        channel_mults=(1, 2), attn_res=(32,), vsrpp_res=(64,),
        spatial_attn=False, temporal_attn=True, res_blocks=1, dropout=0.0,
        image_size=64, cross_frame_module=True, num_frames=3, head_dim=8,
    ).eval()
    with torch.no_grad():
        for _, p in ref.named_parameters():
            if p.abs().sum() == 0:
                p.normal_(0, 0.05)
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    from flair_tpu.models.sr3 import BicubicUNet
    from flair_tpu.utils.convert import convert_bicubic_unet

    variables = convert_bicubic_unet(state, channel_mults=(1, 2), res_blocks=1)
    model = BicubicUNet(
        inner_channel=32, norm_groups=16, channel_mults=(1, 2), attn_res=(32,),
        vsrpp_res=(64,), image_size=64, res_blocks=1, num_frames=3,
        head_dim=8, temporal_attn=True, cross_frame_module=True,
    )

    b, t, s = 1, 3, 64
    rs = np.random.RandomState(0)
    x = rs.rand(b, t, s, s, 3).astype(np.float32) * 2 - 1
    lr = rs.rand(b, t, s, s, 3).astype(np.float32) * 2 - 1
    lvl = np.full((b * t,), 0.37, np.float32)

    for cross, atol in ((False, 1e-4), (True, 2e-3)):
        with torch.no_grad():
            t_out = ref(
                torch.from_numpy(x.reshape(b * t, s, s, 3).transpose(0, 3, 1, 2)),
                torch.from_numpy(lvl),
                low_res_input=torch.from_numpy(lr.transpose(0, 1, 4, 2, 3)),
                num_frames=t, enable_cross_frames=cross,
            )
        j_out = model.apply(
            variables, jnp.asarray(x), jnp.full((b, t), 0.37, jnp.float32),
            jnp.asarray(lr), enable_cross_frames=cross,
        )
        t_np = t_out.numpy().reshape(b, t, 3, s, s).transpose(0, 1, 3, 4, 2)
        np.testing.assert_allclose(
            np.asarray(j_out), t_np, atol=atol,
            err_msg=f"BicubicUNet forward mismatch (cross={cross})",
        )
        if cross:  # the temporal path must actually change the output
            assert np.abs(t_np - prev).max() > 1e-2
        prev = t_np


@pytest.mark.slow
def test_blur_unet_conversion_full_forward_parity():
    """Reference unet_new.UNetModel (torch, random init, zero-init params
    randomised so attention projections / VSR++ are live) vs our BlurUNet
    with converted weights (unet_new.py:901-1362 construction,
    video_sample.py MODEL_CONFIG shape family scaled down)."""
    torch = pytest.importorskip("torch")
    from ref_shim import install_reference_shims

    install_reference_shims()
    torch.cuda.is_available = lambda: True
    try:
        from guided_diffusion.unet_new import UNetModel as RefUNet
    except Exception as e:
        pytest.skip(f"reference not importable: {e}")

    b, t, s = 1, 3, 32
    torch.manual_seed(0)
    ref = RefUNet(
        image_size=s, in_channels=6, model_channels=32, out_channels=6,
        num_res_blocks=1, attention_resolutions=(2,), rnn_resolutions=(1,),
        channel_mult=(1, 2), num_heads=1, num_head_channels=8,
        use_scale_shift_norm=True, resblock_updown=True, temporal_block=True,
    ).eval()
    # the reference hardcodes emb_layers=linear(512,512) in
    # AttentionbottleBlock (unet_new.py:399), valid only at
    # model_channels=128; re-size it for the scaled-down test config
    ref.middle_block[2].emb_layers[1] = torch.nn.Linear(128, 64)
    with torch.no_grad():
        for _, p in ref.named_parameters():
            if p.abs().sum() == 0:
                p.normal_(0, 0.05)
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    from flair_tpu.models.adm import BlurUNet
    from flair_tpu.utils.convert import convert_blur_unet

    variables = convert_blur_unet(
        state, channel_mult=(1, 2), num_res_blocks=1,
        attention_ds=(2,), rnn_ds=(1,),
    )
    model = BlurUNet(
        image_size=s, in_channels=6, model_channels=32, out_channels=6,
        num_res_blocks=1, attention_resolutions=(2,), rnn_resolutions=(1,),
        channel_mult=(1, 2), num_heads=1, num_head_channels=8,
        use_scale_shift_norm=True, resblock_updown=True, temporal_block=True,
        temporal_frames=5,
    )

    rs = np.random.RandomState(0)
    x = rs.rand(b, t, s, s, 3).astype(np.float32) * 2 - 1
    lr = rs.rand(b, t, s, s, 3).astype(np.float32) * 2 - 1
    ts = np.full((b * t,), 7, np.int64)

    for cross, atol in ((False, 1e-4), (True, 2e-3)):
        with torch.no_grad():
            t_out = ref(
                torch.from_numpy(x.reshape(b * t, s, s, 3).transpose(0, 3, 1, 2)),
                torch.from_numpy(ts),
                low_res_input=torch.from_numpy(lr.transpose(0, 1, 4, 2, 3)),
                num_frames=t, enable_cross_frames=cross,
            )
        j_out = model.apply(
            variables, jnp.asarray(x), jnp.full((b, t), 7, jnp.int32),
            jnp.asarray(lr), enable_cross_frames=cross,
        )
        t_np = t_out.numpy().reshape(b, t, 6, s, s).transpose(0, 1, 3, 4, 2)
        np.testing.assert_allclose(
            np.asarray(j_out), t_np, atol=atol,
            err_msg=f"BlurUNet forward mismatch (cross={cross})",
        )
        if cross:
            assert np.abs(t_np - prev).max() > 1e-3
        prev = t_np


@pytest.mark.slow
def test_restore_video_agrees_with_reference_sampler():
    """End-to-end numeric agreement: restore_video (window loop + q_sample
    init + SRConv data consistency + guided update + prev_recon chaining)
    vs a faithful replication of the reference demo driver running the
    reference's OWN SpacedDiffusion.sample and SRConv
    (scripts/video_sample.py:361-487, gaussian_diffusion.py:423-689).
    Deterministic: rho=0 kills the in-loop noise and both RNGs are stubbed
    to zeros for the q_sample init. Same stub denoiser on both sides."""
    torch = pytest.importorskip("torch")
    from ref_shim import install_reference_shims

    install_reference_shims()
    try:
        gd = _import_reference("guided_diffusion.gaussian_diffusion")
        rsp = _import_reference("guided_diffusion.respace")
        ru = _import_reference("guided_diffusion.restore_util")
    except Exception as e:
        pytest.skip(f"reference not importable: {e}")

    size, factor, T, WIN, OV, steps = 32, 8, 6, 4, 1, 5
    rs = np.random.RandomState(0)
    degraded01 = rs.rand(T, size // factor, size // factor, 3).astype(np.float32)

    # ---- reference driver -------------------------------------------------
    import torchvision.transforms.functional as VF

    dcfg = dict(
        model_mean_type=gd.ModelMeanType.EPSILON,
        model_var_type=gd.ModelVarType.FIXED_SMALL,
        loss_type=gd.LossType.MSE,
        rescale_timesteps=False,
    )
    betas = gd.get_named_beta_schedule("face_bicubic", 2000)
    ref_d = rsp.SpacedDiffusion(
        use_timesteps=rsp.space_timesteps(2000, str(steps)), betas=betas, **dcfg
    )

    def bicubic_kernel(x, a=-0.5):
        if abs(x) <= 1:
            return (a + 2) * abs(x) ** 3 - (a + 3) * abs(x) ** 2 + 1
        if 1 < abs(x) < 2:
            return a * abs(x) ** 3 - 5 * a * abs(x) ** 2 + 8 * a * abs(x) - 4 * a
        return 0

    k = np.zeros(factor * 4)
    for i in range(factor * 4):
        k[i] = bicubic_kernel((1 / factor) * (i - np.floor(factor * 4 / 2) + 0.5))
    k = k / k.sum()
    A = ru.SRConv(torch.from_numpy(k).float(), 3, size, torch.device("cpu"),
                  stride=factor)

    class StubModel(torch.nn.Module):
        def __init__(self):
            super().__init__()
            # the reference loop reads next(model.parameters()).device
            self.dummy = torch.nn.Parameter(torch.zeros(1))

        def forward(self, x, lvl, **kwargs):
            return -0.1 * x[:, :3]

    w, rho, zeta, tau = 0.85, 0.0, -1, 0
    dg = torch.from_numpy(degraded01.transpose(0, 3, 1, 2))[None]  # (1,T,3,h,w)
    randn_orig = torch.randn
    torch.randn = lambda *a, **kw: torch.zeros(*a, **{k_: v for k_, v in kw.items() if k_ != "generator"})
    torch.randn_like = lambda x: torch.zeros_like(x)
    try:
        from flair_tpu.pipeline.video import window_slices

        prev = None
        rec = []
        for idx, length in window_slices(T, WIN, OV):
            sl = dg[:, idx : idx + length]
            init = VF.resize(sl.squeeze(0), (size, size),
                             VF.InterpolationMode.BICUBIC).clamp(0, 1)[None]
            sl_pm = (sl - 0.5) / 0.5
            init_pm = (init - 0.5) / 0.5
            noise = ref_d.q_sample(
                init_pm.reshape(length, 3, size, size),
                torch.full((length,), ref_d.num_timesteps - 1, dtype=torch.long),
            )
            mk = {"low_res_input": init_pm, "num_frames": length,
                  "rnn_input": init_pm}
            rfn = lambda x: A.A_pinv(
                A.A(x.reshape(x.shape[0], -1))
                - sl_pm.reshape(x.shape[0], -1)
            ).reshape(*x.size())
            with torch.no_grad():
                # the reference cannot run aux_model=None (start_timestep
                # unbound at gaussian_diffusion.py:680); an identity aux with
                # aligned=True is a mathematical no-op: w*x0+(1-w)*x0 = x0
                out = ref_d.sample(
                    StubModel(), noise, model_kwargs=mk, restore_fn=rfn,
                    face_restore_helper=None,
                    aux_model=lambda x0, t, xt: x0, post_fn=None,
                    clip_denoised=True, sample_mode="ddpm", w=w, tau=tau,
                    rho=rho, noise_level=0.0, prev_recon=prev, zeta=zeta,
                    t_start=-1, aligned=True,
                )
            out = out.reshape(1, length, 3, size, size)
            if prev is not None:
                out = out[:, OV:]
            prev = out[:, -OV:].clone()
            rec.append(((out.clamp(-1, 1) + 1) / 2).numpy())
        ref_out = np.concatenate(rec, 1)[0].transpose(0, 2, 3, 1)
    finally:
        torch.randn = randn_orig
        del torch.randn_like

    # ---- our pipeline -----------------------------------------------------
    import jax as _jax

    from flair_tpu.diffusion import GuidanceConfig
    from flair_tpu.pipeline.video import TASK_CONFIGS, restore_video
    import dataclasses

    cfg = dataclasses.replace(
        TASK_CONFIGS["x8_bicubic"], output_size=size, steps=str(steps),
        w=w, rho=rho, zeta=zeta, tau=tau, noise_level=0.0,
        vsrpp_bg_weight=0.0,
    )

    def model_apply(x, t, low_res, rnn_input, vsrpp_weights):
        return -0.1 * x

    normal_orig = _jax.random.normal

    def zeros_normal(key, shape=None, dtype=jnp.float32):
        return jnp.zeros(shape if shape is not None else (), dtype)

    _jax.random.normal = zeros_normal
    try:
        ours = restore_video(
            degraded01, cfg, model_apply,
            guidance=GuidanceConfig(use_aux=False, w=w, rho=rho, tau=tau,
                                    zeta=zeta, noise_level=0.0),
            win=WIN, overlap=OV,
            pad_tail=False,  # reference-exact short tail window
        )
    finally:
        _jax.random.normal = normal_orig

    assert ours.shape == ref_out.shape == (T, size, size, 3)
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=2e-3,
                               err_msg="pipeline output diverges from the "
                                       "reference sampler")


@pytest.mark.slow
def test_retinaface_conversion_full_forward_parity():
    """Reference RetinaFace-ResNet50 (torch, random init + random BN stats)
    vs our flax RetinaFace with converted weights
    (facelib/detection/retinaface/retinaface.py:78-157)."""
    torch = pytest.importorskip("torch")
    from ref_shim import install_reference_shims

    install_reference_shims()
    try:
        rf_mod = _import_reference(
            "guided_diffusion.facelib.detection.retinaface.retinaface")
    except Exception as e:
        pytest.skip(f"reference not importable: {e}")

    torch.manual_seed(0)
    ref = rf_mod.RetinaFace(network_name="resnet50").eval()
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()
             if "num_batches_tracked" not in k and not k.startswith("mean_tensor")}

    from flair_tpu.models.retinaface import RetinaFace
    from flair_tpu.utils.convert import convert_retinaface

    variables = convert_retinaface(state, network="resnet50")
    model = RetinaFace(network="resnet50")

    x = (np.random.RandomState(0).rand(1, 128, 128, 3).astype(np.float32)
         * 255.0 - 120.0)
    with torch.no_grad():
        t_loc, t_conf, t_ldm = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    j_loc, j_conf, j_ldm = model.apply(variables, jnp.asarray(x))

    np.testing.assert_allclose(np.asarray(j_loc), t_loc.numpy(), atol=5e-3,
                               err_msg="bbox regression mismatch")
    np.testing.assert_allclose(np.asarray(j_conf), t_conf.numpy(), atol=5e-3,
                               err_msg="class confidence mismatch")
    np.testing.assert_allclose(np.asarray(j_ldm), t_ldm.numpy(), atol=5e-3,
                               err_msg="landmark regression mismatch")


@pytest.mark.slow
def test_bisenet_conversion_full_forward_parity():
    """Reference BiSeNet (torch, random init + randomized BN stats) vs our
    flax BiSeNet with converted weights (facelib/parsing/bisenet.py:110-141
    forward; backbone parsing/resnet.py:49-71)."""
    torch = pytest.importorskip("torch")
    try:
        ref_mod = _import_reference("guided_diffusion.facelib.parsing.bisenet")
    except Exception as e:
        pytest.skip(f"reference not importable: {e}")

    torch.manual_seed(0)
    ref = ref_mod.BiSeNet(num_class=19).eval()
    # randomize BN running stats so the test actually exercises them
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    from flair_tpu.models.bisenet import BiSeNet
    from flair_tpu.utils.convert import convert_bisenet

    variables = convert_bisenet(state)
    model = BiSeNet()

    x = np.random.RandomState(1).rand(1, 128, 128, 3).astype(np.float32)
    with torch.no_grad():
        t_out, t_out16, t_out32 = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    j_out, j_out16, j_out32 = model.apply(variables, jnp.asarray(x))
    for jv, tv, tag in ((j_out, t_out, "out"), (j_out16, t_out16, "out16"),
                        (j_out32, t_out32, "out32")):
        np.testing.assert_allclose(
            np.asarray(jv), tv.numpy().transpose(0, 2, 3, 1), atol=2e-4,
            err_msg=f"bisenet {tag} mismatch",
        )


@pytest.mark.slow
def test_restoreformer_conversion_full_forward_parity():
    """Reference VQVAEGANMultiHeadTransformer (torch, random init) vs our
    RestoreFormer with converted weights (restoreformer.py:764-861 forward,
    cross-attention decoder :543-675), at 256² with matching resolution."""
    torch = pytest.importorskip("torch")
    try:
        ref_mod = _import_reference("guided_diffusion.restoreformer")
    except Exception as e:
        pytest.skip(f"reference not importable: {e}")

    torch.manual_seed(0)
    ref = ref_mod.VQVAEGANMultiHeadTransformer(resolution=256).eval()
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    from flair_tpu.models.restoreformer import RestoreFormer
    from flair_tpu.utils.convert import convert_restoreformer

    variables = convert_restoreformer(state, resolution=256)
    model = RestoreFormer()

    x = np.random.RandomState(0).rand(1, 256, 256, 3).astype(np.float32) * 2 - 1
    with torch.no_grad():
        t_dec, t_loss, _, _ = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    j_dec, j_loss, _, _ = model.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(
        float(j_loss), float(t_loss), atol=1e-4,
        err_msg="codebook loss mismatch")
    np.testing.assert_allclose(
        np.asarray(j_dec), t_dec.numpy().transpose(0, 2, 3, 1), atol=5e-3,
        err_msg="restoreformer decode mismatch")


@pytest.mark.slow
def test_vqvaegan_conversion_full_forward_parity():
    """Plain VQVAEGAN (restoreformer.py:678-762, self-attention decoder)."""
    torch = pytest.importorskip("torch")
    try:
        ref_mod = _import_reference("guided_diffusion.restoreformer")
    except Exception as e:
        pytest.skip(f"reference not importable: {e}")

    torch.manual_seed(1)
    ref = ref_mod.VQVAEGAN(ch=32, ch_mult=(1, 2, 4, 8), resolution=128,
                           head_size=1, attn_resolutions=(16,)).eval()
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    from flair_tpu.models.restoreformer import VQVAEGAN
    from flair_tpu.utils.convert import convert_restoreformer

    variables = convert_restoreformer(
        state, ch_mult=(1, 2, 4, 8), resolution=128, cross=False)
    model = VQVAEGAN(ch=32, ch_mult=(1, 2, 4, 8))

    x = np.random.RandomState(2).rand(1, 128, 128, 3).astype(np.float32) * 2 - 1
    with torch.no_grad():
        t_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    t_dec = t_out[0]
    j_dec, j_loss, _ = model.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(j_dec), t_dec.numpy().transpose(0, 2, 3, 1), atol=5e-3,
        err_msg="vqvaegan decode mismatch")


@pytest.mark.slow
def test_vqfr_conversion_full_forward_parity():
    """Reference VQFRv2 (torch, random init) vs our VQFRv2 with converted
    weights (vqfr.py:490-586 forward incl. the DCNv2Pack texture warps,
    :341-427). Uses the released-model config at reduced size."""
    torch = pytest.importorskip("torch")
    try:
        ref_mod = _import_reference("guided_diffusion.vqfr")
    except Exception as e:
        pytest.skip(f"reference not importable: {e}")

    torch.manual_seed(0)
    ref = ref_mod.VQFRv2(
        base_channels=32,
        channel_multipliers=(1, 2, 2, 4),
        num_enc_blocks=2,
        use_enc_attention=True,
        num_dec_blocks=2,
        use_dec_attention=True,
        code_dim=256,
        inpfeat_dim=32,
        code_selection_mode="Predict",
        align_opt={"cond_channels": 32, "deformable_groups": 4},
    ).eval()
    # break the zero-init of the offset convs so the deformable warps are
    # actually exercised with non-trivial offsets
    with torch.no_grad():
        for name, p in ref.named_parameters():
            if "conv_offset" in name:
                p.uniform_(-0.05, 0.05)
        # feat2index LayerNorm(256) vs Linear(256->1024) are fixed sizes in
        # the reference; keep code_dim=256/num_code=1024
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    from flair_tpu.models.vqfr import VQFRv2
    from flair_tpu.utils.convert import convert_vqfr

    variables = convert_vqfr(state, channel_multipliers=(1, 2, 2, 4))
    model = VQFRv2(base_channels=32, channel_multipliers=(1, 2, 2, 4),
                   deformable_groups=4)

    # the reference quantizer hardcodes a 16x16 token grid
    # (vqfr.py:537-539), so the input must be 16·2^(levels-1) = 128
    x = np.random.RandomState(0).rand(1, 128, 128, 3).astype(np.float32) * 2 - 1
    with torch.no_grad():
        t_res = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                    fidelity_ratio=0.7)
    j_res = model.apply(variables, jnp.asarray(x), fidelity_ratio=0.7)

    def chw(t):
        return t.numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(
        np.asarray(j_res["enc_feat"]), chw(t_res["enc_feat"]), atol=2e-3,
        err_msg="vqfr encoder mismatch")
    np.testing.assert_allclose(
        np.asarray(j_res["quant_logit"]),
        t_res["quant_logit"].numpy(), atol=2e-3,
        err_msg="vqfr token logits mismatch")
    np.testing.assert_allclose(
        np.asarray(j_res["texture_dec"]), chw(t_res["texture_dec"]),
        atol=5e-3, err_msg="vqfr texture decode mismatch")
    np.testing.assert_allclose(
        np.asarray(j_res["main_dec"]), chw(t_res["main_dec"]), atol=5e-3,
        err_msg="vqfr main decode mismatch")


@pytest.mark.slow
def test_yolov5face_conversion_full_forward_parity():
    """Reference yolov5n-face Model (torch, random init + randomized BN
    stats) vs our YOLOv5FromConfig with converted weights: per-level raw
    detect maps must agree (yolo.py:29-66 Detect, :95-235 parse_model)."""
    torch = pytest.importorskip("torch")
    pytest.importorskip("yaml")
    try:
        ref_mod = _import_reference(
            "guided_diffusion.facelib.detection.yolov5face.models.yolo")
    except Exception as e:
        pytest.skip(f"reference not importable: {e}")

    from ref_shim import reference_root

    cfg_path = (reference_root()
                + "/guided_diffusion/facelib/detection/yolov5face/models"
                + "/yolov5n.yaml")
    torch.manual_seed(0)
    ref = ref_mod.Model(cfg=cfg_path).eval()
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    from flair_tpu.models.yolov5face import YOLOv5FromConfig, load_yolo_yaml
    from flair_tpu.utils.convert import convert_yolov5face

    cfg = load_yolo_yaml(cfg_path)
    variables = convert_yolov5face(state, cfg)
    model = YOLOv5FromConfig(cfg)

    x = np.random.RandomState(0).rand(1, 128, 128, 3).astype(np.float32)
    with torch.no_grad():
        t_maps = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    if isinstance(t_maps, tuple):
        t_maps = t_maps[1] if isinstance(t_maps[1], (list, tuple)) else t_maps[0]
    j_maps = model.apply(variables, jnp.asarray(x))
    na = len(cfg["anchors"][0]) // 2
    for lvl, (jm, tm) in enumerate(zip(j_maps, t_maps)):
        tm = tm.numpy()  # (B, na, H, W, no)
        b, _, hh, ww, no = tm.shape
        jm = np.asarray(jm).reshape(b, hh, ww, na, no).transpose(0, 3, 1, 2, 4)
        np.testing.assert_allclose(
            jm, tm, atol=2e-4, err_msg=f"yolo level {lvl} mismatch")


@pytest.mark.slow
def test_superslomo_conversion_full_forward_parity():
    """Reference SuperSloMo (torch, random init) vs ours with converted
    weights (superslomo.py:249-291 forward, back_warp :225-247)."""
    torch = pytest.importorskip("torch")
    try:
        ref_mod = _import_reference("guided_diffusion.superslomo")
    except Exception as e:
        pytest.skip(f"reference not importable: {e}")

    torch.manual_seed(0)
    ref = ref_mod.SuperSloMo().eval()
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    from flair_tpu.models.superslomo import SuperSloMo
    from flair_tpu.utils.convert import convert_superslomo

    variables = convert_superslomo(state)
    model = SuperSloMo(factor=4)

    rs = np.random.RandomState(0)
    f0 = rs.rand(1, 64, 64, 3).astype(np.float32) * 2 - 1
    f1 = rs.rand(1, 64, 64, 3).astype(np.float32) * 2 - 1
    with torch.no_grad():
        t_out = ref(torch.from_numpy(f0.transpose(0, 3, 1, 2)),
                    torch.from_numpy(f1.transpose(0, 3, 1, 2)), factor=4)
    j_out = model.apply(variables, jnp.asarray(f0), jnp.asarray(f1))
    np.testing.assert_allclose(
        np.asarray(j_out), t_out.numpy().transpose(0, 1, 3, 4, 2), atol=2e-4,
        err_msg="superslomo interpolation mismatch")


@pytest.mark.slow
def test_amt_conversion_full_forward_parity():
    """Reference AMT (torch, random init) vs ours with converted weights
    (amt.py:113-225 _forward: RAFT correlation pyramid, coarse-to-fine
    update blocks, multi-flow combination)."""
    torch = pytest.importorskip("torch")
    try:
        ref_mod = _import_reference("guided_diffusion.amt")
    except Exception as e:
        pytest.skip(f"reference not importable: {e}")

    torch.manual_seed(0)
    ref = ref_mod.AMT().eval()
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    from flair_tpu.models.amt import AMT, interpolate
    from flair_tpu.utils.convert import convert_amt

    variables = convert_amt(state)
    model = AMT()

    rs = np.random.RandomState(0)
    # width > 64 so the reference uses scale_factor=1.0 (amt.py:230-232)
    f0 = rs.rand(1, 96, 96, 3).astype(np.float32) * 2 - 1
    f1 = rs.rand(1, 96, 96, 3).astype(np.float32) * 2 - 1
    with torch.no_grad():
        t_out = ref(torch.from_numpy(f0.transpose(0, 3, 1, 2)),
                    torch.from_numpy(f1.transpose(0, 3, 1, 2)), factor=2)
    j_out = interpolate(model, variables, jnp.asarray(f0), jnp.asarray(f1),
                        factor=2)
    np.testing.assert_allclose(
        np.asarray(j_out), t_out.numpy().transpose(0, 1, 3, 4, 2), atol=1e-3,
        err_msg="amt interpolation mismatch")


@pytest.mark.slow
def test_full_system_agreement_real_models_face_prior_on():
    """VERDICT r1 item 3: both pipelines end-to-end with REAL converted
    weights — BicubicUNet denoiser + CodeFormer + ParseNet face prior ON
    through the UNALIGNED crop→fuse→paste path (gaussian_diffusion.py:
    471-496, face_restoration_helper.py:225-335) — at 512² with a tiny
    UNet. Deterministic (rho=0, zeroed RNGs). First test to exercise the
    SR3 noise-level conditioning (respace.py:161-165) through the full
    sampler with a real denoiser, and the cv2-vs-device warp stack at the
    pipeline level."""
    torch = pytest.importorskip("torch")
    from ref_shim import install_reference_shims

    install_reference_shims()
    torch.cuda.is_available = lambda: True
    try:
        gd = _import_reference("guided_diffusion.gaussian_diffusion")
        rsp = _import_reference("guided_diffusion.respace")
        ru = _import_reference("guided_diffusion.restore_util")
        frh_mod = _import_reference(
            "guided_diffusion.facelib.utils.face_restoration_helper")
        pn_mod = _import_reference("guided_diffusion.facelib.parsing.parsenet")
        from guided_diffusion.codeformer import CodeFormer as RefCF
        from guided_diffusion.sr3 import UNet as RefUNet
    except Exception as e:
        pytest.skip(f"reference not importable: {e}")

    size, factor, T, WIN, OV, steps = 512, 8, 3, 3, 1, 3
    rs = np.random.RandomState(0)
    degraded01 = rs.rand(T, size // factor, size // factor, 3).astype(np.float32)

    torch.manual_seed(0)
    ref_unet = RefUNet(
        in_channel=6, out_channel=3, inner_channel=32, norm_groups=16,
        channel_mults=(1, 2), attn_res=(256,), vsrpp_res=(256,),
        spatial_attn=False, temporal_attn=True, res_blocks=1, dropout=0.0,
        image_size=size, cross_frame_module=True, num_frames=WIN, head_dim=8,
    ).eval()
    with torch.no_grad():
        for _, p in ref_unet.named_parameters():
            if p.abs().sum() == 0:
                p.normal_(0, 0.02)
    ref_cf = RefCF(dim_embd=64, n_head=4, n_layers=2, codebook_size=32).eval()
    ref_pn = pn_mod.ParseNet(in_size=512, out_size=512, parsing_ch=19).eval()

    helper = object.__new__(frh_mod.FaceRestoreHelper)
    helper.face_size = (512, 512)
    helper.device = torch.device("cpu")
    helper.face_parse = ref_pn

    from flair_tpu.models.codeformer import CodeFormer
    from flair_tpu.models.parsenet import ParseNet
    from flair_tpu.models.sr3 import BicubicUNet
    from flair_tpu.utils.convert import (
        convert_bicubic_unet, convert_codeformer, convert_parsenet,
    )

    unet_vars = convert_bicubic_unet(
        {k: v.detach().numpy() for k, v in ref_unet.state_dict().items()},
        channel_mults=(1, 2), res_blocks=1)
    cf_vars = convert_codeformer(
        {k: v.detach().numpy() for k, v in ref_cf.state_dict().items()},
        dim_embd=64, n_head=4, n_layers=2, codebook_size=32)
    pn_vars = convert_parsenet(
        {k: v.detach().numpy() for k, v in ref_pn.state_dict().items()})
    model = BicubicUNet(
        inner_channel=32, norm_groups=16, channel_mults=(1, 2),
        attn_res=(256,), vsrpp_res=(256,), image_size=size, res_blocks=1,
        num_frames=WIN, head_dim=8, temporal_attn=True,
        cross_frame_module=True,
    )
    cf = CodeFormer(dim_embd=64, n_head=4, n_layers=2, codebook_size=32)
    pn = ParseNet()

    # fixed similarity matrices: modest zoom+rotation about the centre
    import cv2

    mats = []
    for i in range(WIN):
        m = cv2.getRotationMatrix2D((256.0, 256.0), 5.0 + 2 * i, 1.15)
        m[:, 2] += (6.0, -4.0)
        mats.append(np.asarray(m, np.float32))
    mats = np.stack(mats)

    # ---- reference driver (video_sample.py:361-487) ----------------------
    import torchvision.transforms.functional as VF

    dcfg = dict(
        model_mean_type=gd.ModelMeanType.EPSILON,
        model_var_type=gd.ModelVarType.FIXED_SMALL,
        loss_type=gd.LossType.MSE, rescale_timesteps=False,
    )
    betas = gd.get_named_beta_schedule("face_bicubic", 2000)
    ref_d = rsp.SpacedDiffusion(
        use_timesteps=rsp.space_timesteps(2000, str(steps)), betas=betas,
        **dcfg)

    def bicubic_kernel(x, a=-0.5):
        if abs(x) <= 1:
            return (a + 2) * abs(x) ** 3 - (a + 3) * abs(x) ** 2 + 1
        if 1 < abs(x) < 2:
            return a * abs(x) ** 3 - 5 * a * abs(x) ** 2 + 8 * a * abs(x) - 4 * a
        return 0

    k = np.zeros(factor * 4)
    for i in range(factor * 4):
        k[i] = bicubic_kernel((1 / factor) * (i - np.floor(factor * 4 / 2) + 0.5))
    k = k / k.sum()
    A = ru.SRConv(torch.from_numpy(k).float(), 3, size, torch.device("cpu"),
                  stride=factor)

    def aux_model(face, t, xt):
        with torch.no_grad():
            return ref_cf(face, w=1.0, adain=True)[0]

    w, rho, zeta, tau = 0.6, 0.0, -1, 0
    dg = torch.from_numpy(degraded01.transpose(0, 3, 1, 2))[None]
    randn_orig = torch.randn
    torch.randn = lambda *a, **kw: torch.zeros(
        *a, **{k_: v for k_, v in kw.items() if k_ != "generator"})
    torch.randn_like = lambda x: torch.zeros_like(x)
    try:
        sl = dg[:, :T]
        init = VF.resize(sl.squeeze(0), (size, size),
                         VF.InterpolationMode.BICUBIC).clamp(0, 1)[None]
        sl_pm = (sl - 0.5) / 0.5
        init_pm = (init - 0.5) / 0.5
        noise = ref_d.q_sample(
            init_pm.reshape(T, 3, size, size),
            torch.full((T,), ref_d.num_timesteps - 1, dtype=torch.long),
        )
        mk = {"low_res_input": init_pm, "num_frames": T,
              "rnn_input": init_pm}
        rfn = lambda x: A.A_pinv(
            A.A(x.reshape(x.shape[0], -1)) - sl_pm.reshape(x.shape[0], -1)
        ).reshape(*x.size())
        with torch.no_grad():
            out = ref_d.sample(
                ref_unet, noise, model_kwargs=mk, restore_fn=rfn,
                face_restore_helper=helper, affine_matrices=list(mats),
                aux_model=aux_model, post_fn=None, clip_denoised=True,
                sample_mode="ddpm", w=w, tau=tau, rho=rho, noise_level=0.0,
                prev_recon=None, zeta=zeta, t_start=-1, aligned=False,
            )
        out = out.reshape(1, T, 3, size, size)
        ref_out = ((out.clamp(-1, 1) + 1) / 2).numpy()[0].transpose(0, 2, 3, 1)
    finally:
        torch.randn = randn_orig
        del torch.randn_like

    # ---- our pipeline ----------------------------------------------------
    import dataclasses

    import jax as _jax

    from flair_tpu.diffusion import GuidanceConfig, make_task_diffusion
    from flair_tpu.face.helper import make_face_fn
    from flair_tpu.pipeline.video import TASK_CONFIGS, restore_video
    from flair_tpu.pipeline.wrappers import wrap_bicubic_model

    cfg = dataclasses.replace(
        TASK_CONFIGS["x8_bicubic"], output_size=size, steps=str(steps),
        w=w, rho=rho, zeta=zeta, tau=tau, noise_level=0.0,
        vsrpp_bg_weight=0.0,
    )
    d = make_task_diffusion(cfg.task, cfg.steps)
    model_apply = wrap_bicubic_model(d, model, unet_vars)

    def cf_apply(frames):
        return cf.apply(cf_vars, frames, w=1.0, adain=True)[0]

    def pn_apply(frames):
        return pn.apply(pn_vars, frames)[0]

    face_fn = make_face_fn(mats, cf_apply, pn_apply, face_size=size)

    normal_orig = _jax.random.normal

    def zeros_normal(key, shape=None, dtype=jnp.float32):
        return jnp.zeros(shape if shape is not None else (), dtype)

    _jax.random.normal = zeros_normal
    try:
        ours = restore_video(
            degraded01, cfg, model_apply, face_fn=face_fn,
            guidance=GuidanceConfig(use_aux=True, w=w, rho=rho, tau=tau,
                                    zeta=zeta, noise_level=0.0),
            win=WIN, overlap=OV, pad_tail=False,
        )
    finally:
        _jax.random.normal = normal_orig

    assert ours.shape == ref_out.shape == (T, size, size, 3)
    diff = np.abs(np.asarray(ours) - ref_out)
    # the face path crosses cv2 (reference, host) vs device warps (ours);
    # sub-pixel cubic differences at crop borders survive the blurred mask,
    # so assert a tight mean and a loose max
    assert diff.mean() < 2e-3, f"mean divergence {diff.mean()}"
    assert diff.max() < 6e-2, f"max divergence {diff.max()}"
