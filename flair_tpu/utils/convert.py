"""torch → flax weight converters for the reference's released checkpoints.

Each ``convert_<model>(state_dict)`` walks the torch module's construction
order (mirroring the reference ``__init__`` loops) and emits the flat
flax param dict, so the tables stay correct for any config the reference
supports. Reference load sites: scripts/video_sample.py:327-359 (FLAIR UNets,
CodeFormer), facelib/detection/__init__.py:25-48 and
facelib/parsing/__init__.py:8-25 (RetinaFace / ParseNet auto-downloads).

Conventions:
- torch Conv2d (O,I,kh,kw) → flax HWIO; Linear (O,I) → (I,O);
- GroupNorm/LayerNorm/BatchNorm ``weight`` → flax ``scale``;
- our GNorm wrapper modules hold the actual norm as ``GroupNorm_0``.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import numpy as np

from .checkpoint import t2j_conv2d, t2j_linear, unflatten_params

Flat = dict


# ---------------------------------------------------------------------------
# emit helpers
# ---------------------------------------------------------------------------


def _conv(flat: Flat, s: Mapping, t: str, j: str) -> None:
    flat[f"{j}/kernel"] = t2j_conv2d(np.asarray(s[f"{t}.weight"]))
    if f"{t}.bias" in s:
        flat[f"{j}/bias"] = np.asarray(s[f"{t}.bias"])


def _linear(flat: Flat, s: Mapping, t: str, j: str) -> None:
    flat[f"{j}/kernel"] = t2j_linear(np.asarray(s[f"{t}.weight"]))
    if f"{t}.bias" in s:
        flat[f"{j}/bias"] = np.asarray(s[f"{t}.bias"])


def _norm(flat: Flat, s: Mapping, t: str, j: str) -> None:
    """GroupNorm / LayerNorm / InstanceNorm affine params."""
    flat[f"{j}/scale"] = np.asarray(s[f"{t}.weight"])
    flat[f"{j}/bias"] = np.asarray(s[f"{t}.bias"])


def _bn(flat: Flat, s: Mapping, t: str, j: str) -> None:
    """BatchNorm → flax nn.BatchNorm (scale/bias + batch_stats handled by
    caller: we fold running stats under the same flat key prefix with
    'mean'/'var' so converters can split them)."""
    flat[f"{j}/scale"] = np.asarray(s[f"{t}.weight"])
    flat[f"{j}/bias"] = np.asarray(s[f"{t}.bias"])
    flat[f"{j}@mean"] = np.asarray(s[f"{t}.running_mean"])
    flat[f"{j}@var"] = np.asarray(s[f"{t}.running_var"])


def _split_params_stats(flat: Flat):
    """Split a flat dict with '@mean'/'@var' markers into
    {'params': ..., 'batch_stats': ...} pytrees."""
    params, stats = {}, {}
    for k, v in flat.items():
        if k.endswith("@mean"):
            stats[k[: -len("@mean")] + "/mean"] = v
        elif k.endswith("@var"):
            stats[k[: -len("@var")] + "/var"] = v
        else:
            params[k] = v
    out = {"params": unflatten_params(params)}
    if stats:
        out["batch_stats"] = unflatten_params(stats)
    return out


# ---------------------------------------------------------------------------
# CodeFormer (guided_diffusion/codeformer.py:600-753)
# ---------------------------------------------------------------------------


def _cf_resblock(flat: Flat, s: Mapping, t: str, j: str) -> None:
    _norm(flat, s, f"{t}.norm1", f"{j}/norm1/GroupNorm_0")
    _conv(flat, s, f"{t}.conv1", f"{j}/conv1")
    _norm(flat, s, f"{t}.norm2", f"{j}/norm2/GroupNorm_0")
    _conv(flat, s, f"{t}.conv2", f"{j}/conv2")
    if f"{t}.conv_out.weight" in s:
        _conv(flat, s, f"{t}.conv_out", f"{j}/conv_out")


def _cf_attnblock(flat: Flat, s: Mapping, t: str, j: str) -> None:
    _norm(flat, s, f"{t}.norm", f"{j}/norm/GroupNorm_0")
    for p in ("q", "k", "v", "proj_out"):
        _conv(flat, s, f"{t}.{p}", f"{j}/{p}")


def _cf_autoencoder(
    flat: Flat,
    s: Mapping,
    *,
    ch_mult: Sequence[int],
    num_res_blocks: int,
    resolution: int,
    attn_resolutions: Sequence[int],
) -> None:
    """Encoder + generator + codebook of the VQAutoEncoder
    (codeformer.py:244-354,357-434); block indices follow the reference's
    nn.Sequential construction order."""
    # --- encoder ---
    idx = 0
    _conv(flat, s, f"encoder.blocks.{idx}", "encoder/conv_in")
    idx += 1
    curr, li = resolution, 0
    for i in range(len(ch_mult)):
        for _ in range(num_res_blocks):
            _cf_resblock(flat, s, f"encoder.blocks.{idx}", f"encoder/block{li}")
            idx += 1
            li += 1
            if curr in attn_resolutions:
                _cf_attnblock(flat, s, f"encoder.blocks.{idx}", f"encoder/attn{li}")
                idx += 1
                li += 1
        if i != len(ch_mult) - 1:
            _conv(flat, s, f"encoder.blocks.{idx}.conv", f"encoder/down{i}/conv")
            idx += 1
            curr //= 2
    _cf_resblock(flat, s, f"encoder.blocks.{idx}", "encoder/mid_block1")
    _cf_attnblock(flat, s, f"encoder.blocks.{idx + 1}", "encoder/mid_attn")
    _cf_resblock(flat, s, f"encoder.blocks.{idx + 2}", "encoder/mid_block2")
    _norm(flat, s, f"encoder.blocks.{idx + 3}", "encoder/norm_out/GroupNorm_0")
    _conv(flat, s, f"encoder.blocks.{idx + 4}", "encoder/conv_out")

    # --- codebook ---
    flat["quantize/embedding"] = np.asarray(s["quantize.embedding.weight"])

    # --- generator ---
    idx = 0
    _conv(flat, s, f"generator.blocks.{idx}", "generator/conv_in")
    _cf_resblock(flat, s, f"generator.blocks.{idx + 1}", "generator/mid_block1")
    _cf_attnblock(flat, s, f"generator.blocks.{idx + 2}", "generator/mid_attn")
    _cf_resblock(flat, s, f"generator.blocks.{idx + 3}", "generator/mid_block2")
    idx += 4
    li = 0
    curr = resolution // 2 ** (len(ch_mult) - 1)
    for i in reversed(range(len(ch_mult))):
        for _ in range(num_res_blocks):
            _cf_resblock(flat, s, f"generator.blocks.{idx}", f"generator/block{li}")
            idx += 1
            li += 1
            if curr in attn_resolutions:
                _cf_attnblock(
                    flat, s, f"generator.blocks.{idx}", f"generator/attn{li}"
                )
                idx += 1
                li += 1
        if i != 0:
            _conv(flat, s, f"generator.blocks.{idx}.conv", f"generator/up{i}/conv")
            idx += 1
            curr *= 2
    _norm(flat, s, f"generator.blocks.{idx}", "generator/norm_out/GroupNorm_0")
    _conv(flat, s, f"generator.blocks.{idx + 1}", "generator/conv_out")


def convert_codeformer(
    s: Mapping[str, np.ndarray],
    *,
    nf: int = 64,
    ch_mult: Sequence[int] = (1, 2, 2, 4, 4, 8),
    num_res_blocks: int = 2,
    resolution: int = 512,
    attn_resolutions: Sequence[int] = (16,),
    dim_embd: int = 512,
    n_head: int = 8,
    n_layers: int = 9,
    codebook_size: int = 1024,
    connect_list: Sequence[str] = ("32", "64", "128", "256"),
):
    """CodeFormer released checkpoint → flax variables
    (codeformer.py:600-753; loaded at video_sample.py:351-359)."""
    flat: Flat = {}
    _cf_autoencoder(
        flat, s,
        ch_mult=ch_mult, num_res_blocks=num_res_blocks,
        resolution=resolution, attn_resolutions=attn_resolutions,
    )

    flat["position_emb"] = np.asarray(s["position_emb"])
    _linear(flat, s, "feat_emb", "feat_emb")

    E, H = dim_embd, n_head
    D = E // H
    for i in range(n_layers):
        t = f"ft_layers.{i}"
        j = f"ft_layer{i}"
        _norm(flat, s, f"{t}.norm1", f"{j}/norm1")
        _norm(flat, s, f"{t}.norm2", f"{j}/norm2")
        _linear(flat, s, f"{t}.linear1", f"{j}/linear1")
        _linear(flat, s, f"{t}.linear2", f"{j}/linear2")
        W = np.asarray(s[f"{t}.self_attn.in_proj_weight"])  # (3E, E)
        b = np.asarray(s[f"{t}.self_attn.in_proj_bias"])    # (3E,)
        for name, k in (("query", 0), ("key", 1), ("value", 2)):
            flat[f"{j}/self_attn/{name}/kernel"] = (
                W[k * E : (k + 1) * E].T.reshape(E, H, D)
            )
            flat[f"{j}/self_attn/{name}/bias"] = (
                b[k * E : (k + 1) * E].reshape(H, D)
            )
        Wo = np.asarray(s[f"{t}.self_attn.out_proj.weight"])  # (E, E)
        flat[f"{j}/self_attn/out/kernel"] = Wo.T.reshape(H, D, E)
        flat[f"{j}/self_attn/out/bias"] = np.asarray(
            s[f"{t}.self_attn.out_proj.bias"]
        )

    _norm(flat, s, "idx_pred_layer.0", "idx_norm")
    flat["idx_pred/kernel"] = t2j_linear(np.asarray(s["idx_pred_layer.1.weight"]))

    for f in connect_list:
        t = f"fuse_convs_dict.{f}"
        j = f"fuse_{f}"
        _cf_resblock(flat, s, f"{t}.encode_enc", f"{j}/encode_enc")
        _conv(flat, s, f"{t}.scale.0", f"{j}/scale_conv1")
        _conv(flat, s, f"{t}.scale.2", f"{j}/scale_conv2")
        _conv(flat, s, f"{t}.shift.0", f"{j}/shift_conv1")
        _conv(flat, s, f"{t}.shift.2", f"{j}/shift_conv2")

    return {"params": unflatten_params(flat)}


# ---------------------------------------------------------------------------
# ParseNet (facelib/parsing/parsenet.py:140-194)
# ---------------------------------------------------------------------------


def _pn_conv(flat: Flat, s: Mapping, t: str, j: str) -> None:
    _conv(flat, s, f"{t}.conv2d", f"{j}/conv")
    if f"{t}.norm.norm.weight" in s:
        _bn(flat, s, f"{t}.norm.norm", f"{j}/bn")


def _pn_res(flat: Flat, s: Mapping, t: str, j: str) -> None:
    if f"{t}.shortcut_func.conv2d.weight" in s:
        _pn_conv(flat, s, f"{t}.shortcut_func", f"{j}/shortcut")
    _pn_conv(flat, s, f"{t}.conv1", f"{j}/conv1")
    _pn_conv(flat, s, f"{t}.conv2", f"{j}/conv2")


def convert_parsenet(
    s: Mapping[str, np.ndarray],
    *,
    down_steps: int = 4,
    up_steps: int = 4,
    res_depth: int = 10,
):
    """ParseNet released checkpoint → flax variables with batch_stats
    (parsenet.py:140-194; loaded at facelib/parsing/__init__.py:8-25)."""
    flat: Flat = {}
    _pn_conv(flat, s, "encoder.0", "enc_in")
    for i in range(down_steps):
        _pn_res(flat, s, f"encoder.{i + 1}", f"enc_{i}")
    for i in range(res_depth):
        _pn_res(flat, s, f"body.{i}", f"body_{i}")
    for i in range(up_steps):
        _pn_res(flat, s, f"decoder.{i}", f"dec_{i}")
    _pn_conv(flat, s, "out_img_conv", "out_img_conv")
    _pn_conv(flat, s, "out_mask_conv", "out_mask_conv")
    return _split_params_stats(flat)


# ---------------------------------------------------------------------------
# SPyNet (mmedit basicvsr_net.SPyNet; owned by both UNets — the FLAIR
# checkpoints embed it under a prefix, e.g. "spynet." in unet_new.py:985)
# ---------------------------------------------------------------------------


def convert_spynet(
    s: Mapping[str, np.ndarray], *, prefix: str = "", levels: int = 6
):
    """mmedit SPyNet weights (6 pyramid levels × 5 convs) → flax params."""
    flat: Flat = {}
    for i in range(levels):
        for j in range(5):
            _conv(
                flat, s,
                f"{prefix}basic_module.{i}.basic_module.{j}.conv",
                f"level{i}/conv{j}",
            )
    return {"params": unflatten_params(flat)}


# ---------------------------------------------------------------------------
# BicubicUNet (guided_diffusion/sr3.py:317-611, temporal blocks unet.py)
# ---------------------------------------------------------------------------


def _conv3d(flat: Flat, s: Mapping, t: str, j: str) -> None:
    from .checkpoint import t2j_conv3d

    flat[f"{j}/kernel"] = t2j_conv3d(np.asarray(s[f"{t}.weight"]))
    if f"{t}.bias" in s:
        flat[f"{j}/bias"] = np.asarray(s[f"{t}.bias"])


def _conv1x1_as_dense(flat: Flat, s: Mapping, t: str, j: str) -> None:
    """torch 1×1 Conv2d → flax Dense (used by SR3 spatial attention)."""
    w = np.asarray(s[f"{t}.weight"])[:, :, 0, 0]
    flat[f"{j}/kernel"] = w.T
    if f"{t}.bias" in s:
        flat[f"{j}/bias"] = np.asarray(s[f"{t}.bias"])


def _sr3_res_block(flat: Flat, s: Mapping, t: str, j: str) -> None:
    """sr3.ResnetBlock (sr3.py:123-161): FeatureWiseAffine + Block×2 + skip."""
    _linear(flat, s, f"{t}.noise_func.noise_func.0", f"{j}/noise_proj/Dense_0")
    for b in ("block1", "block2"):
        _norm(flat, s, f"{t}.{b}.block.0.wrapped_module", f"{j}/{b}/norm")
        _conv(flat, s, f"{t}.{b}.block.3.wrapped_module", f"{j}/{b}/conv/Conv_0")
    if f"{t}.res_conv.wrapped_module.weight" in s:
        _conv(flat, s, f"{t}.res_conv.wrapped_module", f"{j}/res_conv/Conv_0")


def _adm_res3d(flat: Flat, s: Mapping, t: str, j: str) -> None:
    """ADM ResBlock with 3-D convs (unet.py:80-254) inside TemporalWrapper2."""
    _norm(flat, s, f"{t}.in_layers.0.wrapped_module", f"{j}/in_norm")
    _conv3d(flat, s, f"{t}.in_layers.2.wrapped_module", f"{j}/in_conv/Conv_0")
    _linear(flat, s, f"{t}.emb_layers.1", f"{j}/emb_proj/Dense_0")
    _norm(flat, s, f"{t}.out_layers.0.wrapped_module", f"{j}/out_norm")
    _conv3d(flat, s, f"{t}.out_layers.3.wrapped_module", f"{j}/out_conv/Conv_0")


def _temporal_attention(flat: Flat, s: Mapping, t: str, j: str) -> None:
    """unet.TemporalAttention (unet.py:664-758)."""
    for lin in ("q_linear", "k_linear", "v_linear"):
        _linear(flat, s, f"{t}.{lin}", f"{j}/{lin}/Dense_0")
    _conv(flat, s, f"{t}.proj.wrapped_module", f"{j}/proj")
    _norm(flat, s, f"{t}.norm.wrapped_module", f"{j}/norm")


def _vsrpp(flat: Flat, s: Mapping, t: str, j: str) -> None:
    """unet.BasicVSRPP (unet.py:313-595) minus the shared SPyNet."""
    for br in ("backward_1", "forward_1"):
        ta, ja = f"{t}.deform_align.{br}", f"{j}/{br}/deform_align"
        flat[f"{ja}/weight"] = t2j_conv2d(np.asarray(s[f"{ta}.weight"]))
        flat[f"{ja}/bias"] = np.asarray(s[f"{ta}.bias"])
        for k, src in enumerate((0, 2, 4)):
            _conv(flat, s, f"{ta}.conv_offset.{src}", f"{ja}/offset_conv{k}")
        _conv(flat, s, f"{ta}.conv_offset.6", f"{ja}/offset_out")
        tb, jb = f"{t}.backbone.{br}", f"{j}/{br}/backbone"
        _conv(flat, s, f"{tb}.main.0", f"{jb}/conv_in")
        _conv(flat, s, f"{tb}.main.2.conv1", f"{jb}/block0/conv1")
        _conv(flat, s, f"{tb}.main.2.conv2", f"{jb}/block0/conv2")
    _conv(flat, s, f"{t}.reconstruction.main.0", f"{j}/reconstruction/conv_in")
    _conv(flat, s, f"{t}.reconstruction.main.2.conv1",
          f"{j}/reconstruction/block0/conv1")
    _conv(flat, s, f"{t}.reconstruction.main.2.conv2",
          f"{j}/reconstruction/block0/conv2")
    _conv(flat, s, f"{t}.conv_last", f"{j}/conv_last")


def _sr3_level_block(flat: Flat, s: Mapping, t: str, j: str) -> None:
    """ResnetBlocWithAttn (sr3.py:229-314): res_block + optional gated
    temporal modules; gates are TemporalWrapper2.emb_layers (sr3.py:203-226)."""
    _sr3_res_block(flat, s, f"{t}.res_block", f"{j}/res_block")
    if f"{t}.conv_3d.emb_layers.1.weight" in s:
        _adm_res3d(flat, s, f"{t}.conv_3d.wrapped_module", f"{j}/conv_3d")
        _linear(flat, s, f"{t}.conv_3d.emb_layers.1",
                f"{j}/conv_3d_gate/gate/Dense_0")
    if f"{t}.attn.qkv.wrapped_module.weight" in s:
        _norm(flat, s, f"{t}.attn.norm.wrapped_module", f"{j}/attn/norm")
        _conv1x1_as_dense(flat, s, f"{t}.attn.qkv.wrapped_module",
                          f"{j}/attn/qkv")
        _conv1x1_as_dense(flat, s, f"{t}.attn.out.wrapped_module",
                          f"{j}/attn/out")
    if f"{t}.temp_attn.emb_layers.1.weight" in s:
        _temporal_attention(flat, s, f"{t}.temp_attn.wrapped_module",
                            f"{j}/temp_attn")
        _linear(flat, s, f"{t}.temp_attn.emb_layers.1",
                f"{j}/temp_attn_gate/gate/Dense_0")
    if f"{t}.vsrpp.emb_layers.1.weight" in s:
        _vsrpp(flat, s, f"{t}.vsrpp.wrapped_module", f"{j}/vsrpp")
        _linear(flat, s, f"{t}.vsrpp.emb_layers.1",
                f"{j}/vsrpp_gate/gate/Dense_0")


def convert_bicubic_unet(
    s: Mapping[str, np.ndarray],
    *,
    channel_mults: Sequence[int] = (1, 2, 4, 8, 16),
    res_blocks: int = 1,
):
    """FLAIR BicubicUNet checkpoint (flair_x8/x16_bicubic.pt) → flax params.

    Walks the reference construction order (sr3.py:352-467): downs list =
    [conv_in] + per-level res_blocks + Downsample; mid ×2; ups list with
    Upsample; final Block. The shared SPyNet is hoisted to a single top-level
    'spynet' (the torch state dict duplicates it under every vsrpp site).
    """
    flat: Flat = {}
    _linear(flat, s, "noise_level_mlp.1", "mlp_in/Dense_0")
    _linear(flat, s, "noise_level_mlp.3", "mlp_out/Dense_0")

    num_mults = len(channel_mults)
    idx = 0
    _conv(flat, s, f"downs.{idx}.wrapped_module", "conv_in/Conv_0")
    idx += 1
    li = 0
    for ind in range(num_mults):
        for _ in range(res_blocks):
            _sr3_level_block(flat, s, f"downs.{idx}", f"down_{li}")
            idx += 1
            li += 1
        if ind != num_mults - 1:
            _conv(flat, s, f"downs.{idx}.wrapped_module.conv",
                  f"downsample_{ind}/Conv_0")
            idx += 1

    _sr3_level_block(flat, s, "mid.0", "mid_0")
    _sr3_level_block(flat, s, "mid.1", "mid_1")

    idx = 0
    li = 0
    for ind in reversed(range(num_mults)):
        for _ in range(res_blocks + 1):
            _sr3_level_block(flat, s, f"ups.{idx}", f"up_{li}")
            idx += 1
            li += 1
        if ind >= 1:
            _conv(flat, s, f"ups.{idx}.wrapped_module.conv",
                  f"upsample_{ind}/Conv_0")
            idx += 1

    _norm(flat, s, "final_conv.block.0.wrapped_module", "final_norm")
    _conv(flat, s, "final_conv.block.3.wrapped_module", "final_conv/Conv_0")

    # shared SPyNet: hoist from the first vsrpp site that embeds it
    spynet_prefix = None
    for k in s:
        pos = k.find(".spynet.basic_module.")
        if pos != -1:
            spynet_prefix = k[: pos + len(".spynet.")]
            break
    if spynet_prefix is not None:
        sp = convert_spynet(s, prefix=spynet_prefix)["params"]
        from .checkpoint import flatten_params

        for k, v in flatten_params(sp).items():
            flat[f"spynet/{k}"] = v

    return {"params": unflatten_params(flat)}


# ---------------------------------------------------------------------------
# BlurUNet (guided_diffusion/unet_new.py:901-1362)
# ---------------------------------------------------------------------------


def _adm_resblock(flat: Flat, s: Mapping, t: str, j: str, dims: int = 2) -> None:
    """unet_new.ResBlock (unet_new.py:198-330): in/emb/out layers + optional
    1×1 skip; convs are wrapped in LazyReshaper{2,3}D either way."""
    _norm(flat, s, f"{t}.in_layers.0.wrapped_module", f"{j}/in_norm")
    cv = _conv3d if dims == 3 else _conv
    cv(flat, s, f"{t}.in_layers.2.wrapped_module", f"{j}/in_conv/Conv_0")
    _linear(flat, s, f"{t}.emb_layers.1", f"{j}/emb_proj/Dense_0")
    _norm(flat, s, f"{t}.out_layers.0.wrapped_module", f"{j}/out_norm")
    cv(flat, s, f"{t}.out_layers.3.wrapped_module", f"{j}/out_conv/Conv_0")
    if f"{t}.skip_connection.wrapped_module.weight" in s:
        cv(flat, s, f"{t}.skip_connection.wrapped_module", f"{j}/skip/Conv_0")


def _adm_attention(flat: Flat, s: Mapping, t: str, j: str,
                   bottleneck: bool = False) -> None:
    """unet_new.AttentionBlock / AttentionbottleBlock (unet_new.py:332-429):
    qkv/proj_out are 1-D convs → flax Dense."""
    _norm(flat, s, f"{t}.norm.wrapped_module", f"{j}/norm")
    w = np.asarray(s[f"{t}.qkv.weight"])[:, :, 0]
    flat[f"{j}/qkv/Dense_0/kernel"] = w.T
    flat[f"{j}/qkv/Dense_0/bias"] = np.asarray(s[f"{t}.qkv.bias"])
    w = np.asarray(s[f"{t}.proj_out.weight"])[:, :, 0]
    flat[f"{j}/proj/Dense_0/kernel"] = w.T
    flat[f"{j}/proj/Dense_0/bias"] = np.asarray(s[f"{t}.proj_out.bias"])
    if bottleneck:
        _linear(flat, s, f"{t}.emb_layers.1", f"{j}/emb_proj/Dense_0")


def convert_blur_unet(
    s: Mapping[str, np.ndarray],
    *,
    channel_mult: Sequence[float] = (0.5, 1, 1, 2, 2, 4, 4),
    num_res_blocks: int = 2,
    attention_ds: Sequence[int] = (16, 32, 64),
    rnn_ds: Sequence[int] = (1, 2),
    temporal_block: bool = True,
) -> dict:
    """FLAIR BlurUNet checkpoint (flair_gaussian/jpeg.pt) → flax params.

    Walks the reference construction order (unet_new.py:988-1216):
    input_blocks = [conv] + per-level (res [+res3d] [+attn [+tattn]]
    [+vsrpp]) + down; middle_block fixed 6-layer list; output_blocks with
    trailing up-ResBlock; `out` head. The UNet-owned SPyNet converts to the
    top-level 'spynet' collection (unet_new.py:985).
    """
    flat: Flat = {}
    _linear(flat, s, "time_embed.0", "time_embed_0/Dense_0")
    _linear(flat, s, "time_embed.2", "time_embed_1/Dense_0")
    _conv(flat, s, "input_blocks.0.0.wrapped_module", "conv_in/Conv_0")

    def level_layers(bi: str, j_prefix: str, ds: int) -> None:
        """Convert one (res [+res3d] [+attn [+tattn]] [+vsrpp]) entry."""
        li = 0
        _adm_resblock(flat, s, f"{bi}.{li}", f"{j_prefix}_res")
        li += 1
        if temporal_block:
            _adm_resblock(flat, s, f"{bi}.{li}.wrapped_module",
                          f"{j_prefix}_res3d", dims=3)
            li += 1
        if ds in attention_ds:
            _adm_attention(flat, s, f"{bi}.{li}", f"{j_prefix}_attn")
            li += 1
            if temporal_block:
                _temporal_attention(flat, s, f"{bi}.{li}.wrapped_module",
                                    f"{j_prefix}_attn_temporal")
                li += 1
        if ds in rnn_ds and temporal_block:
            _vsrpp(flat, s, f"{bi}.{li}.wrapped_module", f"{j_prefix}_vsrpp")
            li += 1

    idx = 1
    ds = 1
    for level in range(len(channel_mult)):
        for i in range(num_res_blocks):
            level_layers(f"input_blocks.{idx}", f"in_{level}_{i}", ds)
            idx += 1
        if level != len(channel_mult) - 1:
            _adm_resblock(flat, s, f"input_blocks.{idx}.0",
                          f"in_{level}_down")
            idx += 1
            ds *= 2

    # middle_block: res, [res3d], bottle-attn, [tattn], res, [res3d]
    mi = 0
    _adm_resblock(flat, s, f"middle_block.{mi}", "mid_res1"); mi += 1
    if temporal_block:
        _adm_resblock(flat, s, f"middle_block.{mi}.wrapped_module",
                      "mid_res3d_1", dims=3)
        mi += 1
    _adm_attention(flat, s, f"middle_block.{mi}", "mid_attn",
                   bottleneck=True)
    mi += 1
    if temporal_block:
        _temporal_attention(flat, s, f"middle_block.{mi}.wrapped_module",
                            "mid_attn_temporal")
        mi += 1
    _adm_resblock(flat, s, f"middle_block.{mi}", "mid_res2"); mi += 1
    if temporal_block:
        _adm_resblock(flat, s, f"middle_block.{mi}.wrapped_module",
                      "mid_res3d_2", dims=3)
        mi += 1

    idx = 0
    for level in reversed(range(len(channel_mult))):
        for i in range(num_res_blocks + 1):
            bi = f"output_blocks.{idx}"
            level_layers(bi, f"out_{level}_{i}", ds)
            if level and i == num_res_blocks:
                # trailing up-ResBlock is the entry's last layer
                last = 1
                if temporal_block:
                    last += 1
                if ds in attention_ds:
                    last += 1 + (1 if temporal_block else 0)
                if ds in rnn_ds and temporal_block:
                    last += 1
                _adm_resblock(flat, s, f"{bi}.{last}", f"out_{level}_up")
                ds //= 2
            idx += 1

    _norm(flat, s, "out.0.wrapped_module", "out_norm")
    _conv(flat, s, "out.2.wrapped_module", "out_conv/Conv_0")

    variables = {"params": unflatten_params(flat)}
    if any(k.startswith("spynet.") for k in s):
        sp = convert_spynet(s, prefix="spynet.")["params"]
        variables["params"]["spynet"] = sp
    return variables


# ---------------------------------------------------------------------------
# RetinaFace (facelib/detection/retinaface/{retinaface,retinaface_net}.py)
# ---------------------------------------------------------------------------


def _cbn(flat: Flat, s: Mapping, t: str, j: str) -> None:
    """conv_bn/conv_bn1X1/conv_bn_no_relu Sequential(conv, bn[, leaky]) →
    our ConvBNLeaky child 'cb' (ConvBN with conv/bn)."""
    flat[f"{j}/cb/conv/kernel"] = t2j_conv2d(np.asarray(s[f"{t}.0.weight"]))
    _bn(flat, s, f"{t}.1", f"{j}/cb/bn")


def convert_retinaface(s: Mapping[str, np.ndarray], *,
                       network: str = "resnet50") -> dict:
    """RetinaFace detector weights (detection_Resnet50_Final.pth /
    detection_mobilenet0.25_Final.pth, facelib/detection/__init__.py:25-48)
    → flax variables {'params', 'batch_stats'}."""
    flat: Flat = {}

    if network == "resnet50":
        # torchvision resnet50 body via IntermediateLayerGetter
        flat["body/conv1/kernel"] = t2j_conv2d(np.asarray(s["body.conv1.weight"]))
        _bn(flat, s, "body.bn1", "body/bn1")
        for li, n in enumerate((3, 4, 6, 3)):
            for bi in range(n):
                t = f"body.layer{li + 1}.{bi}"
                j = f"body/layer{li + 1}_{bi}"
                for ci in (1, 2, 3):
                    flat[f"{j}/c{ci}/conv/kernel"] = t2j_conv2d(
                        np.asarray(s[f"{t}.conv{ci}.weight"]))
                    _bn(flat, s, f"{t}.bn{ci}", f"{j}/c{ci}/bn")
                if f"{t}.downsample.0.weight" in s:
                    flat[f"{j}/downsample/conv/kernel"] = t2j_conv2d(
                        np.asarray(s[f"{t}.downsample.0.weight"]))
                    _bn(flat, s, f"{t}.downsample.1", f"{j}/downsample/bn")
    else:
        # MobileNet-0.25 body: stage1 (6 entries), stage2 (6), stage3 (2);
        # entry 0 of stage1 is conv_bn, the rest conv_dw(Sequential of 6)
        names = (
            [("body.stage1.0", "body/s1_0", "cbn")]
            + [(f"body.stage1.{i}", f"body/s1_{i}", "dw") for i in range(1, 6)]
            + [(f"body.stage2.{i}", f"body/s2_{i}", "dw") for i in range(6)]
            + [(f"body.stage3.{i}", f"body/s3_{i}", "dw") for i in range(2)]
        )
        for t, j, kind in names:
            if kind == "cbn":
                _cbn(flat, s, t, j)
            else:
                flat[f"{j}_dw/kernel"] = t2j_conv2d(np.asarray(s[f"{t}.0.weight"]))
                _bn(flat, s, f"{t}.1", f"{j}_dwbn")
                flat[f"{j}_pw/kernel"] = t2j_conv2d(np.asarray(s[f"{t}.3.weight"]))
                _bn(flat, s, f"{t}.4", f"{j}_pwbn")

    for name in ("output1", "output2", "output3", "merge1", "merge2"):
        _cbn(flat, s, f"fpn.{name}", f"fpn/{name}")
    for si in (1, 2, 3):
        for cname in ("conv3X3", "conv5X5_1", "conv5X5_2",
                      "conv7X7_2", "conv7x7_3"):
            _cbn(flat, s, f"ssh{si}.{cname}", f"ssh{si}/{cname}")
    for i in range(3):
        _conv(flat, s, f"BboxHead.{i}.conv1x1", f"bbox_head{i}")
        _conv(flat, s, f"ClassHead.{i}.conv1x1", f"class_head{i}")
        _conv(flat, s, f"LandmarkHead.{i}.conv1x1", f"landmark_head{i}")

    return _split_params_stats(flat)


# ---------------------------------------------------------------------------
# BiSeNet face parser (facelib/parsing/bisenet.py:8-141 + parsing/resnet.py)
# ---------------------------------------------------------------------------


def convert_bisenet(s: Mapping[str, np.ndarray]) -> dict:
    """BiSeNet parser weights (parsing_bisenet.pth layout,
    facelib/parsing/__init__.py:8-25) → flax variables for
    models/bisenet.BiSeNet."""
    flat: Flat = {}

    def cbr(t: str, j: str) -> None:  # reference ConvBNReLU(conv, bn)
        flat[f"{j}/conv/kernel"] = t2j_conv2d(np.asarray(s[f"{t}.conv.weight"]))
        _bn(flat, s, f"{t}.bn", f"{j}/bn")

    # ResNet18 backbone (parsing/resnet.py:49-71)
    flat["resnet/conv1/kernel"] = t2j_conv2d(
        np.asarray(s["cp.resnet.conv1.weight"]))
    _bn(flat, s, "cp.resnet.bn1", "resnet/bn1")
    for li in range(4):
        for bi in range(2):
            t = f"cp.resnet.layer{li + 1}.{bi}"
            j = f"resnet/layer{li + 1}_{bi}"
            for ci in (1, 2):
                flat[f"{j}/c{ci}/conv/kernel"] = t2j_conv2d(
                    np.asarray(s[f"{t}.conv{ci}.weight"]))
                _bn(flat, s, f"{t}.bn{ci}", f"{j}/c{ci}/bn")
            if f"{t}.downsample.0.weight" in s:
                flat[f"{j}/downsample/conv/kernel"] = t2j_conv2d(
                    np.asarray(s[f"{t}.downsample.0.weight"]))
                _bn(flat, s, f"{t}.downsample.1", f"{j}/downsample/bn")

    # context path (bisenet.py:53-85)
    cbr("cp.conv_avg", "conv_avg")
    for arm in ("arm16", "arm32"):
        cbr(f"cp.{arm}.conv", f"{arm}/conv")
        flat[f"{arm}/conv_atten/kernel"] = t2j_conv2d(
            np.asarray(s[f"cp.{arm}.conv_atten.weight"]))
        _bn(flat, s, f"cp.{arm}.bn_atten", f"{arm}/bn_atten")
    cbr("cp.conv_head32", "conv_head32")
    cbr("cp.conv_head16", "conv_head16")

    # fusion + heads (bisenet.py:88-121)
    cbr("ffm.convblk", "ffm/convblk")
    for i in (1, 2):
        flat[f"ffm/conv{i}/kernel"] = t2j_conv2d(
            np.asarray(s[f"ffm.conv{i}.weight"]))
    for name in ("conv_out", "conv_out16", "conv_out32"):
        cbr(f"{name}.conv", f"{name}/conv")
        flat[f"{name}/conv_out/kernel"] = t2j_conv2d(
            np.asarray(s[f"{name}.conv_out.weight"]))
    return _split_params_stats(flat)


# ---------------------------------------------------------------------------
# RestoreFormer (restoreformer.py:7-861)
# ---------------------------------------------------------------------------


def _rf_resblock(flat: Flat, s: Mapping, t: str, j: str) -> None:
    _norm(flat, s, f"{t}.norm1", f"{j}/norm1/GroupNorm_0")
    _conv(flat, s, f"{t}.conv1", f"{j}/conv1")
    _norm(flat, s, f"{t}.norm2", f"{j}/norm2/GroupNorm_0")
    _conv(flat, s, f"{t}.conv2", f"{j}/conv2")
    if f"{t}.nin_shortcut.weight" in s:
        _conv(flat, s, f"{t}.nin_shortcut", f"{j}/nin_shortcut")


def _rf_attn(flat: Flat, s: Mapping, t: str, j: str, *, norm2: bool) -> None:
    """MultiHeadAttnBlock (restoreformer.py:218-285). The torch module always
    owns norm2; our flax module only creates it on the cross-attention path,
    so copy it only when the call site passes ``y``."""
    _norm(flat, s, f"{t}.norm1", f"{j}/norm1/GroupNorm_0")
    if norm2:
        _norm(flat, s, f"{t}.norm2", f"{j}/norm2/GroupNorm_0")
    for p in ("q", "k", "v", "proj_out"):
        _conv(flat, s, f"{t}.{p}", f"{j}/{p}")


def convert_restoreformer(
    s: Mapping[str, np.ndarray],
    *,
    ch_mult: Sequence[int] = (1, 2, 2, 4, 4, 8),
    num_res_blocks: int = 2,
    resolution: int = 512,
    attn_resolutions: Sequence[int] = (16,),
    ex_multi_scale_num: int = 1,
    cross: bool = True,
) -> dict:
    """VQVAEGANMultiHeadTransformer (restoreformer.py:764-861; ``cross=True``,
    for models/restoreformer.RestoreFormer) or the plain VQVAEGAN
    (restoreformer.py:678-762; ``cross=False``) → flax variables."""
    flat: Flat = {}
    n = len(ch_mult)

    # encoder (restoreformer.py:288-368)
    _conv(flat, s, "encoder.conv_in", "encoder/conv_in")
    curr = resolution
    for i in range(n):
        for j in range(num_res_blocks):
            _rf_resblock(flat, s, f"encoder.down.{i}.block.{j}",
                         f"encoder/down{i}_block{j}")
            if curr in attn_resolutions:
                _rf_attn(flat, s, f"encoder.down.{i}.attn.{j}",
                         f"encoder/down{i}_attn{j}", norm2=False)
        if i != n - 1:
            _conv(flat, s, f"encoder.down.{i}.downsample.conv",
                  f"encoder/down{i}_ds/conv")
            curr //= 2
    _rf_resblock(flat, s, "encoder.mid.block_1", "encoder/mid_block1")
    _rf_attn(flat, s, "encoder.mid.attn_1", "encoder/mid_attn", norm2=False)
    _rf_resblock(flat, s, "encoder.mid.block_2", "encoder/mid_block2")
    _norm(flat, s, "encoder.norm_out", "encoder/norm_out/GroupNorm_0")
    _conv(flat, s, "encoder.conv_out", "encoder/conv_out")

    # quantizer bridge
    _conv(flat, s, "quant_conv", "quant_conv")
    _conv(flat, s, "post_quant_conv", "post_quant_conv")
    flat["quantize/embedding"] = np.asarray(s["quantize.embedding.weight"])

    # decoder (restoreformer.py:543-675 transformer / 415-541 plain); the
    # torch ModuleList is built with insert(0, ...) so up.{i} is level i
    dec_attn = list(attn_resolutions)
    if cross:
        for _ in range(ex_multi_scale_num):
            dec_attn = [dec_attn[0], dec_attn[-1] * 2]
    _conv(flat, s, "decoder.conv_in", "decoder/conv_in")
    _rf_resblock(flat, s, "decoder.mid.block_1", "decoder/mid_block1")
    _rf_attn(flat, s, "decoder.mid.attn_1", "decoder/mid_attn", norm2=cross)
    _rf_resblock(flat, s, "decoder.mid.block_2", "decoder/mid_block2")
    curr = resolution // 2 ** (n - 1)
    for i in reversed(range(n)):
        for j in range(num_res_blocks + 1):
            _rf_resblock(flat, s, f"decoder.up.{i}.block.{j}",
                         f"decoder/up{i}_block{j}")
            if curr in dec_attn:
                _rf_attn(flat, s, f"decoder.up.{i}.attn.{j}",
                         f"decoder/up{i}_attn{j}", norm2=cross)
        if i != 0:
            _conv(flat, s, f"decoder.up.{i}.upsample.conv",
                  f"decoder/up{i}_us/conv")
            curr *= 2
    _norm(flat, s, "decoder.norm_out", "decoder/norm_out/GroupNorm_0")
    _conv(flat, s, "decoder.conv_out", "decoder/conv_out")
    return {"params": unflatten_params(flat)}


# ---------------------------------------------------------------------------
# VQFR (vqfr.py:11-586)
# ---------------------------------------------------------------------------


def _vqfr_res(flat: Flat, s: Mapping, t: str, j: str) -> None:
    _norm(flat, s, f"{t}.norm1", f"{j}/norm1/GroupNorm_0")
    _conv(flat, s, f"{t}.conv1", f"{j}/conv1")
    _norm(flat, s, f"{t}.norm2", f"{j}/norm2/GroupNorm_0")
    _conv(flat, s, f"{t}.conv2", f"{j}/conv2")
    if f"{t}.residual_func.weight" in s:
        _conv(flat, s, f"{t}.residual_func", f"{j}/residual_func")


def convert_vqfr(
    s: Mapping[str, np.ndarray],
    *,
    channel_multipliers: Sequence[int] = (1, 2, 2, 4, 4, 8),
    num_enc_blocks: int = 2,
    use_enc_attention: bool = True,
    num_dec_blocks: int = 2,
    use_dec_attention: bool = True,
) -> dict:
    """VQFRv2 weights (vqfr.py:490-586; released VQFR_v2.pth layout) →
    flax variables for models/vqfr.VQFRv2."""
    flat: Flat = {}
    n = len(channel_multipliers)

    _conv(flat, s, "inpfeat_extraction", "inpfeat_extraction")

    # encoder (vqfr.py:190-260): blocks.{i} Sequential =
    # [Downsample (i>0)] + num_blocks x [Res, Attn (last level only)]
    _conv(flat, s, "encoder.conv_in", "encoder/conv_in")
    for i in range(n):
        si = 0
        t = f"encoder.blocks.{i}"
        if i != 0:
            _conv(flat, s, f"{t}.{si}.conv", f"encoder/down{i}/conv")
            si += 1
        for j in range(num_enc_blocks):
            _vqfr_res(flat, s, f"{t}.{si}", f"encoder/block{i}_{j}")
            si += 1
            if i == n - 1 and use_enc_attention:
                _cf_attnblock(flat, s, f"{t}.{si}", f"encoder/attn{i}_{j}")
                si += 1
    if use_enc_attention:
        _vqfr_res(flat, s, "encoder.mid_blocks.0", "encoder/mid1")
        _cf_attnblock(flat, s, "encoder.mid_blocks.1", "encoder/mid_attn")
        _vqfr_res(flat, s, "encoder.mid_blocks.2", "encoder/mid2")
    else:
        _vqfr_res(flat, s, "encoder.mid_blocks.0", "encoder/mid1")
        _vqfr_res(flat, s, "encoder.mid_blocks.1", "encoder/mid2")
    _norm(flat, s, "encoder.conv_out.0", "encoder/norm_out/GroupNorm_0")
    _conv(flat, s, "encoder.conv_out.2", "encoder/conv_out")

    # token head + codebook
    if "feat2index.0.weight" in s:
        _norm(flat, s, "feat2index.0", "feat2index_norm")
        _linear(flat, s, "feat2index.1", "feat2index")
    flat["quantizer/embedding"] = np.asarray(s["quantizer.embedding.weight"])

    # decoder (vqfr.py:262-339): blocks.{k} covers level n-1-k
    _conv(flat, s, "decoder.conv_in", "decoder/conv_in")
    if use_dec_attention:
        _vqfr_res(flat, s, "decoder.mid_blocks.0", "decoder/mid1")
        _cf_attnblock(flat, s, "decoder.mid_blocks.1", "decoder/mid_attn")
        _vqfr_res(flat, s, "decoder.mid_blocks.2", "decoder/mid2")
    else:
        _vqfr_res(flat, s, "decoder.mid_blocks.0", "decoder/mid1")
        _vqfr_res(flat, s, "decoder.mid_blocks.1", "decoder/mid2")
    for k in range(n):
        i = n - 1 - k
        si = 0
        t = f"decoder.blocks.{k}"
        if i != n - 1:
            _conv(flat, s, f"{t}.{si}.conv", f"decoder/up{i}/conv")
            si += 1
        for j in range(num_dec_blocks):
            _vqfr_res(flat, s, f"{t}.{si}", f"decoder/block{i}_{j}")
            si += 1
            if i == n - 1 and use_dec_attention:
                _cf_attnblock(flat, s, f"{t}.{si}", f"decoder/attn{i}_{j}")
                si += 1
    # shared out head (decoder.conv_out, reused for main_dec at vqfr.py:584)
    _norm(flat, s, "decoder.conv_out.0", "decoder_out/norm_out/GroupNorm_0")
    _conv(flat, s, "decoder.conv_out.2", "decoder_out/conv_out")

    # main branch (vqfr.py:429-488)
    for i in reversed(range(n)):
        lv = 2 ** i
        t = f"main_branch.align_func_dict.Level_{lv}"
        j = f"align_Level_{lv}"
        _conv(flat, s, f"{t}.offset_conv1.0", f"{j}/off1_0")
        _norm(flat, s, f"{t}.offset_conv1.1", f"{j}/off1_n0/GroupNorm_0")
        _conv(flat, s, f"{t}.offset_conv1.3", f"{j}/off1_1")
        _norm(flat, s, f"{t}.offset_conv1.4", f"{j}/off1_n1/GroupNorm_0")
        _conv(flat, s, f"{t}.offset_conv1.6", f"{j}/off1_2")
        _conv(flat, s, f"{t}.offset_conv2.0", f"{j}/off2")
        _norm(flat, s, f"{t}.offset_conv2.1", f"{j}/off2_n/GroupNorm_0")
        _conv(flat, s, f"{t}.dcn.conv_offset", f"{j}/dcn/conv_offset")
        flat[f"{j}/dcn/weight"] = t2j_conv2d(np.asarray(s[f"{t}.dcn.weight"]))
        flat[f"{j}/dcn/bias"] = np.asarray(s[f"{t}.dcn.bias"])
        if i != n - 1:
            _conv(flat, s, f"main_branch.pre_upsample_dict.Level_{lv}.1",
                  f"pre_up_{lv}")
            _vqfr_res(flat, s, f"main_branch.decoder_dict.Level_{lv}",
                      f"dec_Level_{lv}")
    return {"params": unflatten_params(flat)}


# ---------------------------------------------------------------------------
# YOLOv5-face detector (facelib/detection/yolov5face/models/yolo.py:95-235)
# ---------------------------------------------------------------------------


def _yolo_conv(flat: Flat, s: Mapping, t: str, j: str) -> None:
    """yolov5face Conv (common.py:46-48): conv (no bias) + BN."""
    flat[f"{j}/conv/kernel"] = t2j_conv2d(np.asarray(s[f"{t}.conv.weight"]))
    _bn(flat, s, f"{t}.bn", f"{j}/bn")


def convert_yolov5face(s: Mapping[str, np.ndarray], cfg: Mapping) -> dict:
    """YOLOv5-face weights (yolov5n/l-face .pth) → flax variables for
    models/yolov5face.YOLOv5FromConfig(cfg). Walks the same
    [from, number, module, args] graph as the interpreter (yolo.py:95-235
    parse_model), so torch layer index == our l{i} name."""
    import math

    flat: Flat = {}
    gd = cfg["depth_multiple"]

    def cdepth(n):
        return max(round(n * gd), 1) if n > 1 else n

    layers = list(cfg["backbone"]) + list(cfg["head"])
    for li, (frm, num, mod, args) in enumerate(layers):
        mod = str(mod)
        t = f"model.{li}"
        j = f"l{li}_{mod.replace('.', '_').lower()}"
        n = cdepth(num)
        if mod == "Conv":
            _yolo_conv(flat, s, t, j)
        elif mod == "StemBlock":
            for sub in ("stem_1", "stem_2a", "stem_2b", "stem_3"):
                _yolo_conv(flat, s, f"{t}.{sub}", f"{j}/{sub}")
        elif mod == "C3":
            for sub in ("cv1", "cv2", "cv3"):
                _yolo_conv(flat, s, f"{t}.{sub}", f"{j}/{sub}")
            for bi in range(n):
                _yolo_conv(flat, s, f"{t}.m.{bi}.cv1", f"{j}/m{bi}/cv1")
                _yolo_conv(flat, s, f"{t}.m.{bi}.cv2", f"{j}/m{bi}/cv2")
        elif mod == "SPP":
            _yolo_conv(flat, s, f"{t}.cv1", f"{j}/cv1")
            _yolo_conv(flat, s, f"{t}.cv2", f"{j}/cv2")
        elif mod == "ShuffleV2Block":
            stride = args[1]
            for ni in range(n):
                tt = f"{t}.{ni}" if n > 1 else t
                jj = f"{j}_{ni}"
                if stride > 1:
                    pairs = [("branch1.0", "b1_dw"), ("branch1.2", "b1_pw"),
                             ("branch2.0", "b2_pw1"), ("branch2.3", "b2_dw"),
                             ("branch2.5", "b2_pw2")]
                else:
                    pairs = [("branch2.0", "b2_pw1"), ("branch2.3", "b2_dw"),
                             ("branch2.5", "b2_pw2")]
                for tb, jb in pairs:
                    bn_t = f"{tt}.{tb[:-1]}{int(tb[-1]) + 1}"
                    flat[f"{jj}/{jb}_conv/kernel"] = t2j_conv2d(
                        np.asarray(s[f"{tt}.{tb}.weight"]))
                    _bn(flat, s, bn_t, f"{jj}/{jb}_bn")
        elif mod == "Detect":
            for i in range(len(frm)):
                _conv(flat, s, f"{t}.m.{i}", f"detect{i}")
        elif mod in ("nn.Upsample", "Concat"):
            pass
        else:
            raise ValueError(f"unknown module in config: {mod}")
    return _split_params_stats(flat)


# ---------------------------------------------------------------------------
# SuperSloMo (superslomo.py:8-291)
# ---------------------------------------------------------------------------


def convert_superslomo(s: Mapping[str, np.ndarray]) -> dict:
    """SuperSloMo weights (flow UNet + interpolation UNet,
    superslomo.py:217-221) → flax variables for models/superslomo.SuperSloMo."""
    flat: Flat = {}
    for net in ("flow_estimator", "interp"):
        for cv in ("conv1", "conv2", "conv3"):
            _conv(flat, s, f"{net}.{cv}", f"{net}/{cv}")
        for i in range(1, 6):
            for cv in ("conv1", "conv2"):
                _conv(flat, s, f"{net}.down{i}.{cv}", f"{net}/down{i}/{cv}")
                _conv(flat, s, f"{net}.up{i}.{cv}", f"{net}/up{i}/{cv}")
    return {"params": unflatten_params(flat)}


# ---------------------------------------------------------------------------
# AMT frame interpolator (amt.py:44-236 + amt_blocks/*)
# ---------------------------------------------------------------------------


def t2j_convtranspose2d(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d weight (in, out, kh, kw) → flax nn.ConvTranspose
    kernel (kh, kw, in, out); flax's transposed conv correlates an unflipped
    kernel, so the spatial taps must be reversed (verified vs torch)."""
    return np.ascontiguousarray(w.transpose(2, 3, 0, 1)[::-1, ::-1])


def _amt_convrelu(flat: Flat, s: Mapping, t: str, j: str) -> None:
    """ifrnet convrelu Sequential(Conv2d, PReLU) → our ConvPReLU."""
    _conv(flat, s, f"{t}.0", f"{j}/conv")
    flat[f"{j}/act/prelu"] = np.asarray(s[f"{t}.1.weight"])


def _amt_resblock(flat: Flat, s: Mapping, t: str, j: str) -> None:
    """ifrnet ResBlock (conv1-4 convrelu, conv5 plain, trailing PReLU)."""
    for i in (1, 2, 3, 4):
        _amt_convrelu(flat, s, f"{t}.conv{i}", f"{j}/conv{i}")
    _conv(flat, s, f"{t}.conv5", f"{j}/conv5")
    flat[f"{j}/prelu/prelu"] = np.asarray(s[f"{t}.prelu.weight"])


def convert_amt(s: Mapping[str, np.ndarray]) -> dict:
    """AMT interpolator weights (amt-l released ckpt layout, amt.py:44-111)
    → flax variables for models/amt.AMT."""
    flat: Flat = {}

    # RAFT feature encoder (feat_enc.py:267-345, instance norm — affine-free,
    # so norms carry no weights)
    _conv(flat, s, "feat_encoder.conv1", "feat_encoder/conv1")
    _conv(flat, s, "feat_encoder.conv2", "feat_encoder/conv2")
    for i, lname in enumerate(("layer1", "layer2", "layer3", "layer3_2")):
        for bi in range(2):
            t = f"feat_encoder.{lname}.{bi}"
            j = f"feat_encoder/layer{i}_{bi}"
            _conv(flat, s, f"{t}.conv1", f"{j}/conv1")
            _conv(flat, s, f"{t}.conv2", f"{j}/conv2")
            if f"{t}.downsample.0.weight" in s:
                _conv(flat, s, f"{t}.downsample.0", f"{j}/downsample")

    # IFRNet pyramid encoder (4 levels of 2 convrelu)
    for idx in range(4):
        for sub in range(2):
            _amt_convrelu(flat, s, f"encoder.pyramid{idx + 1}.{sub}",
                          f"encoder/pyr{idx}_{sub}")

    # coarse-to-fine decoders: convblock = [convrelu, ResBlock, deconv]
    for k in (4, 3, 2, 1):
        t = f"decoder{k}.convblock"
        j = f"decoder{k}"
        _amt_convrelu(flat, s, f"{t}.0", f"{j}/conv_in")
        _amt_resblock(flat, s, f"{t}.1", f"{j}/res")
        flat[f"{j}/up/deconv/kernel"] = t2j_convtranspose2d(
            np.asarray(s[f"{t}.2.weight"]))
        flat[f"{j}/up/deconv/bias"] = np.asarray(s[f"{t}.2.bias"])

    # RAFT update blocks
    for u in ("update4", "update3_low", "update3_high",
              "update2_low", "update2_high"):
        for cv in ("convc1", "convc2", "convf1", "convf2", "conv"):
            _conv(flat, s, f"{u}.{cv}", f"{u}/{cv}")
        for tseq, jpair in (("gru", ("gru1", "gru2")),
                            ("feat_head", ("feat1", "feat2")),
                            ("flow_head", ("flow1", "flow2"))):
            _conv(flat, s, f"{u}.{tseq}.0", f"{u}/{jpair[0]}")
            _conv(flat, s, f"{u}.{tseq}.2", f"{u}/{jpair[1]}")

    # multi-flow combination head
    _conv(flat, s, "comb_block.0", "comb0/conv")
    flat["comb0/act/prelu"] = np.asarray(s["comb_block.1.weight"])
    _conv(flat, s, "comb_block.2", "comb1")
    return {"params": unflatten_params(flat)}


# ---------------------------------------------------------------------------
# DAVSRNet pieces (davsr.py:1557-1921)
# ---------------------------------------------------------------------------


def convert_davsr_aux(s: Mapping[str, np.ndarray]) -> dict:
    """DAVSRNet auxiliary nets → flax params for models/davsr.DAVSRNet:
    HyPaNet (1×1 Conv3d MLP ↔ Dense, davsr.py:1722-1744) and the two
    SuperSloMo UNets (flow/interp, davsr.py:1788-1790).

    The internal BasicVSRPP regularizer is intentionally NOT mapped: the
    reference instance upsamples 4× per unfolding iteration
    (davsr.py:1374-1380 upsample path inside the :1914-1916 loop), which is
    resolution-inconsistent with its own data prox — our DAVSRNet keeps a
    same-size regularizer by design (models/davsr.ImageVSRPP docstring).
    """
    flat: Flat = {}
    for i, fc in ((0, "fc1"), (2, "fc2"), (4, "fc3")):
        w = np.asarray(s[f"h.mlp.{i}.weight"])  # (O, I, 1, 1, 1)
        flat[f"hypanet/{fc}/kernel"] = w.reshape(w.shape[0], w.shape[1]).T
        flat[f"hypanet/{fc}/bias"] = np.asarray(s[f"h.mlp.{i}.bias"])
    for net in ("flow", "interp"):
        for cv in ("conv1", "conv2", "conv3"):
            _conv(flat, s, f"{net}.{cv}", f"{net}/{cv}")
        for i in range(1, 6):
            for cv in ("conv1", "conv2"):
                _conv(flat, s, f"{net}.down{i}.{cv}", f"{net}/down{i}/{cv}")
                _conv(flat, s, f"{net}.up{i}.{cv}", f"{net}/up{i}/{cv}")
    return {"params": unflatten_params(flat)}
