"""Functional import shims for the reference's native/external dependencies.

The reference (at /root/reference) imports flash_attn (CUDA wheel),
torchvision, mmcv and mmedit — none of which exist in this environment. For
*parity testing* we install pure-torch implementations of the exact public
contracts the reference uses, so its modules can be imported AND executed on
CPU with random weights:

- flash_attn.flash_attn_interface.flash_attn_func → dense softmax attention
  (nn.py:370-394 call sites);
- torchvision.ops.deform_conv2d → grid_sample-based modulated deformable
  conv (unet.py:652-661 call site);
- mmcv.ops.ModulatedDeformConv2d / mmcv.cnn.constant_init (unet.py:598 base);
- mmedit SPyNet / flow_warp / PixelShufflePack / ResidualBlocksWithInputConv
  (unet.py:34-38), implementing the mmedit-0.12 basicvsr_net semantics.

Call install_reference_shims() BEFORE importing any guided_diffusion module.
"""

from __future__ import annotations

import sys
import types


def _flash_attn_module():
    import torch

    mod = types.ModuleType("flash_attn")
    iface = types.ModuleType("flash_attn.flash_attn_interface")

    def flash_attn_func(q, k, v, dropout_p=0.0, softmax_scale=None,
                        causal=False, **kw):
        # (batch, seqlen, nheads, headdim), softmax over k's seqlen
        assert not causal
        scale = softmax_scale if softmax_scale is not None else q.shape[-1] ** -0.5
        qf, kf, vf = q.float(), k.float(), v.float()
        attn = torch.einsum("bshd,bthd->bhst", qf * scale, kf).softmax(dim=-1)
        out = torch.einsum("bhst,bthd->bshd", attn, vf)
        return out.to(q.dtype)

    iface.flash_attn_func = flash_attn_func
    mod.flash_attn_interface = iface
    sys.modules["flash_attn"] = mod
    sys.modules["flash_attn.flash_attn_interface"] = iface


def _deform_conv2d(input, offset, weight, bias=None, stride=(1, 1),
                   padding=(0, 0), dilation=(1, 1), mask=None):
    """torchvision.ops.deform_conv2d contract, via grid_sample.

    offset: (B, 2·G·kh·kw, Ho, Wo) in (dy, dx) pairs; mask: (B, G·kh·kw, Ho,
    Wo); zeros padding outside; conv groups = 1.
    """
    import torch
    import torch.nn.functional as F

    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    B, C, H, W = input.shape
    O, Cw, kh, kw = weight.shape
    assert Cw == C, "conv groups != 1 not supported by the shim"
    sy, sx = stride
    py, px = padding
    dly, dlx = dilation
    Ho = (H + 2 * py - (dly * (kh - 1) + 1)) // sy + 1
    Wo = (W + 2 * px - (dlx * (kw - 1) + 1)) // sx + 1
    K = kh * kw
    G = offset.shape[1] // (2 * K)

    off = offset.view(B, G, K, 2, Ho, Wo)
    ys = torch.arange(Ho, device=input.device) * sy - py
    xs = torch.arange(Wo, device=input.device) * sx - px
    iy = torch.arange(kh, device=input.device) * dly
    ix = torch.arange(kw, device=input.device) * dlx
    base_y = ys.view(1, 1, Ho, 1) + iy.view(kh, 1, 1, 1)   # (kh,1,Ho,1)
    base_x = xs.view(1, 1, 1, Wo) + ix.view(1, kw, 1, 1)   # (1,kw,1,Wo)
    base_y = base_y.expand(kh, kw, Ho, Wo).reshape(1, 1, K, Ho, Wo)
    base_x = base_x.expand(kh, kw, Ho, Wo).reshape(1, 1, K, Ho, Wo)
    pos_y = base_y + off[:, :, :, 0]
    pos_x = base_x + off[:, :, :, 1]
    gy = 2.0 * pos_y / max(H - 1, 1) - 1.0
    gx = 2.0 * pos_x / max(W - 1, 1) - 1.0
    grid = torch.stack([gx, gy], dim=-1)                   # (B,G,K,Ho,Wo,2)

    xg = input.view(B, G, C // G, H, W).reshape(B * G, C // G, H, W)
    grid = grid.reshape(B * G, K * Ho, Wo, 2)
    sampled = F.grid_sample(
        xg, grid, mode="bilinear", padding_mode="zeros", align_corners=True
    ).view(B, G, C // G, K, Ho, Wo)
    if mask is not None:
        sampled = sampled * mask.view(B, G, 1, K, Ho, Wo)
    sampled = sampled.view(B, C, K, Ho, Wo)
    w = weight.view(O, C, K)
    out = torch.einsum("bckhw,ock->bohw", sampled, w)
    if bias is not None:
        out = out + bias.view(1, O, 1, 1)
    return out


def _torchvision_module():
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    tv = types.ModuleType("torchvision")
    tv.__version__ = "0.15.0"  # vqfr.py:356 LooseVersion gate → torchvision path
    ops = types.ModuleType("torchvision.ops")
    ops.deform_conv2d = _deform_conv2d
    tv.ops = ops

    models = types.ModuleType("torchvision.models")
    mutils = types.ModuleType("torchvision.models._utils")

    class IntermediateLayerGetter(nn.ModuleDict):
        """torchvision.models._utils.IntermediateLayerGetter contract."""

        def __init__(self, model, return_layers):
            orig = dict(return_layers)
            layers = {}
            remaining = dict(return_layers)
            for name, module in model.named_children():
                layers[name] = module
                if name in remaining:
                    del remaining[name]
                if not remaining:
                    break
            super().__init__(layers)
            self.return_layers = orig

        def forward(self, x):
            out = {}
            for name, module in self.items():
                x = module(x)
                if name in self.return_layers:
                    out[self.return_layers[name]] = x
            return out

    mutils.IntermediateLayerGetter = IntermediateLayerGetter
    models._utils = mutils

    class _Bottleneck(nn.Module):
        """torchvision.models.resnet.Bottleneck contract (expansion 4)."""

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(planes * 4)
            self.relu = nn.ReLU(inplace=True)
            self.downsample = downsample
            self.stride = stride

        def forward(self, x):
            idn = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            if self.downsample is not None:
                idn = self.downsample(x)
            return self.relu(out + idn)

    class _ResNet50(nn.Module):
        """torchvision.models.resnet50 contract (naming + topology)."""

        def __init__(self):
            super().__init__()
            self.inplanes = 64
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            self.layer1 = self._make_layer(64, 3, 1)
            self.layer2 = self._make_layer(128, 4, 2)
            self.layer3 = self._make_layer(256, 6, 2)
            self.layer4 = self._make_layer(512, 3, 2)
            self.avgpool = nn.AdaptiveAvgPool2d(1)
            self.fc = nn.Linear(2048, 1000)

        def _make_layer(self, planes, blocks, stride):
            downsample = None
            if stride != 1 or self.inplanes != planes * 4:
                downsample = nn.Sequential(
                    nn.Conv2d(self.inplanes, planes * 4, 1, stride, bias=False),
                    nn.BatchNorm2d(planes * 4),
                )
            layers = [_Bottleneck(self.inplanes, planes, stride, downsample)]
            self.inplanes = planes * 4
            layers += [_Bottleneck(self.inplanes, planes) for _ in range(1, blocks)]
            return nn.Sequential(*layers)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            return self.fc(torch.flatten(self.avgpool(x), 1))

    def resnet50(pretrained=False, **kw):
        return _ResNet50()

    models.resnet50 = resnet50

    transforms = types.ModuleType("torchvision.transforms")
    tfunc = types.ModuleType("torchvision.transforms.functional")

    class InterpolationMode:
        BICUBIC = "bicubic"
        BILINEAR = "bilinear"
        NEAREST = "nearest"

    def normalize(t, mean, std, inplace=False):
        mean = torch.as_tensor(mean, dtype=t.dtype).view(-1, 1, 1)
        std = torch.as_tensor(std, dtype=t.dtype).view(-1, 1, 1)
        return (t - mean) / std

    def resize(t, size, interpolation=InterpolationMode.BILINEAR, **kw):
        mode = str(getattr(interpolation, "value", interpolation))
        nd = t.dim()
        if nd == 3:
            t = t[None]
        out = F.interpolate(t, size=tuple(size), mode=mode, align_corners=False)
        return out[0] if nd == 3 else out

    class Compose:
        """transforms.Compose contract (davsr.py:1781-1787 call site)."""

        def __init__(self, ts):
            self.ts = ts

        def __call__(self, x):
            for t in self.ts:
                x = t(x)
            return x

    class Normalize:
        def __init__(self, mean, std, inplace=False):
            self.mean, self.std = mean, std

        def __call__(self, x):
            return normalize(x, self.mean, self.std)

    tfunc.InterpolationMode = InterpolationMode
    tfunc.normalize = normalize
    tfunc.resize = resize
    transforms.functional = tfunc
    transforms.InterpolationMode = InterpolationMode
    transforms.Compose = Compose
    transforms.Normalize = Normalize
    tv.transforms = transforms
    tv.models = models

    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = ops
    sys.modules["torchvision.models"] = models
    sys.modules["torchvision.models._utils"] = mutils
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.transforms.functional"] = tfunc


def _flow_warp(x, flow, interpolation="bilinear", padding_mode="zeros",
               align_corners=True):
    """mmedit.models.common.flow_warp: x (n,c,h,w), flow (n,h,w,2) in (dx,dy)."""
    import torch
    import torch.nn.functional as F

    n, c, h, w = x.shape
    gy, gx = torch.meshgrid(
        torch.arange(h, dtype=x.dtype, device=x.device),
        torch.arange(w, dtype=x.dtype, device=x.device),
        indexing="ij",
    )
    grid = torch.stack((gx, gy), dim=2)[None]  # (1,h,w,2)
    gf = grid + flow
    gfx = 2.0 * gf[..., 0] / max(w - 1, 1) - 1.0
    gfy = 2.0 * gf[..., 1] / max(h - 1, 1) - 1.0
    return F.grid_sample(
        x, torch.stack((gfx, gfy), dim=3), mode=interpolation,
        padding_mode=padding_mode, align_corners=align_corners,
    )


def _mmedit_modules():
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class PixelShufflePack(nn.Module):
        """mmedit PixelShufflePack: conv to c·s² then pixel_shuffle."""

        def __init__(self, in_channels, out_channels, scale_factor,
                     upsample_kernel):
            super().__init__()
            self.scale_factor = scale_factor
            self.upsample_conv = nn.Conv2d(
                in_channels, out_channels * scale_factor ** 2,
                upsample_kernel, padding=(upsample_kernel - 1) // 2,
            )

        def forward(self, x):
            return F.pixel_shuffle(self.upsample_conv(x), self.scale_factor)

    class ResidualBlockNoBN(nn.Module):
        def __init__(self, mid_channels=64):
            super().__init__()
            self.conv1 = nn.Conv2d(mid_channels, mid_channels, 3, 1, 1, bias=True)
            self.conv2 = nn.Conv2d(mid_channels, mid_channels, 3, 1, 1, bias=True)
            self.relu = nn.ReLU(inplace=True)

        def forward(self, x):
            return x + self.conv2(self.relu(self.conv1(x)))

    class ResidualBlocksWithInputConv(nn.Module):
        """mmedit basicvsr_net.ResidualBlocksWithInputConv: conv+lrelu then
        num_blocks ResidualBlockNoBN."""

        def __init__(self, in_channels, out_channels=64, num_blocks=30):
            super().__init__()
            layers = [
                nn.Conv2d(in_channels, out_channels, 3, 1, 1, bias=True),
                nn.LeakyReLU(negative_slope=0.1, inplace=True),
            ]
            layers += [ResidualBlockNoBN(out_channels) for _ in range(num_blocks)]
            self.main = nn.Sequential(*layers)

        def forward(self, feat):
            return self.main(feat)

    class _ConvModule(nn.Module):
        """mmcv ConvModule contract (conv under a .conv attribute)."""

        def __init__(self, ci, co, act):
            super().__init__()
            self.conv = nn.Conv2d(ci, co, 7, 1, 3)
            self.act = act

        def forward(self, x):
            x = self.conv(x)
            return F.relu(x) if self.act else x

    class SPyNetBasicModule(nn.Module):
        def __init__(self):
            super().__init__()
            chans = [(8, 32), (32, 64), (64, 32), (32, 16), (16, 2)]
            self.basic_module = nn.Sequential(
                *[
                    _ConvModule(ci, co, i != len(chans) - 1)
                    for i, (ci, co) in enumerate(chans)
                ]
            )

        def forward(self, x):
            return self.basic_module(x)

    class SPyNet(nn.Module):
        """mmedit basicvsr_net.SPyNet (6-level pyramid flow)."""

        def __init__(self, pretrained=None):
            super().__init__()
            self.basic_module = nn.ModuleList(
                [SPyNetBasicModule() for _ in range(6)]
            )
            self.register_buffer(
                "mean", torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
            )
            self.register_buffer(
                "std", torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
            )

        def compute_flow(self, ref, supp):
            n, _, h, w = ref.size()
            ref = [(ref - self.mean) / self.std]
            supp = [(supp - self.mean) / self.std]
            for _ in range(5):
                ref.append(F.avg_pool2d(ref[-1], 2, 2, count_include_pad=False))
                supp.append(F.avg_pool2d(supp[-1], 2, 2, count_include_pad=False))
            ref = ref[::-1]
            supp = supp[::-1]

            flow = ref[0].new_zeros(n, 2, h // 32, w // 32)
            for level in range(len(ref)):
                if level == 0:
                    flow_up = flow
                else:
                    flow_up = (
                        F.interpolate(
                            flow, scale_factor=2, mode="bilinear",
                            align_corners=True,
                        ) * 2.0
                    )
                flow = flow_up + self.basic_module[level](
                    torch.cat(
                        [
                            ref[level],
                            _flow_warp(
                                supp[level],
                                flow_up.permute(0, 2, 3, 1),
                                padding_mode="border",
                            ),
                            flow_up,
                        ],
                        dim=1,
                    )
                )
            return flow

        def forward(self, ref, supp):
            h, w = ref.shape[2:4]
            w_up = w if (w % 32) == 0 else 32 * (w // 32 + 1)
            h_up = h if (h % 32) == 0 else 32 * (h // 32 + 1)
            ref_r = F.interpolate(ref, size=(h_up, w_up), mode="bilinear",
                                  align_corners=False)
            supp_r = F.interpolate(supp, size=(h_up, w_up), mode="bilinear",
                                   align_corners=False)
            flow = F.interpolate(
                self.compute_flow(ref_r, supp_r), size=(h, w),
                mode="bilinear", align_corners=False,
            )
            flow[:, 0, :, :] *= float(w) / float(w_up)
            flow[:, 1, :, :] *= float(h) / float(h_up)
            return flow

    mmedit = types.ModuleType("mmedit")
    models_m = types.ModuleType("mmedit.models")
    backbones = types.ModuleType("mmedit.models.backbones")
    srb = types.ModuleType("mmedit.models.backbones.sr_backbones")
    bvn = types.ModuleType(
        "mmedit.models.backbones.sr_backbones.basicvsr_net"
    )
    common = types.ModuleType("mmedit.models.common")

    bvn.SPyNet = SPyNet
    bvn.SPyNetBasicModule = SPyNetBasicModule
    bvn.ResidualBlocksWithInputConv = ResidualBlocksWithInputConv
    common.PixelShufflePack = PixelShufflePack
    common.flow_warp = _flow_warp

    srb.basicvsr_net = bvn
    backbones.sr_backbones = srb
    models_m.backbones = backbones
    models_m.common = common
    mmedit.models = models_m

    utils_m = types.ModuleType("mmedit.utils")

    def get_root_logger(*a, **k):  # davsr.py:17
        import logging

        return logging.getLogger("mmedit")

    utils_m.get_root_logger = get_root_logger
    mmedit.utils = utils_m

    for name, mod in (
        ("mmedit", mmedit),
        ("mmedit.models", models_m),
        ("mmedit.models.backbones", backbones),
        ("mmedit.models.backbones.sr_backbones", srb),
        ("mmedit.models.backbones.sr_backbones.basicvsr_net", bvn),
        ("mmedit.models.common", common),
        ("mmedit.utils", utils_m),
    ):
        sys.modules[name] = mod


def _mmcv_modules():
    import math

    import torch
    import torch.nn as nn

    class ModulatedDeformConv2d(nn.Module):
        """mmcv.ops.ModulatedDeformConv2d parameter/attribute contract."""

        def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                     padding=0, dilation=1, groups=1, deform_groups=1,
                     bias=True):
            super().__init__()
            if isinstance(kernel_size, int):
                kernel_size = (kernel_size, kernel_size)
            self.in_channels = in_channels
            self.out_channels = out_channels
            self.kernel_size = kernel_size
            self.stride = stride
            self.padding = padding
            self.dilation = dilation
            self.groups = groups
            self.deform_groups = deform_groups
            self.weight = nn.Parameter(
                torch.empty(out_channels, in_channels // groups, *kernel_size)
            )
            self.bias = nn.Parameter(torch.empty(out_channels)) if bias else None
            self.init_weights()

        def init_weights(self):
            n = self.in_channels * self.kernel_size[0] * self.kernel_size[1]
            stdv = 1.0 / math.sqrt(n)
            self.weight.data.uniform_(-stdv, stdv)
            if self.bias is not None:
                self.bias.data.zero_()

    def constant_init(module, val, bias=0):
        if hasattr(module, "weight") and module.weight is not None:
            nn.init.constant_(module.weight, val)
        if hasattr(module, "bias") and module.bias is not None:
            nn.init.constant_(module.bias, bias)

    mmcv = types.ModuleType("mmcv")
    cnn = types.ModuleType("mmcv.cnn")
    ops = types.ModuleType("mmcv.ops")
    cnn.constant_init = constant_init
    ops.ModulatedDeformConv2d = ModulatedDeformConv2d
    mmcv.cnn = cnn
    mmcv.ops = ops
    runner = types.ModuleType("mmcv.runner")

    def load_checkpoint(model, filename, *a, **k):  # davsr.py:19
        import torch

        state = torch.load(filename, map_location="cpu")
        model.load_state_dict(state.get("state_dict", state), strict=False)
        return state

    runner.load_checkpoint = load_checkpoint
    mmcv.runner = runner
    sys.modules["mmcv"] = mmcv
    sys.modules["mmcv.cnn"] = cnn
    sys.modules["mmcv.ops"] = ops
    sys.modules["mmcv.runner"] = runner


def reference_root():
    """Resolve the reference checkout (FLAIR_REFERENCE_ROOT overrides)."""
    import os

    return os.environ.get("FLAIR_REFERENCE_ROOT", "/root/reference")



def _timm_module():
    """timm.models.layers.trunc_normal_ (vqfr.py:7) → torch.nn.init."""
    import torch

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")
    layers.trunc_normal_ = torch.nn.init.trunc_normal_
    models.layers = layers
    timm.models = models
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers


def _dcn_module():
    """guided_diffusion.dcn (the bundled CUDA extension, dcn/deform_conv.py)
    → pure-torch replica driving the grid_sample deform_conv2d shim. Only the
    pieces vqfr.py imports: ModulatedDeformConvPack, modulated_deform_conv."""
    import math

    import torch
    import torch.nn as nn

    def modulated_deform_conv(x, offset, mask, weight, bias, stride=1,
                              padding=0, dilation=1, groups=1,
                              deformable_groups=1):
        assert groups == 1, "shim supports conv groups == 1"
        return _deform_conv2d(x, offset, weight, bias, stride=stride,
                              padding=padding, dilation=dilation, mask=mask)

    class ModulatedDeformConv(nn.Module):
        def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                     padding=0, dilation=1, groups=1, deformable_groups=1,
                     bias=True):
            super().__init__()
            self.in_channels = in_channels
            self.out_channels = out_channels
            self.kernel_size = (kernel_size, kernel_size) if isinstance(
                kernel_size, int) else tuple(kernel_size)
            self.stride = stride
            self.padding = padding
            self.dilation = dilation
            self.groups = groups
            self.deformable_groups = deformable_groups
            self.weight = nn.Parameter(torch.Tensor(
                out_channels, in_channels // groups, *self.kernel_size))
            self.bias = nn.Parameter(torch.Tensor(out_channels)) if bias \
                else None
            self.init_weights()

        def init_weights(self):
            n = self.in_channels
            for k in self.kernel_size:
                n *= k
            stdv = 1.0 / math.sqrt(n)
            self.weight.data.uniform_(-stdv, stdv)
            if self.bias is not None:
                self.bias.data.zero_()

        def forward(self, x, offset, mask):
            return modulated_deform_conv(
                x, offset, mask, self.weight, self.bias, self.stride,
                self.padding, self.dilation, self.groups,
                self.deformable_groups)

    class ModulatedDeformConvPack(ModulatedDeformConv):
        _version = 2

        def __init__(self, *args, **kwargs):
            super().__init__(*args, **kwargs)
            self.conv_offset = nn.Conv2d(
                self.in_channels,
                self.deformable_groups * 3 * self.kernel_size[0]
                * self.kernel_size[1],
                kernel_size=self.kernel_size, stride=self.stride,
                padding=self.padding, dilation=self.dilation, bias=True)
            self.conv_offset.weight.data.zero_()
            self.conv_offset.bias.data.zero_()

        def forward(self, x):
            out = self.conv_offset(x)
            o1, o2, mask = torch.chunk(out, 3, dim=1)
            offset = torch.cat((o1, o2), dim=1)
            mask = torch.sigmoid(mask)
            return modulated_deform_conv(
                x, offset, mask, self.weight, self.bias, self.stride,
                self.padding, self.dilation, self.groups,
                self.deformable_groups)

    dcn = types.ModuleType("guided_diffusion.dcn")
    dcn.ModulatedDeformConvPack = ModulatedDeformConvPack
    dcn.ModulatedDeformConv = ModulatedDeformConv
    dcn.modulated_deform_conv = modulated_deform_conv
    sys.modules["guided_diffusion.dcn"] = dcn


def install_reference_shims():
    """Install all functional shims (idempotent) and put the reference
    checkout on sys.path. Safe to call multiple times."""
    if "flash_attn" not in sys.modules:
        _flash_attn_module()
    if "torchvision" not in sys.modules or not hasattr(
        sys.modules["torchvision"], "ops"
    ):
        _torchvision_module()
    if "mmedit" not in sys.modules or not hasattr(
        sys.modules["mmedit"], "models"
    ):
        _mmedit_modules()
    if "mmcv" not in sys.modules or not hasattr(sys.modules["mmcv"], "ops"):
        _mmcv_modules()
    if "timm" not in sys.modules:
        _timm_module()
    if "guided_diffusion.dcn" not in sys.modules:
        _dcn_module()
    # scipy>=1.13 removed scipy.signal.gaussian (imresize_pseudoSR.py:6)
    import scipy.signal
    import scipy.signal.windows

    if not hasattr(scipy.signal, "gaussian"):
        scipy.signal.gaussian = scipy.signal.windows.gaussian
    root = reference_root()
    if root not in sys.path:
        sys.path.insert(0, root)
