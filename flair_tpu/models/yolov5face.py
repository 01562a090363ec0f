"""YOLOv5-face alternative detector
(re-design of facelib/detection/yolov5face/**).

The reference assembles the net from YAML (models/yolov5l.yaml via
yolo.py:95-235 parse_model); here the same yolov5l-face graph is written out
directly: StemBlock → C3/Conv backbone → SPP → PANet head → 3-scale Detect
with 16 outputs per anchor (xywh + obj + 10 landmarks + 1 class,
models/yolo.py:29-93). Box/landmark decoding and NMS run on host.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .registry import register_model

Array = jax.Array

ANCHORS = np.array(
    [
        [[4, 5], [8, 10], [13, 16]],       # P3/8
        [[23, 29], [43, 55], [73, 105]],   # P4/16
        [[146, 217], [231, 300], [335, 433]],  # P5/32
    ],
    np.float32,
)
STRIDES = (8, 16, 32)


def _silu(x):
    return x * jax.nn.sigmoid(x)


class YConv(nn.Module):
    """Conv+BN+SiLU (common.py:42-54)."""

    features: int
    kernel: int = 1
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(p, p), (p, p)], use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, param_dtype=jnp.float32,
                         name="bn")(x)
        return _silu(x)


class YBottleneck(nn.Module):
    features: int
    shortcut: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = YConv(self.features, 1, dtype=self.dtype, name="cv1")(x)
        h = YConv(self.features, 3, dtype=self.dtype, name="cv2")(h)
        return x + h if self.shortcut and x.shape[-1] == self.features else h


class C3(nn.Module):
    """CSP bottleneck ×3 (common.py:106-117)."""

    features: int
    n: int = 1
    shortcut: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_ = self.features // 2
        a = YConv(c_, 1, dtype=self.dtype, name="cv1")(x)
        for i in range(self.n):
            a = YBottleneck(c_, self.shortcut, self.dtype, name=f"m{i}")(a)
        b = YConv(c_, 1, dtype=self.dtype, name="cv2")(x)
        return YConv(self.features, 1, dtype=self.dtype, name="cv3")(
            jnp.concatenate([a, b], axis=-1)
        )


def _maxpool(x, k, stride=1):
    p = k // 2
    xp = jnp.pad(
        x, ((0, 0), (p, p), (p, p), (0, 0)), constant_values=-jnp.inf
    )
    return nn.max_pool(xp, (k, k), (stride, stride), padding="VALID")


class SPP(nn.Module):
    features: int
    ks: Sequence[int] = (3, 5, 7)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_ = x.shape[-1] // 2
        x = YConv(c_, 1, dtype=self.dtype, name="cv1")(x)
        pools = [x] + [_maxpool(x, k) for k in self.ks]
        return YConv(self.features, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate(pools, axis=-1)
        )


class StemBlock(nn.Module):
    """(common.py:57-72)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s1 = YConv(self.features, 3, 2, dtype=self.dtype, name="stem_1")(x)
        s2a = YConv(self.features // 2, 1, dtype=self.dtype, name="stem_2a")(s1)
        s2b = YConv(self.features, 3, 2, dtype=self.dtype, name="stem_2b")(s2a)
        # ceil-mode 2x2 maxpool
        h, w = s1.shape[1], s1.shape[2]
        ph, pw = h % 2, w % 2
        s1p = jnp.pad(
            s1, ((0, 0), (0, ph), (0, pw), (0, 0)), constant_values=-jnp.inf
        )
        s2p = nn.max_pool(s1p, (2, 2), (2, 2), padding="VALID")
        return YConv(self.features, 1, dtype=self.dtype, name="stem_3")(
            jnp.concatenate([s2b, s2p], axis=-1)
        )


@register_model("yolov5face")
class YOLOv5Face(nn.Module):
    """yolov5l-face graph (models/yolov5l.yaml). Input (B, H, W, 3) RGB in
    [0, 1], H, W % 32 == 0. Returns per-level raw maps
    [(B, Hi, Wi, na·16)], decoded on host by :func:`decode_predictions`."""

    width: int = 64  # base width; 64 → yolov5l-face
    depth: Sequence[int] = (3, 9, 9, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        wd = self.width
        d = self.depth
        x = StemBlock(wd, self.dtype, name="stem")(x)            # P2/4
        x = C3(wd * 2, d[0], dtype=self.dtype, name="c3_1")(x)
        x = YConv(wd * 4, 3, 2, dtype=self.dtype, name="down3")(x)   # P3/8
        p3 = C3(wd * 4, d[1], dtype=self.dtype, name="c3_3")(x)
        x = YConv(wd * 8, 3, 2, dtype=self.dtype, name="down4")(p3)  # P4/16
        p4 = C3(wd * 8, d[2], dtype=self.dtype, name="c3_5")(x)
        x = YConv(wd * 16, 3, 2, dtype=self.dtype, name="down5")(p4)  # P5/32
        x = SPP(wd * 16, (3, 5, 7), self.dtype, name="spp")(x)
        p5 = C3(wd * 16, d[3], False, self.dtype, name="c3_8")(x)

        # PANet head
        h9 = YConv(wd * 8, 1, dtype=self.dtype, name="h9")(p5)
        up = jnp.repeat(jnp.repeat(h9, 2, 1), 2, 2)
        x = C3(wd * 8, 3, False, self.dtype, name="h12")(
            jnp.concatenate([up, p4], axis=-1)
        )
        h13 = YConv(wd * 4, 1, dtype=self.dtype, name="h13")(x)
        up = jnp.repeat(jnp.repeat(h13, 2, 1), 2, 2)
        o16 = C3(wd * 4, 3, False, self.dtype, name="h16")(
            jnp.concatenate([up, p3], axis=-1)
        )
        x = YConv(wd * 4, 3, 2, dtype=self.dtype, name="h17")(o16)
        o19 = C3(wd * 8, 3, False, self.dtype, name="h19")(
            jnp.concatenate([x, h13], axis=-1)
        )
        x = YConv(wd * 8, 3, 2, dtype=self.dtype, name="h20")(o19)
        o22 = C3(wd * 16, 3, False, self.dtype, name="h22")(
            jnp.concatenate([x, h9], axis=-1)
        )

        outs = []
        for i, f in enumerate((o16, o19, o22)):
            outs.append(
                nn.Conv(3 * 16, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"detect{i}")(f)
            )
        return outs


def decode_predictions(
    outs, conf_thres: float = 0.5, iou_thres: float = 0.45
) -> np.ndarray:
    """Host decode + NMS (models/yolo.py:52-79, face_detector.py semantics).

    Returns (N, 16): x1,y1,x2,y2,conf + 10 landmark coords + class."""
    from .retinaface import nms

    dets = []
    for lvl, out in enumerate(outs):
        o = np.asarray(out[0], np.float32)
        ny, nx = o.shape[0], o.shape[1]
        o = o.reshape(ny, nx, 3, 16).transpose(2, 0, 1, 3)  # (na, ny, nx, 16)
        gy, gx = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
        grid = np.stack([gx, gy], -1)[None]  # (1, ny, nx, 2)
        stride = STRIDES[lvl]
        anchor = ANCHORS[lvl].reshape(3, 1, 1, 2)

        def sig(v):
            return 1.0 / (1.0 + np.exp(-v))

        xy = (sig(o[..., 0:2]) * 2.0 - 0.5 + grid) * stride
        wh = (sig(o[..., 2:4]) * 2.0) ** 2 * anchor
        obj = sig(o[..., 4:5])
        lm = o[..., 5:15].reshape(3, ny, nx, 5, 2) * anchor[:, :, :, None, :] + (
            grid[:, :, :, None, :] * stride
        )
        cls = sig(o[..., 15:16])
        conf = (obj * cls).reshape(-1)
        keep = conf > conf_thres
        if not keep.any():
            continue
        xy = xy.reshape(-1, 2)[keep]
        wh = wh.reshape(-1, 2)[keep]
        lm = lm.reshape(-1, 10)[keep]
        boxes = np.concatenate([xy - wh / 2, xy + wh / 2], axis=1)
        dets.append(
            np.concatenate([boxes, conf[keep, None], lm,
                            np.ones((keep.sum(), 1))], axis=1)
        )
    if not dets:
        return np.zeros((0, 16), np.float32)
    dets = np.concatenate(dets, axis=0)
    order = dets[:, 4].argsort()[::-1]
    dets = dets[order]
    keep = nms(dets[:, :5], iou_thres)
    return dets[keep]


# ---------------------------------------------------------------------------
# YAML-built model family (models/yolo.py:95-235 parse_model)
# ---------------------------------------------------------------------------


class ShuffleV2Block(nn.Module):
    """ShuffleNet-V2 unit (yolov5face common.py:120-175): channel split at
    stride 1 / dual downsampling branches at stride 2, channel shuffle."""

    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        bf = self.features // 2
        cin = x.shape[-1]

        def dw(h, s, name):
            c = h.shape[-1]
            h = nn.Conv(c, (3, 3), strides=(s, s), padding=[(1, 1), (1, 1)],
                        feature_group_count=c, use_bias=False,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"{name}_conv")(h)
            return nn.BatchNorm(use_running_average=True,
                                param_dtype=jnp.float32, name=f"{name}_bn")(h)

        def pw(h, c, act, name):
            h = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"{name}_conv")(h)
            h = nn.BatchNorm(use_running_average=True,
                             param_dtype=jnp.float32, name=f"{name}_bn")(h)
            return _silu(h) if act else h

        if self.stride > 1:
            b1 = dw(x, self.stride, "b1_dw")
            b1 = pw(b1, bf, True, "b1_pw")
            b2 = pw(x, bf, True, "b2_pw1")
        else:
            b1, b2 = x[..., :cin // 2], x[..., cin // 2:]
            b2 = pw(b2, bf, True, "b2_pw1")
        b2 = dw(b2, self.stride, "b2_dw")
        b2 = pw(b2, bf, True, "b2_pw2")
        out = jnp.concatenate([b1, b2], axis=-1)
        # channel shuffle (2 groups)
        b, hh, ww, c = out.shape
        return out.reshape(b, hh, ww, 2, c // 2).swapaxes(3, 4).reshape(
            b, hh, ww, c)


# bundled face-detector graph configs (verbatim numeric content of
# models/yolov5l.yaml and models/yolov5n.yaml — [from, number, module, args])
YOLOV5_FACE_ANCHORS = (
    (4, 5, 8, 10, 13, 16),
    (23, 29, 43, 55, 73, 105),
    (146, 217, 231, 300, 335, 433),
)

YOLOV5L_FACE_CFG = {
    "nc": 1, "depth_multiple": 1.0, "width_multiple": 1.0,
    "anchors": YOLOV5_FACE_ANCHORS,
    "backbone": [
        [-1, 1, "StemBlock", [64, 3, 2]],
        [-1, 3, "C3", [128]],
        [-1, 1, "Conv", [256, 3, 2]],
        [-1, 9, "C3", [256]],
        [-1, 1, "Conv", [512, 3, 2]],
        [-1, 9, "C3", [512]],
        [-1, 1, "Conv", [1024, 3, 2]],
        [-1, 1, "SPP", [1024, [3, 5, 7]]],
        [-1, 3, "C3", [1024, False]],
    ],
    "head": [
        [-1, 1, "Conv", [512, 1, 1]],
        [-1, 1, "nn.Upsample", [None, 2, "nearest"]],
        [[-1, 5], 1, "Concat", [1]],
        [-1, 3, "C3", [512, False]],
        [-1, 1, "Conv", [256, 1, 1]],
        [-1, 1, "nn.Upsample", [None, 2, "nearest"]],
        [[-1, 3], 1, "Concat", [1]],
        [-1, 3, "C3", [256, False]],
        [-1, 1, "Conv", [256, 3, 2]],
        [[-1, 13], 1, "Concat", [1]],
        [-1, 3, "C3", [512, False]],
        [-1, 1, "Conv", [512, 3, 2]],
        [[-1, 9], 1, "Concat", [1]],
        [-1, 3, "C3", [1024, False]],
        [[16, 19, 22], 1, "Detect", []],
    ],
}

YOLOV5N_FACE_CFG = {
    "nc": 1, "depth_multiple": 1.0, "width_multiple": 1.0,
    "anchors": YOLOV5_FACE_ANCHORS,
    "backbone": [
        [-1, 1, "StemBlock", [32, 3, 2]],
        [-1, 1, "ShuffleV2Block", [128, 2]],
        [-1, 3, "ShuffleV2Block", [128, 1]],
        [-1, 1, "ShuffleV2Block", [256, 2]],
        [-1, 7, "ShuffleV2Block", [256, 1]],
        [-1, 1, "ShuffleV2Block", [512, 2]],
        [-1, 3, "ShuffleV2Block", [512, 1]],
    ],
    "head": [
        [-1, 1, "Conv", [128, 1, 1]],
        [-1, 1, "nn.Upsample", [None, 2, "nearest"]],
        [[-1, 4], 1, "Concat", [1]],
        [-1, 1, "C3", [128, False]],
        [-1, 1, "Conv", [128, 1, 1]],
        [-1, 1, "nn.Upsample", [None, 2, "nearest"]],
        [[-1, 2], 1, "Concat", [1]],
        [-1, 1, "C3", [128, False]],
        [-1, 1, "Conv", [128, 3, 2]],
        [[-1, 11], 1, "Concat", [1]],
        [-1, 1, "C3", [128, False]],
        [-1, 1, "Conv", [128, 3, 2]],
        [[-1, 7], 1, "Concat", [1]],
        [-1, 1, "C3", [128, False]],
        [[14, 17, 20], 1, "Detect", []],
    ],
}


def load_yolo_yaml(path: str) -> dict:
    """Load a yolov5face model YAML (models/yolov5{l,n}.yaml) into the
    config-dict form used by :class:`YOLOv5FromConfig`."""
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f)
    # Detect's ['nc', 'anchors'] placeholders resolve to the cfg fields
    for rows in (raw["backbone"], raw["head"]):
        for r in rows:
            if str(r[2]) == "Detect":
                r[3] = []
    cfg = {
        "nc": raw.get("nc", 1),
        "depth_multiple": raw.get("depth_multiple", 1.0),
        "width_multiple": raw.get("width_multiple", 1.0),
        "anchors": tuple(tuple(a) for a in raw["anchors"]),
        "backbone": raw["backbone"],
        "head": raw["head"],
    }
    return cfg


class YOLOv5FromConfig(nn.Module):
    """Generic yolov5face graph interpreter (models/yolo.py:95-235
    parse_model): walks the [from, number, module, args] backbone+head lists,
    keeping every layer output for skip references. Returns the per-level
    raw detect maps [(B, Hi, Wi, na·no)] for :func:`decode_predictions`."""

    cfg: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        import math

        cfg = dict(self.cfg)
        gd, gw = cfg["depth_multiple"], cfg["width_multiple"]
        nc = cfg["nc"]
        na = len(cfg["anchors"][0]) // 2
        no = nc + 5 + 10  # box(4)+obj(1)+landms(10)+cls

        def cdepth(n):
            return max(round(n * gd), 1) if n > 1 else n

        def cwidth(c):
            if gw == 1.0:
                return c
            return int(math.ceil(c * gw / 8) * 8)

        ys = []  # per-layer outputs; -1 = previous (the image before layer 0)
        detect_from = None

        def get(f):
            if f == -1:
                return ys[-1] if ys else x
            return ys[f]

        layers = list(cfg["backbone"]) + list(cfg["head"])
        for li, (frm, num, mod, args) in enumerate(layers):
            mod = str(mod)
            num = cdepth(num)
            inp = get(frm) if isinstance(frm, int) else [get(f) for f in frm]
            name = f"l{li}_{mod.replace('.', '_').lower()}"
            if mod == "StemBlock":
                y = StemBlock(cwidth(args[0]), self.dtype, name=name)(inp)
            elif mod == "Conv":
                k = args[1] if len(args) > 1 else 1
                s = args[2] if len(args) > 2 else 1
                y = YConv(cwidth(args[0]), k, s, self.dtype, name=name)(inp)
            elif mod == "C3":
                shortcut = args[1] if len(args) > 1 else True
                y = C3(cwidth(args[0]), num, shortcut, self.dtype,
                       name=name)(inp)
            elif mod == "SPP":
                y = SPP(cwidth(args[0]), tuple(args[1]), self.dtype,
                        name=name)(inp)
            elif mod == "ShuffleV2Block":
                y = inp
                for ni in range(num):  # n repeats share args (parse_model)
                    y = ShuffleV2Block(cwidth(args[0]), args[1], self.dtype,
                                       name=f"{name}_{ni}")(y)
            elif mod == "nn.Upsample":
                y = jnp.repeat(jnp.repeat(inp, int(args[1]), 1), int(args[1]), 2)
            elif mod == "Concat":
                y = jnp.concatenate(inp, axis=-1)
            elif mod == "Detect":
                detect_from = inp
                y = inp[-1]
            else:
                raise ValueError(f"unknown module in config: {mod}")
            ys.append(y)

        assert detect_from is not None, "config has no Detect layer"
        outs = []
        for i, f in enumerate(detect_from):
            outs.append(
                nn.Conv(na * no, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"detect{i}")(f)
            )
        return outs
