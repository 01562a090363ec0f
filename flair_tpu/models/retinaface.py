"""RetinaFace face detector (re-design of facelib/detection/retinaface/*).

ResNet50 (or MobileNet-0.25) backbone → FPN → SSH context heads →
class/bbox/landmark 1×1 heads over 3 pyramid levels with 2 anchors each
(retinaface.py:78-157, retinaface_net.py:37-196). Priors, box/landmark
decoding and NMS are host-side numpy (retinaface_utils.py:8-119,214-379) —
variable face counts stay off-device so the network itself jits with static
shapes (SURVEY.md §7.3 item 3).
"""

from __future__ import annotations

import math
from itertools import product
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .registry import register_model
from .resnet import ConvBN, ResNet, resnet50

Array = jax.Array

CFG_RESNET50 = {
    "min_sizes": [[16, 32], [64, 128], [256, 512]],
    "steps": [8, 16, 32],
    "variance": [0.1, 0.2],
    "clip": False,
    "in_channel": 256,
    "out_channel": 256,
}
CFG_MOBILENET = {
    "min_sizes": [[16, 32], [64, 128], [256, 512]],
    "steps": [8, 16, 32],
    "variance": [0.1, 0.2],
    "clip": False,
    "in_channel": 32,
    "out_channel": 64,
}


def _leaky(x, slope):
    return jnp.where(x >= 0, x, slope * x)


class ConvBNLeaky(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    leaky: float = 0.0
    relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = ConvBN(self.features, self.kernel, self.stride, self.dtype,
                   name="cb")(x)
        return _leaky(h, self.leaky) if self.relu else h


class SSH(nn.Module):
    """Context module: parallel 3/5/7 receptive-field branches
    (retinaface_net.py:37-64)."""

    out_channel: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        oc = self.out_channel
        leaky = 0.1 if oc <= 64 else 0.0
        c3 = ConvBNLeaky(oc // 2, 3, relu=False, dtype=self.dtype,
                         name="conv3X3")(x)
        c5_1 = ConvBNLeaky(oc // 4, 3, leaky=leaky, dtype=self.dtype,
                           name="conv5X5_1")(x)
        c5 = ConvBNLeaky(oc // 4, 3, relu=False, dtype=self.dtype,
                         name="conv5X5_2")(c5_1)
        c7_2 = ConvBNLeaky(oc // 4, 3, leaky=leaky, dtype=self.dtype,
                           name="conv7X7_2")(c5_1)
        c7 = ConvBNLeaky(oc // 4, 3, relu=False, dtype=self.dtype,
                         name="conv7x7_3")(c7_2)
        return jax.nn.relu(jnp.concatenate([c3, c5, c7], axis=-1))


class FPN(nn.Module):
    """3-level top-down FPN (retinaface_net.py:67-99)."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        oc = self.out_channels
        leaky = 0.1 if oc <= 64 else 0.0
        o1 = ConvBNLeaky(oc, 1, leaky=leaky, dtype=self.dtype, name="output1")(feats[0])
        o2 = ConvBNLeaky(oc, 1, leaky=leaky, dtype=self.dtype, name="output2")(feats[1])
        o3 = ConvBNLeaky(oc, 1, leaky=leaky, dtype=self.dtype, name="output3")(feats[2])

        def up_to(src, dst):
            # nearest resize to dst's spatial size
            ry = dst.shape[1] // src.shape[1]
            rx = dst.shape[2] // src.shape[2]
            up = jnp.repeat(jnp.repeat(src, ry, axis=1), rx, axis=2)
            return up[:, : dst.shape[1], : dst.shape[2]]

        o2 = o2 + up_to(o3, o2)
        o2 = ConvBNLeaky(oc, 3, leaky=leaky, dtype=self.dtype, name="merge2")(o2)
        o1 = o1 + up_to(o2, o1)
        o1 = ConvBNLeaky(oc, 3, leaky=leaky, dtype=self.dtype, name="merge1")(o1)
        return [o1, o2, o3]


class MobileNetV1(nn.Module):
    """MobileNet-0.25 backbone (retinaface_net.py:102-137). Returns the three
    stage features."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        def conv_bn(h, oc, stride, leaky, name):
            return ConvBNLeaky(oc, 3, stride, leaky, dtype=self.dtype,
                               name=name)(h)

        def conv_dw(h, oc, stride, name):
            cin = h.shape[-1]
            h = nn.Conv(cin, (3, 3), strides=(stride, stride),
                        padding=[(1, 1), (1, 1)], feature_group_count=cin,
                        use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"{name}_dw")(h)
            h = nn.BatchNorm(use_running_average=True,
                             param_dtype=jnp.float32, name=f"{name}_dwbn")(h)
            h = _leaky(h, 0.1)
            h = nn.Conv(oc, (1, 1), use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"{name}_pw")(h)
            h = nn.BatchNorm(use_running_average=True,
                             param_dtype=jnp.float32, name=f"{name}_pwbn")(h)
            return _leaky(h, 0.1)

        h = conv_bn(x, 8, 2, 0.1, "s1_0")
        h = conv_dw(h, 16, 1, "s1_1")
        h = conv_dw(h, 32, 2, "s1_2")
        h = conv_dw(h, 32, 1, "s1_3")
        h = conv_dw(h, 64, 2, "s1_4")
        h = conv_dw(h, 64, 1, "s1_5")
        f1 = h
        h = conv_dw(h, 128, 2, "s2_0")
        for i in range(1, 6):
            h = conv_dw(h, 128, 1, f"s2_{i}")
        f2 = h
        h = conv_dw(h, 256, 2, "s3_0")
        h = conv_dw(h, 256, 1, "s3_1")
        return [f1, f2, h]


@register_model("retinaface")
class RetinaFace(nn.Module):
    """Detector network (retinaface.py:78-157). Input: (B, H, W, 3) BGR with
    means [104, 117, 123] already subtracted. Returns
    (loc (B, N, 4), conf (B, N, 2) softmaxed, landms (B, N, 10))."""

    network: str = "resnet50"  # 'resnet50' | 'mobile0.25'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = CFG_RESNET50 if self.network == "resnet50" else CFG_MOBILENET
        if self.network == "resnet50":
            feats = resnet50(self.dtype).copy(name="body")(x)[1:]  # C3,C4,C5
        else:
            feats = MobileNetV1(self.dtype, name="body")(x)
        fpn = FPN(cfg["out_channel"], self.dtype, name="fpn")(feats)
        f1 = SSH(cfg["out_channel"], self.dtype, name="ssh1")(fpn[0])
        f2 = SSH(cfg["out_channel"], self.dtype, name="ssh2")(fpn[1])
        f3 = SSH(cfg["out_channel"], self.dtype, name="ssh3")(fpn[2])

        locs, confs, landms = [], [], []
        for i, f in enumerate((f1, f2, f3)):
            b, hh, ww, _ = f.shape
            loc = nn.Conv(2 * 4, (1, 1), dtype=self.dtype,
                          param_dtype=jnp.float32, name=f"bbox_head{i}")(f)
            cls = nn.Conv(2 * 2, (1, 1), dtype=self.dtype,
                          param_dtype=jnp.float32, name=f"class_head{i}")(f)
            ldm = nn.Conv(2 * 10, (1, 1), dtype=self.dtype,
                          param_dtype=jnp.float32, name=f"landmark_head{i}")(f)
            locs.append(loc.reshape(b, -1, 4))
            confs.append(cls.reshape(b, -1, 2))
            landms.append(ldm.reshape(b, -1, 10))
        loc = jnp.concatenate(locs, axis=1)
        conf = jax.nn.softmax(jnp.concatenate(confs, axis=1), axis=-1)
        landms = jnp.concatenate(landms, axis=1)
        return loc, conf, landms


# ---------------------------------------------------------------------------
# Host-side priors / decode / NMS (retinaface_utils.py)
# ---------------------------------------------------------------------------


def prior_boxes(cfg, image_size) -> np.ndarray:
    """Anchor centres/sizes in normalised coords (retinaface_utils.py:8-40)."""
    h, w = image_size
    anchors = []
    for k, step in enumerate(cfg["steps"]):
        fh = int(math.ceil(h / step))
        fw = int(math.ceil(w / step))
        for i, j in product(range(fh), range(fw)):
            for min_size in cfg["min_sizes"][k]:
                s_kx = min_size / w
                s_ky = min_size / h
                cx = (j + 0.5) * step / w
                cy = (i + 0.5) * step / h
                anchors.append([cx, cy, s_kx, s_ky])
    out = np.asarray(anchors, np.float32).reshape(-1, 4)
    if cfg["clip"]:
        out = np.clip(out, 0, 1)
    return out


def decode_boxes(loc: np.ndarray, priors: np.ndarray, variances) -> np.ndarray:
    """SSD box decoding → (x1, y1, x2, y2) (retinaface_utils.py:214-239)."""
    boxes = np.concatenate(
        [
            priors[:, :2] + loc[:, :2] * variances[0] * priors[:, 2:],
            priors[:, 2:] * np.exp(loc[:, 2:] * variances[1]),
        ],
        axis=1,
    )
    boxes[:, :2] -= boxes[:, 2:] / 2
    boxes[:, 2:] += boxes[:, :2]
    return boxes


def decode_landms(pre: np.ndarray, priors: np.ndarray, variances) -> np.ndarray:
    """5-landmark decoding (retinaface_utils.py:265-296)."""
    out = [
        priors[:, :2] + pre[:, 2 * i : 2 * i + 2] * variances[0] * priors[:, 2:]
        for i in range(5)
    ]
    return np.concatenate(out, axis=1)


def nms(dets: np.ndarray, thresh: float) -> list[int]:
    """Greedy IoU NMS (retinaface_utils.py:349-379 py_cpu_nms)."""
    x1, y1, x2, y2, scores = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3], dets[:, 4]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        ovr = w * h / (areas[i] + areas[order[1:]] - w * h)
        order = order[np.where(ovr <= thresh)[0] + 1]
    return keep


class RetinaFaceDetector:
    """Host driver: normalise → jitted network → decode/NMS on host
    (retinaface.py:194-266 detect_faces semantics, resize=1)."""

    def __init__(self, model: RetinaFace, params, network: str = "resnet50"):
        self.model = model
        self.params = params
        self.cfg = CFG_RESNET50 if network == "resnet50" else CFG_MOBILENET
        self._fwd = jax.jit(lambda p, x: model.apply(p, x))

    def detect_faces(
        self,
        image_bgr: np.ndarray,
        conf_threshold: float = 0.8,
        nms_threshold: float = 0.4,
    ) -> np.ndarray:
        """image_bgr: (H, W, 3) float BGR in [0, 255]. Returns
        (N, 15): x1,y1,x2,y2,score + 5 landmark (x,y) pairs."""
        h, w = image_bgr.shape[:2]
        x = image_bgr.astype(np.float32) - np.array([104.0, 117.0, 123.0])
        loc, conf, landms = self._fwd(self.params, jnp.asarray(x[None]))
        loc = np.asarray(loc[0], np.float32)
        scores = np.asarray(conf[0, :, 1], np.float32)
        landms = np.asarray(landms[0], np.float32)

        priors = prior_boxes(self.cfg, (h, w))
        boxes = decode_boxes(loc, priors, self.cfg["variance"]) * np.array(
            [w, h, w, h], np.float32
        )
        lm = decode_landms(landms, priors, self.cfg["variance"]) * np.array(
            [w, h] * 5, np.float32
        )

        inds = scores > conf_threshold
        boxes, lm, scores = boxes[inds], lm[inds], scores[inds]
        order = scores.argsort()[::-1]
        boxes, lm, scores = boxes[order], lm[order], scores[order]
        dets = np.hstack([boxes, scores[:, None]]).astype(np.float32)
        keep = nms(dets, nms_threshold)
        return np.concatenate([dets[keep], lm[keep]], axis=1)
