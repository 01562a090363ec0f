"""Face restoration helper: detect → align → crop → fuse → paste back.

Re-design of facelib/utils/face_restoration_helper.py:64-335 with the key
TPU-first change (SURVEY.md §7.1): the reference crosses GPU→CPU through
cv2.warpAffine at EVERY guided step; here the affine matrices are computed
once per window on host (detection + similarity transform) and the per-step
crop → CodeFormer → ParseNet mask → blur → inverse paste runs entirely on
device inside the jitted sampler (ops.warp_affine / ops.gaussian_blur).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.blur import gaussian_blur
from ..ops.warp import warp_affine

Array = jax.Array

# standard 5 landmarks for FFHQ 512² faces (face_restoration_helper.py:91-99)
FFHQ_TEMPLATE_512 = np.array(
    [
        [192.98138, 239.94708],
        [318.90277, 240.1936],
        [256.63416, 314.01935],
        [201.26117, 371.41043],
        [313.08905, 371.15118],
    ],
    dtype=np.float64,
)

# 19-class parsing → paste mask (face_restoration_helper.py:281-302):
# classes 1-13 belong to the face region; 0 and 14-18 (background, hair/ears/
# neck/cloth) are excluded.
MASK_COLORMAP = np.array(
    [0] + [1] * 13 + [0] * 5, dtype=np.float32
)

_GRAY_BORDER = np.array([135.0, 133.0, 132.0], np.float32) / 255.0 * 2.0 - 1.0


def estimate_similarity_transform(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Least-squares similarity (rotation+scale+translation) transform, the
    deterministic core of cv2.estimateAffinePartial2D(method=LMEDS) for the
    5-point face alignment (face_restoration_helper.py:198-200). With 5
    correspondences and no outliers LMEDS reduces to this LSQ solution."""
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    n = src.shape[0]
    a = np.zeros((2 * n, 4))
    b = np.zeros(2 * n)
    a[0::2, 0] = src[:, 0]
    a[0::2, 1] = -src[:, 1]
    a[0::2, 2] = 1
    a[1::2, 0] = src[:, 1]
    a[1::2, 1] = src[:, 0]
    a[1::2, 3] = 1
    b[0::2] = dst[:, 0]
    b[1::2] = dst[:, 1]
    sol, *_ = np.linalg.lstsq(a, b, rcond=None)
    cos_s, sin_s, tx, ty = sol
    return np.array([[cos_s, -sin_s, tx], [sin_s, cos_s, ty]], np.float64)


def get_largest_face(boxes: np.ndarray, h: int, w: int) -> int:
    """Index of the largest detected face (face_restoration_helper.py:31-43)."""
    def area(b):
        left, top = max(b[0], 0), max(b[1], 0)
        right, bottom = min(b[2], w), min(b[3], h)
        return (right - left) * (bottom - top)

    return int(np.argmax([area(b) for b in boxes]))


class FaceRestoreHelper:
    """Host-side geometry + device-side fusion.

    ``detector``: object with detect_faces(image_bgr) → (N, 15) dets
    (flair_tpu.models.retinaface.RetinaFaceDetector), or None to skip
    detection (supply matrices directly).
    """

    def __init__(
        self,
        detector=None,
        face_size: int = 512,
        template: np.ndarray = FFHQ_TEMPLATE_512,
    ):
        self.detector = detector
        self.face_size = face_size
        self.template = template * (face_size / 512.0)

    def get_affine_matrices(
        self,
        frames01: np.ndarray,
        only_keep_largest: bool = True,
        eye_dist_threshold: float = 0.1,
    ) -> list[Optional[np.ndarray]]:
        """Per-frame affine matrix mapping the frame onto the 512² template
        (face_restoration_helper.py:150-211). frames01: (T, H, W, 3) RGB in
        [0, 1]. Frames with no detected face get None."""
        mats: list[Optional[np.ndarray]] = []
        for img in frames01:
            bgr = (img[..., ::-1] * 255.0).astype(np.float32)
            dets = self.detector.detect_faces(bgr) if self.detector else np.zeros((0, 15))
            landmarks, boxes = [], []
            for det in dets:
                eye_dist = np.linalg.norm([det[5] - det[7], det[6] - det[8]])
                if eye_dist_threshold is not None and eye_dist < eye_dist_threshold:
                    continue
                landmarks.append(det[5:15].reshape(5, 2))
                boxes.append(det[:5])
            if not boxes:
                mats.append(None)
                continue
            idx = (
                get_largest_face(np.asarray(boxes), img.shape[0], img.shape[1])
                if only_keep_largest
                else 0
            )
            mats.append(
                estimate_similarity_transform(landmarks[idx], self.template)
            )
        return mats


def make_face_fn(
    matrices: np.ndarray,
    codeformer_apply: Callable[[Array], Array],
    parsenet_apply: Optional[Callable[[Array], Array]] = None,
    *,
    face_size: int = 512,
    fidelity_w: float = 1.0,
    aligned: bool = False,
) -> Callable[[Array, Array], Array]:
    """Build the device-side face fusion closure for the guided sampler.

    ``matrices``: (T, 2, 3) per-frame affine matrices (host-computed).
    ``codeformer_apply(face)``: (N,512,512,3)→restored faces ([-1,1] NHWC)
    — typically CodeFormer.apply with w=1.0, adain=True
    (scripts/video_sample.py:450-452).
    ``parsenet_apply(face)``: (N,512,512,3) → (N,512,512,19) mask logits.

    Returns face_fn(x0 (B,T,H,W,3), x_t) → fused image, matching the
    reference fusion (gaussian_diffusion.py:471-494):
    fused = (1−mask)·x0 + mask·inv_face.
    """
    mats = jnp.asarray(matrices, jnp.float32)
    fn_p = make_face_fn_p(
        codeformer_apply, parsenet_apply,
        face_size=face_size, fidelity_w=fidelity_w, aligned=aligned,
    )

    def face_fn(x0: Array, x_t: Array) -> Array:
        return fn_p(x0, x_t, mats)

    return face_fn


def make_face_fn_p(
    codeformer_apply: Callable[[Array], Array],
    parsenet_apply: Optional[Callable[[Array], Array]] = None,
    *,
    face_size: int = 512,
    fidelity_w: float = 1.0,
    aligned: bool = False,
) -> Callable[[Array, Array, Array], Array]:
    """Parameterised :func:`make_face_fn`: the per-window affine matrices
    enter per CALL — ``face_fn(x0, x_t, mats)`` with mats (T, 2, 3), or
    (B, T, 2, 3) / (B·T, 2, 3) for batched multi-clip serving (per-clip
    matrices; a (T, 2, 3) input is tiled across the batch).

    Needed by the two-program (steps) sampler: matrices baked into the
    closure would retrace (and recompile) the guidance-update program on
    every window; as a runtime argument one compiled program serves all
    windows of a clip.
    """
    border = jnp.asarray(_GRAY_BORDER)

    def face_fn(x0: Array, x_t: Array, mats: Array) -> Array:
        b, t, h, w, c = x0.shape
        frames = x0.reshape(b * t, h, w, c)
        if aligned:
            restored = codeformer_apply(frames)
            return restored.reshape(b, t, h, w, c)

        m = mats.reshape(-1, 2, 3)
        if m.shape[0] != b * t:
            m = jnp.tile(m, (b, 1, 1))
        # crop with gray constant border (face_restoration_helper.py:203-209)
        crop = warp_affine(
            frames - border, m, (face_size, face_size), mode="bicubic"
        ) + border
        crop = jnp.clip(crop, -1, 1)

        restored = codeformer_apply(crop)

        if parsenet_apply is not None:
            # the reference parses the raw CodeFormer output
            # (face_restoration_helper.py:265) ...
            logits = parsenet_apply(restored)
            classes = jnp.argmax(logits, axis=-1)
            mask = jnp.take(
                jnp.asarray(MASK_COLORMAP), classes, axis=0
            )[..., None]
        else:
            mask = jnp.ones_like(restored[..., :1])
        # double 101/26 gaussian blur + 10px border zeroing
        # (face_restoration_helper.py:303-313)
        mask = gaussian_blur(gaussian_blur(mask, 101, 26.0), 101, 26.0)
        thres = 10
        zm = jnp.zeros_like(mask)
        mask = zm.at[:, thres:-thres, thres:-thres].set(
            mask[:, thres:-thres, thres:-thres]
        )

        # inverse paste (face_restoration_helper.py:314-335):
        # cv2.warpAffine(face, invertAffineTransform(M)) — the inverse matrix
        # is the src→dst map of the paste warp. ParseNet sees the RAW
        # CodeFormer output (:265), but the warp input is the CLAMPED face
        # (the 0..1 normalize at :267-271 clips), and the warped result is
        # clamped again (:326-333 — cubic overshoot clipped to [-1,1]).
        # Face and mask share the same inverse matrices and output grid, so
        # both paste warps ride ONE C=4 warp (per-channel independent ≡ two
        # warps; halves the gather/coordinate work).
        pasted = warp_affine(
            jnp.concatenate([jnp.clip(restored, -1, 1), mask], axis=-1),
            _invert_batch(m), (h, w), mode="bicubic",
        )
        inv_face = jnp.clip(pasted[..., :3], -1, 1)
        inv_mask = pasted[..., 3:]

        fused = frames * (1.0 - inv_mask) + inv_face * inv_mask
        return fused.reshape(b, t, h, w, c)

    return face_fn


def _invert_batch(m: Array) -> Array:
    """Invert (N, 2, 3) affines on device."""
    a, b_, c = m[:, 0, 0], m[:, 0, 1], m[:, 0, 2]
    d, e, f = m[:, 1, 0], m[:, 1, 1], m[:, 1, 2]
    det = a * e - b_ * d
    ia, ib = e / det, -b_ / det
    id_, ie = -d / det, a / det
    ic = -(ia * c + ib * f)
    if_ = -(id_ * c + ie * f)
    row0 = jnp.stack([ia, ib, ic], axis=-1)
    row1 = jnp.stack([id_, ie, if_], axis=-1)
    return jnp.stack([row0, row1], axis=1)
