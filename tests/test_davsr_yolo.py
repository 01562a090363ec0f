"""DAVSR unfolding net, YOLOv5-face, and alignment math tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_davsr_data_prox_identity_when_alpha_large():
    """As α → ∞, the prox returns its input (FX → FR/α → fft(x))."""
    from flair_tpu.models.davsr import data_prox_3d, ps2ot, upsample3d

    rs = np.random.RandomState(0)
    b, t, h, w, c = 1, 2, 8, 8, 3
    sf = (2, 2, 2)
    x_lr = jnp.asarray(rs.rand(b, t, h, w, c), jnp.float32)
    x = jnp.asarray(rs.rand(b, t * 2, h * 2, w * 2, c), jnp.float32)
    psf = np.ones((2, 3, 3)) / 18.0
    FBn = ps2ot(psf, (t * 2, h * 2, w * 2))
    FB = jnp.asarray(FBn, jnp.complex64)
    FBC = jnp.conj(FB)
    F2B = jnp.asarray(np.abs(FBn) ** 2, jnp.complex64)
    STy = upsample3d(x_lr, sf)
    FBFy = FBC * jnp.fft.fftn(
        jnp.moveaxis(STy, -1, 1).astype(jnp.complex64), axes=(2, 3, 4)
    )
    alpha = jnp.asarray(1e8, jnp.complex64).reshape(1, 1, 1, 1, 1)
    out = data_prox_3d(x, FB, FBC, F2B, FBFy, alpha, sf)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-3)


@pytest.mark.slow
def test_davsr_forward_tiny():
    from flair_tpu.models.davsr import DAVSRNet

    model = DAVSRNet(
        n_iter=1, h_nc=8, mid_channels=32, num_blocks=1, sf=(2, 2, 2),
        deform_groups=2,
    )
    x = jnp.asarray(np.random.RandomState(1).rand(1, 2, 32, 32, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (1, 4, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_yolov5face_forward_and_decode():
    from flair_tpu.models.yolov5face import YOLOv5Face, decode_predictions

    model = YOLOv5Face(width=8, depth=(1, 1, 1, 1))
    x = jnp.asarray(np.random.RandomState(2).rand(1, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(params, x)
    assert len(outs) == 3
    assert outs[0].shape == (1, 8, 8, 48)
    dets = decode_predictions(outs, conf_thres=0.0)
    assert dets.ndim == 2 and dets.shape[1] == 16


def test_cp2tform_matches_reference():
    # load the reference module directly by path (its package __init__ pulls
    # in torchvision, which is absent)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_cp2tform",
        "/root/reference/guided_diffusion/facelib/detection/matlab_cp2tform.py",
    )
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except Exception as e:
        pytest.skip(f"reference not importable: {e}")
    get_similarity_transform_for_cv2 = mod.get_similarity_transform_for_cv2
    from flair_tpu.face.align import cp2tform

    rs = np.random.RandomState(3)
    src = rs.rand(5, 2) * 100
    th, s = 0.4, 1.3
    m = np.array([[s * np.cos(th), -s * np.sin(th)], [s * np.sin(th), s * np.cos(th)]])
    dst = src @ m.T + [10, -4] + rs.randn(5, 2) * 0.1
    want = get_similarity_transform_for_cv2(src.copy(), dst.copy())
    got = cp2tform(src, dst)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_reference_facial_points():
    from flair_tpu.face.align import get_reference_facial_points

    pts = get_reference_facial_points(default_square=True)
    assert pts.shape == (5, 2)
    # square template spans 112×112
    assert pts.max() < 112 and pts.min() > 0


def test_yolov5_yaml_model_family():
    """YAML-built yolov5face family (models/yolo.py:95-235 parse_model):
    the bundled configs equal the reference YAML files, and the graph
    interpreter builds + forwards the yolov5n-face config."""
    import jax
    import jax.numpy as jnp

    from flair_tpu.models.yolov5face import (
        YOLOV5L_FACE_CFG, YOLOV5N_FACE_CFG, YOLOv5FromConfig, load_yolo_yaml,
    )

    from ref_shim import reference_root

    base = (reference_root()
            + "/guided_diffusion/facelib/detection/yolov5face/models")
    for bundled, fname in ((YOLOV5L_FACE_CFG, "yolov5l.yaml"),
                           (YOLOV5N_FACE_CFG, "yolov5n.yaml")):
        try:
            ref = load_yolo_yaml(f"{base}/{fname}")
        except (FileNotFoundError, ImportError):
            continue  # reference yaml or pyyaml unavailable
        assert ref["anchors"] == bundled["anchors"]
        def norm(rows):
            # YAML reads the torch arg 'None' as the string 'None'
            fix = lambda a: None if a == "None" else a
            return [
                [list(r[0]) if isinstance(r[0], list) else r[0], r[1],
                 str(r[2]), [fix(a) for a in r[3]]] for r in rows
            ]
        assert norm(ref["backbone"]) == norm(bundled["backbone"]), fname
        assert norm(ref["head"]) == norm(bundled["head"]), fname

    model = YOLOv5FromConfig(YOLOV5N_FACE_CFG)
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(params, x)
    assert [o.shape for o in outs] == [
        (1, 8, 8, 48), (1, 4, 4, 48), (1, 2, 2, 48)
    ]
