"""Face-stack tests: CodeFormer, ParseNet, RetinaFace, BiSeNet (tiny configs),
plus the alignment math vs cv2 and the device fusion closure."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def rand01(*shape, seed=0):
    return jnp.asarray(
        np.random.RandomState(seed).rand(*shape).astype(np.float32)
    )


def test_codeformer_tiny_forward():
    from flair_tpu.models.codeformer import CodeFormer

    model = CodeFormer(
        dim_embd=64, n_head=4, n_layers=2, codebook_size=32,
        latent_size=256, connect_list=("32",), nf=32, ch_mult=(1, 2),
    )
    x = rand01(1, 32, 32, 3, seed=1) * 2 - 1
    # resolution is derived from input: 32 → two levels → latent 16×16
    params = model.init(jax.random.PRNGKey(0), x, w=0.5, adain=True)
    out, logits, lq = model.apply(params, x, w=0.5, adain=True)
    assert out.shape == (1, 32, 32, 3)
    assert logits.shape == (1, 256, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_vqautoencoder_roundtrip_shapes():
    from flair_tpu.models.codeformer import VQAutoEncoder

    model = VQAutoEncoder(nf=32, ch_mult=(1, 2), codebook_size=32, emb_dim=32)
    x = rand01(1, 16, 16, 3, seed=2)
    params = model.init(jax.random.PRNGKey(0), x)
    out, loss, stats = model.apply(params, x)
    assert out.shape == x.shape
    assert np.isfinite(float(loss))


def test_adain_matches_reference_semantics():
    from flair_tpu.models.codeformer import adaptive_instance_normalization

    rs = np.random.RandomState(3)
    content = jnp.asarray(rs.randn(2, 8, 8, 4).astype(np.float32))
    style = jnp.asarray(rs.randn(2, 8, 8, 4).astype(np.float32) * 2 + 1)
    out = np.asarray(adaptive_instance_normalization(content, style))
    # output stats must match style stats per channel
    np.testing.assert_allclose(
        out.mean(axis=(1, 2)), np.asarray(style).mean(axis=(1, 2)), atol=1e-3
    )
    np.testing.assert_allclose(
        out.std(axis=(1, 2)), np.asarray(style).std(axis=(1, 2)), atol=1e-2
    )


def test_parsenet_shapes():
    from flair_tpu.models.parsenet import ParseNet

    model = ParseNet(in_size=32, out_size=32, base_ch=32, res_depth=2)
    x = rand01(1, 32, 32, 3, seed=4) * 2 - 1
    variables = model.init(jax.random.PRNGKey(0), x)
    mask, img = model.apply(variables, x)
    assert mask.shape == (1, 32, 32, 19)
    assert img.shape == (1, 32, 32, 3)


def test_retinaface_mobile_shapes_and_detector():
    from flair_tpu.models.retinaface import (
        CFG_MOBILENET,
        RetinaFace,
        RetinaFaceDetector,
        prior_boxes,
    )

    model = RetinaFace(network="mobile0.25")
    x = rand01(1, 64, 64, 3, seed=5) * 255
    variables = model.init(jax.random.PRNGKey(0), x)
    loc, conf, landms = model.apply(variables, x)
    n_priors = prior_boxes(CFG_MOBILENET, (64, 64)).shape[0]
    assert loc.shape == (1, n_priors, 4)
    assert conf.shape == (1, n_priors, 2)
    assert landms.shape == (1, n_priors, 10)
    # conf rows are softmaxed
    np.testing.assert_allclose(np.asarray(conf.sum(-1)), 1.0, atol=1e-4)

    det = RetinaFaceDetector(model, variables, "mobile0.25")
    out = det.detect_faces(np.random.RandomState(6).rand(64, 64, 3) * 255)
    assert out.ndim == 2 and out.shape[1] == 15


def test_bisenet_shapes():
    from flair_tpu.models.bisenet import BiSeNet

    model = BiSeNet(num_class=19)
    x = rand01(1, 64, 64, 3, seed=7)
    variables = model.init(jax.random.PRNGKey(0), x)
    out, out16, out32 = model.apply(variables, x)
    assert out.shape == (1, 64, 64, 19)
    assert out16.shape == out.shape and out32.shape == out.shape


def test_similarity_transform_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    from flair_tpu.face.helper import estimate_similarity_transform

    rs = np.random.RandomState(8)
    src = rs.rand(5, 2).astype(np.float64) * 100
    # random similarity + small noise
    th = 0.3
    s = 1.7
    m = np.array(
        [[s * np.cos(th), -s * np.sin(th), 12.0],
         [s * np.sin(th), s * np.cos(th), -5.0]]
    )
    dst = src @ m[:, :2].T + m[:, 2] + rs.randn(5, 2) * 0.01
    want = cv2.estimateAffinePartial2D(
        src.astype(np.float32), dst.astype(np.float32), method=cv2.LMEDS
    )[0]
    got = estimate_similarity_transform(src, dst)
    np.testing.assert_allclose(got, want, atol=1e-2)


def test_make_face_fn_identity_blend():
    """With an identity 'CodeFormer' and full mask, fusion must reproduce the
    input away from borders (crop→paste round trip)."""
    from flair_tpu.face.helper import make_face_fn

    t, s = 2, 32
    mats = np.tile(np.array([[1.0, 0, 0], [0, 1.0, 0]], np.float32), (t, 1, 1))
    face_fn = make_face_fn(
        mats, codeformer_apply=lambda f: f, parsenet_apply=None, face_size=s
    )
    x0 = rand01(1, t, s, s, 3, seed=9) * 2 - 1
    fused = face_fn(x0, x0)
    assert fused.shape == x0.shape
    # borders are zeroed in the mask; interior blends toward identity
    inner = np.asarray(fused[0, :, 14:18, 14:18] - x0[0, :, 14:18, 14:18])
    assert np.abs(inner).max() < 0.3


def test_facelib_misc_utils_parity():
    """Host-side facelib utils (facelib/utils/misc.py): img/tensor round
    trip, grayscale heuristics, and numpy AdaIN vs the reference formulas."""
    import numpy as np

    from flair_tpu.face import misc

    rs = np.random.RandomState(0)
    img = (rs.rand(16, 16, 3) * 255).astype(np.uint8)
    t = misc.img2tensor(img, bgr2rgb=True, float32=True)
    assert t.shape == (3, 16, 16) and t.dtype == np.float32
    back = misc.tensor2img(t / 255.0, rgb2bgr=True)
    np.testing.assert_array_equal(back, img)

    gray = np.stack([img[..., 0]] * 3, -1)
    assert misc.is_gray(gray) and not misc.is_gray(img, threshold=1)
    g1 = misc.rgb2gray(img.astype(np.float32))
    assert g1.shape == (16, 16, 3)

    content = rs.rand(2, 4, 8, 8).astype(np.float32)
    style = rs.rand(2, 4, 8, 8).astype(np.float32) * 3 + 1
    out = misc.adain_npy(content, style)
    sm, ss = misc.calc_mean_std(style)
    om, os_ = misc.calc_mean_std(out)
    np.testing.assert_allclose(om, sm, atol=1e-4)
    np.testing.assert_allclose(os_, ss, atol=1e-3)

    # scandir finds this test file (absolute path: session runs in a tmpdir)
    import os

    tests_dir = os.path.dirname(os.path.abspath(__file__))
    files = list(misc.scandir(tests_dir, suffix=".py"))
    assert any("test_face_models.py" in f for f in files)
