"""Degradation-operator tests: pseudo-inverse identities + parity with the
reference torch implementations run directly from /root/reference
(SURVEY.md §4 layer 1: A·A⁺·A = A, null-space property, golden parity).
"""

import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

from flair_tpu.operators import PseudoSR, SRConv, get_pseudo_sr_conf
from flair_tpu.operators.factory import bicubic_kernel_1d, make_restore_fn


def _import_reference(modname):
    import importlib

    import scipy.signal
    import scipy.signal.windows

    if not hasattr(scipy.signal, "gaussian"):
        scipy.signal.gaussian = scipy.signal.windows.gaussian
    for name in (
        "torchvision",
        "torchvision.transforms",
        "torchvision.transforms.functional",
        "torchvision.ops",
        "mmcv",
        "mmcv.ops",
        "mmedit",
        "mmedit.models",
        "mmedit.models.backbones",
        "mmedit.models.backbones.sr_backbones",
        "mmedit.models.backbones.sr_backbones.basicvsr_net",
        "mmedit.models.common",
        "more_itertools",
    ):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            sys.modules[name] = mod
    sys.modules["torchvision.transforms.functional"].normalize = lambda *a, **k: None
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    return importlib.import_module(modname)


def small_srconv(img_dim=32, factor=4):
    return SRConv(bicubic_kernel_1d(factor), 3, img_dim, factor)


def test_srconv_pinv_identities():
    op = small_srconv()
    x = jnp.asarray(
        np.random.RandomState(0).randn(2, 32 * 32 * 3).astype(np.float32)
    )
    ax = op.A(x)
    # A A⁺ A = A
    np.testing.assert_allclose(
        np.asarray(op.A(op.A_pinv(ax))), np.asarray(ax), atol=1e-3
    )
    # A⁺ A A⁺ = A⁺
    pax = op.A_pinv(ax)
    np.testing.assert_allclose(
        np.asarray(op.A_pinv(op.A(pax))), np.asarray(pax), atol=1e-3
    )


def test_srconv_constant_image():
    op = small_srconv()
    x = jnp.ones((1, 32 * 32 * 3))
    y = op.A(x)
    assert y.shape == (1, 8 * 8 * 3)
    np.testing.assert_allclose(np.asarray(y), 1.0, atol=1e-3)


def test_srconv_matches_reference():
    try:
        ref_mod = _import_reference("guided_diffusion.restore_util")
    except Exception as e:
        pytest.skip(f"reference not importable: {e}")
    import torch

    img_dim, factor = 32, 4
    k = bicubic_kernel_1d(factor)
    ref = ref_mod.SRConv(
        torch.from_numpy(k).float(), 3, img_dim, "cpu", stride=factor
    )
    ours = small_srconv(img_dim, factor)

    rs = np.random.RandomState(1)
    x_nchw = rs.randn(2, 3, img_dim, img_dim).astype(np.float32)
    # reference flattens channel-major; ours channel-last
    x_ref = torch.from_numpy(x_nchw.reshape(2, -1))
    x_ours = jnp.asarray(
        x_nchw.transpose(0, 2, 3, 1).reshape(2, -1)
    )

    want_a = ref.A(x_ref).numpy().reshape(2, 3, 8, 8)
    got_a = np.asarray(ours.A(x_ours)).reshape(2, 8, 8, 3).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got_a, want_a, atol=2e-4)

    y_nchw = rs.randn(2, 3, 8, 8).astype(np.float32)
    want_p = ref.A_pinv(torch.from_numpy(y_nchw.reshape(2, -1))).numpy().reshape(
        2, 3, img_dim, img_dim
    )
    got_p = (
        np.asarray(ours.A_pinv(jnp.asarray(y_nchw.transpose(0, 2, 3, 1).reshape(2, -1))))
        .reshape(2, img_dim, img_dim, 3)
        .transpose(0, 3, 1, 2)
    )
    np.testing.assert_allclose(got_p, want_p, atol=2e-3)


def test_pseudo_sr_nullspace_property():
    """A(A⁺A x − A⁺ y) ≈ A x − y in the valid interior (pseudoSR.py:248-281)."""
    op = PseudoSR(get_pseudo_sr_conf(4))
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.rand(1, 64, 64, 3).astype(np.float32) * 2 - 1)
    y = op.A(jnp.asarray(rs.rand(1, 64, 64, 3).astype(np.float32) * 2 - 1))
    corr = op.A_pinv(y, x)
    lhs = np.asarray(op.A(x - (x - corr)))  # = A(corr)
    rhs = np.asarray(op.A(x) - y)
    m = 8  # trim invalid borders
    np.testing.assert_allclose(
        lhs[:, m:-m, m:-m], rhs[:, m:-m, m:-m], atol=0.05
    )


def test_pseudo_sr_matches_reference():
    try:
        ref_ps = _import_reference("guided_diffusion.pseudoSR")
    except Exception as e:
        pytest.skip(f"reference not importable: {e}")
    import torch

    conf = ref_ps.Get_pseudoSR_Conf(4)
    conf.sigmoid_range_limit = False
    conf.input_range = np.array(None)
    ref_op = ref_ps.pseudoSR(conf).WrapArchitecture_PyTorch()
    ours = PseudoSR(get_pseudo_sr_conf(4))

    rs = np.random.RandomState(5)
    hr = rs.rand(1, 3, 64, 64).astype(np.float32) * 2 - 1
    lr = rs.rand(1, 3, 16, 16).astype(np.float32) * 2 - 1

    with torch.no_grad():
        want = ref_op.A_pinv(
            torch.from_numpy(lr), torch.from_numpy(hr)
        ).numpy()
    got = np.asarray(
        ours.A_pinv(
            jnp.asarray(lr.transpose(0, 2, 3, 1)),
            jnp.asarray(hr.transpose(0, 2, 3, 1)),
        )
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=2e-3)

    with torch.no_grad():
        want_a = ref_op.A(torch.from_numpy(hr), scale_factor=0.25).numpy()
    got_a = np.asarray(
        ours.A(jnp.asarray(hr.transpose(0, 2, 3, 1)))
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got_a, want_a, atol=1e-4)


def test_make_restore_fn_shapes():
    op = small_srconv()
    rs = np.random.RandomState(7)
    d = jnp.asarray(rs.rand(2, 8, 8, 3).astype(np.float32))
    fn = make_restore_fn("x8_bicubic", op, d)
    x0 = jnp.asarray(rs.rand(2, 32, 32, 3).astype(np.float32))
    out = fn(x0)
    assert out.shape == x0.shape
    assert np.isfinite(np.asarray(out)).all()
