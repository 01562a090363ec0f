"""MATLAB imresize parity vs the reference resizer.py (runs from
/root/reference with torch CPU)."""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

from flair_tpu.ops.matlab_resize import matlab_resize


def _ref_resizer():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from guided_diffusion.resizer import Resizer

    return Resizer


@pytest.mark.parametrize("kernel", ["cubic", "lanczos2", "lanczos3", "box", "linear"])
@pytest.mark.parametrize("scale", [0.5, 0.25, 2.0])
def test_matlab_resize_matches_reference(kernel, scale):
    import torch

    if kernel == "box" and scale > 1:
        # the reference Resizer crashes here (resizer.py:68 IndexError —
        # np.squeeze degenerates the single-tap field of view on box
        # upscaling); our implementation is well-defined, nothing to compare
        pytest.skip("reference box-upscale path is broken")

    Resizer = _ref_resizer()
    rs = np.random.RandomState(0)
    x = rs.rand(16, 16, 3).astype(np.float32)
    ref = Resizer((16, 16, 3), scale_factor=(scale, scale, 1), kernel=kernel)
    want = ref(torch.from_numpy(x)).numpy()
    out = int(round(16 * scale))
    got = np.asarray(matlab_resize(jnp.asarray(x[None]), (out, out), kernel))[0]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4)
