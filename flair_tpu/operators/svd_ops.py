"""SVD-decomposed linear degradation operators in pure jnp.

Re-design of restore_util.py:11-471. The operator A = U Σ Vᵀ is represented
by callables; SRConv exploits separability: the SVD of the 1-D bicubic
conv+decimation matrix (built on host in float64) induces the SVD of the full
2-D operator through Kronecker structure plus an index permutation (DDRM
Appendix D.5). All device work is batched small matmuls — pure MXU.

Convention: vectors are flattened NHWC images (B, H·W·C) — channel-fastest,
unlike the reference's channel-major (B, C·H·W); the permutation bookkeeping
is internal so the public A/At/A_pinv semantics match.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


class AFunctions:
    """Abstract SVD operator interface (restore_util.py:11-99).

    Subclasses implement V, Vt, U, Ut, singulars, add_zeros on flattened
    batches (B, D).
    """

    def V(self, vec: Array) -> Array:
        raise NotImplementedError

    def Vt(self, vec: Array) -> Array:
        raise NotImplementedError

    def U(self, vec: Array) -> Array:
        raise NotImplementedError

    def Ut(self, vec: Array) -> Array:
        raise NotImplementedError

    def singulars(self) -> Array:
        raise NotImplementedError

    def add_zeros(self, vec: Array) -> Array:
        raise NotImplementedError

    def A(self, vec: Array) -> Array:
        s = self.singulars()
        tmp = self.Vt(vec)
        return self.U(s * tmp[:, : s.shape[0]])

    def At(self, vec: Array) -> Array:
        s = self.singulars()
        tmp = self.Ut(vec)
        return self.V(self.add_zeros(s * tmp[:, : s.shape[0]]))

    def A_pinv(self, vec: Array) -> Array:
        s = self.singulars()
        factors = jnp.where(s != 0, 1.0 / jnp.where(s != 0, s, 1.0), 0.0)
        tmp = self.Ut(vec)
        tmp = tmp.at[:, : s.shape[0]].multiply(factors)
        return self.V(self.add_zeros(tmp))

    def A_pinv_eta(self, vec: Array, eta: float) -> Array:
        s = self.singulars()
        factors = s / (s * s + eta)
        tmp = self.Ut(vec)
        tmp = tmp.at[:, : s.shape[0]].multiply(factors)
        return self.V(self.add_zeros(tmp))


def _build_srconv_matrix(kernel: np.ndarray, img_dim: int, stride: int) -> np.ndarray:
    """1-D conv+decimation matrix with reflection padding
    (restore_util.py:112-133), float64 host."""
    small = img_dim // stride
    a = np.zeros((small, img_dim), dtype=np.float64)
    klen = kernel.shape[0]
    for i in range(stride // 2, img_dim + stride // 2, stride):
        for j in range(i - klen // 2, i + klen // 2):
            je = j
            if je < 0:
                je = -je - 1
            if je >= img_dim:
                je = (img_dim - 1) - (je - img_dim)
            a[i // stride, je] += kernel[j - i + klen // 2]
    return a


class SRConv(AFunctions):
    """Separable bicubic downsampling operator (restore_util.py:102-227).

    SVD built on host (numpy float64, singular values below 3e-2 zeroed);
    applied on device as (small matmul, image, small matmulᵀ) pairs.
    """

    def __init__(
        self,
        kernel: np.ndarray,
        channels: int,
        img_dim: int,
        stride: int,
        dtype=jnp.float32,
    ):
        self.channels = channels
        self.img_dim = img_dim
        self.ratio = stride
        self.y_dim = img_dim // stride
        a_small = _build_srconv_matrix(
            np.asarray(kernel, np.float64), img_dim, stride
        )
        u, s, vt = np.linalg.svd(a_small, full_matrices=True)
        s = s.copy()
        s[s < 3e-2] = 0.0
        self._u_small = jnp.asarray(u, dtype)
        self._v_small = jnp.asarray(vt.T, dtype)
        sing2d = np.outer(s, s).reshape(-1)
        self._singulars_np = sing2d
        self._singulars = jnp.asarray(
            np.repeat(sing2d, channels), dtype
        )
        # permutation P: singular-value ordering ↔ raster ordering
        # (restore_util.py:146-160)
        perm = [
            img_dim * i + j for i in range(self.y_dim) for j in range(self.y_dim)
        ] + [
            img_dim * i + j
            for i in range(self.y_dim)
            for j in range(self.y_dim, img_dim)
        ]
        self._perm = np.asarray(perm, np.int64)
        # rows not covered by perm keep their position (identity tail)
        self._perm_full = np.concatenate(
            [self._perm, np.arange(len(perm), img_dim**2)]
        )
        self._inv_perm_full = np.argsort(self._perm_full)

    # -- helpers ------------------------------------------------------------

    def _to_img(self, vec: Array, dim: int) -> Array:
        return vec.reshape(vec.shape[0], dim, dim, self.channels)

    def _sep_apply(self, img: Array, m: Array) -> Array:
        """Apply m on rows and mᵀ on cols of (B, d, d, C)."""
        out = jnp.einsum("uh,bhwc->buwc", m, img)
        return jnp.einsum("vw,bhwc->bhvc", m, out)

    # -- SVD interface --------------------------------------------------------

    def V(self, vec: Array) -> Array:
        b = vec.shape[0]
        d = self.img_dim
        x = vec.reshape(b, d * d, self.channels)
        x = x[:, self._inv_perm_full, :]
        img = x.reshape(b, d, d, self.channels)
        return self._sep_apply(img, self._v_small).reshape(b, -1)

    def Vt(self, vec: Array) -> Array:
        b = vec.shape[0]
        d = self.img_dim
        img = self._to_img(vec, d)
        out = self._sep_apply(img, self._v_small.T).reshape(
            b, d * d, self.channels
        )
        out = out[:, self._perm_full, :]
        return out.reshape(b, -1)

    def U(self, vec: Array) -> Array:
        b = vec.shape[0]
        img = vec.reshape(b, self.y_dim, self.y_dim, self.channels)
        return self._sep_apply(img, self._u_small).reshape(b, -1)

    def Ut(self, vec: Array) -> Array:
        b = vec.shape[0]
        img = self._to_img(vec, self.y_dim)
        return self._sep_apply(img, self._u_small.T).reshape(b, -1)

    def singulars(self) -> Array:
        return self._singulars

    def add_zeros(self, vec: Array) -> Array:
        b = vec.shape[0]
        flat = vec.reshape(b, -1)
        out = jnp.zeros(
            (b, flat.shape[1] * self.ratio**2), dtype=vec.dtype
        )
        return out.at[:, : flat.shape[1]].set(flat)


class SuperResolution(AFunctions):
    """Patch-average SR operator with DDRM Λ-ops (restore_util.py:230-471).

    A averages each ratio×ratio patch. The SVD of the 1×r² row [1/r² ... 1/r²]
    gives U = [1], σ = 1/r, V with first column 1/r·1.
    """

    def __init__(self, channels: int, img_dim, ratio: int, dtype=jnp.float32):
        h, w = img_dim if isinstance(img_dim, (tuple, list)) else (img_dim, img_dim)
        assert h % ratio == 0 and w % ratio == 0
        self.channels = channels
        self.img_dim = (h, w)
        self.ratio = ratio
        self.y_dim = (h // ratio, w // ratio)
        self.y_pixels = self.y_dim[0] * self.y_dim[1]
        a = np.full((1, ratio**2), 1.0 / ratio**2, dtype=np.float64)
        u, s, vt = np.linalg.svd(a, full_matrices=True)
        self._u00 = float(u[0, 0])
        self._sing_small = jnp.asarray(s, dtype)  # (1,)
        self._v_small = jnp.asarray(vt.T, dtype)  # (r², r²)

    # layout helpers: ordered vector ↔ patch decomposition ---------------------

    def _extract_patches(self, vec: Array) -> Array:
        """(B, flat) image → (B, C, y_pixels, r²) patch-flattened."""
        b = vec.shape[0]
        h, w = self.img_dim
        r = self.ratio
        img = vec.reshape(b, h, w, self.channels)
        img = img.reshape(b, h // r, r, w // r, r, self.channels)
        patches = img.transpose(0, 5, 1, 3, 2, 4).reshape(
            b, self.channels, self.y_pixels, r * r
        )
        return patches

    def _assemble_patches(self, patches: Array) -> Array:
        b = patches.shape[0]
        h, w = self.img_dim
        r = self.ratio
        img = patches.reshape(b, self.channels, h // r, w // r, r, r)
        img = img.transpose(0, 2, 4, 3, 5, 1).reshape(b, h, w, self.channels)
        return img.reshape(b, -1)

    def _ordered_to_patches(self, vec: Array) -> Array:
        """Inverse of the singular-value ordering (restore_util.py:244-262):
        first C·y_pixels entries are patch component 0; the rest interleave
        components 1..r²-1."""
        b = vec.shape[0]
        r2 = self.ratio**2
        flat = vec.reshape(b, -1)
        head = flat[:, : self.channels * self.y_pixels].reshape(
            b, self.channels, self.y_pixels, 1
        )
        tail = flat[:, self.channels * self.y_pixels :].reshape(
            b, self.channels, self.y_pixels, r2 - 1
        )
        return jnp.concatenate([head, tail], axis=-1)

    def _patches_to_ordered(self, patches: Array) -> Array:
        b = patches.shape[0]
        head = patches[..., 0].reshape(b, -1)
        tail = patches[..., 1:].reshape(b, -1)
        return jnp.concatenate([head, tail], axis=1)

    # SVD interface -------------------------------------------------------------

    def V(self, vec: Array) -> Array:
        patches = self._ordered_to_patches(vec)
        patches = jnp.einsum("ij,bcpj->bcpi", self._v_small, patches)
        return self._assemble_patches(patches)

    def Vt(self, vec: Array) -> Array:
        patches = self._extract_patches(vec)
        patches = jnp.einsum("ji,bcpj->bcpi", self._v_small, patches)
        return self._patches_to_ordered(patches)

    def U(self, vec: Array) -> Array:
        return self._u00 * vec.reshape(vec.shape[0], -1)

    def Ut(self, vec: Array) -> Array:
        return self._u00 * vec.reshape(vec.shape[0], -1)

    def singulars(self) -> Array:
        return jnp.tile(self._sing_small, self.channels * self.y_pixels)

    def add_zeros(self, vec: Array) -> Array:
        b = vec.shape[0]
        flat = vec.reshape(b, -1)
        out = jnp.zeros((b, flat.shape[1] * self.ratio**2), vec.dtype)
        return out.at[:, : flat.shape[1]].set(flat)

    # DDRM Λ-operators (restore_util.py:325-471) --------------------------------

    def Lambda(self, vec: Array, a: float, sigma_y: float, sigma_t, eta: float) -> Array:
        r2 = self.ratio**2
        patches = self._extract_patches(vec)
        patches = jnp.einsum("ji,bcpj->bcpi", self._v_small, patches)

        sing = jnp.zeros((r2,), vec.dtype).at[:1].set(self._sing_small)
        inv_sing = jnp.where(sing != 0, 1.0 / jnp.where(sing != 0, sing, 1.0), 0.0)
        lam = jnp.ones((r2,), vec.dtype)
        if a != 0 and sigma_y != 0:
            change = (sigma_t < a * sigma_y * inv_sing).astype(vec.dtype)
            lam = lam * (1 - change) + change * (
                sing * sigma_t * (1 - eta**2) ** 0.5 / a / sigma_y
            )
        patches = patches * lam
        patches = jnp.einsum("ij,bcpj->bcpi", self._v_small, patches)
        return self._assemble_patches(patches)

    def Lambda_noise(
        self, vec: Array, a: float, sigma_y: float, sigma_t, eta: float, epsilon: Array
    ) -> Array:
        r2 = self.ratio**2
        pv = self._extract_patches(vec)
        pe = self._extract_patches(epsilon)

        sing = jnp.zeros((r2,), vec.dtype).at[:1].set(self._sing_small)
        inv_sing = jnp.where(sing != 0, 1.0 / jnp.where(sing != 0, sing, 1.0), 0.0)
        d1 = jnp.full((r2,), sigma_t * eta, vec.dtype)
        d2 = jnp.full((r2,), sigma_t * (1 - eta**2) ** 0.5, vec.dtype)
        if a != 0 and sigma_y != 0:
            ch = (sigma_t < a * sigma_y * inv_sing).astype(vec.dtype)
            d1 = d1 * (1 - ch) + ch * sigma_t * eta
            d2 = d2 * (1 - ch)
            ch = (sigma_t > a * sigma_y * inv_sing).astype(vec.dtype)
            d1 = d1 * (1 - ch) + jnp.sqrt(
                ch * jnp.maximum(sigma_t**2 - a**2 * sigma_y**2 * inv_sing**2, 0)
            )
            d2 = d2 * (1 - ch)
            ch = (sing == 0).astype(vec.dtype)
            d1 = d1 * (1 - ch) + ch * sigma_t * eta
            d2 = d2 * (1 - ch) + ch * sigma_t * (1 - eta**2) ** 0.5
        pv = jnp.einsum("ij,bcpj->bcpi", self._v_small, pv * d1)
        pe = jnp.einsum("ij,bcpj->bcpi", self._v_small, pe * d2)
        return self._assemble_patches(pv) + self._assemble_patches(pe)
