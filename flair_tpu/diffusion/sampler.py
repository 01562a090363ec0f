"""FLAIR guided sampler, compiled as ONE XLA program (lax.scan over steps).

This is the heart of the framework — the reference's Python-level hot loop
(guided_diffusion/gaussian_diffusion.py:372-689: ``sample`` → ``p_sample_loop``
→ per-step ``p_sample``) becomes a single scanned step function so the entire
100-step restoration of a window runs on-device without host round-trips.

Per step (gaussian_diffusion.py:423-517):
  1. denoise:      x0 = p_mean_variance(model(x, t))            (:459-461)
  2. data consist: x0 ← x0 − γ_t · restore_fn(x0), clip         (:465-470)
  3. GAN prior:    for τ ≤ t ≤ t_start, x0 ← w_t·x0 + (1−w_t)·face_fn(x0, x)
                                                                 (:471-496)
  4. pin overlap:  first OVERLAP frames ← prev_recon            (:497-506)
  5. update:       x_{t−1} = √ᾱ_{t−1}·x0
                   + 1[t≠0]·√(1−ᾱ_{t−1})·(√(1−ρ)·ε̂ + √ρ·z)      (:507-515)

The ``ws`` / ``gammas`` schedules are precomputed on host in f64
(gaussian_diffusion.py:632-657) and indexed by t inside the scan.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .gaussian import (
    Diffusion,
    extract,
    p_mean_variance,
    predict_eps_from_xstart,
)

Array = jax.Array
ModelFn = Callable[[Array, Array], Array]  # (x, t_spaced) -> raw model output
RestoreFn = Callable[[Array], Array]       # x0 -> correction (A-operator residual)
FaceFn = Callable[[Array, Array], Array]   # (x0, x_t) -> face-fused image


def compute_ws(
    num_timesteps: int, w: float, tau: int, start_timestep: int, use_aux: bool
) -> np.ndarray:
    """Per-step GAN-fusion weight schedule (gaussian_diffusion.py:632-646).

    Exponential ramp from ``w`` at t=τ to 1 at t=t_start; ones outside.
    """
    if not use_aux:
        return np.ones(num_timesteps, dtype=np.float64)
    if start_timestep - tau > 0:
        ws = np.linspace(0, 1, start_timestep - tau + 1)
        ws = 1.0 * np.exp(-ws * 1)
        ws = (ws - ws.min()) / (ws.max() - ws.min()) * (1 - w)
        ws = 1 - ws
        ws = np.append(ws, np.ones(num_timesteps - start_timestep - 1))
        ws = np.concatenate([np.ones(tau), ws])
    else:
        ws = np.ones(num_timesteps) * w
    return ws


def compute_gammas(
    betas: np.ndarray,
    sqrt_alphas_cumprod: np.ndarray,
    sqrt_one_minus_alphas_cumprod: np.ndarray,
    zeta: float,
    noise_level: float,
) -> np.ndarray:
    """ζ-scaled SNR-dependent data-consistency step sizes
    (gaussian_diffusion.py:648-657). ζ = -1 disables the schedule (all ones).
    """
    if zeta == -1:
        return np.ones_like(betas)
    gammas = zeta * (
        noise_level**2 / (sqrt_one_minus_alphas_cumprod / sqrt_alphas_cumprod) ** 2
    )
    gammas = np.asarray(gammas, dtype=np.float64).copy()
    gammas[gammas >= 1] = 0.991
    gammas[gammas <= 1e-1] = 1e-6
    gammas = 1 - gammas
    return gammas


@dataclasses.dataclass(frozen=True)
class GuidanceConfig:
    """Static guidance hyper-parameters for one sampling run
    (scripts/video_sample.py:265-308 CLI surface)."""

    w: float = 0.5
    tau: int = 5
    rho: float = 0.35
    noise_level: float = 12.75
    zeta: float = -1.0
    t_start: int = -1          # -1 → start from T-1
    clip_denoised: bool = True
    use_aux: bool = True       # GAN face prior enabled


def guidance_tables(d: Diffusion, cfg: GuidanceConfig):
    """Host-side precompute of (indices, ws, gammas, start_timestep)."""
    T = d.num_timesteps
    t_hi = T - 1 if cfg.t_start == -1 else cfg.t_start
    if not (0 <= t_hi < T):
        raise ValueError("t_start must be in [0, num_timesteps)")
    indices = np.arange(t_hi, -1, -1, dtype=np.int32)
    start_timestep = int(indices[0])
    ws = compute_ws(T, cfg.w, cfg.tau, start_timestep, cfg.use_aux)
    gammas = compute_gammas(
        np.asarray(d.betas),
        np.asarray(d.sqrt_alphas_cumprod, dtype=np.float64),
        np.asarray(d.sqrt_one_minus_alphas_cumprod, dtype=np.float64),
        cfg.zeta,
        cfg.noise_level,
    )
    return indices, ws.astype(np.float32), gammas.astype(np.float32), start_timestep


def p_sample(
    d: Diffusion,
    model_out: Array,
    x: Array,
    t: Array,
    z: Array,
    *,
    w_t: Array,
    gamma_t: Array,
    rho: float,
    in_face_window: Array,
    clip_denoised: bool = True,
    restore_fn: Optional[RestoreFn] = None,
    face_fn: Optional[FaceFn] = None,
    pin_mask: Optional[Array] = None,
    pin_values: Optional[Array] = None,
    rule: str = "ddpm",
    eta: float = 0.0,
):
    """One guided reverse step (gaussian_diffusion.py:423-517), given the raw
    model output and pre-drawn gaussian noise ``z``.

    ``t`` is a scalar int32 (all batch elements share the step, as in the
    reference loop, gaussian_diffusion.py:664-665). Returns (sample, pred_xstart).

    ``rule`` selects the x_{t-1} update family; guidance (data consistency,
    face fusion, overlap pinning) is identical in both:

    - ``"ddpm"``: FLAIR's ρ-interpolated update (gaussian_diffusion.py:507-515)
      x_{t−1} = √ᾱ′·x0 + 1[t≠0]·√(1−ᾱ′)·(√(1−ρ)·ε̂ + √ρ·z), ᾱ′ = ᾱ_{t−1}.
      Note this is already a *generalized DDIM* step with σ = √(ρ(1−ᾱ′)):
      the ε̂ coefficient is √(1−ᾱ′−σ²). ρ=0 is exactly DDIM η=0.
    - ``"ddim"``: the standard Song et al. η-parameterisation used with
      respaced schedules (driver metric "frames/s (DDIM)"):
      σ = η·√((1−ᾱ′)/(1−ᾱ))·√(1−ᾱ/ᾱ′);
      x_{t−1} = √ᾱ′·x0 + 1[t≠0]·(√(1−ᾱ′−σ²)·ε̂ + σ·z). ``rho`` is ignored.
    """
    nd = x.ndim
    tb = jnp.full((x.shape[0],), t, dtype=jnp.int32) if jnp.ndim(t) == 0 else t
    out = p_mean_variance(d, model_out, x, tb, clip_denoised=clip_denoised)
    x0 = out["pred_xstart"]

    if restore_fn is not None:
        x0 = x0 - gamma_t * restore_fn(x0)
        if clip_denoised:
            x0 = jnp.clip(x0, -1, 1)

    if face_fn is not None:
        def fuse(x0_):
            fused = face_fn(x0_, x)
            if clip_denoised:
                fused = jnp.clip(fused, -1, 1)
            return w_t * x0_ + (1 - w_t) * fused

        x0 = jax.lax.cond(in_face_window, fuse, lambda x0_: x0_, x0)

    if pin_mask is not None:
        x0 = jnp.where(pin_mask, pin_values, x0)

    eps = predict_eps_from_xstart(d, x, tb, x0)
    nonzero = (tb != 0).astype(x.dtype).reshape((-1,) + (1,) * (nd - 1))
    if rule == "ddpm":
        co_noise = extract(d.sqrt_one_minus_alphas_cumprod_prev, tb, nd)
        sample = extract(d.sqrt_alphas_cumprod_prev, tb, nd) * x0 + nonzero * (
            np.sqrt(1 - rho) * co_noise * eps + np.sqrt(rho) * co_noise * z
        )
    elif rule == "ddim":
        alpha_bar = extract(d.alphas_cumprod, tb, nd)
        alpha_bar_prev = extract(d.alphas_cumprod_prev, tb, nd)
        sigma = (
            eta
            * jnp.sqrt((1 - alpha_bar_prev) / (1 - alpha_bar))
            * jnp.sqrt(1 - alpha_bar / alpha_bar_prev)
        )
        sample = jnp.sqrt(alpha_bar_prev) * x0 + nonzero * (
            jnp.sqrt(jnp.maximum(1 - alpha_bar_prev - sigma**2, 0.0)) * eps
            + sigma * z
        )
    else:
        raise ValueError(f"unknown update rule: {rule!r}")
    return sample, x0


def guided_sample_loop(
    d: Diffusion,
    model_fn: ModelFn,
    noise: Array,
    rng: Array,
    cfg: GuidanceConfig,
    *,
    restore_fn: Optional[RestoreFn] = None,
    face_fn: Optional[FaceFn] = None,
    pin_mask: Optional[Array] = None,
    pin_values: Optional[Array] = None,
    rule: str = "ddpm",
    eta: float = 0.0,
) -> Array:
    """Full guided DDPM loop as lax.scan (gaussian_diffusion.py:589-689).
    ``rule="ddim"`` swaps in the standard η-DDIM update (see :func:`p_sample`)
    with ALL guidance hooks intact — pair it with a respaced ``d`` (e.g.
    ``make_task_diffusion(task, "ddim25")``) for the fast serving path.

    ``model_fn(x, t)`` receives the *spaced* step index t (scalar int32); use
    :func:`flair_tpu.diffusion.gaussian.map_timesteps` / ``sr3_noise_level``
    inside it for model conditioning (respace.py:155-167 semantics).

    Returns the final sample (x at t=0).
    """
    indices, ws, gammas, start_timestep = guidance_tables(d, cfg)
    ws_dev = jnp.asarray(ws)
    gammas_dev = jnp.asarray(gammas)
    indices_dev = jnp.asarray(indices)

    def step(carry, t):
        x, rng = carry
        rng, k = jax.random.split(rng)
        z = jax.random.normal(k, x.shape, dtype=x.dtype)
        in_window = jnp.logical_and(t <= start_timestep, t >= cfg.tau)
        model_out = model_fn(x, t)
        sample, _ = p_sample(
            d,
            model_out,
            x,
            t,
            z,
            w_t=jnp.take(ws_dev, t),
            gamma_t=jnp.take(gammas_dev, t),
            rho=cfg.rho,
            in_face_window=in_window,
            clip_denoised=cfg.clip_denoised,
            restore_fn=restore_fn,
            face_fn=face_fn,
            pin_mask=pin_mask,
            pin_values=pin_values,
            rule=rule,
            eta=eta,
        )
        return (sample, rng), None

    (x_final, _), _ = jax.lax.scan(step, (noise, rng), indices_dev)
    return x_final


def make_guided_update(
    d: Diffusion,
    cfg: GuidanceConfig,
    *,
    restore_fn=None,   # (x0, *restore_args) -> correction
    face_fn=None,      # (x0, x_t, *face_args) -> fused image
    rule: str = "ddpm",
    eta: float = 0.0,
):
    """Build the guidance-update half of the two-program sampler.
    ``rule="ddim"`` selects the standard η-DDIM update (see :func:`p_sample`);
    guidance hooks (restore/face/pin, ws/γ schedules) are identical.

    The guided step factors into [heavy model forward] + [cheap update]
    (p_sample). Compiling them as SEPARATE programs — instead of the
    monolithic scan of :func:`guided_sample_loop` — keeps each XLA program
    small enough for this machine's remote compile service and lets the
    model program's compile cache be shared between the pipeline, the
    bench, and the CLI.

    Everything that varies per window is a runtime ARGUMENT (not a closure):
    closure-captured arrays are baked into the traced program as constants,
    so new per-window data would retrace + recompile; worse, XLA constant-
    folds whatever is derivable from constants at compile time.

    Returns ``update(x, model_out, t, rng, pin_mask, pin_values,
    restore_args, face_args) -> (sample, rng)``:
    - t: scalar int32 spaced step index (traced — no per-step recompile);
    - pin_mask/pin_values: overlap pinning (None for the first window);
    - restore_args / face_args: tuples forwarded to restore_fn / face_fn
      (e.g. the window's degraded frames, the window's face matrices);
      pass face_args=None to disable face fusion for a window.
    Numerics identical to the :func:`guided_sample_loop` scan body (tested).
    """
    _, ws, gammas, start_timestep = guidance_tables(d, cfg)
    ws_dev = jnp.asarray(ws)
    gammas_dev = jnp.asarray(gammas)

    def update(x, model_out, t, rng, pin_mask, pin_values,
               restore_args=(), face_args=()):
        rng, k = jax.random.split(rng)
        z = jax.random.normal(k, x.shape, dtype=x.dtype)
        in_window = jnp.logical_and(t <= start_timestep, t >= cfg.tau)
        rfn = None
        if restore_fn is not None:
            rfn = lambda x0: restore_fn(x0, *(restore_args or ()))
        ffn = None
        if face_fn is not None and face_args is not None:
            ffn = lambda x0, xt: face_fn(x0, xt, *face_args)
        sample, _ = p_sample(
            d, model_out, x, t, z,
            w_t=jnp.take(ws_dev, t),
            gamma_t=jnp.take(gammas_dev, t),
            rho=cfg.rho,
            in_face_window=in_window,
            clip_denoised=cfg.clip_denoised,
            restore_fn=rfn,
            face_fn=ffn,
            pin_mask=pin_mask,
            pin_values=pin_values,
            rule=rule,
            eta=eta,
        )
        return sample, rng

    return update


def guided_sample_steps(
    d: Diffusion,
    model_fn: ModelFn,
    noise: Array,
    rng: Array,
    cfg: GuidanceConfig,
    *,
    restore_fn: Optional[RestoreFn] = None,
    face_fn: Optional[FaceFn] = None,
    pin_mask: Optional[Array] = None,
    pin_values: Optional[Array] = None,
    update=None,
    jit_update: bool = True,
    restore_args=None,
    face_args=None,
    rule: str = "ddpm",
    eta: float = 0.0,
) -> Array:
    """Python-loop guided sampler: numerics identical to
    :func:`guided_sample_loop`, but dispatched as one model program + one
    update program per step instead of one monolithic scan program.

    Use this on TPU at full resolution — the scanned program is too large
    for this machine's remote XLA compile service (PERF.md); the split
    programs compile in minutes and cache across windows, bench and CLI.

    ``model_fn`` should already be jitted by the caller (it is invoked once
    per step). Pass ``update`` (from :func:`make_guided_update`, possibly
    pre-jitted and shared across windows) to control closure lifetimes;
    otherwise one is built from restore_fn/face_fn with args baked.
    """
    indices, _, _, _ = guidance_tables(d, cfg)
    if update is None:
        rfn = None if restore_fn is None else (
            lambda x0, *a: restore_fn(x0))
        ffn = None if face_fn is None else (
            lambda x0, xt, *a: face_fn(x0, xt))
        update = make_guided_update(d, cfg, restore_fn=rfn, face_fn=ffn,
                                    rule=rule, eta=eta)
        face_args = None if face_fn is None else ()
        if jit_update:
            update = jax.jit(update)

    x = noise
    for t_host in indices:
        t = jnp.asarray(int(t_host), jnp.int32)
        model_out = model_fn(x, t)
        x, rng = update(x, model_out, t, rng, pin_mask, pin_values,
                        restore_args or (), face_args)
    return x


def ddim_sample_loop(
    d: Diffusion,
    model_fn: ModelFn,
    noise: Array,
    rng: Array,
    *,
    eta: float = 0.0,
    clip_denoised: bool = True,
    restore_fn: Optional[RestoreFn] = None,
    gammas: Optional[Array] = None,
) -> Array:
    """Plain DDIM sampler (capability extension; the reference exposes only
    ``sample_mode="ddpm"`` at gaussian_diffusion.py:397 but the driver metric
    is stated for DDIM). Supports the same data-consistency hook."""
    T = d.num_timesteps
    indices = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)
    gammas_dev = jnp.ones((T,), jnp.float32) if gammas is None else jnp.asarray(gammas)

    def step(carry, t):
        x, rng = carry
        rng, k = jax.random.split(rng)
        nd = x.ndim
        tb = jnp.full((x.shape[0],), t, dtype=jnp.int32)
        out = p_mean_variance(d, model_fn(x, t), x, tb, clip_denoised=clip_denoised)
        x0 = out["pred_xstart"]
        if restore_fn is not None:
            x0 = x0 - jnp.take(gammas_dev, t) * restore_fn(x0)
            if clip_denoised:
                x0 = jnp.clip(x0, -1, 1)
        eps = predict_eps_from_xstart(d, x, tb, x0)
        alpha_bar = extract(d.alphas_cumprod, tb, nd)
        alpha_bar_prev = extract(d.alphas_cumprod_prev, tb, nd)
        sigma = (
            eta
            * jnp.sqrt((1 - alpha_bar_prev) / (1 - alpha_bar))
            * jnp.sqrt(1 - alpha_bar / alpha_bar_prev)
        )
        z = jax.random.normal(k, x.shape, dtype=x.dtype)
        mean_pred = (
            x0 * jnp.sqrt(alpha_bar_prev)
            + jnp.sqrt(jnp.maximum(1 - alpha_bar_prev - sigma**2, 0.0)) * eps
        )
        nonzero = (tb != 0).astype(x.dtype).reshape((-1,) + (1,) * (nd - 1))
        sample = mean_pred + nonzero * sigma * z
        return (sample, rng), None

    (x_final, _), _ = jax.lax.scan(step, (noise, rng), indices)
    return x_final
