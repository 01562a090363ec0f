"""FLAIR-TPU: a TPU-native (JAX / XLA / Pallas / pjit) conditional-diffusion
framework for face video restoration, with the full capability surface of
wustl-cig/FLAIR (reference: guided DDPM sampler + data-consistency operators +
GAN face prior + optical-flow temporal propagation).

Layer map (bottom → top), mirroring the reference but re-designed TPU-first:

- ``flair_tpu.ops``        — device kernels & primitives (attention, deformable
                             conv, flow warp, resize, DCT/JPEG). Pallas where hot.
- ``flair_tpu.operators``  — degradation / inverse-problem linear operators
                             (SVD SRConv, FFT pseudo-inverse, patch-average SR).
- ``flair_tpu.models``     — denoiser UNets (SR3-style, ADM-style), temporal
                             stack (SPyNet, BasicVSR++), face nets (RetinaFace,
                             ParseNet, CodeFormer, ...), interpolators.
- ``flair_tpu.diffusion``  — schedules, respacing, guided sampler (lax.scan),
                             losses, timestep samplers.
- ``flair_tpu.face``       — host+device face alignment/paste-back helper.
- ``flair_tpu.parallel``   — mesh construction, sharding rules, halo exchange.
- ``flair_tpu.train``      — training loop (optax, EMA, microbatch scan, psum).
- ``flair_tpu.pipeline``   — windowed video restoration driver.
- ``flair_tpu.cli``        — command-line interface mirroring the reference demos.
"""

__version__ = "0.1.0"
