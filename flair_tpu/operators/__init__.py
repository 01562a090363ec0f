"""Degradation / inverse-problem operators (reference L4 layer).

- svd_ops:    SVD-decomposed linear operators — SRConv (bicubic x8/x16),
              patch-average SuperResolution with DDRM Λ-ops
              (restore_util.py:11-471).
- pseudo_sr:  FFT-domain pseudo-inverse blur+decimation operator with
              optional differentiable-JPEG round-trip (pseudoSR.py:15-416).
- factory:    per-task A-operator + restore_fn construction mirroring
              scripts/video_sample.py:177-263.
"""

from .svd_ops import AFunctions, SRConv, SuperResolution
from .pseudo_sr import PseudoSR, get_pseudo_sr_conf
from .factory import get_operator, make_restore_fn
