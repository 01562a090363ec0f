"""EMA of parameter pytrees (nn.py:804-814 update_ema).

The reference mutates flat param lists in place; here the EMA stream is a
second pytree updated functionally (jit/donate-friendly).
"""

from __future__ import annotations

import jax


def ema_update(ema_params, params, rate: float = 0.99):
    """ema ← rate·ema + (1−rate)·params, leafwise."""
    return jax.tree_util.tree_map(
        lambda e, p: e * rate + p.astype(e.dtype) * (1.0 - rate), ema_params, params
    )
