"""Training loop (reference L7: train_util.py / fp16_util.py, completed).

The reference's TrainLoop cannot actually train — ``training_losses`` is
missing from its diffusion core (SURVEY.md §0). Here the capability is
completed TPU-natively: optax AdamW + dynamic-loss-scale-free bf16, EMA
streams as pytrees, microbatch gradient accumulation as lax.scan (the
``no_sync()`` trick of train_util.py:266-267 becomes a single psum by
construction), loss-aware timestep resampling via lax collectives.
"""

from .loop import TrainConfig, TrainState, create_train_state, make_train_step
from .runner import (
    TrainRunner,
    find_resume_checkpoint,
    interpolate_skipped_frames,
    log_loss_quartiles,
)
