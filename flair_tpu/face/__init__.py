"""Face pipeline: detection (host), alignment, on-device crop/fuse/paste."""

from .helper import (
    FFHQ_TEMPLATE_512,
    MASK_COLORMAP,
    FaceRestoreHelper,
    estimate_similarity_transform,
    make_face_fn,
)
