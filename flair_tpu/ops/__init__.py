"""Device kernels & NN primitives (TPU-first: XLA-fused ops + Pallas where hot).

Replaces the reference's L0/L1 layers (guided_diffusion/nn.py, nn_new.py, the
bundled CUDA DCN extension, flash-attn, mmcv/mmedit ops) with JAX/XLA/Pallas
equivalents. Layout convention throughout: channels-last NHWC images and
(B, T, H, W, C) videos — the TPU-native layout.
"""

from .dct import dct_matrix, dct1, idct1, dct_2d, idct_2d, block_dct8, block_idct8
from .jpeg import (
    jpeg_encode,
    jpeg_decode,
    quantization_matrix,
    quantization_encode,
    quantization_decode,
    rgb_to_ycbcr,
    ycbcr_to_rgb,
)
from .resize import (
    cubic_kernel_1d,
    cubic_kernel_2d,
    calc_strides,
    center_mass,
    resize_matrix,
    resize_bicubic,
    resize_area,
    resize_bilinear,
    imresize_kernel,
    depthwise_filter2d,
    imresize_efficient,
    matlab_imresize,
)
from .warp import flow_warp, grid_sample, warp_affine, inverse_affine_matrix
from .norms import group_norm, shift_window_group_norm
from .embed import timestep_embedding, sr3_noise_embedding
from .shuffle import pixel_shuffle, pixel_unshuffle
from .blur import gaussian_kernel_1d, gaussian_blur
from .patch import patchify, unpatchify
from .ema import ema_update
from .attention import (
    dot_product_attention,
    flash_attention,
    temporal_window_attention,
)
from .deform import deform_conv2d, modulated_deform_conv2d
