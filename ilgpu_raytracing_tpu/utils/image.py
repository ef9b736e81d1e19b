"""Host-side image IO.

The reference presents frames zero-copy into a GL window via CUDA-GL interop
(reference CudaGlInteropIndexBuffer.cs); on TPU the presentation capability is
"device array -> host -> display surface / PNG". This module is the host end
of that path (the copy is explicit and documented, per SURVEY.md section 7
step 7).
"""

from __future__ import annotations

import numpy as np

from ilgpu_raytracing_tpu.utils import packing


def packed_to_numpy_rgb(packed, width: int, height: int) -> np.ndarray:
    """uint32 0xAARRGGBB flat (H*W,) -> (H, W, 3) uint8."""
    p = np.asarray(packed, dtype=np.uint32).reshape(height, width)
    out = np.empty((height, width, 3), dtype=np.uint8)
    out[..., 0] = (p >> 16) & 255
    out[..., 1] = (p >> 8) & 255
    out[..., 2] = p & 255
    return out


def linear_to_uint8(color, srgb: bool = False) -> np.ndarray:
    """(H, W, 3) linear float -> uint8, clamped; optionally sRGB-encoded."""
    import jax.numpy as jnp

    c = jnp.asarray(color)
    if srgb:
        c = packing.linear_to_srgb(c)
    arr = np.asarray(jnp.clip(c, 0.0, 1.0) * 255.99, dtype=np.float32)
    return arr.astype(np.uint8)


def save_png(path: str, rgb_uint8: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray(rgb_uint8, mode="RGB").save(path)


def save_packed_png(path: str, packed, width: int, height: int) -> None:
    save_png(path, packed_to_numpy_rgb(packed, width, height))
