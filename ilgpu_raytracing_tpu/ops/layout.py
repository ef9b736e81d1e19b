"""Block-linear pixel layout: the frame's static coherence order.

The packet traversal kernels (ops/pallas/) process rays in consecutive
4096-lane tiles. In row-major order one tile is a 3-pixel-tall strip of the
whole image width; in block-linear order it is a compact 64x64 screen block,
which shrinks every tile's BVH node-visit union. Measured on v5e (cornell,
931k rays): primary 24 -> 36 Mrays/s, sun-shadow 24 -> 48 Mrays/s, and
secondary bounce batches in block order match the old runtime
morton/octant-sorted path (ops/sort.py) *without* its ~110 ms/trace
argsort+gather overhead -- the permutation is static, so ray generation,
ReSTIR neighbor math, and TAAU taps simply compute block-linear indices
arithmetically and no data is ever shuffled.

Layout contract: every flat per-pixel array of the internal render
resolution (G-buffer, reservoirs, color/depth/obj aux) is ordered by
`position`, where position p holds pixel (x, y) = `xy_from_position(p)`.
For resolutions that are not multiples of 64 in both axes the layout
degrades to row-major (identity) -- all index math below handles both, and
`RenderConfig.internal_resolution` rounds production resolutions to block
multiples. At exactly 64x64 the two orders coincide (one block), which keeps
the committed golden images valid.

Output-resolution arrays (TAAU history and the presented frame) stay
row-major; only internal-resolution arrays are block-ordered.
"""

from __future__ import annotations

import jax.numpy as jnp

BLOCK_LOG2 = 6
BLOCK = 1 << BLOCK_LOG2  # 64x64 pixels = 4096 lanes = one packet tile


def is_blocked(width: int, height: int) -> bool:
    return width % BLOCK == 0 and height % BLOCK == 0 and width > 0 and height > 0


def xy_from_position(pos, width: int, height: int):
    """Array position -> pixel coords. `pos` is any int array."""
    pos = jnp.asarray(pos, jnp.int32)
    if not is_blocked(width, height):
        return pos % width, pos // width
    blocks_x = width >> BLOCK_LOG2
    b = pos >> (2 * BLOCK_LOG2)
    l = pos & (BLOCK * BLOCK - 1)
    x = ((b % blocks_x) << BLOCK_LOG2) | (l & (BLOCK - 1))
    y = ((b // blocks_x) << BLOCK_LOG2) | (l >> BLOCK_LOG2)
    return x, y


def position_from_xy(x, y, width: int, height: int):
    """Pixel coords -> array position. No bounds checks (callers mask)."""
    x = jnp.asarray(x, jnp.int32)
    y = jnp.asarray(y, jnp.int32)
    if not is_blocked(width, height):
        return y * width + x
    blocks_x = width >> BLOCK_LOG2
    b = (y >> BLOCK_LOG2) * blocks_x + (x >> BLOCK_LOG2)
    l = ((y & (BLOCK - 1)) << BLOCK_LOG2) | (x & (BLOCK - 1))
    return (b << (2 * BLOCK_LOG2)) | l


def to_image(flat, width: int, height: int):
    """(N, ...) position-ordered -> (height, width, ...) image.

    Pure reshape/transpose (no gathers)."""
    if not is_blocked(width, height):
        return flat.reshape(height, width, *flat.shape[1:])
    by, bx = height >> BLOCK_LOG2, width >> BLOCK_LOG2
    t = flat.reshape(by, bx, BLOCK, BLOCK, *flat.shape[1:])
    order = (0, 2, 1, 3) + tuple(range(4, t.ndim))
    return t.transpose(order).reshape(height, width, *flat.shape[1:])


def from_image(img):
    """(height, width, ...) image -> (N, ...) position-ordered."""
    height, width = img.shape[0], img.shape[1]
    if not is_blocked(width, height):
        return img.reshape(height * width, *img.shape[2:])
    by, bx = height >> BLOCK_LOG2, width >> BLOCK_LOG2
    t = img.reshape(by, BLOCK, bx, BLOCK, *img.shape[2:])
    order = (0, 2, 1, 3) + tuple(range(4, t.ndim))
    return t.transpose(order).reshape(height * width, *img.shape[2:])
