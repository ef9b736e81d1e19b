"""Counter-based per-pixel RNG (pure uint32, jit/vmap-safe).

The reference seeds a xorshift32 stream per (pixel, frame, sample, salt) with
heavy hash mixing, and supports "locked" noise: when the noise key is 0 the
frame term enters the seed, when nonzero the frame term is zeroed and the key
value itself selects a distinct stream (reference RTUtils.cs:53-137;
RTRenderer.cs:48, 166 for how the key is produced per frame).

This module is a 32-bit-native redesign of that scheme: the reference folds
two 64-bit lanes through SplitMix64, which would force x64 mode in JAX; here
the same four 32-bit input lanes are mixed through triple32/PCG-style 32-bit
finalizers instead. Stream structure and lock semantics are identical; bit
values are not (and don't need to be -- parity is statistical, per SURVEY.md
section 7 hard-part (d)).

State is simply a uint32 array of any shape; every draw is vectorized across
lanes. Masked lanes may advance freely because streams are independent.
"""

from __future__ import annotations

import jax.numpy as jnp

_U = jnp.uint32


def u32(x) -> jnp.ndarray:
    if isinstance(x, int):  # python ints may exceed int32; wrap explicitly
        import numpy as np

        return jnp.asarray(np.uint32(x & 0xFFFFFFFF))
    return jnp.asarray(x).astype(jnp.uint32)


def rotl(v: jnp.ndarray, r: int) -> jnp.ndarray:
    r = r & 31
    if r == 0:
        return v
    return (v << _U(r)) | (v >> _U(32 - r))


def hash32(x: jnp.ndarray) -> jnp.ndarray:
    """Integer finalizer (same constants as reference Hash32,
    RTUtils.cs:77-84)."""
    x = x ^ (x >> _U(17))
    x = x * _U(0xED5AD4BB)
    x = x ^ (x >> _U(11))
    x = x * _U(0xAC4C1B51)
    x = x ^ (x >> _U(15))
    x = x * _U(0x31848BAB)
    x = x ^ (x >> _U(14))
    return x


def pcg_permute(x: jnp.ndarray) -> jnp.ndarray:
    """PCG XSH-RR-like output permutation (RTUtils.cs:65-74)."""
    x = x ^ (x >> _U(16))
    x = x * _U(0x7FEB352D)
    x = x ^ (x >> _U(15))
    x = x * _U(0x846CA68B)
    x = x ^ (x >> _U(16))
    return x


def make_seed32(a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Mix four 32-bit lanes into one well-avalanched nonzero seed.

    32-bit-native analog of the reference's MakeSeed32 (RTUtils.cs:87-97),
    replacing the two SplitMix64 folds with hash32/pcg_permute chains.
    """
    s0 = pcg_permute(hash32(a ^ _U(0xD1B54A33)) + rotl(b, 16))
    s1 = pcg_permute(hash32(c ^ _U(0x94D049BB)) + rotl(d, 8))
    s = pcg_permute(s0 ^ (rotl(s1, 13) + _U(0x9E3779B1)))
    return s | _U(1)


def seed_from_pixel(px, py, frame, sample, salt, noise_key) -> jnp.ndarray:
    """Seed per (pixel, frame, sample, salt) with lockNoise semantics.

    noise_key == 0  => frame term participates (noise varies per frame).
    noise_key != 0  => frame term zeroed and the key value is folded in as a
                       distinct stream selector (RTUtils.cs:121-133).

    All args broadcast; px/py may be arrays, frame/sample/salt/noise_key may
    be python ints or traced scalars.
    """
    px = u32(px)
    py = u32(py)
    frame = u32(frame)
    sample = u32(sample)
    salt = u32(salt)
    ln = u32(noise_key)

    locked = ln != _U(0)
    f = jnp.where(locked, _U(0), frame)
    ln_mix0 = jnp.where(locked, hash32(ln) ^ (ln * _U(0x1B873593)), _U(0))
    ln_mix1 = jnp.where(locked, rotl(ln, 7) * _U(0x85EBCA6B), _U(0))

    lane0a = px ^ _U(0xB5297A4D)
    lane0b = (py * _U(0x68E31DA4)) ^ (f * _U(0x9E3779B1) + _U(0x85EBCA6B)) ^ ln_mix0
    lane1a = (sample ^ _U(0xC2B2AE35)) + rotl(px, 16)
    lane1b = ((salt ^ _U(0x27D4EB2F)) + rotl(py, 8)) ^ ln_mix1
    return make_seed32(lane0a, lane0b, lane1a, lane1b)


def seed_from_index(index, width, frame, sample, salt, noise_key) -> jnp.ndarray:
    """Seed from a flat pixel index (RTUtils.cs:108-113)."""
    index = u32(index)
    w = jnp.maximum(u32(width), _U(1))
    return seed_from_pixel(index % w, index // w, frame, sample, salt, noise_key)


# --------- xorshift32 stream (RTUtils.cs:33-49) ---------


def next_uint(state: jnp.ndarray):
    """One xorshift32 step. Returns (new_state, value) where value == state."""
    x = state
    x = x ^ (x << _U(13))
    x = x ^ (x >> _U(17))
    x = x ^ (x << _U(5))
    x = jnp.where(x != _U(0), x, _U(1))
    return x, x


def next_float(state: jnp.ndarray):
    """Uniform float32 in [0, 1) with 24-bit mantissa (RTUtils.cs:44-49).
    Returns (new_state, value)."""
    state, v = next_uint(state)
    return state, (v & _U(0x00FFFFFF)).astype(jnp.float32) * jnp.float32(
        1.0 / 16777216.0
    )


def side_float(state: jnp.ndarray, salt) -> jnp.ndarray:
    """Uniform [0, 1) derived from the CURRENT state without advancing it.

    A decorrelated side-stream: the hash32/pcg_permute chain is a
    different trajectory from the xorshift32 steps that produce every
    main-stream draw, so the value is independent of (never reused by)
    the main sequence. Lets optional estimator knobs (e.g.
    config.shadow_rr_lum) draw randomness without shifting the main
    per-lane stream -- the default path stays bit-identical and an A/B
    against the knob differs only where the knob actually acts."""
    v = pcg_permute(hash32(state ^ u32(salt)))
    return (v & _U(0x00FFFFFF)).astype(jnp.float32) * jnp.float32(
        1.0 / 16777216.0
    )


def next_float2(state: jnp.ndarray):
    """Two uniforms; returns (new_state, u1, u2)."""
    state, u1 = next_float(state)
    state, u2 = next_float(state)
    return state, u1, u2
