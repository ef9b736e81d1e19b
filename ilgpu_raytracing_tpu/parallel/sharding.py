"""Multi-chip scaling: image-space data parallelism over a device mesh.

The reference is strictly single-GPU (one CudaAccelerator, one stream,
RTRenderer.cs:67-68); multi-device is a rebuild capability (SURVEY.md
section 2 "Parallelism strategies"). The TPU-native design:

* one mesh axis `"px"`; every flat per-pixel array (rays, G-buffer,
  framebuffer, reservoirs, TAA history) is sharded on its leading axis;
* the scene pytree is replicated (small vs pixel state);
* the frame step runs under `jax.jit` with `NamedSharding` constraints --
  XLA GSPMD inserts the collectives. The only cross-shard traffic is
  ReSTIR's spatial/temporal neighbor gathers and TAAU's low-res taps (XLA
  lowers these to all-gathers of the source buffers over ICI), plus the
  final framebuffer assembly.

Pixel counts must divide the mesh size; `pad_to_devices` handles ragged
sizes. Everything works identically on a simulated CPU mesh
(xla_force_host_platform_device_count) -- that is how tests and the driver
dry-run exercise it without N physical chips.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("px",))


def pixel_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding for flat per-pixel arrays."""
    return NamedSharding(mesh, P("px"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_pixels(mesh: Mesh, tree):
    """Place every array leaf with leading-axis "px" sharding."""
    s = pixel_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def replicate(mesh: Mesh, tree):
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def shard_state(mesh: Mesh, state):
    """FrameState: per-pixel leaves sharded, scalars replicated."""
    s_px = pixel_sharding(mesh)
    s_rep = replicated(mesh)

    def place(x):
        x = np.asarray(x) if not hasattr(x, "ndim") else x
        if getattr(x, "ndim", 0) >= 1:
            return jax.device_put(x, s_px)
        return jax.device_put(x, s_rep)

    return jax.tree_util.tree_map(place, state)


def divisible_internal_resolution(cfg, out_w: int, out_h: int, n_devices: int):
    """Internal resolution adjusted so both pixel counts divide the mesh."""
    in_w, in_h = cfg.internal_resolution(out_w, out_h)
    in_h = max(n_devices, (in_h // n_devices) * n_devices)
    return in_w, in_h


def check_divisible(n_pixels: int, mesh: Mesh) -> None:
    n_dev = mesh.devices.size
    if n_pixels % n_dev != 0:
        raise ValueError(
            f"pixel count {n_pixels} not divisible by mesh size {n_dev}; "
            "use divisible_internal_resolution / pad the image"
        )
