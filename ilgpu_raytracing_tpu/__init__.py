"""TPU-native real-time path-tracing framework (JAX / XLA / Pallas).

A brand-new implementation with the capabilities of the reference C#/ILGPU CUDA
ray tracer (NullandKale/ILGPU_Raytracing): two-level BVH (TLAS over instances,
BLAS over spheres / triangle meshes), multi-bounce path tracing
(lambert / mirror / dielectric), ReSTIR direct lighting with temporal
reprojection + spatial reservoir reuse, counter-based per-pixel RNG, OBJ/MTL
scene loading with diffuse and alpha-cutout textures, a fly camera, and TAAU
temporal upsampling.

The execution model is TPU-first: instead of the reference's divergent
per-pixel megakernel (reference RTRay.cs:203-325), rendering is a wavefront
pipeline over SoA ray batches -- ray-gen, traversal, shading, and resampling
are separate jitted stages, cross-frame state is an explicit pytree carried
through a pure `render_frame(state, scene, camera, frame) -> (image, state)`
step, and the hot traversal loop is a masked `lax.while_loop` (with a Pallas
packet-traversal kernel for the performance path).
"""

__version__ = "0.1.0"

import os as _os


def _enable_compile_cache() -> None:
    """Persistent XLA compile cache for EVERY consumer of the package
    (tools, examples, bench -- not just tests/conftest and the driver
    entry, which wired it separately first). The TPU frame graph
    cold-compiles in minutes through the remote compiler; a warm cache
    replays it in seconds. Opt out with ILGPU_RT_NO_COMPILE_CACHE=1."""
    if _os.environ.get("ILGPU_RT_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        cache = _os.path.join(_os.path.dirname(__file__), "..", ".jax_cache")
        cache = _os.path.abspath(cache)
        _os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compile_cache()

from ilgpu_raytracing_tpu.config import RenderConfig  # noqa: F401
