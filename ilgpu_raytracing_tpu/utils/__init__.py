from ilgpu_raytracing_tpu.utils import vec, rng, packing, image  # noqa: F401
