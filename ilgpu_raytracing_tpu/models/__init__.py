from ilgpu_raytracing_tpu.models.camera import Camera  # noqa: F401
