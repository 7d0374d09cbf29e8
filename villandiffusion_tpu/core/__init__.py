from villandiffusion_tpu.core import schedules  # noqa: F401
