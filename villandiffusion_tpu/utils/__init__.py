from villandiffusion_tpu.utils.log import Log  # noqa: F401
