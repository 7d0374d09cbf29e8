from villandiffusion_tpu.data.loader import DatasetLoader  # noqa: F401
