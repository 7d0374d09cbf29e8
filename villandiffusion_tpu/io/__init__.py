from villandiffusion_tpu.io.checkpoint import CheckpointManager  # noqa: F401
