from villandiffusion_tpu.train.loss import BackdoorLoss  # noqa: F401
