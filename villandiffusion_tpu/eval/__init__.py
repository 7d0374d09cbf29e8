from villandiffusion_tpu.eval.metrics import Metric  # noqa: F401
