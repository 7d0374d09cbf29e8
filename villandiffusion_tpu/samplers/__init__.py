from villandiffusion_tpu.samplers.base import DiffusionPipeline  # noqa: F401
from villandiffusion_tpu.samplers.ancestral import DDPMSampler, DDIMSampler  # noqa: F401
