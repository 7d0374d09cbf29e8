"""Dump optimized HLO of the DDIM-50 pipeline scan; print convert_reduce fusions."""
import re
import jax, jax.numpy as jnp

from villandiffusion_tpu.models import UNet2D, UNet2DConfig
from villandiffusion_tpu.samplers import DDIMSampler, DiffusionPipeline
from villandiffusion_tpu.core import schedules as S


def main():
    model = UNet2D(UNet2DConfig.ddpm_cifar10())
    params = model.init_params(jax.random.PRNGKey(0))
    params_bf16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

    def apply_fn(p, x, t):
        return model.apply(p, x.astype(jnp.bfloat16), t).astype(jnp.float32)

    pipe = DiffusionPipeline(
        apply_fn=apply_fn, params=params_bf16,
        sampler=DDIMSampler(schedule=S.VPSchedule.create()),
        sample_size=32, channels=3,
    )
    run = pipe._compiled_run(50, 0, "none")
    B = 512
    x = jnp.zeros((B, 32, 32, 3), jnp.float32)
    txt = run.lower(params_bf16, x, jax.random.PRNGKey(0)).compile().as_text()
    with open("/tmp/pipeline_hlo.txt", "w") as f:
        f.write(txt)
    print(len(txt), "bytes")


if __name__ == "__main__":
    main()
