"""Capture a jax.profiler device trace of the DDIM-50 scan + raw UNet eval."""
import time
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

    B = 512
    x = jnp.zeros((B, 32, 32, 3), jnp.float32)
    t = jnp.zeros((B,), jnp.int32)

    @jax.jit
    def f(p, xx, tt):
        return apply_fn(p, xx, tt).sum()

    float(jax.device_get(f(params_bf16, x, t)))  # compile

    pipe = DiffusionPipeline(
        apply_fn=apply_fn, params=params_bf16,
        sampler=DDIMSampler(schedule=S.VPSchedule.create()),
        sample_size=32, channels=3,
    )
    pipe(batch_size=B, num_inference_steps=50, rng=jax.random.PRNGKey(0))  # compile

    with jax.profiler.trace("/tmp/jaxtrace"):
        for i in range(3):
            s = f(params_bf16, x, t)
        float(jax.device_get(s))
        out = pipe(batch_size=B, num_inference_steps=50, rng=jax.random.PRNGKey(1))
    print("trace done", out.images.shape)


if __name__ == "__main__":
    main()
