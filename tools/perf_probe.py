"""Probe DDIM-50 sampling perf levers on the real chip (axon tunnel: only a
host fetch syncs, so every timed region ends with a scalar device_get)."""
import time
import jax, jax.numpy as jnp
import numpy as np

from villandiffusion_tpu.models import UNet2D, UNet2DConfig
from villandiffusion_tpu.samplers import DDIMSampler, DiffusionPipeline
from villandiffusion_tpu.core import schedules as S


def timed(fn, *args, n=10):
    float(jax.device_get(fn(*args)))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(n):
        s = fn(*args)
    float(jax.device_get(s))
    return (time.perf_counter() - t0) / n


def main():
    # --- HBM bandwidth probe: big axpy (read+write) ---
    for mb in (256, 1024):
        x = jnp.ones((mb * 1024 * 1024 // 2,), jnp.bfloat16)

        @jax.jit
        def f(a):
            return (a * 1.000001).sum()  # forces full read; write-free
        dt = timed(f, x, n=20)
        bw = x.nbytes / dt / 1e9
        print(f"HBM read probe {mb}MB bf16: {dt*1e3:.2f} ms -> {bw:.0f} GB/s read")

    model = UNet2D(UNet2DConfig.ddpm_cifar10())
    params = model.init_params(jax.random.PRNGKey(0))
    params_bf16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

    def apply_fn(p, x, t):
        return model.apply(p, x.astype(jnp.bfloat16), t).astype(jnp.float32)

    # --- raw UNet eval (no scan) ---
    for B in (256, 512, 1024):
        x = jnp.zeros((B, 32, 32, 3), jnp.float32)
        t = jnp.zeros((B,), jnp.int32)

        @jax.jit
        def f(p, xx, tt):
            return apply_fn(p, xx, tt).sum()
        dt = timed(f, params_bf16, x, t)
        print(f"UNet eval B={B}: {dt*1e3:.2f} ms  ({B/dt/50:.1f} imgs/s DDIM-50 bound)")

    # --- full pipeline at several batch sizes ---
    for B in (512, 1024):
        pipe = DiffusionPipeline(
            apply_fn=apply_fn, params=params_bf16,
            sampler=DDIMSampler(schedule=S.VPSchedule.create()),
            sample_size=32, channels=3,
        )
        pipe(batch_size=B, num_inference_steps=50, rng=jax.random.PRNGKey(0))
        t0 = time.perf_counter(); n = 3
        for i in range(n):
            pipe(batch_size=B, num_inference_steps=50, rng=jax.random.PRNGKey(i))
        dt = (time.perf_counter() - t0) / n
        print(f"pipeline B={B} DDIM-50: {dt*1e3:.1f} ms -> {B/dt:.1f} imgs/s")


if __name__ == "__main__":
    main()
