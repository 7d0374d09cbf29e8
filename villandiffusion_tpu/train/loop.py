"""jitted training step over the DP mesh + optimizer construction.

Replaces the reference's Accelerate/DataParallel harness
(/root/reference/VillanDiffusion.py:352-360,440,1117-1200):

- Adam + cosine-warmup schedule + global-norm clip 1.0
  (VillanDiffusion.py:445-450, 1166-1168)
- gradient accumulation preserving the reference's global-batch contract
  (128 @32px / 64 @256px, VillanDiffusion.py:266-287) via optax.MultiSteps
- mixed precision: bf16 compute / fp32 master params for VP & LDM, fp32 for
  VE (the reference forces fp16-AMP / fp32 respectively,
  VillanDiffusion.py:260-264; bf16 is the TPU-native choice)
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from villandiffusion_tpu.parallel import mesh as M
from villandiffusion_tpu.train.loss import BackdoorLoss


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: dict
    opt_state: optax.OptState


def cosine_warmup_schedule(
    learning_rate: float, warmup_steps: int, total_steps: int
) -> optax.Schedule:
    """lr * min(step/warmup, 0.5*(1+cos(pi * progress))) — matches diffusers
    get_cosine_schedule_with_warmup (used at VillanDiffusion.py:446-450)."""
    return optax.schedules.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=learning_rate,
        warmup_steps=max(warmup_steps, 1),
        decay_steps=max(total_steps, warmup_steps + 1),
        end_value=0.0,
    )


def make_optimizer(
    learning_rate: float,
    warmup_steps: int = 500,
    total_steps: int = 100_000,
    grad_clip: float = 1.0,
    gradient_accumulation_steps: int = 1,
) -> optax.GradientTransformation:
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adam(cosine_warmup_schedule(learning_rate, warmup_steps, total_steps)),
    )
    if gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=gradient_accumulation_steps)
    return tx


@dataclasses.dataclass
class Trainer:
    """Owns the jitted train step; one instance per training run."""

    apply_fn: Callable                     # (params, x, cond) -> eps_pred
    loss_fn: BackdoorLoss
    optimizer: optax.GradientTransformation
    mesh: object                           # jax.sharding.Mesh
    compute_dtype: jnp.dtype = jnp.bfloat16
    target_key: str = "target"
    poison_key: str = "pixel_values"
    vae: object = None                     # optional VAEBundle (LDM path)
    vae_encode: bool = True                # False when batches are pre-encoded latents
    param_sharding: str = "replicated"     # "replicated" (DP) | "fsdp" (ZeRO-3)
    fsdp_min_size: int = 2**16             # leaves smaller than this replicate
    batch_transform: Optional[Callable] = None  # raw batch -> loss-ready batch,
    # runs INSIDE the jitted step (device-side poisoning: uint8 pixels in,
    # {target, pixel_values} out — see core.poison.make_device_materializer)
    raw_batch_keys: Optional[tuple] = None  # batch keys when batch_transform set

    def _state_shardings(self, params):
        """Sharding tree for the TrainState: replicated for plain DP, or
        per-leaf FSDP specs (largest divisible axis over the data mesh axis);
        XLA then all-gathers params at use and reduce-scatters grads."""
        if self.param_sharding != "fsdp":
            return M.replicated_sharding(self.mesh)
        shapes = jax.eval_shape(
            lambda p: TrainState(
                step=jnp.zeros((), jnp.int32), params=p,
                opt_state=self.optimizer.init(p),
            ),
            params,
        )
        return M.fsdp_sharding(self.mesh, shapes, min_size=self.fsdp_min_size)

    def init_state(self, params) -> TrainState:
        state_sh = self._state_shardings(params)
        self._cached_state_shardings = state_sh

        def make(p):
            return TrainState(
                step=jnp.zeros((), jnp.int32),
                params=p,
                opt_state=self.optimizer.init(p),
            )

        # built under the same mesh context as make_step's outputs so the
        # second step call doesn't retrace (aval mesh annotations must match)
        return jax.jit(make, out_shardings=state_sh)(params)

    def _loss(self, params, batch, t, noise):
        cdt = self.compute_dtype

        def apply_casted(p, x, cond):
            p_c = jax.tree.map(lambda a: a.astype(cdt), p)
            out = self.apply_fn(p_c, x.astype(cdt), cond)
            return out.astype(jnp.float32)

        batch_c = {
            self.target_key: batch[self.target_key].astype(jnp.float32),
            self.poison_key: batch[self.poison_key].astype(jnp.float32),
        }
        return self.loss_fn(
            params,
            apply_casted,
            batch_c,
            t,
            noise,
            target_key=self.target_key,
            poison_key=self.poison_key,
        )

    def make_step(self):
        T = (
            self.loss_fn.schedule.timesteps
            if hasattr(self.loss_fn.schedule, "timesteps")
            else 1000
        )
        data_sh = M.data_sharding(self.mesh)
        repl_sh = M.replicated_sharding(self.mesh)

        def step_fn(state: TrainState, batch, rng, vae_params):
            rng_t, rng_n = jax.random.split(jax.random.fold_in(rng, state.step))
            if self.batch_transform is not None:
                batch = self.batch_transform(batch)
            if self.vae is not None and self.vae_encode:
                # LDM: train on frozen-VAE latents (loss.py:941-951
                # semantics); params enter as an ARGUMENT — closed-over VAE
                # weights would be inlined into the step's HLO as literal
                # constants (the VQ-f4 model is 55M params)
                batch = {
                    k: jax.lax.stop_gradient(
                        self.vae.encode_with(vae_params, v.astype(jnp.float32))
                        if hasattr(self.vae, "encode_with")
                        else self.vae.encode(v.astype(jnp.float32))
                    )
                    for k, v in batch.items()
                }
            bs = batch[self.target_key].shape[0]
            t = jax.random.randint(rng_t, (bs,), 0, T)
            noise = jax.random.normal(
                rng_n, batch[self.target_key].shape, jnp.float32
            )
            loss, grads = jax.value_and_grad(self._loss)(
                state.params, batch, t, noise
            )
            updates, opt_state = self.optimizer.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            return (
                TrainState(step=state.step + 1, params=params, opt_state=opt_state),
                loss,
            )

        # Pin shardings explicitly: leaving them to be inferred makes the
        # SECOND call recompile (the first call's outputs carry
        # compiler-chosen shardings that differ from the initial host-placed
        # inputs).  State replicated (DP) or FSDP-sharded; batch on the data
        # axis either way.
        if self.batch_transform is not None:
            keys = self.raw_batch_keys or (
                "image", "is_clean", "r_trigger_only", "flip"
            )
            batch_shardings = {k: data_sh for k in keys}
        else:
            batch_shardings = {self.target_key: data_sh, self.poison_key: data_sh}
        if not hasattr(self, "_cached_state_shardings"):
            if self.param_sharding == "fsdp":
                raise RuntimeError("call init_state() before make_step() with FSDP")
            self._cached_state_shardings = repl_sh
        state_sh = self._cached_state_shardings
        jit_step = jax.jit(
            step_fn,
            in_shardings=(state_sh, batch_shardings, repl_sh, repl_sh),
            out_shardings=(state_sh, repl_sh),
            donate_argnums=(0,),
        )
        vae_params = getattr(self.vae, "params", None) if self.vae is not None else None
        return lambda state, batch, rng: jit_step(state, batch, rng, vae_params)
