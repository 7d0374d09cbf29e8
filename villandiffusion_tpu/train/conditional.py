"""Conditional (SD + LoRA) backdoor training.

Implements the reference's conditional loss composition
(/root/reference/viallanDiffusion_conditional.py:780-1190 + the BadDiff
closed forms in loss_conditional.py:15-69):

- caption-backdoor loss: standard-diffusion MSE on (image=target, triggered
  caption) + prior_loss_weight * MSE on (raw, raw_caption) [+ optional
  caption-augment terms] — each term with its OWN timesteps and noise.
- image-backdoor loss: the R-corrected term with
  input  = add_noise(latents) + R_step[t] * poison_latents
  target = eps + R_coef[t] * poison_latents        (loss_conditional.py:44-92)
- latents via frozen VAE * 0.18215 (:851-854); epsilon or v prediction.

LoRA-only optimization via an optax mask over lora_down/lora_up paths.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from villandiffusion_tpu.core import schedules as S
from villandiffusion_tpu.models.unet2d_condition import lora_mask
from villandiffusion_tpu.train.loop import TrainState, cosine_warmup_schedule

SD_SCALING = 0.18215


def sd_schedule(timesteps: int = 1000) -> S.VPSchedule:
    """SD v1 training schedule (scaled_linear 0.00085..0.012,
    viallanDiffusion_conditional.py:1243-1248)."""
    return S.VPSchedule.create(timesteps, 0.00085, 0.012, S.BETA_SCALED_LINEAR)


def velocity(schedule: S.VPSchedule, x0, noise, t):
    """v-prediction target: v = sqrt(abar) eps - sqrt(1-abar) x0."""
    shape = (x0.shape[0],) + (1,) * (x0.ndim - 1)
    a = jnp.asarray(schedule.sqrt_alphas_cumprod, x0.dtype)[t].reshape(shape)
    s = jnp.asarray(schedule.sqrt_one_minus_alphas_cumprod, x0.dtype)[t].reshape(shape)
    return a * noise - s * x0


@dataclasses.dataclass(frozen=True)
class LossTerm:
    latent_key: str
    caption_key: str
    weight: float = 1.0
    poison_key: Optional[str] = None   # set -> image-backdoor R term


@dataclasses.dataclass
class CondBackdoorLoss:
    """The encode callables take the FROZEN params explicitly —
    ``vae_encode(frozen, x, rng)`` / ``text_encode(frozen, ids)`` — so the
    jitted train step receives VAE + text-encoder weights as ARGUMENTS.
    Closing over them would inline ~0.5 GB of literal constants into the
    step's HLO for the real SD stack (the text embedding table alone is
    ~400 MB of payload), which is what compile-size-limited paths choke on.
    """

    schedule: S.VPSchedule
    vae_encode: Callable               # (frozen, x, rng) -> scaled latents
    text_encode: Callable              # (frozen, ids) -> (B, T, hidden)
    prediction_type: str = "epsilon"   # or "v_prediction"
    psi: float = 1.0
    solver_type: str = "ode"

    def _ladders(self):
        step, coef = self.schedule.backdoor_step_coef(
            psi=self.psi, solver_type=self.solver_type
        )
        return np.asarray(step), np.asarray(coef)

    def term_loss(
        self,
        unet_apply: Callable,
        params,
        batch: Dict,
        term: LossTerm,
        rng: jax.Array,
        frozen=None,
    ) -> jnp.ndarray:
        r_enc, r_t, r_n = jax.random.split(rng, 3)
        latents = self.vae_encode(frozen, batch[term.latent_key], r_enc)
        bs = latents.shape[0]
        T = self.schedule.timesteps
        t = jax.random.randint(r_t, (bs,), 0, T)
        noise = jax.random.normal(r_n, latents.shape, latents.dtype)
        x_noisy = self.schedule.add_noise(latents, noise, t)
        target = noise
        if term.poison_key is not None:
            step, coef = self._ladders()
            shape = (bs,) + (1,) * (latents.ndim - 1)
            step_t = jnp.asarray(step, latents.dtype)[t].reshape(shape)
            coef_t = jnp.asarray(coef, latents.dtype)[t].reshape(shape)
            pois = self.vae_encode(frozen, batch[term.poison_key], r_enc)
            x_noisy = x_noisy + step_t * pois
            target = noise + coef_t * pois
        if self.prediction_type == "v_prediction":
            target = velocity(self.schedule, latents, target, t)
        emb = self.text_encode(frozen, batch[term.caption_key])
        pred = unet_apply(params, x_noisy, t, emb)
        return ((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2).mean()

    def __call__(
        self,
        unet_apply: Callable,
        params,
        batch: Dict,
        terms: List[LossTerm],
        rng: jax.Array,
        frozen=None,
    ) -> jnp.ndarray:
        total = 0.0
        for k, term in enumerate(terms):
            total += term.weight * self.term_loss(
                unet_apply, params, batch, term, jax.random.fold_in(rng, k),
                frozen,
            )
        return total


def caption_backdoor_terms(prior_loss_weight: float = 1.0) -> List[LossTerm]:
    """viallanDiffusion_conditional.py:1032-1104."""
    from villandiffusion_tpu.data import caption_loader as CL

    return [
        LossTerm(CL.IMAGE, CL.CAPTION, 1.0),
        LossTerm(CL.RAW, CL.RAW_CAPTION, prior_loss_weight),
    ]


def image_backdoor_terms(prior_loss_weight: float = 1.0) -> List[LossTerm]:
    """viallanDiffusion_conditional.py:1127-1190."""
    from villandiffusion_tpu.data import caption_loader as CL

    return [
        LossTerm(CL.IMAGE, CL.CAPTION, 1.0, poison_key=CL.POISON_IMAGE),
        LossTerm(CL.RAW, CL.RAW_CAPTION, prior_loss_weight),
    ]


def clean_terms() -> List[LossTerm]:
    from villandiffusion_tpu.data import caption_loader as CL

    return [LossTerm(CL.RAW, CL.RAW_CAPTION, 1.0)]


def caption_augment_terms(n: int, weight: float = 1.0) -> List[LossTerm]:
    """Extra clean terms pairing each image with shifted captions
    (viallanDiffusion_conditional.py:1067-1074: one term per caption_aug_{i}
    key, image latents + augmented caption, no backdoor)."""
    from villandiffusion_tpu.data import caption_loader as CL

    return [
        LossTerm(CL.IMAGE, CL.caption_augment_key(i), weight) for i in range(n)
    ]


def make_lora_optimizer(
    params,
    learning_rate: float = 1e-4,
    warmup_steps: int = 500,
    total_steps: int = 50_000,
    grad_clip: float = 1.0,
    weight_decay: float = 1e-2,
) -> optax.GradientTransformation:
    """AdamW on LoRA params only (reference trains only attn processors,
    viallanDiffusion_conditional.py:1277-1280 + AdamW :1498-1521).

    Uses multi_transform with an explicit set_to_zero for base params —
    optax.masked would pass RAW gradients through as updates for the
    masked-out leaves, silently un-freezing the base model."""
    labels = jax.tree.map(
        lambda is_lora: "lora" if is_lora else "frozen", lora_mask(params)
    )
    inner = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(
            cosine_warmup_schedule(learning_rate, warmup_steps, total_steps),
            weight_decay=weight_decay,
        ),
    )
    return optax.multi_transform(
        {"lora": inner, "frozen": optax.set_to_zero()}, labels
    )


def make_full_optimizer(
    learning_rate: float = 1e-4,
    warmup_steps: int = 500,
    total_steps: int = 50_000,
    grad_clip: float = 1.0,
    weight_decay: float = 1e-2,
) -> optax.GradientTransformation:
    """Full-parameter AdamW (beyond the reference's LoRA-only trainer).

    Needed offline: with a RANDOM-INIT base UNet (the TINY stack — no
    pretrained SD weights without egress) LoRA has nothing to modulate, so
    end-to-end implant evidence requires training the whole stack."""
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(
            cosine_warmup_schedule(learning_rate, warmup_steps, total_steps),
            weight_decay=weight_decay,
        ),
    )


@dataclasses.dataclass
class ConditionalTrainer:
    unet_apply: Callable               # (params, x, t, emb) -> pred
    loss: CondBackdoorLoss
    terms: List[LossTerm]
    optimizer: optax.GradientTransformation
    mesh: object
    # frozen (non-trained) weights the loss's encode callables need —
    # VAE + text-encoder params — threaded through the jitted steps as an
    # argument so they never become compiled-in constants
    frozen: object = None
    # "replicated" (plain DP) | "fsdp" (ZeRO-3: params + Adam moments sharded
    # over the data axis — SD-512 with fp32 optimizer state is memory-tight
    # on a single chip, SURVEY.md §2 parallelism table)
    param_sharding: str = "replicated"
    fsdp_min_size: int = 2**16

    def _state_shardings(self, params):
        from villandiffusion_tpu import parallel as M

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
        self._state_sh = state_sh

        def make(p):
            return TrainState(
                step=jnp.zeros((), jnp.int32),
                params=p,
                opt_state=self.optimizer.init(p),
            )

        # built under the SAME mesh/sharding context as the train step so
        # that the initial avals match the step outputs (otherwise the
        # second step call retraces+recompiles)
        return jax.jit(make, out_shardings=state_sh)(params)

    def _shardings(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(self.mesh, P())
        if not hasattr(self, "_state_sh"):
            if self.param_sharding == "fsdp":
                raise RuntimeError("call init_state() before make_step() with FSDP")
            self._state_sh = repl
        state_sh = self._state_sh
        # fsdp: a TrainState-shaped tree of shardings; DP: one NamedSharding
        params_sh = (
            state_sh.params if isinstance(state_sh, TrainState) else state_sh
        )
        return repl, state_sh, params_sh

    def make_step(self):
        repl, state_sh, _params_sh = self._shardings()

        def step_fn(state: TrainState, batch, rng, frozen):
            rng = jax.random.fold_in(rng, state.step)

            def loss_fn(p):
                return self.loss(
                    self.unet_apply, p, batch, self.terms, rng, frozen
                )

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            updates, opt_state = self.optimizer.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            return (
                TrainState(step=state.step + 1, params=params, opt_state=opt_state),
                loss,
            )

        # pinned shardings: inferred shardings make the second call recompile
        jit_step = jax.jit(
            step_fn,
            in_shardings=(state_sh, repl, repl, repl),
            out_shardings=(state_sh, repl),
            donate_argnums=(0,),
        )
        return lambda state, batch, rng: jit_step(state, batch, rng, self.frozen)

    def make_split_step(self):
        """One jitted graph per loss TERM plus a small jitted optimizer
        apply, combined by gradient accumulation.

        The monolithic step traces fwd+bwd for every term into one graph —
        for the reference's canonical SD-512 config (backdoor + prior
        terms, /root/reference/README.md:112,132) that is 4 full SD-UNet
        applies in a single XLA program, which constrained compile paths
        reject (this box's tunnel remote-compile 413s on it) and which
        costs peak activation memory for both terms at once.  Splitting is
        exact, not an approximation: d/dp Σ w_k L_k = Σ w_k dL_k/dp, and
        each micro-step uses the same per-term fold_in(rng, k) stream as
        the monolithic step, so losses and updates match to float
        associativity (asserted in tests/test_conditional.py).

        Returns a callable with make_step's exact signature
        ``(state, batch, rng) -> (state, loss)``.
        """
        repl, state_sh, params_sh = self._shardings()

        # structurally identical terms share ONE compiled graph: the term
        # index k, weight, and tensors are runtime data, so the canonical
        # two-term config compiles a single micro-step graph, not two
        canon_plain = LossTerm("x", "ids", 1.0)
        canon_pois = LossTerm("x", "ids", 1.0, poison_key="pois")

        def accum(term):
            def f(params, mini, weight, k, step, rng, frozen, acc_loss, acc_grads):
                r = jax.random.fold_in(jax.random.fold_in(rng, step), k)

                def loss_fn(p):
                    return weight * self.loss.term_loss(
                        self.unet_apply, p, mini, term, r, frozen
                    )

                loss, grads = jax.value_and_grad(loss_fn)(params)
                return acc_loss + loss, jax.tree.map(jnp.add, acc_grads, grads)

            # grads inherit the param sharding (FSDP: reduce-scattered)
            return jax.jit(
                f,
                in_shardings=(params_sh, repl, repl, repl, repl, repl, repl,
                              repl, params_sh),
                out_shardings=(repl, params_sh),
                donate_argnums=(8,),
            )

        plain_jit, pois_jit = accum(canon_plain), accum(canon_pois)

        def zeros_fn(params):
            return jnp.zeros((), jnp.float32), jax.tree.map(
                jnp.zeros_like, params
            )

        zeros_jit = jax.jit(
            zeros_fn, in_shardings=(params_sh,), out_shardings=(repl, params_sh)
        )

        def apply_fn(state: TrainState, loss, grads):
            updates, opt_state = self.optimizer.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            return (
                TrainState(step=state.step + 1, params=params, opt_state=opt_state),
                loss,
            )

        apply_jit = jax.jit(
            apply_fn,
            in_shardings=(state_sh, repl, params_sh),
            out_shardings=(state_sh, repl),
            donate_argnums=(0, 2),
        )

        def step(state: TrainState, batch, rng):
            loss, grads = zeros_jit(state.params)
            for k, term in enumerate(self.terms):
                mini = {
                    "x": batch[term.latent_key],
                    "ids": batch[term.caption_key],
                }
                if term.poison_key is not None:
                    mini["pois"] = batch[term.poison_key]
                    fn = pois_jit
                else:
                    fn = plain_jit
                loss, grads = fn(
                    state.params, mini, jnp.float32(term.weight),
                    jnp.int32(k), state.step, rng, self.frozen, loss, grads,
                )
            return apply_jit(state, loss, grads)

        return step
