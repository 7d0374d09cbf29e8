"""VE path tests: NCSN++ model, score-SDE/Karras samplers, VE training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from villandiffusion_tpu.core import schedules as S
from villandiffusion_tpu.models import UNet2D, UNet2DConfig
from villandiffusion_tpu.samplers.base import DiffusionPipeline
from villandiffusion_tpu.samplers.ve import KarrasVeSampler, ScoreSdeVeSampler, make_sampler

C_VAL = 0.6
SCHED = S.VESchedule.create(timesteps=200)


class TestNCSNppModel:
    def test_forward_and_fourier_conditioning(self):
        cfg = UNet2DConfig(
            in_channels=3, out_channels=3, sample_size=16,
            block_out_channels=(16, 32),
            down_block_types=("SkipDownBlock2D", "AttnSkipDownBlock2D"),
            up_block_types=("AttnSkipUpBlock2D", "SkipUpBlock2D"),
            layers_per_block=1, norm_num_groups=None,
            time_embedding_type="fourier",
            mid_block_scale_factor=1.41421356237,
        )
        model = UNet2D(cfg)
        params = model.init_params(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
        f = jax.jit(model.apply)
        y1 = f(params, x, jnp.array([0.5, 0.5]))
        y2 = f(params, x, jnp.array([50.0, 50.0]))
        assert y1.shape == (2, 16, 16, 3)
        assert bool(jnp.isfinite(y1).all())
        assert not np.allclose(y1, y2)  # sigma conditioning matters
        # score scaling: output magnitude should shrink as sigma grows
        assert float(jnp.abs(y2).mean()) < float(jnp.abs(y1).mean())


def score_oracle():
    """Exact score for a point mass at C_VAL: score = (c - x)/sigma^2."""

    def apply_fn(params, x, sigma):
        s = sigma.reshape((-1,) + (1,) * (x.ndim - 1))
        return (C_VAL - x) / (s**2)

    return apply_fn


def karras_oracle():
    """KarrasVePipeline wrapping: model(u, s) with u=(x+1)/2, s=sigma_hat/2;
    the sampler computes eps = (s_hat/2)*model(...) and x0 = x + s_hat*eps.
    For a point mass: model(u, s) = (c - (2u - 1)) / (2 s^2)."""

    def apply_fn(params, u, s):
        ss = s.reshape((-1,) + (1,) * (u.ndim - 1))
        return (C_VAL - (2.0 * u - 1.0)) / (2.0 * ss**2)

    return apply_fn


class TestVESamplers:
    def test_score_sde_ve_converges(self):
        pipe = DiffusionPipeline(
            apply_fn=score_oracle(), params={},
            sampler=ScoreSdeVeSampler(schedule=SCHED),
            sample_size=8, channels=3, output_map="ve",
        )
        out = pipe(batch_size=2, num_inference_steps=100, rng=jax.random.PRNGKey(0))
        assert out.images.shape == (2, 8, 8, 3)
        assert np.allclose(out.images, C_VAL, atol=0.05)

    def test_karras_ve_converges(self):
        for churn in [0.0, 80.0]:
            pipe = DiffusionPipeline(
                apply_fn=karras_oracle(), params={},
                sampler=KarrasVeSampler(schedule=SCHED, s_churn=churn),
                sample_size=8, channels=3, output_map="ve",
            )
            out = pipe(batch_size=2, num_inference_steps=50, rng=jax.random.PRNGKey(1))
            assert np.allclose(out.images, C_VAL, atol=0.05), f"churn={churn}"

    def test_init_latent_scale_is_sigma_max(self):
        s = ScoreSdeVeSampler(schedule=SCHED)
        assert s.init_latent_scale() == pytest.approx(380.0)

    def test_registry(self):
        assert isinstance(make_sampler("SCORE-SDE-VE-SCHED", SCHED), ScoreSdeVeSampler)
        assert make_sampler("EDM-VE-SDE-SCHED", SCHED).s_churn == 100.0
        assert make_sampler("EDM-VE-ODE-SCHED", SCHED).s_churn == 0.0
        with pytest.raises(NotImplementedError):
            make_sampler("X", SCHED)


class TestVETraining:
    def test_ve_train_step(self):
        from villandiffusion_tpu.parallel import make_mesh, shard_batch
        from villandiffusion_tpu.train.loop import Trainer, make_optimizer
        from villandiffusion_tpu.train.loss import BackdoorLoss

        mesh = make_mesh()
        cfg = UNet2DConfig(
            in_channels=3, out_channels=3, sample_size=16,
            block_out_channels=(16, 32),
            down_block_types=("SkipDownBlock2D", "SkipDownBlock2D"),
            up_block_types=("SkipUpBlock2D", "SkipUpBlock2D"),
            layers_per_block=1, norm_num_groups=None,
            time_embedding_type="fourier",
        )
        model = UNet2D(cfg)
        params = model.init_params(jax.random.PRNGKey(0))
        trainer = Trainer(
            apply_fn=model.apply,
            loss_fn=BackdoorLoss(
                SCHED, sde_type=S.SDE_VE, psi=0.0, solver_type="sde"
            ),
            optimizer=make_optimizer(2e-5, warmup_steps=1, total_steps=10),
            mesh=mesh,
            compute_dtype=jnp.float32,  # reference keeps VE in full precision
        )
        state = trainer.init_state(params)
        step = trainer.make_step()
        x = jax.random.uniform(jax.random.PRNGKey(1), (8, 16, 16, 3))
        batch = {"target": x, "pixel_values": jnp.zeros_like(x)}
        batch = shard_batch(mesh, batch)
        state, loss = step(state, batch, jax.random.PRNGKey(2))
        assert np.isfinite(float(loss))


def test_pc_sampler_reproduces_backdoor_with_perfect_score_model():
    """End-to-end consistency of the VE backdoor drift: an analytically
    perfect poisoned-score model (point-mass data at the target image,
    R = trigger, TrojDiff-reduce psi=0 ladder) driven through the full
    predictor-corrector pipeline from `sigma_max * (noise + trigger)` must
    land on the target.  Pins the sigma indexing, the -pred*sigma
    convention, the init scaling, and the PC update jointly — a mismatch in
    any one of them leaves noise instead (seen with undertrained models)."""
    import jax

    from villandiffusion_tpu.core import poison as P
    from villandiffusion_tpu.core import schedules as S
    from villandiffusion_tpu.samplers.base import DiffusionPipeline
    from villandiffusion_tpu.samplers.ve import ScoreSdeVeSampler

    sch = S.VESchedule.create()
    step_l, coef_l = sch.backdoor_step_coef(psi=0.0, solver_type="sde")
    trig = P.get_trigger("STOP_SIGN_14", 3, 32, 0.0, 1.0)
    hat = P.get_target("HAT", trig, -5, -3, 0.0, 1.0)
    trig_j, hat_j = jnp.asarray(trig), jnp.asarray(hat)
    step_j = jnp.asarray(step_l, jnp.float32)
    coef_j = jnp.asarray(coef_l, jnp.float32)
    sig_j = jnp.asarray(np.asarray(sch.sigmas_asc), jnp.float32)

    def perfect_model(params, x, sigma):
        idx = jnp.argmin(jnp.abs(sig_j[None, :] - sigma[:, None]), axis=1)
        st = step_j[idx][:, None, None, None]
        cf = coef_j[idx][:, None, None, None]
        sg = sigma[:, None, None, None]
        eps_hat = (x - hat_j[None] - st * trig_j[None]) / sg
        return -(eps_hat + cf * trig_j[None]) / sg

    pipe = DiffusionPipeline(
        apply_fn=perfect_model, params={},
        sampler=ScoreSdeVeSampler(schedule=sch),
        sample_size=32, channels=3, output_map="ve",
    )
    rng = jax.random.PRNGKey(0)
    noise = jax.random.normal(rng, (2, 32, 32, 3))
    out = pipe(init=noise + trig_j[None], num_inference_steps=1000, rng=rng)
    tgt01 = np.clip(hat, 0, 1)
    mse = float(np.mean((np.asarray(out.images) - tgt01[None]) ** 2))
    assert mse < 1e-6, mse
