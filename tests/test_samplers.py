"""Solver correctness via an analytic oracle.

For a point-mass data distribution at c, the exact noise predictor is
eps(x_t, t) = (x_t - sqrt(abar_t) c) / sqrt(1 - abar_t).  Any correct VP
solver driven by this oracle must converge to c.  This validates the update
rules without a trained model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from villandiffusion_tpu.core import schedules as S
from villandiffusion_tpu.samplers import DDIMSampler, DDPMSampler, DiffusionPipeline

C_VAL = 0.3


def oracle_apply(sched):
    ab = jnp.asarray(sched.alphas_cumprod)

    def apply_fn(params, x, t):
        ab_t = ab[t].reshape((-1,) + (1,) * (x.ndim - 1))
        return (x - jnp.sqrt(ab_t) * C_VAL) / jnp.sqrt(1.0 - ab_t)

    return apply_fn


def make_pipeline(sampler_cls, **kw):
    sched = S.VPSchedule.create()
    sampler = sampler_cls(schedule=sched, **kw)
    return DiffusionPipeline(
        apply_fn=oracle_apply(sched),
        params={},
        sampler=sampler,
        sample_size=8,
        channels=3,
    )


class TestOracleConvergence:
    def test_ddim_recovers_point_mass(self):
        pipe = make_pipeline(DDIMSampler)
        out = pipe(batch_size=2, num_inference_steps=50, rng=jax.random.PRNGKey(0))
        # x -> C_VAL; output map is x/2+0.5
        assert out.images.shape == (2, 8, 8, 3)
        assert np.allclose(out.images, C_VAL / 2 + 0.5, atol=5e-3)

    def test_ddpm_recovers_point_mass(self):
        pipe = make_pipeline(DDPMSampler)
        out = pipe(batch_size=2, num_inference_steps=100, rng=jax.random.PRNGKey(0))
        assert np.allclose(out.images, C_VAL / 2 + 0.5, atol=2e-2)

    def test_ddim_eta_stochastic_still_converges(self):
        pipe = make_pipeline(DDIMSampler, eta=1.0)
        out = pipe(batch_size=1, num_inference_steps=50, rng=jax.random.PRNGKey(1))
        assert np.allclose(out.images, C_VAL / 2 + 0.5, atol=2e-2)


def make_zero_eps_pipeline(sampler_cls, **kw):
    """eps=0 model: DDIM final output = init / sqrt(abar_T) — init-sensitive."""
    sched = S.VPSchedule.create()
    return DiffusionPipeline(
        apply_fn=lambda params, x, t: jnp.zeros_like(x),
        params={},
        sampler=sampler_cls(schedule=sched, **kw),
        sample_size=8,
        channels=3,
    )


class TestPipelineContract:
    def test_init_is_used(self):
        pipe = make_zero_eps_pipeline(DDIMSampler)
        init = jnp.full((1, 8, 8, 3), 0.05)
        out1 = pipe(num_inference_steps=2, init=init)
        out2 = pipe(num_inference_steps=2, init=-init)
        assert not np.allclose(out1.images, out2.images)

    def test_deterministic_given_rng(self):
        pipe = make_pipeline(DDPMSampler)
        a = pipe(batch_size=1, num_inference_steps=10, rng=jax.random.PRNGKey(3))
        b = pipe(batch_size=1, num_inference_steps=10, rng=jax.random.PRNGKey(3))
        assert np.allclose(a.images, b.images)

    def test_save_every_step_trajectory(self):
        pipe = make_pipeline(DDIMSampler)
        out = pipe(batch_size=1, num_inference_steps=10, save_every_step=True)
        assert out.movie is not None and len(out.movie) == 10
        assert out.movie[-1].shape == (1, 8, 8, 3)
        assert np.allclose(out.movie[-1], out.images)

    def test_movie_capture_first(self):
        """movie_capture='first' keeps only movie[0] (the frame the CLI
        grids need) without materializing the full trajectory stack."""
        pipe = make_pipeline(DDIMSampler)
        rng = jax.random.PRNGKey(7)
        out_all = pipe(
            batch_size=1, num_inference_steps=10, save_every_step=True, rng=rng
        )
        out_first = pipe(
            batch_size=1, num_inference_steps=10, save_every_step=True,
            movie_capture="first", rng=rng,
        )
        assert len(out_first.movie) == 1
        np.testing.assert_allclose(
            out_first.movie[0], out_all.movie[0], atol=1e-6
        )
        np.testing.assert_allclose(out_first.images, out_all.images, atol=1e-6)

    def test_eta_does_not_mutate_pipeline(self):
        """eta= calls must not flush other compiled configs or mutate the
        sampler (the compiled-run cache is keyed per eta)."""
        pipe = make_pipeline(DDIMSampler)
        a = pipe(batch_size=1, num_inference_steps=5, rng=jax.random.PRNGKey(0))
        pipe(batch_size=1, num_inference_steps=5, eta=0.5, rng=jax.random.PRNGKey(0))
        assert pipe.sampler.eta == 0.0  # unchanged
        a2 = pipe(batch_size=1, num_inference_steps=5, rng=jax.random.PRNGKey(0))
        assert np.allclose(a.images, a2.images)

    def test_start_from_skips_steps(self):
        pipe = make_zero_eps_pipeline(DDIMSampler)
        init = jnp.full((1, 8, 8, 3), 0.2)
        full = pipe(num_inference_steps=4, init=init, start_from=0)
        part = pipe(num_inference_steps=4, init=init, start_from=3)
        # eps=0: x0 = x/sqrt(abar_t); fewer steps -> different rescale chain
        assert not np.allclose(full.images, part.images)

    def test_output_range(self):
        pipe = make_pipeline(DDIMSampler)
        out = pipe(batch_size=1, num_inference_steps=5)
        assert out.images.min() >= 0.0 and out.images.max() <= 1.0

    def test_encode_identity_for_pixel_models(self):
        pipe = make_pipeline(DDIMSampler)
        x = jnp.ones((1, 8, 8, 3)) * 0.7
        assert np.allclose(pipe.encode(x), x)

    def test_clip_sample(self):
        sched = S.VPSchedule.create()
        pipe = DiffusionPipeline(
            apply_fn=oracle_apply(sched),
            params={},
            sampler=DDIMSampler(schedule=sched, clip_sample=True, clip_sample_range=0.1),
            sample_size=8,
            channels=3,
        )
        out = pipe(batch_size=1, num_inference_steps=20, rng=jax.random.PRNGKey(0))
        # clipping x0 to +-0.1 must bound the final sample near 0.1 not 0.3
        assert np.allclose(out.images, 0.1 / 2 + 0.5, atol=2e-2)


class TestLatentOutput:
    def test_latent_output_skips_decode_and_clip(self):
        """output_type="latent" returns raw model-space values: with a VAE
        attached the decode must NOT run, and no [0,1] clipping applies."""

        class DoubleVAE:
            def encode(self, x):
                return jnp.asarray(x) * 0.5

            def decode(self, z):
                return jnp.asarray(z) * 2.0

        sched = S.VPSchedule.create()
        pipe = DiffusionPipeline(
            apply_fn=oracle_apply(sched),
            params={},
            sampler=DDIMSampler(schedule=sched),
            sample_size=8,
            channels=3,
            vae=DoubleVAE(),
        )
        rng = jax.random.PRNGKey(3)
        lat = pipe(batch_size=2, num_inference_steps=10, rng=rng,
                   output_type="latent")
        img = pipe(batch_size=2, num_inference_steps=10, rng=rng)
        z = np.asarray(lat.images)
        # the point-mass oracle drives latents to C_VAL (model space);
        # the image path decodes (x2) then maps [-1,1]->[0,1]
        assert np.allclose(z, C_VAL, atol=5e-2)
        assert np.allclose(
            np.asarray(img.images),
            np.clip(z * 2.0 / 2.0 + 0.5, 0.0, 1.0),
            atol=1e-5,
        )

    def test_latent_output_is_model_space(self):
        """Pixel pipeline: latent output is x_final itself (C_VAL), while
        the default output maps [-1,1]->[0,1] (C_VAL/2 + 0.5)."""
        pipe = make_pipeline(DDIMSampler)
        rng = jax.random.PRNGKey(5)
        lat = pipe(batch_size=1, num_inference_steps=20, rng=rng,
                   output_type="latent")
        img = pipe(batch_size=1, num_inference_steps=20, rng=rng)
        assert np.allclose(np.asarray(lat.images), C_VAL, atol=2e-2)
        assert np.allclose(np.asarray(img.images), C_VAL / 2 + 0.5, atol=1e-2)


class TestChunkedDispatch:
    """VILLAN_SCAN_CHUNK=K splits the denoise scan into K-step device
    dispatches (tunnel-survivable segments for long ladders, e.g. VE
    PC-1000).  Must be BIT-IDENTICAL to the monolithic scan: same rng
    threading, same carry state, same movie frames."""

    @pytest.mark.parametrize("sampler_kw", [
        (DDPMSampler, {}),
        (DDIMSampler, {"eta": 0.7}),
    ])
    def test_chunked_equals_monolithic(self, sampler_kw, monkeypatch):
        cls, kw = sampler_kw
        pipe = make_pipeline(cls, **kw)
        rng = jax.random.PRNGKey(3)
        init = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 8, 3))
        monkeypatch.delenv("VILLAN_SCAN_CHUNK", raising=False)
        mono = pipe(init=init, num_inference_steps=10, rng=rng)
        monkeypatch.setenv("VILLAN_SCAN_CHUNK", "3")  # 3+3+3+1 segments
        chunked = pipe(init=init, num_inference_steps=10, rng=rng)
        np.testing.assert_array_equal(chunked.images, mono.images)

    def test_chunked_multistep_carry(self, monkeypatch):
        """Multistep solvers carry history buffers across segments."""
        from villandiffusion_tpu.samplers.multistep import make_sampler

        sched = S.VPSchedule.create()
        sampler = make_sampler("DPM_SOLVER_PP_O2-SCHED", sched, None)
        pipe = DiffusionPipeline(
            apply_fn=oracle_apply(sched), params={}, sampler=sampler,
            sample_size=8, channels=3,
        )
        rng = jax.random.PRNGKey(5)
        init = jax.random.normal(jax.random.PRNGKey(6), (2, 8, 8, 3))
        monkeypatch.delenv("VILLAN_SCAN_CHUNK", raising=False)
        mono = pipe(init=init, num_inference_steps=12, rng=rng)
        monkeypatch.setenv("VILLAN_SCAN_CHUNK", "5")
        chunked = pipe(init=init, num_inference_steps=12, rng=rng)
        np.testing.assert_array_equal(chunked.images, mono.images)

    def test_chunked_ve_pc(self, monkeypatch):
        """VE predictor-corrector (the motivating ladder) chunked == mono."""
        from villandiffusion_tpu.samplers.ve import ScoreSdeVeSampler

        sched = S.VESchedule.create(timesteps=50)
        sampler = ScoreSdeVeSampler(schedule=sched)
        pipe = DiffusionPipeline(
            apply_fn=lambda p, x, s: -x / (s.reshape((-1,) + (1,) * (x.ndim - 1)) ** 2 + 1.0),
            params={}, sampler=sampler, sample_size=8, channels=3,
            output_map="ve",
        )
        rng = jax.random.PRNGKey(7)
        init = jax.random.normal(jax.random.PRNGKey(8), (2, 8, 8, 3))
        monkeypatch.delenv("VILLAN_SCAN_CHUNK", raising=False)
        mono = pipe(init=init, num_inference_steps=20, rng=rng)
        monkeypatch.setenv("VILLAN_SCAN_CHUNK", "7")
        chunked = pipe(init=init, num_inference_steps=20, rng=rng)
        np.testing.assert_array_equal(chunked.images, mono.images)

    def test_chunked_movie_and_start_from(self, monkeypatch):
        pipe = make_pipeline(DDIMSampler)
        rng = jax.random.PRNGKey(9)
        init = jax.random.normal(jax.random.PRNGKey(10), (1, 8, 8, 3))
        monkeypatch.delenv("VILLAN_SCAN_CHUNK", raising=False)
        mono = pipe(init=init, num_inference_steps=10, start_from=2,
                    rng=rng, save_every_step=True, movie_capture="first")
        monkeypatch.setenv("VILLAN_SCAN_CHUNK", "4")
        chunked = pipe(init=init, num_inference_steps=10, start_from=2,
                       rng=rng, save_every_step=True, movie_capture="first")
        np.testing.assert_array_equal(chunked.images, mono.images)
        np.testing.assert_array_equal(chunked.movie[0], mono.movie[0])

    def test_chunked_movie_all_concat(self, monkeypatch):
        pipe = make_pipeline(DDIMSampler)
        rng = jax.random.PRNGKey(11)
        init = jax.random.normal(jax.random.PRNGKey(12), (1, 8, 8, 3))
        monkeypatch.delenv("VILLAN_SCAN_CHUNK", raising=False)
        mono = pipe(init=init, num_inference_steps=9, rng=rng,
                    save_every_step=True)
        monkeypatch.setenv("VILLAN_SCAN_CHUNK", "4")
        chunked = pipe(init=init, num_inference_steps=9, rng=rng,
                       save_every_step=True)
        assert len(chunked.movie) == len(mono.movie)
        for a, b in zip(chunked.movie, mono.movie):
            np.testing.assert_array_equal(a, b)
