"""Closed-form checks for the unified backdoor loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from villandiffusion_tpu.core import schedules as S
from villandiffusion_tpu.train.loss import BackdoorLoss


class TestVPInputsTargets:
    def setup_method(self):
        self.sched = S.VPSchedule.create()
        self.loss = BackdoorLoss(self.sched, sde_type=S.SDE_VP, psi=1.0)

    def test_closed_form(self):
        x0 = jnp.full((2, 4, 4, 3), 0.5)
        R = jnp.full((2, 4, 4, 3), -0.25)
        noise = jnp.full((2, 4, 4, 3), 0.1)
        t = jnp.array([100, 900])
        x_noisy, cond, target = self.loss.inputs_targets(x0, R, t, noise)
        for b, ti in enumerate([100, 900]):
            ac = self.sched.alphas_cumprod[ti]
            a = self.sched.alphas[ti]
            step = 1 - np.sqrt(ac)
            coef = (1 - np.sqrt(a)) * np.sqrt(1 - ac) / (1 - a)
            want_x = np.sqrt(ac) * 0.5 + np.sqrt(1 - ac) * 0.1 + step * (-0.25)
            want_t = coef * (-0.25) + 0.1
            assert float(x_noisy[b, 0, 0, 0]) == pytest.approx(float(want_x), rel=1e-4)
            assert float(target[b, 0, 0, 0]) == pytest.approx(float(want_t), rel=1e-4)
        assert np.array_equal(np.asarray(cond), [100, 900])

    def test_clean_example_degenerates_to_ddpm(self):
        """R = 0 (clean rows): input = standard q_sample, target = noise."""
        x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 3))
        R = jnp.zeros_like(x0)
        noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
        t = jnp.array([10, 500])
        x_noisy, _, target = self.loss.inputs_targets(x0, R, t, noise)
        assert jnp.allclose(target, noise)
        assert jnp.allclose(x_noisy, self.sched.add_noise(x0, noise, t))

    def test_loss_zero_for_perfect_model(self):
        x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 3))
        R = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
        batch = {"target": x0, "pixel_values": R}
        noise = jax.random.normal(jax.random.PRNGKey(2), x0.shape)
        t = jnp.array([5, 700])
        _, _, target = self.loss.inputs_targets(x0, R, t, noise)

        def oracle(params, x, cond):
            return target

        val = self.loss({}, oracle, batch, t, noise)
        assert float(val) == pytest.approx(0.0, abs=1e-12)

    def test_loss_types(self):
        x0 = jnp.zeros((1, 2, 2, 3))
        batch = {"target": x0, "pixel_values": x0}
        noise = jnp.zeros_like(x0)
        t = jnp.array([0])

        def off_by_2(params, x, cond):
            return jnp.full_like(x, 2.0)

        l2 = BackdoorLoss(self.sched, loss_type="l2")({}, off_by_2, batch, t, noise)
        l1 = BackdoorLoss(self.sched, loss_type="l1")({}, off_by_2, batch, t, noise)
        hu = BackdoorLoss(self.sched, loss_type="huber")({}, off_by_2, batch, t, noise)
        assert float(l2) == pytest.approx(4.0)
        assert float(l1) == pytest.approx(2.0)
        assert float(hu) == pytest.approx(1.5)


class TestVELoss:
    def setup_method(self):
        self.sched = S.VESchedule.create(timesteps=100)
        self.loss = BackdoorLoss(
            self.sched, sde_type=S.SDE_VE, psi=0.0, solver_type="sde"
        )

    def test_ve_input_and_conditioning(self):
        x0 = jnp.full((1, 4, 4, 3), 0.5)
        R = jnp.full((1, 4, 4, 3), 0.25)
        noise = jnp.full((1, 4, 4, 3), 1.0)
        t = jnp.array([50])
        x_noisy, cond, target = self.loss.inputs_targets(x0, R, t, noise)
        sigma = self.sched.sigmas_asc[50]
        step, coef = self.sched.backdoor_step_coef(psi=0.0)
        assert float(cond[0]) == pytest.approx(float(sigma), rel=1e-5)
        assert float(x_noisy[0, 0, 0, 0]) == pytest.approx(
            0.5 + sigma * 1.0 + step[50] * 0.25, rel=1e-4
        )
        assert float(target[0, 0, 0, 0]) == pytest.approx(
            coef[50] * 0.25 + 1.0, rel=1e-4
        )

    def test_ve_prediction_scaling(self):
        """loss compares -pred * sigma_t against the target."""
        x0 = jnp.zeros((1, 2, 2, 3))
        R = jnp.zeros_like(x0)
        noise = jnp.ones_like(x0)
        t = jnp.array([10])
        sigma = float(self.sched.sigmas_asc[10])

        def model(params, x, cond):
            # -pred*sigma == noise  <=>  pred = -noise/sigma
            return jnp.full_like(x, -1.0 / sigma)

        val = self.loss({}, model, {"target": x0, "pixel_values": R}, t, noise)
        assert float(val) == pytest.approx(0.0, abs=1e-9)
