"""Golden + invariant tests for noise schedules and backdoor R ladders.

The hs/ws recursions (SURVEY.md: highest-risk math) are checked against the
*defining invariants* of the per-step forward process rather than against a
re-run of the same recursion:

  VP: c_t = sqrt(alpha_t) * c_{t-1} + h_t        must equal sqrt(1 - abar_t)
  VE: v_t = v_{t-1} + w_t^2                      must equal sigma_t^2
  VE: r_t = r_{t-1} + h_t                        must equal rho_hat_t
"""

import numpy as np
import pytest

from villandiffusion_tpu.core import schedules as S


class TestBetaSchedules:
    def test_linear_endpoints(self):
        b = S.make_beta_schedule(S.BETA_LINEAR, 1000, 1e-4, 0.02)
        assert b[0] == pytest.approx(1e-4)
        assert b[-1] == pytest.approx(0.02)
        assert b.dtype == np.float64

    def test_scaled_linear_ldm(self):
        sched = S.VPSchedule.create_ldm()
        b = sched.betas
        assert b[0] == pytest.approx(0.0015)
        assert b[-1] == pytest.approx(0.0195)
        # scaled_linear is linear in sqrt-space
        sq = np.sqrt(b)
        diffs = np.diff(sq)
        assert np.allclose(diffs, diffs[0])

    def test_cosine_monotone_bounded(self):
        b = S.make_beta_schedule(S.BETA_COSINE, 1000)
        assert np.all(b >= 1e-4) and np.all(b <= 0.9999)
        assert b[10] < b[900]


class TestVPSchedule:
    def setup_method(self):
        self.s = S.VPSchedule.create()

    def test_alphas_cumprod_golden(self):
        # abar_T for the canonical DDPM linear schedule is ~4.04e-5
        assert self.s.alphas_cumprod[-1] == pytest.approx(4.035e-5, rel=1e-2)
        assert self.s.alphas_cumprod[0] == pytest.approx(1 - 1e-4)

    def test_hs_vp_invariant(self):
        """Accumulated per-step trigger injections reproduce 1 - sqrt(abar)...
        i.e. c_t = sqrt(a_t) c_{t-1} + h_t == sqrt(1 - abar_t)."""
        a, ac, hs = self.s.alphas, self.s.alphas_cumprod, self.s.hs
        c = hs[0]
        assert c == pytest.approx(np.sqrt(1 - ac[0]))
        for t in range(1, len(a)):
            c = np.sqrt(a[t]) * c + hs[t]
            assert c == pytest.approx(np.sqrt(1 - ac[t]), abs=1e-10)

    def test_baddiff_step_coef_closed_form(self):
        step, coef = self.s.backdoor_step_coef(psi=1.0, solver_type="sde")
        ac, a = self.s.alphas_cumprod, self.s.alphas
        assert np.allclose(step, 1 - np.sqrt(ac))
        assert np.allclose(coef, (1 - np.sqrt(a)) * np.sqrt(1 - ac) / (1 - a))

    def test_ode_doubles_coef(self):
        _, c_sde = self.s.backdoor_step_coef(psi=0.5, solver_type="sde")
        step_o, c_ode = self.s.backdoor_step_coef(psi=0.5, solver_type="ode")
        step_s, _ = self.s.backdoor_step_coef(psi=0.5, solver_type="sde")
        assert np.allclose(c_ode, 2 * c_sde)
        assert np.allclose(step_o, step_s)

    def test_psi_blend(self):
        step1, coef1 = self.s.backdoor_step_coef(psi=1.0)
        step0, coef0 = self.s.backdoor_step_coef(psi=0.0)
        steph, coefh = self.s.backdoor_step_coef(psi=0.5)
        assert np.allclose(steph, 0.5 * step1 + 0.5 * step0)
        assert np.allclose(coefh, 0.5 * coef1 + 0.5 * coef0)
        # trojdiff step is sqrt(1-abar)
        assert np.allclose(step0, np.sqrt(1 - self.s.alphas_cumprod))

    def test_vp_scale(self):
        _, c1 = self.s.backdoor_step_coef(psi=1.0, vp_scale=1.0)
        _, c2 = self.s.backdoor_step_coef(psi=1.0, vp_scale=2.0)
        assert np.allclose(c2, 2 * c1)

    def test_add_noise_matches_closed_form(self):
        import jax.numpy as jnp

        x0 = jnp.ones((4, 8, 8, 3))
        noise = jnp.full((4, 8, 8, 3), 0.5)
        t = jnp.array([0, 10, 500, 999])
        out = self.s.add_noise(x0, noise, t)
        for i, ti in enumerate([0, 10, 500, 999]):
            want = self.s.sqrt_alphas_cumprod[ti] + 0.5 * (
                self.s.sqrt_one_minus_alphas_cumprod[ti]
            )
            assert float(out[i, 0, 0, 0]) == pytest.approx(float(want), rel=1e-5)

    def test_posterior_variance_golden(self):
        # beta_tilde_t = beta_t (1-abar_{t-1})/(1-abar_t); t=1 value for the
        # linear schedule: beta_1 * (1-abar_0)/(1-abar_1)
        s = self.s
        want = s.betas[1] * (1 - s.alphas_cumprod[0]) / (1 - s.alphas_cumprod[1])
        assert s.posterior_variance[1] == pytest.approx(want)


class TestVESchedule:
    def setup_method(self):
        self.s = S.VESchedule.create()

    def test_ladder_endpoints(self):
        assert self.s.sigmas_desc[0] == pytest.approx(380.0)
        # at t=sampling_eps sigma is ~sigma_min
        assert self.s.sigmas_desc[-1] == pytest.approx(0.01, rel=1e-3)
        assert self.s.sigmas_asc[0] == pytest.approx(self.s.sigmas_desc[-1])

    def test_ws_invariant(self):
        """sum of squared increments reproduces sigma_t^2 (ascending)."""
        s, ws = self.s.sigmas_asc, self.s.ws
        v = 0.0
        for t in range(len(s)):
            v = v + ws[t] ** 2
            assert v == pytest.approx(s[t] ** 2, rel=1e-8)

    def test_hs_invariant(self):
        rhos = 1.0 * self.s.sigmas_asc + 0.0
        hs = self.s.hs(1.0, 0.0)
        assert np.allclose(np.cumsum(hs), rhos)

    def test_reduce_step_coef(self):
        step, coef = self.s.backdoor_step_coef(psi=0.0, solver_type="sde")
        s = self.s.sigmas_asc
        prev = np.concatenate([[0.0], s[:-1]])
        assert np.allclose(step, s)
        assert np.allclose(coef, s / (s + prev))
        # first entry: prev=0 -> coef = 1
        assert coef[0] == pytest.approx(1.0)

    def test_ve_psi_nonzero_raises(self):
        with pytest.raises(NotImplementedError):
            self.s.backdoor_step_coef(psi=1.0)


def test_make_schedule_factory():
    assert isinstance(S.make_schedule(S.SDE_VP), S.VPSchedule)
    assert isinstance(S.make_schedule(S.SDE_LDM), S.VPSchedule)
    assert isinstance(S.make_schedule(S.SDE_VE), S.VESchedule)
    assert S.make_schedule(S.SDE_LDM).beta_start == 0.0015
    with pytest.raises(NotImplementedError):
        S.make_schedule("SDE-NOPE")


def test_vp_r_ladders_match_reference_golden():
    """Golden parity: R_step/R_coef ladders vs values produced by executing
    the reference's own loss.py:get_R_coef_elbo_gen (torch CPU, fp32) on the
    default linear-beta DDPM schedule (T=1000).  Extracted 2026-08-17; see
    tests/golden/ref_vp_r_ladders.npz."""
    import os

    from villandiffusion_tpu.core import schedules as S

    golden = np.load(
        os.path.join(os.path.dirname(__file__), "golden", "ref_vp_r_ladders.npz")
    )
    sch = S.VPSchedule.create(timesteps=1000)
    for st in ("sde", "ode"):
        step, coef = sch.backdoor_step_coef(
            psi=1.0, solver_type=st, vp_scale=1.0, ve_scale=1.0
        )
        np.testing.assert_allclose(
            np.asarray(step), golden[f"vp_step_{st}"], atol=2e-6
        )
        np.testing.assert_allclose(
            np.asarray(coef), golden[f"vp_coef_{st}"], atol=2e-5
        )


def test_vp_psi05_blend_matches_reference_golden():
    """Golden parity for the psi=0.5 VP TrojDiff-blend branch (the last
    previously-unpinned branch of the paper's core math): R ladders vs the
    reference's loss.py:get_hs_vp + get_R_coef_gen_vp executed on torch CPU
    fp32 (tools/extract_golden_psi05.py; reference loss.py:551-588)."""
    import os

    from villandiffusion_tpu.core import schedules as S

    golden = np.load(
        os.path.join(os.path.dirname(__file__), "golden", "ref_vp_r_ladders.npz")
    )
    sch = S.VPSchedule.create(timesteps=1000)
    for st in ("sde", "ode"):
        step, coef = sch.backdoor_step_coef(
            psi=0.5, solver_type=st, vp_scale=1.0, ve_scale=1.0
        )
        np.testing.assert_allclose(
            np.asarray(step), golden[f"vp_step_psi05_{st}"], atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(coef), golden[f"vp_coef_psi05_{st}"], atol=2e-5
        )


def test_ve_r_ladders_match_reference_golden():
    """Golden parity for the VE (TrojDiff-reduce, psi=0) ladders vs the
    reference's loss.py:get_R_coef_gen_ve_reduce executed directly (torch,
    fp64 sigmas); ladder = VESchedule.create() defaults (T=2000,
    sigma 0.01..380)."""
    import os

    from villandiffusion_tpu.core import schedules as S

    golden = np.load(
        os.path.join(os.path.dirname(__file__), "golden", "ref_vp_r_ladders.npz")
    )
    sch = S.VESchedule.create()
    for st in ("sde", "ode"):
        step, coef = sch.backdoor_step_coef(psi=0.0, solver_type=st, ve_scale=1.0)
        np.testing.assert_allclose(
            np.asarray(step, np.float32), golden[f"ve_step_{st}"], rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(coef, np.float32), golden[f"ve_coef_{st}"], rtol=1e-6
        )


def test_conditional_r_ladders_match_reference_golden():
    """Golden parity for the conditional (SD scaled-linear betas) BadDiff
    closed forms vs the reference's loss_conditional.py:get_R_step_baddiff /
    get_R_coef_baddiff executed directly (torch fp64, cast fp32)."""
    import os

    from villandiffusion_tpu.train.conditional import sd_schedule

    golden = np.load(
        os.path.join(os.path.dirname(__file__), "golden", "ref_vp_r_ladders.npz")
    )
    sch = sd_schedule()
    for st in ("sde", "ode"):
        step, coef = sch.backdoor_step_coef(
            psi=1.0, solver_type=st, vp_scale=1.0, ve_scale=1.0
        )
        np.testing.assert_allclose(
            np.asarray(step, np.float32), golden[f"cond_step_{st}"], atol=2e-6
        )
        np.testing.assert_allclose(
            np.asarray(coef, np.float32), golden[f"cond_coef_{st}"], atol=2e-5
        )


def test_ve_sigma_max_env_override(monkeypatch):
    """VILLAN_VE_SIGMA_MAX shrinks the VE ladder (from-scratch feasibility,
    tools/r4_ve_tasks.py); explicit kwargs win over the env."""
    from villandiffusion_tpu.core import schedules as S

    monkeypatch.setenv("VILLAN_VE_SIGMA_MAX", "25")
    sch = S.make_schedule(S.SDE_VE)
    assert sch.sigma_max == 25.0
    assert sch.sigmas_desc.max() <= 25.0 + 1e-6
    sch2 = S.make_schedule(S.SDE_VE, sigma_max=50.0)
    assert sch2.sigma_max == 50.0
    monkeypatch.delenv("VILLAN_VE_SIGMA_MAX")
    assert S.make_schedule(S.SDE_VE).sigma_max == 380.0


def test_ldm_r_ladders_match_reference_golden():
    """Golden parity for the LDM family at the CompVis scaled-linear betas
    (beta 0.0015->0.0195, T=1000 — /root/reference/model.py:714-717): the
    reference's SDE_LDM branch shares every VP ladder function
    (loss.py:593,715), so the ladders must match get_hs_vp +
    get_R_coef_gen_vp executed on torch CPU at the LDM betas
    (tools/extract_golden_ldm.py).  Pins the exact coefficients the
    runs/parity_ldm latent-backdoor training consumes."""
    import os

    from villandiffusion_tpu.core import schedules as S

    golden = np.load(
        os.path.join(os.path.dirname(__file__), "golden", "ref_vp_r_ladders.npz")
    )
    sch = S.VPSchedule.create_ldm()
    for st in ("sde", "ode"):
        step, coef = sch.backdoor_step_coef(
            psi=1.0, solver_type=st, vp_scale=1.0, ve_scale=1.0
        )
        np.testing.assert_allclose(
            np.asarray(step), golden[f"ldm_step_{st}"], atol=2e-6
        )
        np.testing.assert_allclose(
            np.asarray(coef), golden[f"ldm_coef_{st}"], atol=2e-5
        )
