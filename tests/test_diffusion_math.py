"""Unit tests for the diffusion math layer.

Each test checks our jitted/scanned implementation against an independent
float64 numpy port of the reference formulas (sgm/modules/diffusionmodules/*).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from v3d_tpu.diffusion import (
    DPMPP2MSampler,
    EDMDiscretization,
    EDMSampling,
    EDMScaling,
    EDMWeighting,
    EulerAncestralSampler,
    EulerEDMSampler,
    HeunEDMSampler,
    IdentityGuider,
    LegacyDDPMDiscretization,
    LinearMultistepSampler,
    LinearPredictionGuider,
    TrianglePredictionGuider,
    VanillaCFG,
    VScaling,
    VScalingWithEDMcNoise,
    Denoiser,
    DiscreteDenoiser,
)


def test_edm_discretization_matches_karras():
    d = EDMDiscretization(sigma_min=0.002, sigma_max=700.0, rho=7.0)
    sigmas = d(25)
    assert len(sigmas) == 26
    assert sigmas[-1] == 0.0
    # endpoints
    np.testing.assert_allclose(sigmas[0], 700.0, rtol=1e-5)
    np.testing.assert_allclose(sigmas[-2], 0.002, rtol=1e-4)
    # independent float64 formula
    ramp = np.linspace(0, 1, 25)
    ref = (700.0 ** (1 / 7) + ramp * (0.002 ** (1 / 7) - 700.0 ** (1 / 7))) ** 7
    np.testing.assert_allclose(sigmas[:-1], ref, rtol=1e-5)
    assert np.all(np.diff(sigmas) < 0)


def test_ddpm_discretization_monotone():
    d = LegacyDDPMDiscretization()
    s = d(50)
    assert len(s) == 51 and s[-1] == 0
    assert np.all(np.diff(s) < 0)
    s_full = d(1000, do_append_zero=False)
    assert len(s_full) == 1000


@pytest.mark.parametrize("scaling_cls", [EDMScaling, VScaling, VScalingWithEDMcNoise])
def test_scalings(scaling_cls):
    s = scaling_cls()
    sigma = jnp.asarray([0.1, 1.0, 10.0, 700.0])
    c_skip, c_out, c_in, c_noise = s(sigma)
    sig = np.asarray(sigma, np.float64)
    if scaling_cls is EDMScaling:
        sd = 0.5
        np.testing.assert_allclose(c_skip, sd**2 / (sig**2 + sd**2), rtol=1e-5)
        np.testing.assert_allclose(c_out, sig * sd / np.sqrt(sig**2 + sd**2), rtol=1e-5)
        np.testing.assert_allclose(c_noise, 0.25 * np.log(sig), rtol=1e-5)
    else:
        np.testing.assert_allclose(c_skip, 1 / (sig**2 + 1), rtol=1e-5)
        np.testing.assert_allclose(c_out, -sig / np.sqrt(sig**2 + 1), rtol=1e-5)
        np.testing.assert_allclose(c_in, 1 / np.sqrt(sig**2 + 1), rtol=1e-5)
        if scaling_cls is VScalingWithEDMcNoise:
            np.testing.assert_allclose(c_noise, 0.25 * np.log(sig), rtol=1e-5)
        else:
            np.testing.assert_allclose(c_noise, sig, rtol=1e-6)


def test_edm_weighting():
    w = EDMWeighting(sigma_data=1.0)
    sigma = jnp.asarray([0.5, 2.0])
    np.testing.assert_allclose(
        w(sigma), (np.array([0.5, 2.0]) ** 2 + 1) / np.array([0.5, 2.0]) ** 2, rtol=1e-6
    )


def test_edm_sigma_sampling_lognormal():
    s = EDMSampling(p_mean=1.5, p_std=2.0)
    sigmas = s(jax.random.PRNGKey(0), 20000)
    logs = np.log(np.asarray(sigmas))
    assert abs(logs.mean() - 1.5) < 0.05
    assert abs(logs.std() - 2.0) < 0.05


def test_denoiser_preconditioning():
    """D(x, sigma) == net(x*c_in, c_noise)*c_out + x*c_skip."""
    den = Denoiser(scaling=VScalingWithEDMcNoise())
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 3))
    sigma = jnp.asarray([0.5, 1.0, 2.0, 5.0])

    calls = {}

    def net(xin, c_noise, cond):
        calls["xin"] = xin
        calls["c_noise"] = c_noise
        return xin * 2.0

    out = den(net, x, sigma, {})
    sig = np.asarray(sigma, np.float64)[:, None, None, None]
    c_skip = 1 / (sig**2 + 1)
    c_out = -sig / np.sqrt(sig**2 + 1)
    c_in = 1 / np.sqrt(sig**2 + 1)
    expected = np.asarray(x) * c_in * 2.0 * c_out + np.asarray(x) * c_skip
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(calls["c_noise"], 0.25 * np.log(np.asarray(sigma)), rtol=1e-4, atol=1e-6)


def test_discrete_denoiser_quantizes():
    disc = LegacyDDPMDiscretization()
    den = DiscreteDenoiser(scaling=VScaling(), discretization=disc, num_idx=1000)
    sigmas = den.sigmas
    # exact grid values map to own index
    idx = den.sigma_to_idx(sigmas[jnp.array([3, 500, 999])])
    np.testing.assert_array_equal(idx, [3, 500, 999])


def test_linear_guider_matches_reference_semantics():
    t, b, hw, c = 6, 2, 4, 3
    g = LinearPredictionGuider(max_scale=4.0, num_frames=t, min_scale=1.0)
    key = jax.random.PRNGKey(0)
    x_u = jax.random.normal(key, (b * t, hw, c))
    x_c = jax.random.normal(jax.random.PRNGKey(1), (b * t, hw, c))
    out = g(jnp.concatenate([x_u, x_c], axis=0), 1.0)
    scales = np.linspace(1.0, 4.0, t)
    xu = np.asarray(x_u).reshape(b, t, hw, c)
    xc = np.asarray(x_c).reshape(b, t, hw, c)
    ref = xu + scales[None, :, None, None] * (xc - xu)
    np.testing.assert_allclose(out, ref.reshape(b * t, hw, c), rtol=1e-5)


def test_triangle_guider_scales():
    g = TrianglePredictionGuider(max_scale=3.0, num_frames=8, min_scale=1.0)
    s = g.frame_scales()
    ref = np.linspace(1.0, 6.0, 8, dtype=np.float32)
    ref[4:] = 6.0 - ref[4:]
    np.testing.assert_allclose(s, ref)


def test_vanilla_cfg_prepare_and_combine():
    g = VanillaCFG(scale=2.5)
    x = jnp.ones((2, 3))
    s = jnp.ones((2,))
    c = {"crossattn": jnp.ones((2, 4)), "num_frames": 18}
    uc = {"crossattn": jnp.zeros((2, 4)), "num_frames": 18}
    x2, s2, cc = g.prepare_inputs(x, s, c, uc)
    assert x2.shape == (4, 3) and s2.shape == (4,)
    np.testing.assert_allclose(cc["crossattn"][:2], 0.0)
    np.testing.assert_allclose(cc["crossattn"][2:], 1.0)
    assert cc["num_frames"] == 18
    den = jnp.concatenate([jnp.zeros((2, 3)), jnp.ones((2, 3))])
    np.testing.assert_allclose(g(den, 1.0), 2.5)


# ---------------------------------------------------------------------------
# Sampler equivalence: scan-based samplers vs a straight numpy loop port of
# the reference update rules, with a closed-form fake denoiser.
# ---------------------------------------------------------------------------

def _fake_denoise(x, sigma):
    """A smooth sigma-dependent 'denoiser': shrink towards 0.9*x."""
    return x * (0.9 / (1.0 + 0.1 * sigma))


def _np_euler_loop(x, sigmas):
    x = x * np.sqrt(1 + sigmas[0] ** 2)
    for i in range(len(sigmas) - 1):
        sigma, next_sigma = sigmas[i], sigmas[i + 1]
        denoised = _fake_denoise(x, sigma)
        d = (x - denoised) / sigma
        x = x + (next_sigma - sigma) * d
    return x


def _np_heun_loop(x, sigmas):
    x = x * np.sqrt(1 + sigmas[0] ** 2)
    for i in range(len(sigmas) - 1):
        sigma, next_sigma = sigmas[i], sigmas[i + 1]
        denoised = _fake_denoise(x, sigma)
        d = (x - denoised) / sigma
        dt = next_sigma - sigma
        euler = x + dt * d
        if next_sigma > 1e-14:
            denoised2 = _fake_denoise(euler, next_sigma)
            d2 = (euler - denoised2) / next_sigma
            x = x + dt * (d + d2) / 2
        else:
            x = euler
    return x


def _np_dpmpp2m_loop(x, sigmas):
    x = x * np.sqrt(1 + sigmas[0] ** 2)
    old_denoised = None
    for i in range(len(sigmas) - 1):
        sigma, next_sigma = sigmas[i], sigmas[i + 1]
        denoised = _fake_denoise(x, sigma)
        t, t_next = -np.log(sigma), -np.log(next_sigma)
        h = t_next - t
        mult1 = np.exp(-t_next) / np.exp(-t)
        mult2 = np.expm1(-h)
        x_standard = mult1 * x - mult2 * denoised
        if old_denoised is None or next_sigma < 1e-14:
            x = x_standard
        else:
            h_last = t - (-np.log(sigmas[i - 1]))
            r = h_last / h
            denoised_d = (1 + 1 / (2 * r)) * denoised - (1 / (2 * r)) * old_denoised
            x = mult1 * x - mult2 * denoised_d
        old_denoised = denoised
    return x


def _jax_denoiser(x, sigma, cond):
    return _fake_denoise(x, sigma[:, None])


@pytest.mark.parametrize(
    "sampler_cls,np_loop",
    [
        (EulerEDMSampler, _np_euler_loop),
        (HeunEDMSampler, _np_heun_loop),
        (DPMPP2MSampler, _np_dpmpp2m_loop),
    ],
)
def test_sampler_matches_numpy_loop(sampler_cls, np_loop):
    disc = EDMDiscretization(sigma_min=0.002, sigma_max=80.0)
    sampler = sampler_cls(discretization=disc, num_steps=12, guider=IdentityGuider())
    x0 = np.random.RandomState(0).randn(3, 5)
    with jax.enable_x64(True):
        out = sampler(_jax_denoiser, jnp.asarray(x0, jnp.float64), {},
                      rng=jax.random.PRNGKey(0))
        out = np.asarray(out)
    ref = np_loop(x0.astype(np.float64), np.asarray(sampler.schedule(), np.float64))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-9)


def test_euler_ancestral_runs():
    disc = EDMDiscretization()
    sampler = EulerAncestralSampler(discretization=disc, num_steps=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4))
    out = sampler(_jax_denoiser, x, {}, rng=jax.random.PRNGKey(1))
    assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()


def test_lms_sampler_runs():
    disc = EDMDiscretization()
    sampler = LinearMultistepSampler(discretization=disc, num_steps=8, order=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4))
    out = sampler(_jax_denoiser, x, {})
    assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()


def test_sampler_with_cfg_guider_jits():
    """Full CFG path under jit: doubled batch through the denoiser."""
    t = 4
    disc = EDMDiscretization(sigma_max=80.0)
    guider = LinearPredictionGuider(max_scale=3.5, num_frames=t)
    sampler = EulerEDMSampler(discretization=disc, num_steps=5, guider=guider)

    def denoiser(x, sigma, cond):
        # cond-dependent shrink so CFG has an effect
        return (x + cond["concat"]) * (0.5 / (1 + sigma[:, None]))

    c = {"concat": jnp.ones((t, 8))}
    uc = {"concat": jnp.zeros((t, 8))}
    x = jax.random.normal(jax.random.PRNGKey(2), (t, 8))

    fn = jax.jit(lambda x: sampler(denoiser, x, c, uc))
    out = fn(x)
    assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()
