"""Diffusion samplers as compiled lax.scan loops.

TPU-native counterpart of sgm/modules/diffusionmodules/sampling.py.  The
reference iterates a Python loop over sigma pairs, calling the network twice
per step (CFG-doubled batch).  Here the whole sampling loop is a single
``lax.scan`` over a statically precomputed sigma schedule, so XLA compiles one
fused program: no per-step dispatch, weights stay resident, and the schedule
(and per-step churn gammas) are trace-time constants.

A sampler is called as ``sampler(denoiser, x, cond, uc, rng=...)`` where
``denoiser(x, sigma, cond) -> denoised`` already has the network bound
(see engines.sampling_pipeline).  Noise is only consumed by ancestral/churn
samplers; deterministic samplers ignore ``rng``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from v3d_tpu.core.registry import register
from v3d_tpu.diffusion.guidance import IdentityGuider
from v3d_tpu.utils.misc import append_dims, default

Cond = Dict[str, jnp.ndarray]


def to_d(x: jnp.ndarray, sigma: jnp.ndarray, denoised: jnp.ndarray) -> jnp.ndarray:
    """Karras ODE derivative dx/dsigma (sampling_utils.py:35-36)."""
    return (x - denoised) / append_dims(sigma, x.ndim)


def get_ancestral_step(sigma_from, sigma_to, eta: float = 1.0):
    if not eta:
        return sigma_to, jnp.zeros_like(sigma_to)
    sigma_up = jnp.minimum(
        sigma_to,
        eta * jnp.sqrt(sigma_to**2 * (sigma_from**2 - sigma_to**2) / sigma_from**2),
    )
    sigma_down = jnp.sqrt(sigma_to**2 - sigma_up**2)
    return sigma_down, sigma_up


@dataclasses.dataclass(frozen=True)
class BaseDiffusionSampler:
    discretization: object = None
    num_steps: Optional[int] = None
    guider: object = dataclasses.field(default_factory=IdentityGuider)

    def schedule(self, num_steps: Optional[int] = None) -> np.ndarray:
        n = default(num_steps, self.num_steps)
        if n is None:
            raise ValueError("num_steps not set")
        return np.asarray(self.discretization(n))  # length n+1, ends with 0

    def prepare(self, x: jnp.ndarray, num_steps: Optional[int] = None):
        sigmas = self.schedule(num_steps)
        # Initial latent scaled to the top of the schedule (sampling.py:50).
        x = x * jnp.sqrt(1.0 + jnp.asarray(sigmas[0], x.dtype) ** 2)
        return x, sigmas

    def denoise(self, x, denoiser, sigma, cond: Cond, uc: Cond):
        s = jnp.full((x.shape[0],), sigma, dtype=x.dtype)
        x_in, s_in, c_in = self.guider.prepare_inputs(x, s, cond, uc)
        denoised = denoiser(x_in, s_in, c_in)
        return self.guider(denoised, sigma)


@register("euler_edm_sampler")
@dataclasses.dataclass(frozen=True)
class EulerEDMSampler(BaseDiffusionSampler):
    """EDM stochastic Euler sampler (sampling.py:85-133, 214-219)."""

    s_churn: float = 0.0
    s_tmin: float = 0.0
    s_tmax: float = float("inf")
    s_noise: float = 1.0

    def gammas(self, sigmas: np.ndarray) -> np.ndarray:
        n = len(sigmas)
        g = np.zeros(n - 1, dtype=np.float32)
        for i in range(n - 1):
            if self.s_tmin <= sigmas[i] <= self.s_tmax:
                g[i] = min(self.s_churn / (n - 1), 2**0.5 - 1)
        return g

    def step(self, x, sigma, next_sigma, gamma, rng, denoiser, cond, uc):
        sigma_hat = sigma * (gamma + 1.0)
        noise = jax.random.normal(rng, x.shape, x.dtype) * self.s_noise
        churn = jnp.sqrt(jnp.maximum(sigma_hat**2 - sigma**2, 0.0)).astype(x.dtype)
        x = x + noise * churn  # churn==0 when gamma==0
        denoised = self.denoise(x, denoiser, sigma_hat, cond, uc)
        d = to_d(x, sigma_hat, denoised)
        dt = (next_sigma - sigma_hat).astype(x.dtype)
        euler = x + dt * d
        return self.correct(euler, x, d, dt, next_sigma, denoiser, cond, uc)

    def correct(self, euler, x, d, dt, next_sigma, denoiser, cond, uc):
        return euler

    def __call__(self, denoiser: Callable, x: jnp.ndarray, cond: Cond,
                 uc: Optional[Cond] = None, rng: Optional[jax.Array] = None,
                 num_steps: Optional[int] = None) -> jnp.ndarray:
        uc = default(uc, cond)
        x, sigmas = self.prepare(x, num_steps)
        gammas = self.gammas(sigmas)
        n = len(sigmas) - 1
        rng = default(rng, jax.random.PRNGKey(0))
        rngs = jax.random.split(rng, n)

        sdt = jnp.result_type(x.dtype, jnp.float32)
        xs = (
            jnp.asarray(sigmas[:-1], sdt),
            jnp.asarray(sigmas[1:], sdt),
            jnp.asarray(gammas, sdt),
            rngs,
        )

        def body(carry, inp):
            sigma, next_sigma, gamma, step_rng = inp
            out = self.step(carry, sigma, next_sigma, gamma, step_rng, denoiser, cond, uc)
            return out, None

        x, _ = jax.lax.scan(body, x, xs)
        return x


@register("heun_edm_sampler")
@dataclasses.dataclass(frozen=True)
class HeunEDMSampler(EulerEDMSampler):
    """2nd-order Heun correction (sampling.py:221-238); the second network
    call is skipped via lax.cond when next_sigma == 0 (final step)."""

    def correct(self, euler, x, d, dt, next_sigma, denoiser, cond, uc):
        def corrected(euler):
            denoised = self.denoise(euler, denoiser, next_sigma, cond, uc)
            d_new = to_d(euler, next_sigma, denoised)
            return x + dt * (d + d_new) / 2.0

        return jax.lax.cond(next_sigma > 1e-14, corrected, lambda e: e, euler)


@register("euler_ancestral_sampler")
@dataclasses.dataclass(frozen=True)
class EulerAncestralSampler(BaseDiffusionSampler):
    """sampling.py:240-248 — ancestral Euler with eta-controlled noise."""

    eta: float = 1.0
    s_noise: float = 1.0

    def __call__(self, denoiser, x, cond: Cond, uc: Optional[Cond] = None,
                 rng: Optional[jax.Array] = None, num_steps: Optional[int] = None):
        uc = default(uc, cond)
        x, sigmas = self.prepare(x, num_steps)
        n = len(sigmas) - 1
        rng = default(rng, jax.random.PRNGKey(0))
        rngs = jax.random.split(rng, n)
        sdt = jnp.result_type(x.dtype, jnp.float32)
        xs = (jnp.asarray(sigmas[:-1], sdt), jnp.asarray(sigmas[1:], sdt), rngs)

        def body(x, inp):
            sigma, next_sigma, step_rng = inp
            sigma_down, sigma_up = get_ancestral_step(sigma, next_sigma, self.eta)
            denoised = self.denoise(x, denoiser, sigma, cond, uc)
            d = to_d(x, sigma, denoised)
            x = x + (sigma_down - sigma).astype(x.dtype) * d
            noise = jax.random.normal(step_rng, x.shape, x.dtype)
            x = jnp.where(next_sigma > 0.0, x + noise * self.s_noise * sigma_up.astype(x.dtype), x)
            return x, None

        x, _ = jax.lax.scan(body, x, xs)
        return x


@register("dpmpp2s_ancestral_sampler")
@dataclasses.dataclass(frozen=True)
class DPMPP2SAncestralSampler(BaseDiffusionSampler):
    """DPM-Solver++(2S) ancestral (sampling.py:250-288)."""

    eta: float = 1.0
    s_noise: float = 1.0

    def __call__(self, denoiser, x, cond: Cond, uc: Optional[Cond] = None,
                 rng: Optional[jax.Array] = None, num_steps: Optional[int] = None):
        uc = default(uc, cond)
        x, sigmas = self.prepare(x, num_steps)
        n = len(sigmas) - 1
        rng = default(rng, jax.random.PRNGKey(0))
        rngs = jax.random.split(rng, n)
        sdt = jnp.result_type(x.dtype, jnp.float32)
        xs = (jnp.asarray(sigmas[:-1], sdt), jnp.asarray(sigmas[1:], sdt), rngs)

        def body(x, inp):
            sigma, next_sigma, step_rng = inp
            sigma_down, sigma_up = get_ancestral_step(sigma, next_sigma, self.eta)
            denoised = self.denoise(x, denoiser, sigma, cond, uc)
            d = to_d(x, sigma, denoised)
            x_euler = x + (sigma_down - sigma).astype(x.dtype) * d

            def second_order(_):
                t, t_next = -jnp.log(sigma), -jnp.log(sigma_down)
                h = t_next - t
                s = t + 0.5 * h
                mult1 = jnp.exp(-s) / jnp.exp(-t)
                mult2 = jnp.expm1(-0.5 * h)
                mult3 = jnp.exp(-t_next) / jnp.exp(-t)
                mult4 = jnp.expm1(-h)
                x2 = mult1.astype(x.dtype) * x - mult2.astype(x.dtype) * denoised
                denoised2 = self.denoise(x2, denoiser, jnp.exp(-s), cond, uc)
                return mult3.astype(x.dtype) * x - mult4.astype(x.dtype) * denoised2

            x = jax.lax.cond(sigma_down > 1e-14, second_order, lambda _: x_euler, None)
            noise = jax.random.normal(step_rng, x.shape, x.dtype)
            x = jnp.where(next_sigma > 0.0, x + noise * self.s_noise * sigma_up.astype(x.dtype), x)
            return x, None

        x, _ = jax.lax.scan(body, x, xs)
        return x


@register("dpmpp2m_sampler")
@dataclasses.dataclass(frozen=True)
class DPMPP2MSampler(BaseDiffusionSampler):
    """DPM-Solver++(2M) multistep (sampling.py:290-365)."""

    def __call__(self, denoiser, x, cond: Cond, uc: Optional[Cond] = None,
                 rng: Optional[jax.Array] = None, num_steps: Optional[int] = None):
        uc = default(uc, cond)
        x, sigmas = self.prepare(x, num_steps)
        n = len(sigmas) - 1
        prev_sigmas = np.concatenate([[sigmas[0]], sigmas[:-1]])  # dummy for i=0
        first = np.zeros(n, dtype=bool)
        first[0] = True
        sdt = jnp.result_type(x.dtype, jnp.float32)
        xs = (
            jnp.asarray(sigmas[:-1], sdt),
            jnp.asarray(sigmas[1:], sdt),
            jnp.asarray(prev_sigmas[:n], sdt),
            jnp.asarray(first),
        )

        def body(carry, inp):
            x, old_denoised = carry
            sigma, next_sigma, prev_sigma, is_first = inp
            denoised = self.denoise(x, denoiser, sigma, cond, uc)
            t, t_next = -jnp.log(sigma), -jnp.log(next_sigma)
            h = t_next - t
            mult1 = (jnp.exp(-t_next) / jnp.exp(-t)).astype(x.dtype)
            mult2 = jnp.expm1(-h).astype(x.dtype)
            x_standard = mult1 * x - mult2 * denoised
            # 2nd-order correction using the previous denoised estimate.
            h_last = t - (-jnp.log(prev_sigma))
            r = h_last / jnp.where(h == 0, 1.0, h)
            safe_r = jnp.where(is_first | (r == 0), 1.0, r)
            mult3 = (1 + 1 / (2 * safe_r)).astype(x.dtype)
            mult4 = (1 / (2 * safe_r)).astype(x.dtype)
            denoised_d = mult3 * denoised - mult4 * old_denoised
            x_advanced = mult1 * x - mult2 * denoised_d
            use_standard = is_first | (next_sigma < 1e-14)
            x = jnp.where(use_standard, x_standard, x_advanced)
            return (x, denoised), None

        (x, _), _ = jax.lax.scan(body, (x, jnp.zeros_like(x)), xs)
        return x


@register("linear_multistep_sampler")
@dataclasses.dataclass(frozen=True)
class LinearMultistepSampler(BaseDiffusionSampler):
    """Adams-Bashforth style multistep (sampling.py:176-212).  Coefficients
    are integrals over the static sigma schedule, computed on host with
    scipy; the scan keeps a fixed-size ring buffer of past derivatives."""

    order: int = 4

    def coeff_table(self, sigmas: np.ndarray) -> np.ndarray:
        from scipy import integrate

        n = len(sigmas) - 1
        table = np.zeros((n, self.order), dtype=np.float32)
        t = sigmas.astype(np.float64)
        for i in range(n):
            cur_order = min(i + 1, self.order)
            for j in range(cur_order):
                def fn(tau, i=i, j=j, cur_order=cur_order):
                    prod = 1.0
                    for k in range(cur_order):
                        if j == k:
                            continue
                        prod *= (tau - t[i - k]) / (t[i - j] - t[i - k])
                    return prod

                table[i, j] = integrate.quad(fn, t[i], t[i + 1], epsrel=1e-4)[0]
        return table

    def __call__(self, denoiser, x, cond: Cond, uc: Optional[Cond] = None,
                 rng: Optional[jax.Array] = None, num_steps: Optional[int] = None):
        uc = default(uc, cond)
        x, sigmas = self.prepare(x, num_steps)
        n = len(sigmas) - 1
        coeffs = self.coeff_table(sigmas)
        sdt = jnp.result_type(x.dtype, jnp.float32)
        xs = (jnp.asarray(sigmas[:-1], sdt), jnp.asarray(coeffs, sdt))

        def body(carry, inp):
            x, ds = carry  # ds: (order, *x.shape), newest at index 0
            sigma, cs = inp
            denoised = self.denoise(x, denoiser, sigma, cond, uc)
            d = to_d(x, sigma, denoised)
            ds = jnp.concatenate([d[None], ds[:-1]], axis=0)
            update = jnp.tensordot(cs.astype(x.dtype), ds, axes=1)
            return (x + update, ds), None

        ds0 = jnp.zeros((self.order,) + x.shape, x.dtype)
        (x, _), _ = jax.lax.scan(body, (x, ds0), xs)
        return x
