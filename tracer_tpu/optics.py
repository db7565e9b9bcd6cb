"""Stateless optics laws as traced jax.numpy functions.

Capability parity with the reference's ``tracer/optics.py`` (Fresnel,
reflection, vector Snell refraction, Beer-Lambert attenuation, free-path
scattering sampling), written branchlessly for XLA. All direction arrays are
(N,3) rows (the ray axis leads so it shards over the device mesh).

Known-broken reference functions intentionally NOT replicated (SURVEY §2.11):
polarised_reflections (undefined vars), generalised_fresnel (aborts),
apparent_NK (self-shadowing). fresnel_conductor / fresnel_to_attenuating ARE
implemented (they work in the reference).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .mathutils import dot, safe_arccos, safe_sqrt


def fresnel(ray_dirs: jnp.ndarray, normals: jnp.ndarray, n1, n2) -> jnp.ndarray:
    """Unpolarized Fresnel reflectance for a dielectric interface.

    ray_dirs, normals - (N,3); n1, n2 - scalars or (N,).
    Mirrors reference tracer/optics.py:13. Where total internal reflection
    occurs the returned reflectance is clamped to 1.
    """
    cos1 = jnp.abs(dot(normals, ray_dirs))
    sin1_sq = jnp.clip(1.0 - cos1 * cos1, 0.0, 1.0)
    ratio = n1 / n2
    under = 1.0 - ratio * ratio * sin1_sq
    tir = under < 0.0
    bar = safe_sqrt(under)
    Rs = ((n1 * cos1 - n2 * bar) / (n1 * cos1 + n2 * bar)) ** 2
    Rp = ((n1 * bar - n2 * cos1) / (n1 * bar + n2 * cos1)) ** 2
    return jnp.where(tir, 1.0, 0.5 * (Rs + Rp))


def fresnel_to_attenuating(n1, m2, theta1):
    """Dielectric -> absorbing-medium interface (Modest ch.2).

    m2 is the complex refractive index of the absorbing side. Returns
    (R_p, R_s, theta2). Mirrors reference tracer/optics.py:63.
    """
    n2r, k2 = jnp.real(m2), jnp.imag(m2)
    s1 = n1 * jnp.sin(theta1)
    b = n2r**2 - k2**2 - s1**2
    a = safe_sqrt(b**2 + 4.0 * (n2r * k2) ** 2)
    p = safe_sqrt(0.5 * (a + b))
    q = safe_sqrt(0.5 * (a - b))
    theta2 = jnp.arctan2(s1, p)
    c1 = n1 * jnp.cos(theta1)
    R_s = ((c1 - p) ** 2 + q**2) / ((c1 + p) ** 2 + q**2)
    st = s1 * jnp.tan(theta1)
    R_p = ((p - st) ** 2 + q**2) / ((p + st) ** 2 + q**2) * R_s
    return R_p, R_s, theta2


def fresnel_conductor(ray_dirs, normals, m2, n1=1.0):
    """Fresnel reflectances against a conductor with complex index m2
    (per-ray array ok). Mirrors reference tracer/optics.py:41 with the
    material lookup hoisted out (pass m2 = material.m(lambdas))."""
    theta_in = safe_arccos(jnp.abs(dot(normals, ray_dirs)))
    return fresnel_to_attenuating(n1, m2, theta_in)


def reflections(ray_dirs: jnp.ndarray, normals: jnp.ndarray) -> jnp.ndarray:
    """Mirror law: d - 2 (d.n) n, rows (N,3). Ref tracer/optics.py:145."""
    return ray_dirs - 2.0 * dot(ray_dirs, normals)[..., None] * normals


def refractions(n1, n2, ray_dirs, normals):
    """Vector Snell refraction. Returns (refracted_mask, refr_dirs) with
    refr_dirs valid only where the mask is True (TIR elsewhere). Branchless
    analog of reference tracer/optics.py:159 (which compacts TIR rays away;
    we keep static shapes and mask instead)."""
    n = n2 / n1
    cos1 = dot(normals, ray_dirs)
    refracted = cos1**2 >= 1.0 - n**2
    safe_n = jnp.where(n == 0.0, 1.0, n)
    t = (ray_dirs - cos1[..., None] * normals) / safe_n[..., None]
    cos2 = safe_sqrt(1.0 - (1.0 - cos1**2) / safe_n**2)
    t = t + normals * (cos2 * jnp.where(cos1 < 0.0, -1.0, 1.0))[..., None]
    return refracted, t


def refr_idx_hartmann(wavelength, a, b, c, d, e):
    """Hartmann dispersion n(L) = a + b/(c-L) + d/(e-L). Ref optics.py:194."""
    return a + b / (c - wavelength) + d / (e - wavelength)


def attenuations(path_lengths, k, lambda_0, energy):
    """Beer-Lambert attenuation via the absorption index k at vacuum
    wavelength lambda_0. Ref tracer/optics.py:205."""
    T = jnp.exp(-4.0 * jnp.pi * path_lengths * k / lambda_0)
    return T * energy


def sample_scattering(key, sigma, intersection_path_lengths):
    """Sample exponential free paths to a scattering event.

    Returns (scattered_mask, scattered_path_lengths). Rays whose sampled
    free path exceeds the distance to the next surface do not scatter.
    Functional analog of reference tracer/optics.py:214 (the complex-sigma
    carry-over trick is handled by the engine carrying a remaining-path
    field instead of complex numbers).
    """
    u = jax.random.uniform(key, intersection_path_lengths.shape,
                           minval=jnp.finfo(jnp.float32).tiny, maxval=1.0)
    safe_sigma = jnp.where(sigma <= 0.0, 1.0, sigma)
    s = -jnp.log(u) / safe_sigma
    s = jnp.where(sigma <= 0.0, intersection_path_lengths, s)
    return s < intersection_path_lengths, s


def R_from_n_k(n1, n2, thetas_in):
    """Unpolarized reflectance vs incidence angle for real indices.
    Ref tracer/optics.py:242."""
    c = jnp.cos(thetas_in)
    bar = jnp.sqrt(jnp.maximum(1.0 - (n1 / n2 * jnp.sin(thetas_in)) ** 2, 0.0))
    Rs = ((n1 * c - n2 * bar) / (n1 * c + n2 * bar)) ** 2
    Rp = ((n1 * bar - n2 * c) / (n1 * bar + n2 * c)) ** 2
    return 0.5 * (Rs + Rp)
