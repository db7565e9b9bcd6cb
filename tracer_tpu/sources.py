"""Light sources: every function returns a :class:`RayBundle`.

Capability parity with the reference's ``tracer/sources.py`` (pillbox and
Buie sunshapes, disk/rect/triangle/trapezoid emitters, edge rays, view-factor
sources, thermal emission), rebuilt on ``jax.random`` with explicit keys —
per-shard keys replace the reference's global numpy RNG so distributed traces
are reproducible.

Energy conventions follow the reference formulas exactly (noted per
function) so flux maps are directly comparable.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .bundle import RayBundle
from . import spatial


def _as_row3(x) -> np.ndarray:
    return np.asarray(x, dtype=float).reshape(3)


def _rotate_rows(M, rows: jnp.ndarray) -> jnp.ndarray:
    """Apply a (3,3) rotation to (N,3) row vectors — expanded elementwise:
    `@` would route through the TPU MXU whose float32 matmul is
    bf16-rounded (meter-scale position errors on large scenes) and is slow
    for these tiny contractions."""
    from .mathutils import apply_rot
    return apply_rot(jnp.asarray(M), rows)


# ---------------------------------------------------------------------------
# Direction distributions
# ---------------------------------------------------------------------------

def lambertian_directions(key, num_rays: int, ang_range: float) -> jnp.ndarray:
    """Cosine-weighted directions about +Z within ``ang_range``
    (ref sources.py:88: the 'pillbox' sunshape / Lambertian sampler)."""
    k1, k2 = jax.random.split(key)
    phi = jax.random.uniform(k1, (num_rays,), minval=0.0, maxval=2.0 * jnp.pi)
    if ang_range == 0.0:
        return jnp.tile(jnp.array([0.0, 0.0, 1.0]), (num_rays, 1))
    u = jax.random.uniform(k2, (num_rays,))
    sinsqrt = jnp.sin(ang_range) * jnp.sqrt(u)
    return jnp.stack([jnp.cos(phi) * sinsqrt, jnp.sin(phi) * sinsqrt,
                      jnp.sqrt(1.0 - sinsqrt**2)], axis=1)


def pillbox_sunshape_directions(key, num_rays: int, ang_range: float):
    """Pillbox sunshape == angularly-uniform flux (ref sources.py:103)."""
    return lambertian_directions(key, num_rays, ang_range)


def edge_rays_directions(key, num_rays: int, ang_range: float) -> jnp.ndarray:
    """All rays at exactly ``ang_range`` from +Z (ref sources.py:152)."""
    phi = jax.random.uniform(key, (num_rays,), minval=0.0, maxval=2.0 * jnp.pi)
    s = jnp.sin(ang_range)
    return jnp.stack([jnp.cos(phi) * s, jnp.sin(phi) * s,
                      jnp.full((num_rays,), jnp.cos(ang_range))], axis=1)


# ---------------------------------------------------------------------------
# Buie sunshape (ref sources.py:330-516)
# ---------------------------------------------------------------------------

_THETA_DNI = 4.65e-3   # solar-disc half angle [rad]
_THETA_TOT = 43.6e-3   # end of circumsolar aureole [rad]


def _buie_tables(CSR: float, pre_process_CSR: bool = True):
    """Host-side precompute of the discretized Buie solar-disc PDF/CDF and
    aureole parameters. Mirrors ref Buie_directions_sampling steps 1-2."""
    nelem = 210
    theta_int = np.linspace(0.0, _THETA_DNI, nelem + 1)
    phi_dni = np.cos(0.326 * theta_int * 1e3) / np.cos(0.308 * theta_int * 1e3)
    w = phi_dni * np.cos(theta_int) * np.sin(theta_int)
    integ = 0.5 * (w[:-1] + w[1:]) * np.diff(theta_int)

    kappa = gamma = 0.0
    if CSR == 0.0:
        integ_phi = integ.sum()
    else:
        if pre_process_CSR:
            if CSR <= 0.1:
                CSR = (-2.245e3 * CSR**4 + 5.207e2 * CSR**3
                       - 3.939e1 * CSR**2 + 1.891 * CSR + 8e-3)
            else:
                CSR = (1.973 * CSR**4 - 2.481 * CSR**3 + 0.607 * CSR**2
                       + 1.151 * CSR - 0.020)
        kappa = 0.9 * np.log(13.5 * CSR) * CSR ** (-0.3)
        gamma = 2.2 * np.log(0.52 * CSR) * CSR ** 0.43 - 0.1
        integ_csr = (1e-6 * np.exp(kappa) / (gamma + 2.0)
                     * ((_THETA_TOT * 1e3) ** (gamma + 2.0)
                        - (_THETA_DNI * 1e3) ** (gamma + 2.0)))
        integ_phi = integ.sum() + integ_csr

    pdf = integ / integ_phi
    cdf = np.concatenate([[0.0], np.cumsum(pdf)])
    return dict(theta=theta_int, w=w, integ_sum=integ.sum(), cdf=cdf,
                kappa=kappa, gamma=gamma, csr=CSR)


_BUIE_INV_N = 1 << 14  # dense inverse-CDF table resolution


def _buie_inverse_table(tb) -> np.ndarray:
    """Host-side dense inverse CDF of the solar-disc part: theta at
    _BUIE_INV_N+1 uniform quantiles of [0, cdf_disc_end]. Exact per-interval
    quadratic inversion (same math as ref Buie_directions_sampling step 3),
    evaluated once in NumPy so device sampling is two loads and a lerp —
    jnp.searchsorted per ray costs ~100 ms/Mray on TPU."""
    theta, w, cdf = tb["theta"], tb["w"], tb["cdf"]
    disc_end = cdf[-1]
    r = np.linspace(0.0, disc_end, _BUIE_INV_N + 1)
    i = np.clip(np.searchsorted(cdf, r, side="right") - 1, 0, len(cdf) - 2)
    A, B = w[i], w[i + 1]
    t0, t1 = theta[i], theta[i + 1]
    C = 2.0 * tb["integ_sum"] * (r - cdf[i]) * (t1 - t0)
    with np.errstate(invalid="ignore", divide="ignore"):
        root = np.sqrt(np.maximum(((t0 - t1) * A) ** 2 + C * (B - A), 0.0))
        th_q = -(-A * t1 + B * t0 + root) / np.where(A == B, 1.0, A - B)
        th_lin = t0 + C / (2.0 * np.where(A == 0.0, 1.0, A) * (t1 - t0))
    th = np.where(A == B, th_lin, th_q)
    th[0] = 0.0
    return th


_BUIE_POLY_DEG = 10


def _buie_inverse_poly(tb) -> np.ndarray:
    """Polynomial fit of theta(u)/sqrt(u) over the solar-disc inverse CDF
    (u = normalized quantile). The disc radiance is within ~5% of uniform,
    so theta ~ sqrt(u) with a smooth degree-10 correction — max fit error
    ~1e-7 rad, far below MC noise. Gather-free device sampling: per-ray
    loads from even a 16k-entry inverse table cost ~10 ms/Mray on TPU."""
    inv = _buie_inverse_table(tb)
    u = np.linspace(0.0, 1.0, _BUIE_INV_N + 1)
    f = inv / np.where(u > 0, np.sqrt(u), 1.0)
    f[0] = f[1]
    return np.polyfit(u[1:], f[1:], _BUIE_POLY_DEG)


def buie_directions(key, num_rays: int, CSR: float,
                    pre_process_CSR: bool = True) -> jnp.ndarray:
    """Sample ray directions from the Buie sunshape about +Z
    (ref Buie_directions_sampling, sources.py:330): exact inverse-CDF of
    the discretized solar-disc radiance via a host-fitted polynomial (see
    _buie_inverse_poly) plus the analytic circumsolar aureole."""
    tb = _buie_tables(CSR, pre_process_CSR)
    coeffs = _buie_inverse_poly(tb)
    disc_end = tb["cdf"][-1]

    k1, k2 = jax.random.split(key)
    r = jax.random.uniform(k1, (num_rays,))

    u = jnp.clip(r / disc_end, 0.0, 1.0)
    acc = jnp.zeros_like(u) + coeffs[0]
    for c in coeffs[1:]:
        acc = acc * u + c
    thetas = jnp.sqrt(u) * acc

    if tb["csr"] > 0.0:
        gamma, kappa = tb["gamma"], tb["kappa"]
        aureole = r >= disc_end
        th_aur = ((r - 1.0) * ((gamma + 2.0) / (10.0 ** (3.0 * gamma)
                                                * np.exp(kappa))
                               * tb["integ_sum"]
                               - _THETA_DNI ** (gamma + 2.0))
                  + r * _THETA_TOT ** (gamma + 2.0)) ** (1.0 / (gamma + 2.0))
        thetas = jnp.where(aureole, th_aur, thetas)

    phi = jax.random.uniform(k2, (num_rays,), minval=0.0, maxval=2.0 * jnp.pi)
    s = jnp.sin(thetas)
    return jnp.stack([jnp.cos(phi) * s, jnp.sin(phi) * s,
                      jnp.cos(thetas)], axis=1)


def buie_sunshape_pallas_spec(num_rays: int, center, direction,
                              radius: float, CSR: float, flux: float,
                              pre_process_CSR: bool = True,
                              wl_band=None, ambient_att: float = 0.0,
                              ambient_scat: float = 0.0,
                              ambient_g: float = 0.0) -> tuple:
    """Static (hashable) parameter tuple describing a buie_sunshape source
    for in-kernel regeneration by the fused streaming megakernel
    (kernels/pallas_intersect._sample_disk_buie). Energies and geometry
    match buie_sunshape with rays_direction == direction.

    wl_band - optional (wl_lo, wl_hi): fresh rays get uniformly sampled
        per-ray wavelengths, enabling the spectral megakernel mode.
    ambient_att - homogeneous ambient attenuation coefficient [1/m] the
        trace runs in (the kernel Beer-Lamberts every hit segment); the
        source_fn's bundles must carry the same att_coeff so the general
        path agrees.
    ambient_scat / ambient_g - homogeneous ambient Henyey-Greenstein
        scattering coefficient [1/m] and asymmetry: the megakernel lowers
        exponential free-path sampling + HG phase draws (ref Scattering
        optics_callables.py:946); the source_fn's bundles must carry the
        same scat_coeff/scat_g so the general path agrees."""
    tb = _buie_tables(CSR, pre_process_CSR)
    coeffs = tuple(float(c) for c in _buie_inverse_poly(tb))
    center = _as_row3(center)
    rot = spatial.rotation_to_z(_as_row3(direction)).reshape(-1)
    e_ray = float(flux * np.pi * radius**2 / num_rays)
    gamma = float(tb["gamma"]) if tb["csr"] > 0.0 else None
    band = (None if wl_band is None
            else (float(wl_band[0]), float(wl_band[1])))
    return (float(center[0]), float(center[1]), float(center[2]),
            tuple(float(r) for r in rot), float(radius), e_ray, coeffs,
            float(tb["cdf"][-1]), gamma, float(tb["kappa"]),
            float(tb["integ_sum"]), float(_THETA_TOT), float(_THETA_DNI),
            band, float(ambient_att), None,
            (float(ambient_scat), float(ambient_g)))


def disk_pillbox_pallas_spec(num_rays: int, center, direction,
                             radius: float, ang_range: float,
                             flux: float, wl_band=None,
                             ambient_att: float = 0.0,
                             ambient_scat: float = 0.0,
                             ambient_g: float = 0.0) -> tuple:
    """Static spec for in-kernel regeneration of a plain pillbox disk
    source (disk_bundle with default options). Reuses the Buie sampler's
    polynomial-inverse-CDF slot: for a pillbox, theta(u) =
    arcsin(sin(ang_range) * sqrt(u)), so theta/sqrt(u) is fitted the same
    way (max error ~1e-8 rad); there is no aureole (gamma=None), so the
    kernel's Buie branch reduces to exactly this sampling."""
    u = np.linspace(1e-9, 1.0, 4097)
    f = np.arcsin(np.sin(ang_range) * np.sqrt(u)) / np.sqrt(u)
    coeffs = tuple(float(c) for c in np.polyfit(u, f, _BUIE_POLY_DEG))
    center = _as_row3(center)
    rot = spatial.rotation_to_z(_as_row3(direction)).reshape(-1)
    e_ray = float(flux * np.pi * radius**2 / num_rays)
    band = (None if wl_band is None
            else (float(wl_band[0]), float(wl_band[1])))
    return (float(center[0]), float(center[1]), float(center[2]),
            tuple(float(r) for r in rot), float(radius), e_ray, coeffs,
            1.0, None, 0.0, 0.0, float(ang_range), float(ang_range),
            band, float(ambient_att), None,
            (float(ambient_scat), float(ambient_g)))


def tabulated_sunshape_pallas_spec(num_rays: int, center, direction,
                                   radius: float, angles, norm_intensity,
                                   flux: float, wl_band=None,
                                   ambient_att: float = 0.0,
                                   ambient_scat: float = 0.0,
                                   ambient_g: float = 0.0,
                                   fit_tol: float = 1e-5) -> tuple:
    """Bakeable spec for a TABULATED radiance profile — the megakernel
    twin of sunshape_to_ray_directions (ref sources.py:386), so measured
    sunshapes get in-kernel regeneration like pillbox/Buie discs.

    The numeric inverse CDF theta(u) of intensity(theta)*cos*sin is
    fitted as sqrt(u) * poly(u) — exactly the polynomial slot the Buie
    disc branch evaluates (the sqrt factor captures theta ~ sqrt(u) near
    the axis for any finite on-axis radiance, so smooth profiles fit to
    ~1e-7 rad). ``fit_tol`` [rad] bounds the accepted max |fit - exact|
    polar-angle error; profiles too spiky to fit raise instead of
    silently distorting the sunshape — use the host-sampled source
    (general streaming path) for those."""
    angles = np.asarray(angles, dtype=float)
    inten = np.asarray(norm_intensity, dtype=float)
    if abs(angles[0]) > 1e-12 or not (np.diff(angles) > 0).all():
        raise ValueError("angles must start at 0 and increase")
    if (not np.isfinite(inten).all()) or (inten < 0).any() \
            or not (inten > 0).any():
        raise ValueError("norm_intensity must be finite, non-negative "
                         "and not identically zero")
    # dense exact inverse CDF of intensity * cos * sin (trapezoid)
    th_d = np.linspace(0.0, angles[-1], 20001)
    w_d = np.interp(th_d, angles, inten) * np.cos(th_d) * np.sin(th_d)
    cdf_d = np.concatenate([[0.0], np.cumsum(
        0.5 * (w_d[:-1] + w_d[1:]) * np.diff(th_d))])
    cdf_d /= cdf_d[-1]
    u = np.linspace(1e-9, 1.0, 8193)
    theta_exact = np.interp(u, cdf_d, th_d)
    coeffs = tuple(float(c) for c in np.polyfit(
        u, theta_exact / np.sqrt(u), _BUIE_POLY_DEG))
    err = np.abs(np.sqrt(u) * np.polyval(coeffs, u) - theta_exact).max()
    # NaN err must REJECT (a NaN > tol comparison is False)
    if not (err <= fit_tol):
        raise ValueError(
            f"inverse-CDF polynomial fit error {err:.2e} rad exceeds "
            f"fit_tol={fit_tol:.0e}; this profile is too sharp for the "
            "baked sampler — trace it with the host-sampled source")
    center = _as_row3(center)
    rot = spatial.rotation_to_z(_as_row3(direction)).reshape(-1)
    e_ray = float(flux * np.pi * radius**2 / num_rays)
    band = (None if wl_band is None
            else (float(wl_band[0]), float(wl_band[1])))
    return (float(center[0]), float(center[1]), float(center[2]),
            tuple(float(r) for r in rot), float(radius), e_ray, coeffs,
            1.0, None, 0.0, 0.0, float(angles[-1]), float(angles[-1]),
            band, float(ambient_att), None,
            (float(ambient_scat), float(ambient_g)))


def rect_buie_sunshape_pallas_spec(num_rays: int, center, direction,
                                   width: float, height: float, CSR: float,
                                   flux: float, rays_direction=None,
                                   pre_process_CSR: bool = True,
                                   wl_band=None,
                                   ambient_att: float = 0.0,
                                   ambient_scat: float = 0.0,
                                   ambient_g: float = 0.0) -> tuple:
    """Static spec for in-kernel regeneration of a rect_buie_sunshape /
    oblique rect source (ref sources.py:268 oblique_solar_rect_bundle,
    :466 rect_buie_sunshape — the reference's standard heliostat-field
    source): positions uniform on a width x height rectangle in the
    ``direction`` frame, directions Buie-sampled about ``rays_direction``
    (default = direction; when oblique, the flux is cosine-projected).

    Appends a 16th element (w, h, rays_rot) to the disk spec layout —
    kernels and the culling builder switch on its presence."""
    tb = _buie_tables(CSR, pre_process_CSR)
    coeffs = tuple(float(c) for c in _buie_inverse_poly(tb))
    center = _as_row3(center)
    direction = _as_row3(direction)
    rot = spatial.rotation_to_z(direction).reshape(-1)
    if rays_direction is None:
        rays_rot = None
        cosang = 1.0
    else:
        rays_direction = _as_row3(rays_direction)
        rays_rot = tuple(
            float(r)
            for r in spatial.rotation_to_z(rays_direction).reshape(-1))
        cosang = float(np.cos(2.0 * np.arcsin(
            0.5 * np.linalg.norm(rays_direction - direction))))
    e_ray = float(flux * width * height / num_rays * cosang)
    gamma = float(tb["gamma"]) if tb["csr"] > 0.0 else None
    band = (None if wl_band is None
            else (float(wl_band[0]), float(wl_band[1])))
    return (float(center[0]), float(center[1]), float(center[2]),
            tuple(float(r) for r in rot), 0.0, e_ray, coeffs,
            float(tb["cdf"][-1]), gamma, float(tb["kappa"]),
            float(tb["integ_sum"]), float(_THETA_TOT), float(_THETA_DNI),
            band, float(ambient_att),
            (float(width), float(height), rays_rot),
            (float(ambient_scat), float(ambient_g)))


def oblique_rect_pillbox_pallas_spec(num_rays: int, center,
                                     source_direction, rays_direction,
                                     width: float, height: float,
                                     ang_range: float, flux: float,
                                     wl_band=None,
                                     ambient_att: float = 0.0,
                                     ambient_scat: float = 0.0,
                                     ambient_g: float = 0.0) -> tuple:
    """Static spec for an oblique rect source with PILLBOX divergence
    (ref oblique_solar_rect_bundle, sources.py:268). Same rect marker as
    rect_buie_sunshape_pallas_spec; the pillbox angle rides the Buie
    polynomial slot (see disk_pillbox_pallas_spec)."""
    u = np.linspace(1e-9, 1.0, 4097)
    f = np.arcsin(np.sin(ang_range) * np.sqrt(u)) / np.sqrt(u)
    coeffs = tuple(float(c) for c in np.polyfit(u, f, _BUIE_POLY_DEG))
    center = _as_row3(center)
    source_direction = _as_row3(source_direction)
    rot = spatial.rotation_to_z(source_direction).reshape(-1)
    if rays_direction is None:
        rays_rot = None
        cosang = 1.0
    else:
        rays_direction = _as_row3(rays_direction)
        rays_rot = tuple(
            float(r)
            for r in spatial.rotation_to_z(rays_direction).reshape(-1))
        cosang = float(np.cos(2.0 * np.arcsin(
            0.5 * np.linalg.norm(rays_direction - source_direction))))
    e_ray = float(flux * width * height / num_rays * cosang)
    band = (None if wl_band is None
            else (float(wl_band[0]), float(wl_band[1])))
    return (float(center[0]), float(center[1]), float(center[2]),
            tuple(float(r) for r in rot), 0.0, e_ray, coeffs,
            1.0, None, 0.0, 0.0, float(ang_range), float(ang_range),
            band, float(ambient_att),
            (float(width), float(height), rays_rot),
            (float(ambient_scat), float(ambient_g)))


def sunshape_to_ray_directions(key, angles, norm_intensity,
                               num_rays: int) -> jnp.ndarray:
    """Directions from a tabulated radiance profile (ref sources.py:386)."""
    angles = np.asarray(angles, dtype=float)
    inten = np.asarray(norm_intensity, dtype=float)
    w = inten * np.cos(angles) * np.sin(angles)
    integ = 0.5 * (w[:-1] + w[1:]) * np.diff(angles)
    pdf = integ / integ.sum()
    cdf = np.concatenate([[0.0], np.cumsum(pdf)])

    k1, k2 = jax.random.split(key)
    r = jax.random.uniform(k1, (num_rays,))
    i = jnp.clip(jnp.searchsorted(jnp.asarray(cdf), r, side="right") - 1,
                 0, len(cdf) - 2)
    wj = jnp.asarray(w)
    aj = jnp.asarray(angles)
    A, B = wj[i], wj[i + 1]
    t0, t1 = aj[i], aj[i + 1]
    C = 2.0 * integ.sum() * (r - jnp.asarray(cdf)[i]) * (t1 - t0)
    denom = jnp.where(A == B, 1.0, A - B)
    root = jnp.sqrt(jnp.maximum(((t0 - t1) * A) ** 2 + C * (B - A), 0.0))
    th_q = -(-A * t1 + B * t0 + root) / denom
    th_lin = t0 + integ.sum() * (r - jnp.asarray(cdf)[i]) / jnp.where(A == 0, 1.0, A)
    thetas = jnp.where(A == B, th_lin, th_q)

    phi = jax.random.uniform(k2, (num_rays,), minval=0.0, maxval=2.0 * jnp.pi)
    s = jnp.sin(thetas)
    return jnp.stack([jnp.cos(phi) * s, jnp.sin(phi) * s,
                      jnp.cos(thetas)], axis=1)


# ---------------------------------------------------------------------------
# Bundles
# ---------------------------------------------------------------------------

def single_ray_source(position, direction, flux: float = 1.0) -> RayBundle:
    """One ray for behavior tests (ref sources.py:68)."""
    d = _as_row3(direction)
    d = d / np.linalg.norm(d)
    return RayBundle.create(pos=np.asarray(position, dtype=float).reshape(1, 3),
                            dir=d.reshape(1, 3), energy=np.array([flux]))


def disk_bundle(key, num_rays: int, center, direction, radius: float,
                ang_range: float, flux: Optional[float] = None,
                radius_in: float = 0.0,
                angular_span: Sequence[float] = (0.0, 2.0 * np.pi),
                x_cut: Optional[float] = None,
                rays_direction=None, procs: int = 1) -> RayBundle:
    """Uniform disk (or annular wedge) source with pillbox divergence
    (ref disk_bundle, sources.py:175). Energy per ray =
    flux * pi (R^2 - Ri^2) / n * cos(2 arcsin(|rays_dir - dir|/2)) —
    the exact chord->angle inversion; the reference's :197 uses
    2*sin(chord/2), a small-angle approximation of its own :395 arcsin
    form (documented deviation, same fix as the rect sources).

    x_cut - keep only x < x_cut (chord-cut disc). Unlike the reference's
    rejection loop (sources.py:222-237, dynamic-shape), points are sampled
    exactly via the inverse CDF of the truncated chord-length density
    (static shapes; requires radius_in == 0 and a full angular span)."""
    center = _as_row3(center)
    direction = _as_row3(direction)
    if rays_direction is None:
        rays_direction = direction
    else:
        rays_direction = _as_row3(rays_direction)

    k1, k2, k3 = jax.random.split(key, 3)
    a = pillbox_sunshape_directions(k1, num_rays, ang_range)
    directions = _rotate_rows(spatial.rotation_to_z(rays_direction), a)

    if x_cut is not None:
        if radius_in != 0.0 or angular_span != (0.0, 2.0 * np.pi):
            raise NotImplementedError("x_cut combines only with a plain disc")
        # p(x) ~ 2 sqrt(R^2-x^2) on [-R, x_cut]: dense host-side inverse CDF
        xs_t = np.linspace(-radius, min(x_cut, radius), 4097)
        pdf = 2.0 * np.sqrt(np.maximum(radius**2 - xs_t**2, 0.0))
        cdf = np.concatenate([[0.0], np.cumsum((pdf[1:] + pdf[:-1]) / 2.0
                                               * np.diff(xs_t))])
        cdf /= cdf[-1]
        u_grid = np.linspace(0.0, 1.0, 4097)
        inv = np.interp(u_grid, cdf, xs_t)
        u = jax.random.uniform(k2, (num_rays,)) * 4096
        i0 = jnp.clip(u.astype(jnp.int32), 0, 4095)
        fr = u - i0.astype(u.dtype)
        inv_j = jnp.asarray(inv)
        xs = inv_j[i0] * (1 - fr) + inv_j[i0 + 1] * fr
        half = jnp.sqrt(jnp.maximum(radius**2 - xs**2, 0.0))
        ys = jax.random.uniform(k3, (num_rays,), minval=-1.0,
                                maxval=1.0) * half
        verts_local = jnp.stack([xs, ys, jnp.zeros(num_rays)], axis=1)
    else:
        u = jax.random.uniform(k2, (num_rays,))
        thetas = jax.random.uniform(k3, (num_rays,), minval=angular_span[0],
                                    maxval=angular_span[1])
        rs = jnp.sqrt(radius_in**2 + u * (radius**2 - radius_in**2))
        verts_local = jnp.stack([rs * jnp.cos(thetas), rs * jnp.sin(thetas),
                                 jnp.zeros(num_rays)], axis=1)
    verts = _rotate_rows(spatial.rotation_to_z(direction), verts_local) + center

    if flux is not None:
        # chord |a-b| = 2 sin(angle/2), so the angle between the disk
        # normal and the beam is 2*arcsin(chord/2); the reference's
        # :197 uses 2*sin(chord/2) instead (approximately equal only at
        # small obliquity) — documented deviation, matching the arcsin
        # form its own :395 uses (same fix as the rect sources here)
        cosangle = 2.0 * np.arcsin(
            0.5 * np.linalg.norm(rays_direction - direction))
        e = (np.pi * (radius**2 - radius_in**2) / num_rays * flux
             * np.cos(cosangle))
        energy = jnp.full((num_rays,), e)
    else:
        energy = jnp.full((num_rays,), 1.0 / num_rays / procs)
    return RayBundle.create(pos=verts, dir=directions, energy=energy)


# The reference examples call this source by its older name.
solar_disk_bundle = disk_bundle


def rect_bundle(key, num_rays: int, center, direction, x: float, y: float,
                ang_range: float, flux: Optional[float] = None,
                procs: int = 1) -> RayBundle:
    """Rectangular source with pillbox divergence (ref sources.py:241)."""
    center = _as_row3(center)
    direction = _as_row3(direction)
    k1, k2, k3 = jax.random.split(key, 3)
    a = pillbox_sunshape_directions(k1, num_rays, ang_range)
    perp_rot = spatial.rotation_to_z(direction)
    directions = _rotate_rows(perp_rot, a)
    xs = jax.random.uniform(k2, (num_rays,), minval=-x / 2, maxval=x / 2)
    ys = jax.random.uniform(k3, (num_rays,), minval=-y / 2, maxval=y / 2)
    if np.allclose(direction, [0.0, 0.0, -1.0]):
        xs, ys = ys, xs
    # the reference stacks (y, x, 0) — kept for bit-parity of layouts
    verts_local = jnp.stack([ys, xs, jnp.zeros(num_rays)], axis=1)
    verts = _rotate_rows(perp_rot, verts_local) + center
    if flux is not None:
        energy = jnp.full((num_rays,), x * y / num_rays * flux)
    else:
        energy = jnp.full((num_rays,), 1.0 / num_rays / procs)
    return RayBundle.create(pos=verts, dir=directions, energy=energy)


def oblique_solar_rect_bundle(key, num_rays: int, center, source_direction,
                              rays_direction, x: float, y: float,
                              ang_range: float, flux: Optional[float] = None,
                              procs: int = 1, wavelength=None,
                              ref_index=None) -> RayBundle:
    """Rect source whose rays leave obliquely; the flux is cosine-projected
    (ref sources.py:268)."""
    center = _as_row3(center)
    source_direction = _as_row3(source_direction)
    rays_direction = _as_row3(rays_direction)
    k1, k2, k3 = jax.random.split(key, 3)
    a = pillbox_sunshape_directions(k1, num_rays, ang_range)
    directions = _rotate_rows(spatial.rotation_to_z(rays_direction), a)
    xs = jax.random.uniform(k2, (num_rays,), minval=-x / 2, maxval=x / 2)
    ys = jax.random.uniform(k3, (num_rays,), minval=-y / 2, maxval=y / 2)
    if np.allclose(source_direction, [0.0, 0.0, -1.0]):
        xs, ys = ys, xs
    verts_local = jnp.stack([ys, xs, jnp.zeros(num_rays)], axis=1)
    verts = _rotate_rows(spatial.rotation_to_z(source_direction),
                         verts_local) + center
    if flux is not None:
        cosangle = 2.0 * np.arcsin(
            0.5 * np.linalg.norm(rays_direction - source_direction))
        energy = jnp.full((num_rays,),
                          x * y / num_rays * flux * np.cos(cosangle))
    else:
        energy = jnp.full((num_rays,), 1.0 / num_rays / procs)
    return RayBundle.create(pos=verts, dir=directions, energy=energy,
                            wavelength=wavelength, ref_index=ref_index)


def edge_rays_bundle(key, num_rays: int, center, direction, radius: float,
                     ang_range: float, flux: Optional[float] = None,
                     radius_in: float = 0.0) -> RayBundle:
    """Disk source whose rays all leave at the extreme angle
    (ref sources.py:304) — used for quick cone-of-light geometry checks."""
    center = _as_row3(center)
    direction = _as_row3(direction)
    k1, k2, k3 = jax.random.split(key, 3)
    a = edge_rays_directions(k1, num_rays, ang_range)
    perp_rot = spatial.rotation_to_z(direction)
    directions = _rotate_rows(perp_rot, a)
    u = jax.random.uniform(k2, (num_rays,))
    thetas = jax.random.uniform(k3, (num_rays,), maxval=2.0 * jnp.pi)
    rs = jnp.sqrt(radius_in**2 + u * (radius**2 - radius_in**2))
    verts_local = jnp.stack([rs * jnp.cos(thetas), rs * jnp.sin(thetas),
                             jnp.zeros(num_rays)], axis=1)
    verts = _rotate_rows(perp_rot, verts_local) + center
    energy = None
    if flux is not None:
        energy = jnp.full((num_rays,),
                          np.pi * (radius**2 - radius_in**2) / num_rays * flux)
    return RayBundle.create(pos=verts, dir=directions, energy=energy)


def buie_sunshape(key, num_rays: int, center, direction, radius: float,
                  CSR: float, flux: Optional[float] = None,
                  pre_process_CSR: bool = True,
                  rays_direction=None) -> RayBundle:
    """Disk source with Buie sunshape directions (ref sources.py:412)."""
    center = _as_row3(center)
    direction = _as_row3(direction)
    if rays_direction is None:
        rays_direction = direction
    else:
        rays_direction = _as_row3(rays_direction)
    k1, k2, k3 = jax.random.split(key, 3)
    u = jax.random.uniform(k1, (num_rays,))
    phiv = jax.random.uniform(k2, (num_rays,), maxval=2.0 * jnp.pi)
    rs = radius * jnp.sqrt(u)
    verts_local = jnp.stack([rs * jnp.cos(phiv), rs * jnp.sin(phiv),
                             jnp.zeros(num_rays)], axis=1)
    verts = _rotate_rows(spatial.rotation_to_z(direction), verts_local) + center

    a = buie_directions(k3, num_rays, CSR, pre_process_CSR)
    directions = _rotate_rows(spatial.rotation_to_z(rays_direction), a)

    energy = None
    if flux is not None:
        S = np.pi * radius**2
        # exact chord -> angle inversion (see disk_bundle): documented
        # deviation from the reference's 2*sin(chord/2) quirk
        cosangle = 2.0 * np.arcsin(
            0.5 * np.linalg.norm(rays_direction - direction))
        energy = jnp.full((num_rays,), flux * S / num_rays * np.cos(cosangle))
    return RayBundle.create(pos=verts, dir=directions, energy=energy)


def rect_buie_sunshape(key, num_rays: int, center, direction, width: float,
                       height: float, CSR: float,
                       flux: Optional[float] = None,
                       pre_process_CSR: bool = True,
                       rays_direction=None) -> RayBundle:
    """Rect source with Buie sunshape directions (ref sources.py:466)."""
    center = _as_row3(center)
    direction = _as_row3(direction)
    if rays_direction is None:
        rays_direction = direction
    else:
        rays_direction = _as_row3(rays_direction)
    k1, k2, k3 = jax.random.split(key, 3)
    xs = width * (jax.random.uniform(k1, (num_rays,)) - 0.5)
    ys = height * (jax.random.uniform(k2, (num_rays,)) - 0.5)
    verts_local = jnp.stack([xs, ys, jnp.zeros(num_rays)], axis=1)
    verts = _rotate_rows(spatial.rotation_to_z(direction), verts_local) + center
    a = buie_directions(k3, num_rays, CSR, pre_process_CSR)
    directions = _rotate_rows(spatial.rotation_to_z(rays_direction), a)
    energy = None
    if flux is not None:
        S = width * height
        # exact chord->angle inversion (2*arcsin(|a-b|/2)); the reference
        # uses 2*sin(|a-b|/2) here (sources.py:481) while its own
        # oblique_solar_rect_bundle uses arcsin (:395) — the arcsin form
        # is the correct cosine projection, so it is used for both
        cosangle = 2.0 * np.arcsin(
            0.5 * np.linalg.norm(rays_direction - direction))
        energy = jnp.full((num_rays,), flux * S / num_rays * np.cos(cosangle))
    return RayBundle.create(pos=verts, dir=directions, energy=energy)


def regular_square_bundle(num_rays: int, center, direction,
                          width: float) -> RayBundle:
    """Deterministic square grid of parallel rays (ref sources.py:518)."""
    center = _as_row3(center)
    direction = _as_row3(direction)
    per_side = int(np.sqrt(num_rays))
    xs = np.linspace(-width / 2, width / 2, per_side)
    x, y = np.meshgrid(xs, xs)
    verts_local = np.stack([x.ravel(), y.ravel(),
                            np.zeros(per_side**2)], axis=1)
    perp_rot = spatial.rotation_to_z(direction)
    verts = verts_local @ perp_rot.T + center
    dirs = np.tile(direction, (per_side**2, 1))
    return RayBundle.create(pos=verts, dir=dirs,
                            energy=np.ones(per_side**2) / per_side**2)


def triangular_bundle(key, num_rays: int, A, B, C, direction=None,
                      ang_range: float = np.pi / 2,
                      flux: Optional[float] = None,
                      procs: int = 1) -> RayBundle:
    """Triangle source via uniform point-picking (ref sources.py:544).
    A, B, C are the 3D corners; directions are pillbox about the triangle
    normal (or ``direction`` if given)."""
    A = _as_row3(A); Bv = _as_row3(B); Cv = _as_row3(C)
    e1, e2 = Bv - A, Cv - A
    normal = np.cross(e1, e2)
    area = 0.5 * np.linalg.norm(normal)
    normal = normal / (2.0 * area)
    if direction is None:
        direction = normal
    k1, k2, k3 = jax.random.split(key, 3)
    r1 = jnp.sqrt(jax.random.uniform(k1, (num_rays,)))
    r2 = jax.random.uniform(k2, (num_rays,))
    verts = (A[None, :] * (1.0 - r1)[:, None]
             + (r1 * (1.0 - r2))[:, None] * Bv[None, :]
             + (r1 * r2)[:, None] * Cv[None, :])
    a = pillbox_sunshape_directions(k3, num_rays, ang_range)
    dirs = _rotate_rows(spatial.rotation_to_z(_as_row3(direction)), a)
    if flux is not None:
        energy = jnp.full((num_rays,), flux * area / num_rays)
    else:
        energy = jnp.full((num_rays,), 1.0 / num_rays / procs)
    return RayBundle.create(pos=verts, dir=dirs, energy=energy)


def trapezoid_bundle(key, num_rays: int, A, B, C, direction=None,
                     ang_range: float = np.pi / 2,
                     flux: Optional[float] = None,
                     procs: int = 1) -> RayBundle:
    """Isosceles-trapezoid source built from two triangles
    (ref sources.py:599: corners A,B and C on the midline; we mirror C).

    A, B - the two corners of one parallel side; C - corner adjacent to B on
    the other parallel side; the fourth corner is D = C + (A - B)."""
    A = _as_row3(A); Bv = _as_row3(B); Cv = _as_row3(C)
    D = Cv + (A - Bv)
    area_1 = 0.5 * np.linalg.norm(np.cross(Bv - A, Cv - A))
    area_2 = 0.5 * np.linalg.norm(np.cross(Cv - A, D - A))
    n1 = int(round(num_rays * area_1 / (area_1 + area_2)))
    n2 = num_rays - n1
    k1, k2 = jax.random.split(key)
    f = None if flux is None else flux
    b1 = triangular_bundle(k1, n1, A, Bv, Cv, direction, ang_range, f, procs)
    b2 = triangular_bundle(k2, n2, A, Cv, D, direction, ang_range, f, procs)
    return b1.concat(b2)


# ---------------------------------------------------------------------------
# View-factor sources: Lambertian emitters over frustum / cylinder walls
# (ref sources.py:644 vf_frustum_bundle, :716 vf_cylinder_bundle) — used by
# the MC view-factor subsystem (analysis/view_factors.py). Vectorized with
# per-ray rotation frames instead of the reference's per-ray Python loops.
# ---------------------------------------------------------------------------

def _rotz_rows(phi, rows):
    """Rotate (N,3) row vectors about z by per-ray angles phi."""
    c, s = jnp.cos(phi), jnp.sin(phi)
    x, y, z = rows[:, 0], rows[:, 1], rows[:, 2]
    return jnp.stack([c * x - s * y, s * x + c * y, z], axis=1)


def vf_frustum_bundle(key, num_rays: int, r0: float, r1: float, depth: float,
                      center, direction, flux: Optional[float] = None,
                      rays_in: bool = True,
                      angular_span: Sequence[float] = (0.0, 2.0 * np.pi),
                      angular_range: float = np.pi / 2) -> RayBundle:
    """Lambertian emitter over a frustum wall from (z=0, r0) to (z=depth,
    r1); rays point inward when rays_in (ref vf_frustum_bundle :644).
    Total energy 1 unless flux is given (then flux*lateral_area)."""
    center = _as_row3(center)
    direction = _as_row3(direction)
    k1, k2, k3 = jax.random.split(key, 3)

    dir_flat = pillbox_sunshape_directions(k1, num_rays, angular_range)
    c = (r1 - r0) / depth
    u = jax.random.uniform(k2, (num_rays,))
    rs = jnp.sqrt((r1**2 - r0**2) * u + r0**2)
    zs = (rs - r0) / c
    phi = jax.random.uniform(k3, (num_rays,), minval=angular_span[0],
                             maxval=angular_span[1])

    # rotate the pillbox (about +z) onto the inward wall normal:
    # roty(-pi/2 + atan(c)) then rotz(phi)   (ref :776-782)
    theta_rot = -np.pi / 2 + np.arctan(c)
    yrot = spatial.roty(theta_rot)[:3, :3]
    from .mathutils import apply_rot as _ar
    local_unit = _rotz_rows(phi, _ar(jnp.asarray(yrot), dir_flat))
    if not rays_in:
        local_unit = -local_unit

    verts_local = jnp.stack([rs * jnp.cos(phi), rs * jnp.sin(phi), zs], axis=1)
    perp_rot = spatial.rotation_to_z(direction)
    verts = _rotate_rows(perp_rot, verts_local) + center
    dirs = _rotate_rows(perp_rot, local_unit)

    if flux is None:
        energy = jnp.full((num_rays,), 1.0 / num_rays)
    else:
        area = ((angular_span[1] - angular_span[0]) * (r1 + r0) / 2.0
                * np.sqrt(abs(r1 - r0) ** 2 + depth**2))
        energy = jnp.full((num_rays,), flux * area / num_rays)
    return RayBundle.create(pos=verts, dir=dirs, energy=energy)


def vf_cylinder_bundle(key, num_rays: int, rc: float, lc: float, center,
                       direction, flux: Optional[float] = None,
                       rays_in: bool = True,
                       angular_span: Sequence[float] = (0.0, 2.0 * np.pi),
                       ang_range: float = np.pi / 2) -> RayBundle:
    """Lambertian emitter over a cylinder wall, centered on the wall's mid
    height (ref vf_cylinder_bundle :716)."""
    center = _as_row3(center)
    direction = _as_row3(direction)
    k1, k2, k3 = jax.random.split(key, 3)

    zs = lc * jax.random.uniform(k1, (num_rays,)) - lc / 2.0
    phi = jax.random.uniform(k2, (num_rays,), minval=angular_span[0],
                             maxval=angular_span[1])
    dir_flat = pillbox_sunshape_directions(k3, num_rays, ang_range)

    yrot = spatial.roty(-np.pi / 2)[:3, :3]
    from .mathutils import apply_rot as _ar
    local_unit = _rotz_rows(phi, _ar(jnp.asarray(yrot), dir_flat))
    if not rays_in:
        local_unit = -local_unit

    verts_local = jnp.stack([rc * jnp.cos(phi), rc * jnp.sin(phi), zs], axis=1)
    perp_rot = spatial.rotation_to_z(direction)
    verts = _rotate_rows(perp_rot, verts_local) + center
    dirs = _rotate_rows(perp_rot, local_unit)

    if flux is None:
        energy = jnp.full((num_rays,), 1.0 / num_rays)
    else:
        area = rc * (angular_span[1] - angular_span[0]) * lc
        energy = jnp.full((num_rays,), flux * area / num_rays)
    return RayBundle.create(pos=verts, dir=dirs, energy=energy)


def gray_source(key, shape: dict, location, direction, num_rays: int,
                directions_distribution: dict, energy: float,
                rays_direction=None) -> RayBundle:
    """General gray source composer (ref gray_source, sources.py:44):
    ``shape`` and ``directions_distribution`` are {'type': name,
    'kwargs': {...}} dicts resolved against the sampling library's shape
    samplers and direction distributions."""
    from . import sampling as smp

    location = _as_row3(location)
    direction = _as_row3(direction)
    k1, k2 = jax.random.split(key)

    shape_fns = dict(disk=smp.disk_sampling, rectangle=smp.rectangle_sampling,
                     triangle=smp.triangle_sampling,
                     polygon=smp.polygon_sampling,
                     cylinder=smp.cylinder_sampling,
                     frustum=smp.frustum_sampling, sphere=smp.sphere_sampling)
    fn = shape_fns[shape["type"]]
    verts, normals = fn(k1, ns=num_rays, **shape["kwargs"])

    rot = spatial.rotation_to_z(direction)
    verts = _rotate_rows(rot, verts) + location
    normals = _rotate_rows(rot, normals)

    dd = directions_distribution
    if dd["type"].lower() == "lambertian":
        dirs = smp.lambertian_directions_sampling(
            k2, num_rays, normals=normals, **dd.get("kwargs", {}))
    else:
        raise ValueError(f"unknown directions distribution {dd['type']}")

    energies = jnp.full((num_rays,), energy / num_rays)
    if rays_direction is not None:
        rays_direction = _as_row3(rays_direction)
        energies = energies * np.cos(float(np.dot(rays_direction, direction)))
    return RayBundle.create(pos=verts, dir=dirs, energy=energies)


def spectral_band_axisymmetrical_thermal_emission_source(
        key, positions, normals, area, thetas, band_emittance, T: float,
        nrays: int, band, ref_index: float = 1.0) -> RayBundle:
    """Thermal emitter over a spectral band with directional emittance
    (ref sources.py:771): Planck-integrated band radiance, directions
    importance-sampled from the emittance(theta)*cos*sin profile."""
    from .electromagnetics import planck
    from .sampling import PWLinCosSinDistribution
    from .vector_utils import rotate_z_to_normal

    thetas = np.asarray(thetas, dtype=float)
    wls = np.linspace(band[0], band[1],
                      max(int((band[1] - band[0]) / 1e-9), 16))
    bb = np.asarray(planck(wls, T))
    bb_int = np.trapezoid(bb, wls) if hasattr(np, "trapezoid") \
        else np.trapz(bb, wls)
    band_emittance = np.broadcast_to(np.asarray(band_emittance, dtype=float),
                                     thetas.shape)
    radiance = band_emittance * bb_int

    k1, k2 = jax.random.split(key)
    dist = PWLinCosSinDistribution(thetas, radiance)
    th_rays, weights = dist.sample(k1, nrays)
    exitance = 2.0 * np.pi * np.trapz(
        radiance * np.cos(thetas) * np.sin(thetas), thetas)
    phis = jax.random.uniform(k2, (nrays,), maxval=2.0 * jnp.pi)
    s = jnp.sin(th_rays)
    dirs = jnp.stack([s * jnp.cos(phis), s * jnp.sin(phis),
                      jnp.cos(th_rays)], axis=1)
    dirs = jnp.asarray(rotate_z_to_normal(np.asarray(dirs),
                                          np.asarray(normals)))
    energy = weights / jnp.sum(weights) * exitance * area
    wl_avg = float(np.sum(wls * bb) / np.sum(bb))
    return RayBundle.create(pos=np.asarray(positions, dtype=float),
                            dir=dirs, energy=energy,
                            wavelength=wl_avg, ref_index=ref_index)
