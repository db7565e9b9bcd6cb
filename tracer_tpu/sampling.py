"""Sampling library: piecewise-linear inverse-CDF distributions, phase
functions and shape samplers.

Capability parity with the reference's ray_trace_utils/sampling.py
(PW_linear/bilinear/lincos/lincossin distributions :6-149,
Henyey_Greenstein :150, BDRF distributions :170-274, shape samplers
:286-445), re-designed for TPU: distributions precompute a dense inverse-CDF
table on the host (exact per-interval quadratic inversion) so device
sampling is two loads and a lerp — per-ray ``searchsorted`` costs
~100 ms/Mray on TPU.

All ``sample`` methods take an explicit jax.random key.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_INV_N = 1 << 12  # dense inverse-CDF resolution


def _dense_inverse_cdf(xs, a, b, cdf, tot_integ, n=_INV_N):
    """Invert a piecewise-linear-density CDF exactly on a dense quantile
    grid (host-side). Density on [xs_i, xs_i+1] is a_i x + b_i."""
    r = np.linspace(0.0, 1.0, n + 1)
    i = np.clip(np.searchsorted(cdf, r, side="right") - 1, 0, len(xs) - 2)
    aa = a[i] / (2.0 * tot_integ)
    bb = b[i] / tot_integ
    cc = cdf[i] - aa * xs[i] ** 2 - bb * xs[i]
    with np.errstate(invalid="ignore", divide="ignore"):
        lin = xs[i] + (r - cdf[i]) / np.where(bb == 0.0, 1.0, bb)
        D = np.maximum(bb**2 - 4.0 * aa * (cc - r), 0.0)
        quad = (-bb + np.sqrt(D)) / np.where(aa == 0.0, 1.0, 2.0 * aa)
    out = np.where(aa == 0.0, lin, quad)
    out[0], out[-1] = xs[0], xs[-1]
    return np.clip(out, xs[0], xs[-1])


class PWLinearDistribution:
    """Piecewise-linear 1D density on nodes (xs, ys)
    (ref PW_linear_distribution :6)."""

    def __init__(self, xs, ys):
        self.xs = np.round(np.asarray(xs, dtype=float), 8)
        self.ys = np.round(np.asarray(ys, dtype=float), 8)
        dx = self.xs[1:] - self.xs[:-1]
        self.a = (self.ys[1:] - self.ys[:-1]) / dx
        self.b = self.ys[:-1] - self.a * self.xs[:-1]
        self.integ = dx * (self.ys[1:] + self.ys[:-1]) / 2.0
        self.tot_integ = self.integ.sum()
        self.cdf_def = np.concatenate([[0.0], np.cumsum(self.integ)]) \
            / self.tot_integ
        self._inv = jnp.asarray(_dense_inverse_cdf(
            self.xs, self.a, self.b, self.cdf_def, self.tot_integ))

    def _slice(self, x):
        x = np.asarray(x, dtype=float)
        return np.clip(np.searchsorted(self.xs, x, side="right") - 1,
                       0, len(self.xs) - 2)

    def _slice_jnp(self, x):
        """Traceable interval index (device-side twin of _slice). The node
        tables are tiny, so the searchsorted is over a constant array."""
        return jnp.clip(
            jnp.searchsorted(jnp.asarray(self.xs), x, side="right") - 1,
            0, len(self.xs) - 2)

    def _pdf_jnp(self, x):
        """Traceable PW-linear density (normalized)."""
        loc = self._slice_jnp(x)
        return (jnp.asarray(self.a)[loc] * x
                + jnp.asarray(self.b)[loc]) / self.tot_integ

    def __call__(self, x):
        if isinstance(x, jax.core.Tracer):
            return self._pdf_jnp(x) * self.tot_integ
        loc = self._slice(x)
        return self.a[loc] * np.asarray(x) + self.b[loc]

    def pdf(self, x):
        if isinstance(x, jax.core.Tracer):
            return self._pdf_jnp(x)
        return self(x) / self.tot_integ

    def cdf(self, x):
        loc = self._slice(x)
        x = np.asarray(x, dtype=float)
        return (self.cdf_def[loc]
                + (x - self.xs[loc]) * (self.pdf(x)
                                        + self.ys[loc] / self.tot_integ) / 2.0)

    def sample(self, key, ns: int):
        """Device-side: returns (x_samples, weights)."""
        r = jax.random.uniform(key, (ns,))
        u = r * _INV_N
        i0 = jnp.clip(u.astype(jnp.int32), 0, _INV_N - 1)
        frac = u - i0.astype(u.dtype)
        x = self._inv[i0] * (1.0 - frac) + self._inv[i0 + 1] * frac
        return x, jnp.ones((ns,))

    # legacy aliases
    PDF = pdf
    CDF = cdf


class PWLinCosDistribution(PWLinearDistribution):
    """Density ys(x)*cos(x): samples from the PW-linear approximation with
    importance weights (ref PW_lincos_distribution :99)."""

    def __init__(self, xs, ys):
        xs = np.asarray(xs, dtype=float)
        ys = np.asarray(ys, dtype=float)
        super().__init__(xs, ys * np.cos(xs))
        self.a_cos = (ys[1:] - ys[:-1]) / (xs[1:] - xs[:-1])
        self.b_cos = ys[:-1] - self.a_cos * xs[:-1]
        self.integ_cos = (ys[1:] * np.sin(xs[1:]) - ys[:-1] * np.sin(xs[:-1])
                          + self.a_cos * (np.cos(xs[1:]) - np.cos(xs[:-1])))
        self.tot_integ_cos = self.integ_cos.sum()

    def f(self, x):
        loc = self._slice(x)
        return (self.a_cos[loc] * np.asarray(x) + self.b_cos[loc]) \
            * np.cos(np.asarray(x))

    def pdf_cos(self, x):
        return self.f(x) / self.tot_integ_cos

    def sample(self, key, ns: int):
        """Fully traceable: the importance ratio is evaluated with jnp
        gathers over the (tiny) node tables, so this works inside jit."""
        x, w = super().sample(key, ns)
        loc = self._slice_jnp(x)
        f_cos = (jnp.asarray(self.a_cos)[loc] * x
                 + jnp.asarray(self.b_cos)[loc]) * jnp.cos(x)
        pdf_cos = f_cos / self.tot_integ_cos
        w = w * pdf_cos / jnp.maximum(self._pdf_jnp(x), 1e-300)
        w = w * ns / jnp.sum(w)
        return x, w


class PWLinCosSinDistribution(PWLinearDistribution):
    """Density ys(x)*cos(x)*sin(x) (ref PW_lincossin_distribution :124)."""

    def __init__(self, xs, ys):
        xs = np.asarray(xs, dtype=float)
        ys = np.asarray(ys, dtype=float)
        super().__init__(xs, ys * np.cos(xs) * np.sin(xs))
        self.a_cs = (ys[1:] - ys[:-1]) / (xs[1:] - xs[:-1])
        self.b_cs = ys[:-1] - self.a_cs * xs[:-1]
        # per-segment exact integral of (a_i x + b_i) cos x sin x:
        # F_i(x) = y(x)/2 sin^2 x - a_i/4 (x - sin x cos x); the first
        # term is continuous across nodes (y is), but the a-dependent
        # term must use THIS segment's slope at BOTH endpoints — a
        # single node-indexed antiderivative array would evaluate the
        # upper endpoint with the NEXT segment's slope
        s2 = np.sin(xs) ** 2
        t = xs - np.sin(xs) * np.cos(xs)
        self.integ_cs = (ys[1:] / 2.0 * s2[1:] - ys[:-1] / 2.0 * s2[:-1]
                         - self.a_cs / 4.0 * (t[1:] - t[:-1]))
        self.tot_integ_cs = self.integ_cs.sum()

    def f(self, x):
        loc = self._slice(x)
        x = np.asarray(x)
        return (self.a_cs[loc] * x + self.b_cs[loc]) * np.cos(x) * np.sin(x)

    def pdf_cossin(self, x):
        return self.f(x) / self.tot_integ_cs

    def sample(self, key, ns: int):
        """Fully traceable (see PWLinCosDistribution.sample)."""
        x, w = super().sample(key, ns)
        loc = self._slice_jnp(x)
        f_cs = ((jnp.asarray(self.a_cs)[loc] * x
                 + jnp.asarray(self.b_cs)[loc])
                * jnp.cos(x) * jnp.sin(x))
        pdf_cs = f_cs / self.tot_integ_cs
        w = w * pdf_cs / jnp.maximum(self._pdf_jnp(x), 1e-300)
        w = w * ns / jnp.sum(w)
        return x, w


class PWBilinearDistribution:
    """Bilinear density on a regular (xu, yu) grid
    (ref PW_bilinear_distribution :54). Conditional sampling uses the
    reference's per-x-interval importance scheme, with per-interval inverse
    tables precomputed on the host."""

    def __init__(self, xu, yu, zs):
        self.xu = np.asarray(xu, dtype=float)
        self.yu = np.asarray(yu, dtype=float)
        self.zs = np.asarray(zs, dtype=float)
        f_x = np.array([PWLinearDistribution(self.yu, self.zs[i]).tot_integ
                        for i in range(len(self.xu))])
        self.dist_x = PWLinearDistribution(self.xu, f_x)
        self.tot_integ = self.dist_x.tot_integ
        # per-x-interval conditional y distributions at the interval midpoint
        self._y_dists = []
        for i in range(len(self.xu) - 1):
            x_mid = 0.5 * (self.xu[i] + self.xu[i + 1])
            z_mid = self._interp_rows(x_mid)
            self._y_dists.append(PWLinearDistribution(self.yu, z_mid))
        self._y_inv = jnp.asarray(np.stack(
            [np.asarray(d._inv) for d in self._y_dists]))
        # sampling-density coefficients, stacked once (sample() gathers)
        self._y_a = jnp.asarray(np.stack([d.a for d in self._y_dists]))
        self._y_b = jnp.asarray(np.stack([d.b for d in self._y_dists]))
        self._y_tot = jnp.asarray(np.array(
            [d.tot_integ for d in self._y_dists]))

    def _interp_rows(self, x):
        i = np.clip(np.searchsorted(self.xu, x, side="right") - 1,
                    0, len(self.xu) - 2)
        w = (x - self.xu[i]) / (self.xu[i + 1] - self.xu[i])
        if np.ndim(x):
            w = np.asarray(w)[..., None]   # broadcast over the y axis
        return self.zs[i] * (1 - w) + self.zs[i + 1] * w

    def __call__(self, x, y):
        x = np.asarray(x, dtype=float)
        y = np.asarray(y, dtype=float)
        zx = self._interp_rows(x)  # (n, len(yu)) rows
        j = np.clip(np.searchsorted(self.yu, y, side="right") - 1,
                    0, len(self.yu) - 2)
        wy = (y - self.yu[j]) / (self.yu[j + 1] - self.yu[j])
        rows = np.atleast_2d(zx)
        jj = np.atleast_1d(j)
        pick = rows[np.arange(len(jj)), jj] * (1 - wy) \
            + rows[np.arange(len(jj)), jj + 1] * wy
        return pick if np.ndim(x) else float(pick[0])

    def pdf(self, x, y):
        return self(x, y) / self.tot_integ

    def sample(self, key, ns: int):
        """Returns (x, y, weights) — importance weights from the conditional
        approximation, like the reference. Fully traceable: every density
        evaluation is a jnp gather over the precomputed coefficient grids."""
        kx, ky = jax.random.split(key)
        x, _ = self.dist_x.sample(kx, ns)
        xu, yu = jnp.asarray(self.xu), jnp.asarray(self.yu)
        i = jnp.clip(jnp.searchsorted(xu, x, side="right") - 1,
                     0, len(self.xu) - 2)
        r = jax.random.uniform(ky, (ns,))
        u = r * _INV_N
        j0 = jnp.clip(u.astype(jnp.int32), 0, _INV_N - 1)
        frac = u - j0.astype(u.dtype)
        inv = self._y_inv[i]
        y = jnp.take_along_axis(inv, j0[:, None], axis=1)[:, 0] * (1 - frac) \
            + jnp.take_along_axis(inv, j0[:, None] + 1, axis=1)[:, 0] * frac
        # conditional density p(y|x) = bilinear z(x,y)/tot / p_x(x)
        j = jnp.clip(jnp.searchsorted(yu, y, side="right") - 1,
                     0, len(self.yu) - 2)
        wx = (x - xu[i]) / (xu[i + 1] - xu[i])
        wy = (y - yu[j]) / (yu[j + 1] - yu[j])
        zs = jnp.asarray(self.zs)
        z = (zs[i, j] * (1 - wx) * (1 - wy) + zs[i + 1, j] * wx * (1 - wy)
             + zs[i, j + 1] * (1 - wx) * wy + zs[i + 1, j + 1] * wx * wy)
        p_x = self.dist_x._pdf_jnp(x)
        p_cond = (z / self.tot_integ) / jnp.maximum(p_x, 1e-300)
        # sampling density: the per-x-interval midpoint conditional
        p_sample = (self._y_a[i, j] * y + self._y_b[i, j]) / self._y_tot[i]
        w = p_cond / jnp.maximum(p_sample, 1e-300)
        return x, y, w


class HenyeyGreenstein:
    """Henyey-Greenstein phase function with analytic inverse-CDF sampling
    (ref Henyey_Greenstein :150)."""

    def __init__(self, g: float):
        self.g = float(g)

    def __call__(self, th):
        g = self.g
        return (1.0 / (4.0 * jnp.pi) * (1.0 - g**2)
                / (1.0 + g**2 - 2.0 * g * jnp.cos(th)) ** 1.5)

    def sample(self, key, ns: int):
        k1, k2 = jax.random.split(key)
        s = 2.0 * jax.random.uniform(k1, (ns,)) - 1.0
        phis = 2.0 * jnp.pi * jax.random.uniform(k2, (ns,))
        g = self.g
        if g == 0.0:
            return jnp.arccos(s), phis
        cos_th = (1.0 + g**2 - ((1.0 - g**2) / (1.0 + g * s)) ** 2) \
            / (2.0 * g)
        return jnp.arccos(jnp.clip(cos_th, -1.0, 1.0)), phis


def pw_linear_importance_sampling(dist, key, ns: int):
    """Sample a nonlinear 1D density through its PW-linear approximation
    with importance weights (ref pw_linear_importance_sampling :275).

    The weight is the ratio dist.pdf / sampling.pdf (the reference's inverse-
    PDF sample weights times dist.PDF), renormalized to mean 1. Traceable
    whenever ``dist.pdf`` is written in jnp; a numpy-only dist.pdf still
    works outside jit."""
    sampling = PWLinearDistribution(dist.xs, dist(dist.xs))
    x, w = sampling.sample(key, ns)
    w = w * jnp.asarray(dist.pdf(x)) \
        / jnp.maximum(sampling._pdf_jnp(x), 1e-300)
    w = w / (jnp.sum(w) / ns)
    return x, w


# ---------------------------------------------------------------------------
# Shape samplers (ref sampling.py:286-445): return (positions, normals) as
# (n,3) arrays in the shape's local frame.
# ---------------------------------------------------------------------------

def disk_sampling(key, r_ext: float, ns: int, r_int: float = 0.0):
    k1, k2 = jax.random.split(key)
    ths = jax.random.uniform(k1, (ns,), maxval=2.0 * jnp.pi)
    rs = jnp.sqrt(jax.random.uniform(k2, (ns,))
                  * (r_ext**2 - r_int**2) + r_int**2)
    pos = jnp.stack([rs * jnp.cos(ths), rs * jnp.sin(ths),
                     jnp.zeros(ns)], axis=1)
    normals = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (ns, 1))
    return pos, normals


def rectangle_sampling(key, lx: float, ly: float, ns: int):
    u = jax.random.uniform(key, (ns, 2))
    pos = jnp.stack([(u[:, 0] - 0.5) * lx, (u[:, 1] - 0.5) * ly,
                     jnp.zeros(ns)], axis=1)
    normals = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (ns, 1))
    return pos, normals


def triangle_sampling(key, A, B, C, ns: int):
    A, B, C = (jnp.asarray(v, dtype=float).reshape(3) for v in (A, B, C))
    k1, k2 = jax.random.split(key)
    r1 = jnp.sqrt(jax.random.uniform(k1, (ns,)))
    r2 = jax.random.uniform(k2, (ns,))
    pos = (A[None] * (1 - r1)[:, None] + (r1 * (1 - r2))[:, None] * B[None]
           + (r1 * r2)[:, None] * C[None])
    n = jnp.cross(B - A, C - A)
    n = n / jnp.linalg.norm(n)
    return pos, jnp.tile(n, (ns, 1))


def polygon_sampling(key, verts, ns: int):
    """Uniform points in a simple polygon via triangulation + area-weighted
    triangle picking (ref polygon_sampling :333, which used shapely)."""
    from .geometry import triangulate_polygon
    verts = np.asarray(verts, dtype=float)
    tris = triangulate_polygon(verts)
    p = verts[tris]  # (m,3,2)
    areas = 0.5 * np.abs(
        (p[:, 1, 0] - p[:, 0, 0]) * (p[:, 2, 1] - p[:, 0, 1])
        - (p[:, 2, 0] - p[:, 0, 0]) * (p[:, 1, 1] - p[:, 0, 1]))
    cdf = np.concatenate([[0.0], np.cumsum(areas / areas.sum())])
    k0, k1, k2 = jax.random.split(key, 3)
    r = jax.random.uniform(k0, (ns,))
    ti = jnp.clip(jnp.asarray(
        np.searchsorted(cdf, np.asarray(r), side="right") - 1), 0,
        len(areas) - 1)
    P = jnp.asarray(np.concatenate([p, np.zeros((len(p), 3, 1))], axis=2))
    A, B, C = P[ti, 0], P[ti, 1], P[ti, 2]
    r1 = jnp.sqrt(jax.random.uniform(k1, (ns,)))
    r2 = jax.random.uniform(k2, (ns,))
    pos = (A * (1 - r1)[:, None] + (r1 * (1 - r2))[:, None] * B
           + (r1 * r2)[:, None] * C)
    normals = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (ns, 1))
    return pos, normals


def cylinder_sampling(key, radius: float, height: float, ns: int,
                      inward: bool = False):
    k1, k2 = jax.random.split(key)
    phi = jax.random.uniform(k1, (ns,), maxval=2.0 * jnp.pi)
    z = jax.random.uniform(k2, (ns,), minval=-height / 2, maxval=height / 2)
    pos = jnp.stack([radius * jnp.cos(phi), radius * jnp.sin(phi), z], axis=1)
    nrm = jnp.stack([jnp.cos(phi), jnp.sin(phi), jnp.zeros(ns)], axis=1)
    return pos, (-nrm if inward else nrm)


def frustum_sampling(key, r0: float, r1: float, depth: float, ns: int,
                     inward: bool = False):
    k1, k2 = jax.random.split(key)
    u = jax.random.uniform(k1, (ns,))
    rs = jnp.sqrt((r1**2 - r0**2) * u + r0**2)
    zs = (rs - r0) * depth / (r1 - r0)
    phi = jax.random.uniform(k2, (ns,), maxval=2.0 * jnp.pi)
    pos = jnp.stack([rs * jnp.cos(phi), rs * jnp.sin(phi), zs], axis=1)
    alpha = np.arctan2(r1 - r0, depth)
    nrm = jnp.stack([jnp.cos(phi) * np.cos(alpha),
                     jnp.sin(phi) * np.cos(alpha),
                     jnp.full(ns, -np.sin(alpha))], axis=1)
    return pos, (-nrm if inward else nrm)


def sphere_sampling(key, radius: float, ns: int, inward: bool = False):
    v = jax.random.normal(key, (ns, 3))
    v = v / jnp.linalg.norm(v, axis=1, keepdims=True)
    return radius * v, (-v if inward else v)


def lambertian_directions_sampling(key, ns: int, normals=None,
                                   ang_range: float = jnp.pi / 2):
    """Cosine-weighted directions, optionally rotated onto per-point normals
    (ref Lambertian_directions_sampling :446)."""
    from .sources import lambertian_directions
    from .mathutils import rotate_to_normal
    dirs = lambertian_directions(key, ns, ang_range)
    if normals is not None:
        dirs = rotate_to_normal(dirs, jnp.asarray(normals))
    return dirs


def _cumtrapz(y, x):
    dx = np.diff(x)
    return np.concatenate([[0.0], np.cumsum(0.5 * (y[1:] + y[:-1]) * dx)])


def _invert_density(xs, ys, n_inv, refine):
    """Dense inverse CDF of a piecewise-linear density ys(xs) >= 0
    (host-side). Returns (inverse table (n_inv+1,), total integral)."""
    xf = np.linspace(xs[0], xs[-1], refine * (len(xs) - 1) + 1)
    yf = np.interp(xf, xs, ys)
    c = _cumtrapz(yf, xf)
    tot = float(c[-1])
    if tot <= 0.0:
        return np.full(n_inv + 1, xs[0]), 0.0
    q = np.linspace(0.0, 1.0, n_inv + 1) * tot
    return np.interp(q, c, xf), tot


def _bilerp(tab, fi, fj):
    """tab (A,B); fi,fj fractional indices (n,). 4-gather bilinear."""
    A, B = tab.shape
    i0 = jnp.clip(jnp.floor(fi).astype(jnp.int32), 0, A - 2)
    j0 = jnp.clip(jnp.floor(fj).astype(jnp.int32), 0, B - 2)
    wi = jnp.clip(fi - i0, 0.0, 1.0)
    wj = jnp.clip(fj - j0, 0.0, 1.0)
    flat = tab.reshape(-1)
    g = lambda ii, jj: jnp.take(flat, ii * B + jj)
    return ((1 - wi) * (1 - wj) * g(i0, j0) + (1 - wi) * wj * g(i0, j0 + 1)
            + wi * (1 - wj) * g(i0 + 1, j0) + wi * wj * g(i0 + 1, j0 + 1))


def _trilerp(tab, fi, fj, fk):
    """tab (A,B,C); fractional indices (n,). 8-gather trilinear."""
    A, B, C = tab.shape
    i0 = jnp.clip(jnp.floor(fi).astype(jnp.int32), 0, max(A - 2, 0))
    j0 = jnp.clip(jnp.floor(fj).astype(jnp.int32), 0, max(B - 2, 0))
    k0 = jnp.clip(jnp.floor(fk).astype(jnp.int32), 0, C - 2)
    wi = jnp.clip(fi - i0, 0.0, 1.0) if A > 1 else jnp.zeros_like(fi)
    wj = jnp.clip(fj - j0, 0.0, 1.0) if B > 1 else jnp.zeros_like(fj)
    wk = jnp.clip(fk - k0, 0.0, 1.0)
    i1 = jnp.minimum(i0 + 1, A - 1)
    j1 = jnp.minimum(j0 + 1, B - 1)
    flat = tab.reshape(-1)
    g = lambda ii, jj, kk: jnp.take(flat, (ii * B + jj) * C + kk)
    out = 0.0
    for ii, wii in ((i0, 1 - wi), (i1, wi)):
        for jj, wjj in ((j0, 1 - wj), (j1, wj)):
            out = out + wii * wjj * ((1 - wk) * g(ii, jj, k0)
                                     + wk * g(ii, jj, k0 + 1))
    return out


class BDRFDistribution:
    """Generic tabulated BDRF over reflected (theta_r, phi_r), optionally
    resolved in incidence angle theta_i (axisymmetric incidence) —
    capability parity with the reference's BDRF_distribution /
    BDRF_distribution_noinc (ray_trace_utils/sampling.py:170-274).

    bdrf - (Tr, Pr) array (incidence-independent) or (Ti, Tr, Pr) together
    with thetas_i. The sampled density is bdrf(th, phi) cos(th) sin(th).

    TPU redesign: the reference importance-samples the table per ray in a
    Python loop with correction weights; here each incidence row's theta_r
    marginal and the per-theta_r phi conditionals are inverted ONCE on the
    host into dense inverse-CDF tables, so device sampling is a handful of
    gathers + lerps per ray, draws are exact (weights == 1), and the
    directional-hemispherical reflectance DHR(theta_i) — the reflected
    energy factor — falls out of the same integration. Between incidence
    grid rows the inverse CDFs are interpolated linearly (distributional
    interpolation; exact on the grid rows)."""

    def __init__(self, thetas_r, phis_r, bdrf, thetas_i=None,
                 n_inv: int = 256, refine: int = 8):
        th = np.asarray(thetas_r, dtype=float)
        ph = np.asarray(phis_r, dtype=float)
        B = np.asarray(bdrf, dtype=float)
        if B.ndim == 2:
            B = B[None]
            ti = np.zeros(1)
        else:
            ti = np.asarray(thetas_i, dtype=float)
        Ti, Tr, Pr = B.shape
        if (Ti, Tr, Pr) != (len(ti), len(th), len(ph)):
            raise ValueError("bdrf shape does not match the angle grids")
        thr_inv = np.zeros((Ti, n_inv + 1))
        phi_inv = np.zeros((Ti, Tr, n_inv + 1))
        dhr = np.zeros(Ti)
        for i in range(Ti):
            f_th = np.array([_cumtrapz(B[i, j], ph)[-1] for j in range(Tr)])
            thr_inv[i], dhr[i] = _invert_density(
                th, f_th * np.cos(th) * np.sin(th), n_inv, refine)
            for j in range(Tr):
                phi_inv[i, j], _ = _invert_density(ph, B[i, j], n_inv, refine)
        self.thetas_i = jnp.asarray(ti)
        self.thetas_r = jnp.asarray(th)
        self._thr_inv = jnp.asarray(thr_inv)
        self._phi_inv = jnp.asarray(phi_inv)
        self._dhr = jnp.asarray(dhr)
        self._n_inv = n_inv

    def dhr(self, theta_i):
        """Directional-hemispherical reflectance at incidence theta_i (the
        energy factor of reflected rays; ref BDRF_distribution.DHR :245)."""
        theta_i = jnp.asarray(theta_i)
        if self._dhr.shape[0] == 1:
            return jnp.broadcast_to(self._dhr[0], theta_i.shape)
        return jnp.interp(theta_i, self.thetas_i, self._dhr)

    def sample(self, key, theta_i=0.0, ns: int = None):
        """Draw reflected (theta_r, phi_r). theta_i is a scalar (with ns
        draws) or a per-ray array. Exact inverse-CDF draws: no weights."""
        theta_i = jnp.asarray(theta_i, dtype=self._thr_inv.dtype)
        if theta_i.ndim == 0:
            theta_i = jnp.full((ns,), theta_i)
        n = theta_i.shape[0]
        k1, k2 = jax.random.split(key)
        u1 = jax.random.uniform(k1, (n,), dtype=theta_i.dtype)
        u2 = jax.random.uniform(k2, (n,), dtype=theta_i.dtype)
        Ti = self._thr_inv.shape[0]
        if Ti > 1:
            fi = jnp.interp(theta_i, self.thetas_i,
                            jnp.arange(Ti, dtype=theta_i.dtype))
        else:
            fi = jnp.zeros((n,), dtype=theta_i.dtype)
        th = _bilerp(self._thr_inv, fi, u1 * self._n_inv)
        Tr = self.thetas_r.shape[0]
        fj = jnp.interp(th, self.thetas_r,
                        jnp.arange(Tr, dtype=theta_i.dtype))
        phi = _trilerp(self._phi_inv, fi, fj, u2 * self._n_inv)
        return th, phi
