"""Optics-manager descriptors: what happens when a ray hits a surface.

Re-design of the reference's optics managers (tracer/optics_callables.py):
instead of per-surface Python callables, each surface carries an integer
``kind``, a packed parameter vector and a flag word; the shade kernel
(kernels/shade.py) computes every interaction branchlessly and selects by
kind. Accounting (the reference's "accountant" system) is configured per
surface via record flags and realized by the engine's per-bounce records
(engine.BounceRecord / TraceResult.hits_of).

The generated-class-name API of the reference (ReflectiveReceiver,
OneSidedRealReflectiveDetector, ...) is kept as a thin compatibility layer in
``tracer_tpu.compat`` built from these descriptors.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

# --- optics kinds (must match kernels/shade.py) -----------------------------
K_TRANSPARENT = 0      # pass through unchanged (ref Transparent :93)
K_REFLECT = 1          # specular mirror; sigma>0 adds slope error
                       # (ref Reflective :116, RealReflective :214)
K_LAMBERTIAN = 2       # cosine-weighted diffuse (ref Lambertian :143)
K_LAMBERTIAN_SPECULAR = 3  # w.p. specularity specular else diffuse (:553)
K_SEMI_LAMBERTIAN = 4  # diffuse below ang_range, specular at glancing (:506)
K_REFLECT_SPECTRAL = 5  # wavelength-interpolated absorptance (:178)
K_REFRACTIVE = 6       # homogenous-media Fresnel interface (:1186)
K_PERIODIC = 7         # periodic boundary teleport (:690)
K_ABSORBER = 8         # perfect absorber (Reflective with abs=1 shortcut)
K_COOK_TORRANCE = 9    # microfacet BDRF (:630); analytic Beckmann sampling
K_FRESNEL_CONDUCTOR = 10  # complex-index conductor interface (:1523)
K_LAMBERTIAN_PIECEWISE = 11  # piecewise directional/spectral diffuse
                             # absorptance family (:331-491)

N_OPT_PARAMS = 12

# --- flag bits --------------------------------------------------------------
F_ONE_SIDED = 1 << 0   # zero energy for rays arriving along local +Z
F_BIVAR = 1 << 1       # bivariate (tan-gauss) slope error instead of radial
F_IAM = 1 << 2         # Martin-Ruiz incidence-angle modifier active
F_SPLIT = 1 << 3       # refractive: split energy instead of Russian roulette
F_BACKSIDE_MISS = 1 << 4  # rays arriving along local +Z MISS this row
#                           entirely (bifacial lowering: each row of the
#                           coincident pair is visible only from its face,
#                           so the twin — not a one-sided kill — handles
#                           the other side)


@dataclasses.dataclass
class OpticsSpec:
    """Host-side description of a surface's optical behavior.

    params layout by kind:
      REFLECT:    p0=absorptivity p1=sigma_slope  p4=a_r p5=c (IAM)
      LAMBERTIAN: p0=absorptivity p1=ang_range    p4=a_r p5=c
      LAMBERTIAN_SPECULAR: p0=abs p1=specularity p2=sigma p4=a_r p5=c
      SEMI_LAMBERTIAN:     p0=abs p1=ang_range
      REFLECT_SPECTRAL: p0=table_start p1=table_len p2=sigma
      REFRACTIVE: p0=n1 p1=n2 p2=sigma p6=att1 p7=att2 p8=scat1 p9=scat2
                  p10=g1 p11=g2   (medium tuple toggled on crossing)
      PERIODIC:   p0=period
    """

    kind: int
    params: np.ndarray
    flags: int = 0
    # accounting configuration (realized via engine per-bounce records):
    record: tuple = ()   # subset of accountant names, e.g ("location","absorption")
    spectral_table: Optional[np.ndarray] = None  # (n,2) [wavelength, absorptance]
    # (att, scat, g) of the AMBIENT medium this optics expects the scene
    # to sit in — carried by the periodic-medium composites (reference's
    # ScatteringPeriodicBoundary family, optics_callables.py:1038-1106:
    # their medium applies to every path segment, which in this engine is
    # the ambient medium). compile_scene aggregates it onto the table and
    # the engine folds it into the source's ambient slots, so ported
    # reference scripts carry the medium with the optics object.
    ambient_medium: Optional[tuple] = None

    def replace(self, **kw) -> "OpticsSpec":
        return dataclasses.replace(self, **kw)


def _params(*vals) -> np.ndarray:
    p = np.zeros(N_OPT_PARAMS)
    p[: len(vals)] = vals
    return p


def transparent() -> OpticsSpec:
    return OpticsSpec(K_TRANSPARENT, _params())


def reflective(absorptivity: float = 0.0, sigma: float = 0.0,
               bi_var: bool = False, one_sided: bool = False) -> OpticsSpec:
    """Specular mirror with absorptivity; sigma > 0 adds surface slope error
    (radial Gaussian by default, bivariate tan-Gaussian with bi_var).
    Covers ref Reflective/RealReflective/OneSided* variants."""
    flags = (F_BIVAR if bi_var else 0) | (F_ONE_SIDED if one_sided else 0)
    return OpticsSpec(K_REFLECT, _params(absorptivity, sigma), flags)


# The reference's module-level convenience constant.
def perfect_mirror() -> OpticsSpec:
    return reflective(0.0)


def real_reflective(absorptivity: float, sigma: float,
                    bi_var: bool = False, one_sided: bool = False) -> OpticsSpec:
    return reflective(absorptivity, sigma, bi_var, one_sided)


def lambertian(absorptivity: float = 0.0, ang_range: float = np.pi / 2,
               one_sided: bool = False) -> OpticsSpec:
    flags = F_ONE_SIDED if one_sided else 0
    return OpticsSpec(K_LAMBERTIAN, _params(absorptivity, ang_range), flags)


def lambertian_specular(absorptivity: float = 0.0,
                        specularity: float = 0.5,
                        sigma: float = 0.0) -> OpticsSpec:
    return OpticsSpec(K_LAMBERTIAN_SPECULAR,
                      _params(absorptivity, specularity, sigma))


def semi_lambertian(absorptivity: float = 0.0,
                    ang_range: float = np.pi / 2) -> OpticsSpec:
    return OpticsSpec(K_SEMI_LAMBERTIAN, _params(absorptivity, ang_range))


def reflective_spectral(absorptances, wavelengths, sigma: float = 0.0,
                        one_sided: bool = False) -> OpticsSpec:
    """Wavelength-dependent absorptance, linearly interpolated (ref
    Reflective_spectral :178). The table is packed into the scene's shared
    spectral table at compile time."""
    table = np.stack([np.asarray(wavelengths, dtype=float),
                      np.asarray(absorptances, dtype=float)], axis=1)
    flags = F_ONE_SIDED if one_sided else 0
    return OpticsSpec(K_REFLECT_SPECTRAL, _params(0, len(table), sigma),
                      flags, spectral_table=table)


def refractive_homogenous(n1: float, n2: float, single_ray: bool = True,
                          sigma: float = 0.0,
                          att1: float = 0.0, att2: float = 0.0,
                          scat1: float = 0.0, scat2: float = 0.0,
                          g1: float = 0.0, g2: float = 0.0) -> OpticsSpec:
    """Fresnel interface between homogenous media with indices n1/n2; the
    active pair member is toggled against the ray's current ref_index (ref
    RefractiveHomogenous :1186). single_ray=True uses Russian roulette
    (TPU-friendly, keeps the ray population fixed); False requests
    energy-splitting which the engine realizes with a doubled ray slab.

    att/scat/g define the attenuation [1/m], scattering [1/m] and HG
    asymmetry of each medium; crossing rays pick up the entered medium's
    values (covers ref RefractiveAbsorbantHomogenous :1298 and
    RefractiveScatteringHomogenous :1350 compositionally)."""
    flags = 0 if single_ray else F_SPLIT
    p = _params(n1, n2, sigma)
    p[6:12] = [att1, att2, scat1, scat2, g1, g2]
    return OpticsSpec(K_REFRACTIVE, p, flags)


def _index_table(mat, wl_range, n_samples):
    """n(lambda) table from a material: an optical_constants object with
    .m(wavelengths), a (wavelengths, indices) pair, or a constant float."""
    if hasattr(mat, "m"):
        wls = np.linspace(wl_range[0], wl_range[1], n_samples)
        ns = np.real(np.atleast_1d(mat.m(wls)))
        ok = np.isfinite(ns)  # drop points outside the validity range
        wls, ns = wls[ok], ns[ok]
        if len(wls) == 0:
            raise ValueError("material has no data inside wl_range")
    elif np.isscalar(mat):
        wls, ns = np.array([0.0]), np.array([float(mat)])
    else:
        wls, ns = (np.asarray(v, dtype=float) for v in mat)
    return np.stack([wls, ns], axis=1)


def refractive_material(material_1, material_2, single_ray: bool = True,
                        sigma: float = 0.0,
                        wl_range=(300e-9, 2500e-9),
                        n_samples: int = 64,
                        att1: float = 0.0, att2: float = 0.0,
                        scat1: float = 0.0, scat2: float = 0.0,
                        g1: float = 0.0, g2: float = 0.0) -> OpticsSpec:
    """Fresnel interface between two dispersive media whose indices come
    from material callables, evaluated at each ray's wavelength (ref
    Refractive, optics_callables.py:726: toggles between two
    optical_constants materials per ray). Each side may be an
    optical_constants material (anything with .m(wl)), an explicit
    (wavelengths, n) table, or a constant float.

    Both n(lambda) tables are packed as one chunk into the scene's shared
    spectral table; params[3:6] = (chunk start [compile-time], len side 1,
    len side 2) and shading interpolates per ray. params[0:2] hold the mean
    indices as the non-dispersive fallback."""
    t1 = _index_table(material_1, wl_range, n_samples)
    t2 = _index_table(material_2, wl_range, n_samples)
    flags = 0 if single_ray else F_SPLIT
    p = _params(float(t1[:, 1].mean()), float(t2[:, 1].mean()), sigma,
                0.0, float(len(t1)), float(len(t2)))
    # medium tuple slots shared with refractive_homogenous (covers ref
    # RefractiveScattering / RefractiveScatteringAbsorbant,
    # optics_callables.py:1108 :1172: material-based interfaces whose
    # sides carry absorbing/scattering media)
    p[6:12] = [att1, att2, scat1, scat2, g1, g2]
    return OpticsSpec(K_REFRACTIVE, p, flags,
                      spectral_table=np.concatenate([t1, t2], axis=0))


def refractive_absorbant_homogenous(n1, n2, att1=0.0, att2=0.0,
                                    single_ray=True, sigma=0.0) -> OpticsSpec:
    """Refractive interface between absorbing media (ref
    RefractiveAbsorbantHomogenous :1298)."""
    return refractive_homogenous(n1, n2, single_ray, sigma, att1, att2)


def absorbant_interface(att_inside: float, n: float = 1.0) -> OpticsSpec:
    """Transparent boundary of an absorbing volume: rays crossing it toggle
    their medium attenuation coefficient (covers ref Absorbant :861 used as
    a volume boundary). n identical on both sides -> no bending, no Fresnel
    reflection; toggling keys on the medium tuple."""
    return refractive_homogenous(n, n, att1=0.0, att2=att_inside)


def scattering_interface(scat_inside: float, g: float = 0.0,
                         att_inside: float = 0.0,
                         n: float = 1.0) -> OpticsSpec:
    """Transparent boundary of a scattering (optionally absorbing) volume
    (covers ref Scattering :946 / ScatteringAbsorbant composites). The
    engine samples Henyey-Greenstein free paths inside."""
    return refractive_homogenous(n, n, att1=0.0, att2=att_inside,
                                 scat1=0.0, scat2=scat_inside,
                                 g1=0.0, g2=g)


def refractive_transmissive_homogenous(n1: float, n2: float,
                                       attenuation_coefficients,
                                       single_ray: bool = True,
                                       sigma: float = 0.0) -> OpticsSpec:
    """Refractive interface between homogenous media with Beer-Lambert
    attenuation along the traversed path (ref RefractiveTransmissiveHomogenous
    optics_callables.py:1326, which composes RefractiveHomogenous with
    Absorbant :861 — attenuation only, no Fresnel-coefficient coupling).
    ``attenuation_coefficients`` is a scalar (both media) or an (a1, a2)
    pair, in 1/m. The engine attenuates each segment by exp(-a*d) with the
    per-ray coefficient toggled at every crossing."""
    ac = np.atleast_1d(np.asarray(attenuation_coefficients, dtype=float))
    a1, a2 = (ac[0], ac[0]) if len(ac) == 1 else (ac[0], ac[1])
    return refractive_homogenous(n1, n2, single_ray, sigma,
                                 att1=float(a1), att2=float(a2))


def fresnel_conductor_homogenous(n1: float, material,
                                 wl_range=(300e-9, 2500e-9),
                                 n_samples: int = 64) -> OpticsSpec:
    """Conductor interface: specular reflection with the randomly-polarized
    Fresnel-conductor reflectance R(theta, n2 + i k2) at each ray's
    wavelength; the transmitted fraction is absorbed in the skin depth (ref
    FresnelConductorHomogenous optics_callables.py:1523 — valid for
    k2 >> 1, no refracted ray is traced).

    ``material`` is an optical_constants material (anything with .m(wl)
    returning a complex index), an explicit (wavelengths, n, k) triple, or
    a complex constant. n(lambda) and k(lambda) are packed as one chunk of
    the scene's shared spectral table; params = (n1, start, L)."""
    if hasattr(material, "m"):
        wls = np.linspace(wl_range[0], wl_range[1], n_samples)
        m = np.atleast_1d(material.m(wls))
        ok = np.isfinite(m)
        wls, m = wls[ok], m[ok]
        if len(wls) == 0:
            raise ValueError("material has no data inside wl_range")
        ns, ks = np.real(m), np.imag(m)
    elif np.isscalar(material):
        m = complex(material)
        wls, ns, ks = np.array([0.0]), np.array([m.real]), np.array([m.imag])
    else:
        wls, ns, ks = (np.asarray(v, dtype=float) for v in material)
    # one chunk: L rows of (wl -> n) then L rows of (wl -> k)
    table = np.concatenate([np.stack([wls, ns], axis=1),
                            np.stack([wls, ks], axis=1)], axis=0)
    spec = OpticsSpec(K_FRESNEL_CONDUCTOR, _params(n1, 0.0, float(len(wls))))
    spec.pack_tables = [(table, 1)]   # chunk start written into params[1]
    return spec


def lambertian_directional_piecewise(thetas, absorptance,
                                     specularity=0.0) -> OpticsSpec:
    """Diffuse (or partly specular) opaque surface whose axisymmetric
    absorptance is piecewise-linearly interpolated over the incidence angle
    (ref Lambertian_directional_axisymmetric_piecewise :331,
    LambertianSpecular_...:431 and Lambertian_piecewise_Specular_...:460).

    thetas      increasing angles to the normal in [0, pi/2]
    absorptance absorptance at each theta
    specularity scalar probability of a specular bounce, or a per-theta
                table (interpolated like the absorptance)

    The diffuse branch samples the full hemisphere (the reference's
    pillbox with ang_range = pi/2)."""
    thetas = np.asarray(thetas, dtype=float)
    absorptance = np.asarray(absorptance, dtype=float)
    abs_tab = np.stack([thetas, absorptance], axis=1)
    spec_tab = None
    if np.ndim(specularity) == 0:
        p = _params(0.0, float(len(thetas)), float(specularity), -1.0)
    else:
        spec_tab = np.stack([thetas, np.asarray(specularity, dtype=float)],
                            axis=1)
        p = _params(0.0, float(len(thetas)), 0.0, 0.0)
    out = OpticsSpec(K_LAMBERTIAN_PIECEWISE, p)
    out.pack_tables = [(abs_tab, 0)]
    if spec_tab is not None:
        out.pack_tables.append((spec_tab, 3))
    return out


def lambertian_directional_spectral_piecewise(thetas, wavelengths,
                                              absorptance) -> OpticsSpec:
    """Diffuse opaque surface whose absorptance is bilinearly interpolated
    over (incidence angle, wavelength) (ref
    Lambertian_directional_axisymmetric_piecewise_spectral :363; the
    Polychromatic variant :393 is subsumed — instead of carrying dense
    per-ray spectra, sample ray wavelengths from the source spectrum and
    the MC estimate converges to the same spectrally-integrated power).

    absorptance is (len(thetas), len(wavelengths))."""
    thetas = np.unique(np.asarray(thetas, dtype=float))
    wavelengths = np.unique(np.asarray(wavelengths, dtype=float))
    if len(thetas) < 2 or len(wavelengths) < 2:
        raise ValueError("need >= 2 thetas and >= 2 wavelengths "
                         "(bilinear grid)")
    grid = np.reshape(np.asarray(absorptance, dtype=float),
                      (len(thetas), len(wavelengths)))
    # chunks: theta axis (values in x), wavelength axis, then the grid
    # row-major in the y column
    th_tab = np.stack([thetas, np.zeros_like(thetas)], axis=1)
    wl_tab = np.stack([wavelengths, np.zeros_like(wavelengths)], axis=1)
    grid_tab = np.stack([np.zeros(grid.size), grid.reshape(-1)], axis=1)
    p = _params(0.0, float(len(thetas)), 0.0, -1.0,
                0.0, float(len(wavelengths)), 0.0)
    out = OpticsSpec(K_LAMBERTIAN_PIECEWISE, p)
    out.pack_tables = [(th_tab, 0), (wl_tab, 4), (grid_tab, 6)]
    return out


def bifacial(front: OpticsSpec, back: OpticsSpec) -> OpticsSpec:
    """Different optics per face side (ref BiFacial :1877). Lowered by the
    scene compiler into two coincident rows (front as-is, back on a
    pi-flipped frame), each carrying F_BACKSIDE_MISS so it is visible
    ONLY from its own face — rays from the other side intersect the twin
    instead. (A one-sided KILL on the pair would be wrong: the front row
    could win the coincident nearest-hit tie and zero rays that should
    have seen the back optics — e.g. a transparent or mirror back.)"""
    out = front.replace(flags=front.flags | F_BACKSIDE_MISS)
    out.back_spec = back.replace(flags=back.flags | F_BACKSIDE_MISS)
    return out


def bdrf_cook_torrance(alpha: float, m_n: float, m_k: float,
                       R_lam: float = 1.0) -> OpticsSpec:
    """Cook-Torrance isotropic microfacet BDRF (ref
    BDRF_Cook_Torrance_isotropic :630). The reference tabulates the BDRF on
    an angular grid and importance-samples it per ray in Python; here the
    Beckmann facet distribution is sampled analytically on device and the
    throughput weight F*G*|d.h| / (|n.d||n.h|) applied — the standard
    microfacet importance-sampling identity, physically equivalent.

    alpha - Beckmann roughness; m_n + i*m_k - complex refractive index of
    the surface at the design wavelength; R_lam - reflectance scale."""
    return OpticsSpec(K_COOK_TORRANCE, _params(alpha, m_n, m_k, R_lam))


def periodic_boundary(period: float, medium=None) -> OpticsSpec:
    """Teleports rays by ``period`` along the surface normal (ref
    PeriodicBoundary :690). ``medium=(att, scat, g)`` declares the ambient
    participating medium the periodic cell is filled with (the reference's
    periodic x scattering/absorbant composites apply their medium to every
    path segment; here the engine folds it into the source's ambient
    slots — see OpticsSpec.ambient_medium)."""
    med = None
    if medium is not None and any(float(v) != 0.0 for v in medium[:2]):
        med = (float(medium[0]), float(medium[1]),
               float(medium[2]) if len(medium) > 2 else 0.0)
    return OpticsSpec(K_PERIODIC, _params(period), ambient_medium=med)


def scattering_periodic_boundary(period: float, sc: float, g_hg: float = 0.0,
                                 att: float = 0.0) -> OpticsSpec:
    """Periodic boundary of a cell filled with a Henyey-Greenstein
    scattering (optionally absorbing) medium — ref
    ScatteringPeriodicBoundary / ScatteringAbsorbantPeriodicBoundary
    (optics_callables.py:1038 :1094)."""
    return periodic_boundary(period, medium=(att, sc, g_hg))


def absorbant_periodic_boundary(period: float, att: float) -> OpticsSpec:
    """Periodic boundary of an absorbing cell — ref
    AbsorbantPeriodicBoundary (optics_callables.py:1089; its ctor is
    broken upstream, SURVEY §2.11 — capability kept, defect not)."""
    return periodic_boundary(period, medium=(att, 0.0, 0.0))


def absorber(one_sided: bool = True) -> OpticsSpec:
    """Perfect absorber: the standard receiver surface."""
    return reflective(1.0, one_sided=one_sided)


def iam(spec: OpticsSpec, a_r: float, c: float = 1.0) -> OpticsSpec:
    """Wrap a spec with the Martin-Ruiz incidence angle modifier (ref IAM
    :271): energy *= 1 - abs*(1-exp(-cos(aoi)/a_r))/(1-exp(-1/a_r))."""
    p = spec.params.copy()
    p[4] = a_r
    p[5] = c
    return spec.replace(params=p, flags=spec.flags | F_IAM)


# --- accounting sugar (reference's Receiver/Detector aliases) ---------------

def with_accounting(spec: OpticsSpec, *what: str) -> OpticsSpec:
    """Request per-hit recording for this surface. ``what`` from:
    location, absorption, reception, direction, normal, spectral,
    polychromatic (per-hit outgoing spectra on polychromatic bundles),
    attenuation, scattering. Mirrors the reference's accountant class
    factory aliases (optics_callables.py:2043-2092) compositionally."""
    valid = {"location", "absorption", "reception", "direction", "normal",
             "spectral", "attenuation", "scattering", "polychromatic"}
    bad = set(what) - valid
    if bad:
        raise ValueError(f"unknown accountants: {bad}")
    return spec.replace(record=tuple(dict.fromkeys(spec.record + tuple(what))))


def receiver(spec: OpticsSpec) -> OpticsSpec:
    """Location + absorption accounting (ref alias Receiver)."""
    return with_accounting(spec, "location", "absorption")


def detector(spec: OpticsSpec) -> OpticsSpec:
    """Direction + location + absorption accounting (ref alias Detector)."""
    return with_accounting(spec, "direction", "location", "absorption")


def transmitter(spec: OpticsSpec) -> OpticsSpec:
    """Location + scattering(outgoing energy) accounting (ref Transmitter)."""
    return with_accounting(spec, "location", "scattering")
