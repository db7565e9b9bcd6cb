"""Ray bundle: a fixed-width struct-of-arrays pytree.

Capability parity with the reference's ``tracer/ray_bundle.py`` (RayBundle
with vertices/directions/energy/parents/ref_index plus ad-hoc properties),
re-designed TPU-first: fields are fixed at construction, rays live in
(N, ...) arrays so the ray axis shards over a device mesh, and selection is
expressed with boolean masks instead of index fancy-slicing so shapes stay
static under jit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class RayBundle:
    """SoA ray store. All arrays share leading dim N (the ray axis).

    pos        (N,3) ray origin
    dir        (N,3) unit direction
    energy     (N,)  power carried [W]
    wavelength (N,)  vacuum wavelength (units follow the user; 0 = unset)
    ref_index  (N,)  refractive index of the medium the ray travels in
    att_coeff  (N,)  attenuation coefficient of the medium [1/m] (0 = clear)
    scat_coeff (N,)  scattering coefficient of the medium [1/m] (0 = none)
    scat_g     (N,)  Henyey-Greenstein asymmetry of the medium
    alive      (N,)  bool, False for slots that no longer carry a ray
    parent     (N,)  int32 index into the previous bounce's bundle

    The medium fields replace the reference's per-manager medium toggling
    (optics_callables Absorbant :861 / Scattering :946, which stored
    scat_coeff on the bundle too) and make volumetric effects an engine
    mechanism instead of surface-callable side effects.
    """

    pos: jnp.ndarray
    dir: jnp.ndarray
    energy: jnp.ndarray
    wavelength: jnp.ndarray
    ref_index: jnp.ndarray
    att_coeff: jnp.ndarray
    scat_coeff: jnp.ndarray
    scat_g: jnp.ndarray
    alive: jnp.ndarray
    parent: jnp.ndarray
    # Optional POLYCHROMATIC extension (ref optics_callables.py:137-138 /
    # PolychromaticAccountant :1825): every ray carries a full spectral
    # power density ``spectra`` (N, K) [W/m of wavelength] over ONE shared
    # ``spectral_grid`` (K,) of vacuum wavelengths — a TPU-first redesign
    # of the reference's per-ray wavelength grids (static shapes, one
    # trapezoid rule). ``energy`` must equal trapz(spectra, grid) at
    # construction (see with_spectra); the host-stepped engine keeps the
    # identity through every interaction. None = monochromatic bundle.
    spectra: jnp.ndarray = None
    spectral_grid: jnp.ndarray = None

    # ---- construction ----------------------------------------------------
    @classmethod
    def create(
        cls,
        pos,
        dir,
        energy=None,
        wavelength=None,
        ref_index=None,
        att_coeff=None,
        scat_coeff=None,
        scat_g=None,
        alive=None,
        parent=None,
        dtype=None,
    ) -> "RayBundle":
        pos = jnp.asarray(pos, dtype=dtype)
        dir = jnp.asarray(dir, dtype=dtype)
        if pos.ndim != 2 or pos.shape[1] != 3:
            raise ValueError(f"pos must be (N,3), got {pos.shape}")
        n = pos.shape[0]
        f = pos.dtype

        def arr(x, fill):
            if x is None:
                return jnp.full((n,), fill, dtype=f)
            return jnp.broadcast_to(jnp.asarray(x, dtype=f), (n,))

        energy = arr(energy, 1.0)
        wavelength = arr(wavelength, 0.0)
        ref_index = arr(ref_index, 1.0)
        att_coeff = arr(att_coeff, 0.0)
        scat_coeff = arr(scat_coeff, 0.0)
        scat_g = arr(scat_g, 0.0)
        if alive is None:
            alive = jnp.ones((n,), dtype=bool)
        else:
            alive = jnp.broadcast_to(jnp.asarray(alive, dtype=bool), (n,))
        if parent is None:
            parent = jnp.arange(n, dtype=jnp.int32)
        else:
            parent = jnp.broadcast_to(jnp.asarray(parent, dtype=jnp.int32), (n,))
        return cls(pos, dir, energy, wavelength, ref_index, att_coeff,
                   scat_coeff, scat_g, alive, parent)

    def with_spectra(self, spectral_grid, spectra) -> "RayBundle":
        """Attach per-ray spectra (N, K) over a shared wavelength grid
        (K,); ``energy`` is recomputed as the trapezoid integral of each
        spectrum so the polychromatic and scalar accounting agree exactly
        (ref rays carry spectra whose trapz IS the energy,
        optics_callables.py:413)."""
        grid = jnp.asarray(spectral_grid, dtype=self.pos.dtype)
        spec = jnp.asarray(spectra, dtype=self.pos.dtype)
        if spec.shape != (self.num_rays, grid.shape[0]):
            raise ValueError(f"spectra must be (N, K) = "
                             f"({self.num_rays}, {grid.shape[0]}), got "
                             f"{spec.shape}")
        energy = jnp.trapezoid(spec, grid, axis=1)
        return self.replace(spectra=spec, spectral_grid=grid,
                            energy=energy)

    # ---- basic queries ----------------------------------------------------
    @property
    def num_rays(self) -> int:
        return self.pos.shape[0]

    def total_energy(self) -> jnp.ndarray:
        """Sum of energy carried by live rays."""
        return jnp.sum(jnp.where(self.alive, self.energy, 0.0))

    # ---- functional updates ------------------------------------------------
    def inherit(self, **overrides) -> "RayBundle":
        """Copy-with-overrides (the TPU analog of reference inherit)."""
        return self.replace(**overrides)

    def select(self, mask: jnp.ndarray) -> "RayBundle":
        """Keep rays where ``mask``; others become dead slots (static shape)."""
        return self.replace(alive=self.alive & mask)

    def concat(self, other: "RayBundle") -> "RayBundle":
        """Concatenate two bundles along the ray axis (host/staging use)."""
        return jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a, b], axis=0), self, other
        )

    def compact_host(self) -> "RayBundle":
        """Drop dead slots. Host-side only (dynamic shape)."""
        mask = np.asarray(self.alive)
        return jax.tree_util.tree_map(lambda a: jnp.asarray(np.asarray(a)[mask]), self)

    def pad_to(self, n: int) -> "RayBundle":
        """Pad with dead rays up to n slots (for fixed-slab batching)."""
        cur = self.num_rays
        if cur == n:
            return self
        if cur > n:
            raise ValueError(f"cannot pad {cur} rays down to {n}")
        extra = n - cur

        def pad(a):
            pad_width = [(0, extra)] + [(0, 0)] * (a.ndim - 1)
            return jnp.pad(a, pad_width)

        padded = jax.tree_util.tree_map(pad, self)
        alive = padded.alive.at[cur:].set(False)
        return padded.replace(alive=alive)


def concatenate_rays(bundles) -> RayBundle:
    """Concatenate a sequence of bundles along the ray axis."""
    bundles = list(bundles)
    if not bundles:
        raise ValueError("no bundles to concatenate")
    out = bundles[0]
    for b in bundles[1:]:
        out = out.concat(b)
    return out
