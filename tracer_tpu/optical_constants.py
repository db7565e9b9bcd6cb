"""Optical-constant material models: complex refractive index vs wavelength.

Capability parity with the reference's ray_trace_utils/optical_constants.py
(optical_material base with validity checking :35, Sopra-database loader :9,
file loader :116, hand-written models :99-269). The Sopra n,k data files are
not bundled; ``from_sopra`` reads a user-supplied database directory (same
``NAME.txt`` CSV format). Built-in analytic models (Sellmeier SiO2,
Lorentz-Drude metals per Rakic et al. 1998) are provided in corrected eV
units (see electromagnetics module docstring).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .electromagnetics import dielectric_to_refractive, drude_lorentz_model


class OpticalMaterial:
    """Base material: complex index m(lambdas) valid on [l_min, l_max]
    (wavelengths in meters). Out-of-range queries return NaN with a
    warning-free mask, like the reference's check_valid decorator."""

    def __init__(self, l_min: float, l_max: float, m_func=None,
                 name: str = "material"):
        self.l_min, self.l_max = l_min, l_max
        self._m_func = m_func
        self.name = name

    def _m(self, lambdas):
        return self._m_func(lambdas)

    def m(self, lambdas):
        lambdas = np.atleast_1d(np.asarray(lambdas, dtype=float))
        valid = (lambdas >= self.l_min) & (lambdas <= self.l_max)
        out = np.full(lambdas.shape, np.nan, dtype=complex)
        if valid.any():
            out[valid] = self._m(lambdas[valid])
        return out

    def n(self, lambdas):
        return self.m(lambdas).real

    def k(self, lambdas):
        return self.m(lambdas).imag


class TabulatedMaterial(OpticalMaterial):
    """Material from (wavelength, n, k) samples, linearly interpolated."""

    def __init__(self, lambdas, n, k, name="tabulated"):
        lam = np.asarray(lambdas, dtype=float)
        order = np.argsort(lam)
        lam, n, k = lam[order], np.asarray(n)[order], np.asarray(k)[order]
        self._lam, self._n, self._k = lam, n, k
        super().__init__(lam.min(), lam.max(), name=name)

    def _m(self, lambdas):
        return (np.interp(lambdas, self._lam, self._n)
                + 1j * np.interp(lambdas, self._lam, self._k))


def from_file(filename: str, wavelength_col: int = 0, n_col: int = 1,
              k_col: int = 2, wavelength_unit: str = "nm",
              delimiter: str = ",", skiprows: int = 1) -> OpticalMaterial:
    """Material from a CSV of (wavelength, n, k)
    (ref OpticalMaterialFromFile :116)."""
    unit = {"nm": 1e-9, "um": 1e-6, "m": 1.0}.get(wavelength_unit)
    if unit is None:
        raise ValueError("Invalid wavelength unit. Use 'nm', 'um', or 'm'.")
    data = np.loadtxt(filename, skiprows=skiprows, delimiter=delimiter,
                      usecols=(wavelength_col, n_col, k_col))
    return TabulatedMaterial(data[:, 0] * unit, data[:, 1], data[:, 2],
                             name=os.path.basename(filename))


def from_sopra(material: str, database_dir: str) -> OpticalMaterial:
    """Material from a Sopra-format database directory: file NAME.txt with
    'wavelength_nm, n, k' rows (ref get_from_Sopra :9; point this at your
    copy of the Sopra archive)."""
    path = os.path.join(database_dir, material.upper() + ".txt")
    data = np.loadtxt(path, skiprows=1, delimiter=",")
    return TabulatedMaterial(data[:, 0] * 1e-9, data[:, 1], data[:, 2],
                             name=material)


get_from_sopra = from_sopra


class DrudeLorentzMaterial(OpticalMaterial):
    """Metal from Lorentz-Drude resonators (eV units; Rakic et al. 1998)."""

    def __init__(self, resonators, l_min, l_max, name="LD-metal"):
        self.resonators = np.asarray(resonators, dtype=float)
        super().__init__(l_min, l_max, name=name)

    def _m(self, lambdas):
        return dielectric_to_refractive(
            drude_lorentz_model(lambdas, self.resonators))


class Air(OpticalMaterial):
    """Vacuum/air placeholder, n = 1 (ref Air :143)."""

    def __init__(self):
        super().__init__(1e-9, 1.0, name="Air")

    def _m(self, lambdas):
        return np.ones(len(np.atleast_1d(lambdas)), dtype=complex)


class SiO2(OpticalMaterial):
    """Fused silica, Malitson 1965 Sellmeier (ref SiO2 :157)."""

    def __init__(self):
        super().__init__(210e-9, 6.7e-6, name="SiO2")

    def _m(self, lambdas):
        L2 = (np.asarray(lambdas) * 1e6) ** 2
        n = np.sqrt(1.0 + 0.6961663 * L2 / (L2 - 0.0684043**2)
                    + 0.4079426 * L2 / (L2 - 0.1162414**2)
                    + 0.8974794 * L2 / (L2 - 9.896161**2))
        return n + 0j


# Lorentz-Drude parameters [sqrt(f)*wp (eV), w0 (eV), gamma (eV)] from
# Rakic et al., "Optical properties of metallic films for vertical-cavity
# optoelectronic devices", Appl. Opt. 37 (1998). Rows: Drude term first.
_LD_CU = [[8.21225411, 0.0, 0.030], [2.67481269, 0.291, 0.378],
          [3.49257006, 2.957, 1.056], [9.20868474, 5.300, 3.213],
          [8.65045191, 11.18, 4.305]]
_LD_AL = [[10.83334709, 0.0, 0.047], [7.13714865, 0.333, 0.333],
          [3.34962983, 0.312, 0.312], [6.10331602, 1.351, 1.351],
          [2.59461211, 3.382, 3.382]]
_LD_TI = [[2.80451900, 0.0, 0.082], [6.91205801, 2.276, 2.276],
          [4.57008001, 2.518, 2.518], [3.15245090, 1.663, 1.663],
          [0.23053004, 1.762, 1.762]]
_LD_W = [[13.045 * np.sqrt(0.206), 0.0, 0.064],
         [13.045 * np.sqrt(0.054), 1.004, 0.530],
         [13.045 * np.sqrt(0.166), 1.917, 1.281],
         [13.045 * np.sqrt(0.706), 3.580, 3.332],
         [13.045 * np.sqrt(2.590), 7.498, 5.836]]


def Cu():
    return DrudeLorentzMaterial(_LD_CU, 207e-9, 12.4e-6, name="Cu")


def Al():
    return DrudeLorentzMaterial(_LD_AL, 62e-9, 248e-6, name="Al")


def Ti():
    return DrudeLorentzMaterial(_LD_TI, 248e-9, 31e-6, name="Ti")


def W():
    return DrudeLorentzMaterial(_LD_W, 150e-9, 24.9e-6, name="W")


def Rh(filename: Optional[str] = None):
    """Rhodium from a user-supplied (um, n, k) table (the reference read a
    hard-coded absolute path on the author's disk, :237)."""
    if filename is None:
        raise ValueError("Rh needs a data file: Rh(filename=...)")
    return from_file(filename, wavelength_unit="um", delimiter=None)


def Ta(filename: Optional[str] = None):
    """Tantalum from a user-supplied CSV (Werner 2009 + Ordal 1988 mix in
    the reference's other_material_data; :248)."""
    if filename is None:
        raise ValueError("Ta needs a data file: Ta(filename=...)")
    return from_file(filename)


def Al2O3(filename: Optional[str] = None):
    """Sapphire (ordinary ray) from a user-supplied Querry CSV (:99)."""
    if filename is None:
        raise ValueError("Al2O3 needs a data file: Al2O3(filename=...)")
    return from_file(filename, wavelength_unit="um")
