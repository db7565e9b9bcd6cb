"""One-sided mirrors and receivers (parity with reference
tracer/models/one_sided_mirror.py)."""
from __future__ import annotations

from .. import geometry as G
from .. import materials as M
from ..scene import AssembledObject, Surface


def rect_one_sided_mirror(width: float, height: float,
                          absorptivity: float = 0.0, sigma: float = 0.0,
                          bi_var: bool = True, option: str | None = None,
                          location=None, rotation=None,
                          name: str | None = None) -> AssembledObject:
    """Rectangular front-reflective plate; backside hits are killed
    (ref one_sided_mirror.py:33). 'fast' skips hit recording."""
    opt = M.reflective(absorptivity, sigma, bi_var, one_sided=True)
    if option != "fast":
        opt = M.detector(opt)
    surf = Surface(G.rect_plate(width, height), opt, name=name)
    return AssembledObject(surfs=[surf], location=location, rotation=rotation)


def rect_para_one_sided_mirror(width: float, height: float,
                               focal_length: float, absorptivity: float = 0.0,
                               sigma: float = 0.0, bi_var: bool = True,
                               option: str | None = None, location=None,
                               rotation=None,
                               name: str | None = None) -> AssembledObject:
    """Rectangular-aperture parabolic one-sided mirror (heliostat facet;
    ref one_sided_mirror.py:53)."""
    opt = M.reflective(absorptivity, sigma, bi_var, one_sided=True)
    if option != "fast":
        opt = M.detector(opt)
    surf = Surface(G.rect_parabolic_dish(width, height, focal_length), opt,
                   name=name)
    return AssembledObject(surfs=[surf], location=location, rotation=rotation)


def flat_quad_one_sided_mirror(width: float, height: float, quad_params,
                               absorptivity: float = 0.0, sigma: float = 0.0,
                               bi_var: bool = True, option: str | None = None,
                               location=None, rotation=None,
                               name: str | None = None) -> AssembledObject:
    """General quadratic-surface one-sided mirror (ref :67)."""
    a, b, c, d, e, f = quad_params
    opt = M.reflective(absorptivity, sigma, bi_var, one_sided=True)
    if option == "receiver":
        opt = M.receiver(opt)
    elif option != "fast":
        opt = M.detector(opt)
    surf = Surface(G.rect_flat_quadric(width, height, a, b, c, d, e, f), opt,
                   name=name)
    return AssembledObject(surfs=[surf], location=location, rotation=rotation)


def one_sided_receiver(width: float, height: float,
                       absorptivity: float = 1.0, location=None,
                       rotation=None, name: str = "receiver"):
    """Rectangular one-sided receiving surface with hit recording
    (ref one_sided_mirror.py:85). Returns (surface, object)."""
    front = Surface(G.rect_plate(width, height),
                    M.receiver(M.reflective(absorptivity, one_sided=True)),
                    name=name)
    obj = AssembledObject(surfs=[front], location=location, rotation=rotation)
    return front, obj
