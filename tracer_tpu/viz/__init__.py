"""Visualization: surface meshes, 3D scene/ray rendering, scene tree."""
