"""Mesh overlay renderer (reference layer L4: include/RenderSMPLMesh.h)."""

from smpltpu.render.raster import build_drawlist, render_mesh_overlay  # noqa: F401
