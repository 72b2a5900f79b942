"""Offline scanning simulator: rasterize meshes, sample scan lines,
build curve clouds (SURVEY.md §2.8)."""
