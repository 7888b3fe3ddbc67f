from .rasterizer import (
    Fragments,
    face_normals,
    interpolate_face_attributes,
    project_orthographic_screen,
    project_perspective_screen,
    rasterize,
)
from .renderer import (
    DEFAULT_LIGHTS,
    TexturedIUVRenderer,
    load_densepose_uv,
    load_densepose_uv_host,
)

__all__ = [
    "Fragments",
    "face_normals",
    "interpolate_face_attributes",
    "project_orthographic_screen",
    "project_perspective_screen",
    "rasterize",
    "DEFAULT_LIGHTS",
    "TexturedIUVRenderer",
    "load_densepose_uv",
    "load_densepose_uv_host",
]
