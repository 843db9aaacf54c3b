from zrenderer_tpu.raster_ref.raster_cpu import (
    pack_u8,
    rasterize_setup,
    render_scene_cpu,
)

__all__ = ["pack_u8", "rasterize_setup", "render_scene_cpu"]
