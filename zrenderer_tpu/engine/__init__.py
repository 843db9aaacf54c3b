from zrenderer_tpu.engine.config import RenderConfig
from zrenderer_tpu.engine.renderer import Renderer
from zrenderer_tpu.engine.stats import FrameStats
from zrenderer_tpu.engine.textures import Texture, checkerboard, white_texture

__all__ = [
    "RenderConfig",
    "Renderer",
    "FrameStats",
    "Texture",
    "checkerboard",
    "white_texture",
]
