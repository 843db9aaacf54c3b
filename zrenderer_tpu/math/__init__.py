from zrenderer_tpu.math import zmath

__all__ = ["zmath"]
