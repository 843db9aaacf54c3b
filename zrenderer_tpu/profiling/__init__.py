from zrenderer_tpu.profiling import ztracy

__all__ = ["ztracy"]
