"""zrenderer-tpu: a TPU-native software renderer built on JAX/XLA/Pallas.

Rebuild of gmodarelli/zrenderer (a Zig + Direct3D 12 forward renderer) with a
TPU-first architecture: the whole frame is one jitted step; vertex transforms
are batched MXU matmuls; triangle setup, tiled edge-function rasterization,
Z-resolve and shading are Pallas kernels with tile state resident in VMEM;
multi-chip frames shard screen tiles over ICI via shard_map.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy top-level conveniences (keep `import zrenderer_tpu` light —
    # importing the engine pulls in jax).
    if name in ("Renderer", "RenderConfig", "Texture", "FrameStats"):
        from zrenderer_tpu import engine

        return getattr(engine, name)
    if name in ("Scene", "MeshData", "Camera", "Node", "Mobility"):
        from zrenderer_tpu import scene

        return getattr(scene, name)
    raise AttributeError(name)
