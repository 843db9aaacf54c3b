"""zrenderer-tpu: a TPU-native software renderer built on JAX/XLA/Pallas.

Rebuild of gmodarelli/zrenderer (a Zig + Direct3D 12 forward renderer) with a
TPU-first architecture: the whole frame is one jitted step; vertex transforms
are batched MXU matmuls; triangle setup, tiled edge-function rasterization,
Z-resolve and shading are Pallas kernels with tile state resident in VMEM;
multi-chip frames shard screen tiles over ICI via shard_map.
"""

__version__ = "0.1.0"
