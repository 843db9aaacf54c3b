from zrenderer_tpu.scene import mesh, procedural, scene
from zrenderer_tpu.scene.mesh import Mesh, MeshData
from zrenderer_tpu.scene.scene import Camera, Mobility, Node, Scene

__all__ = [
    "mesh",
    "scene",
    "procedural",
    "Mesh",
    "MeshData",
    "Camera",
    "Mobility",
    "Node",
    "Scene",
]
