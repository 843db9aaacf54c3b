"""Procedural scene construction — fixture generator for tests and demos.

``make_test_scene()`` reproduces the *layout* of the reference test scene
(``zrenderer/content/scenes/test.gltf``): two nodes instancing one cube mesh
(the second translated), plus one perspective camera above and behind the
cubes looking down at them.  The cube geometry here is generated
analytically (24 vertices / 36 indices with face colors); exact-parity tests
against the reference instead convert the real ``test.gltf`` via
``zrenderer_tpu.tools.gltf_converter``.
"""

from __future__ import annotations

import numpy as np

from zrenderer_tpu.math import zmath as zm
from zrenderer_tpu.scene.mesh import MeshData, make_vertex
from zrenderer_tpu.scene.scene import Camera, Mobility, Node, Scene

# Same placement constants as the reference test scene (test.gltf nodes).
CUBE2_TRANSLATION = (-2.2731475830078125, 0.9120144844055176, 2.2185516357421875)
CAMERA_TRANSLATION = (-1.5, 3.0, 10.0)
CAMERA_PARENT_QUAT = (0.6087614297866821, 0.0, 0.0, 0.7933533191680908)
CAMERA_CHILD_QUAT = (-0.7071067690849304, 0.0, 0.0, 0.7071067690849304)
CAMERA_YFOV = 0.39959652046304894
CAMERA_ZNEAR = 0.10000000149011612
CAMERA_ZFAR = 1000.0

_FACES = [
    # (normal, tangent, four corners CCW seen from outside, color)
    ((0, 0, 1), (1, 0, 0, 1), [(-1, -1, 1), (1, -1, 1), (1, 1, 1), (-1, 1, 1)], (1, 0, 0, 1)),
    ((0, 0, -1), (-1, 0, 0, 1), [(1, -1, -1), (-1, -1, -1), (-1, 1, -1), (1, 1, -1)], (0, 1, 0, 1)),
    ((1, 0, 0), (0, 0, -1, 1), [(1, -1, 1), (1, -1, -1), (1, 1, -1), (1, 1, 1)], (0, 0, 1, 1)),
    ((-1, 0, 0), (0, 0, 1, 1), [(-1, -1, -1), (-1, -1, 1), (-1, 1, 1), (-1, 1, -1)], (1, 1, 0, 1)),
    ((0, 1, 0), (1, 0, 0, 1), [(-1, 1, 1), (1, 1, 1), (1, 1, -1), (-1, 1, -1)], (1, 0, 1, 1)),
    ((0, -1, 0), (1, 0, 0, 1), [(-1, -1, -1), (1, -1, -1), (1, -1, 1), (-1, -1, 1)], (0, 1, 1, 1)),
]


def make_cube_mesh(mesh_data: MeshData, size: float = 1.0,
                   face_colors: bool = True) -> int:
    """Append a colored unit cube (24 verts, 36 indices); returns mesh index.
    ``face_colors=False`` makes every vertex white (texture/material tests)."""
    verts = []
    indices = []
    uvs = [(0, 0), (1, 0), (1, 1), (0, 1)]
    for normal, tangent, corners, color in _FACES:
        base = len(verts)
        if not face_colors:
            color = (1, 1, 1, 1)
        for corner, uv in zip(corners, uvs):
            pos = tuple(c * size for c in corner)
            verts.append(make_vertex(pos, uv=uv, color=color, normal=normal, tangent=tangent))
        indices += [base, base + 1, base + 2, base, base + 2, base + 3]
    return mesh_data.append_mesh(
        np.stack(verts), np.array(indices, np.uint32)
    )


def make_material_scene() -> tuple:
    """Two side-by-side cubes with DIFFERENT materials: a smooth metal
    (left) and a rough dielectric with green emissive (right) — the
    material-system acceptance fixture (two meshes must visibly differ in
    one frame through materials/textures alone)."""
    from zrenderer_tpu.scene.mesh import Material

    mesh_data = MeshData()
    left = make_cube_mesh(mesh_data, face_colors=False)
    right = make_cube_mesh(mesh_data, face_colors=False)
    mesh_data.materials = [
        Material(metallic=1.0, roughness=0.15, name="metal"),
        Material(metallic=0.0, roughness=0.9, emissive=(0.0, 0.35, 0.0),
                 name="rough-glow"),
    ]
    mesh_data.mesh_material = [0, 1]

    scene = Scene()
    scene.nodes.append(Node(mesh_indices=[left], transform_index=0,
                            name="MetalCube"))
    scene.transforms.append(zm.translation(-1.6, 0.0, 0.0))
    scene.nodes.append(Node(mesh_indices=[right], transform_index=1,
                            name="GlowCube"))
    scene.transforms.append(zm.translation(1.6, 0.0, 0.0))
    scene.cameras.append(
        Camera(position=np.array([0.0, 0.0, 7.0], np.float32),
               forward=np.array([0.0, 0.0, -1.0], np.float32),
               yfov=0.8, znear=0.1, zfar=100.0, name="Camera")
    )
    return scene, mesh_data


def make_test_camera() -> Camera:
    """The reference test scene's camera, with forward derived properly."""
    orientation = zm.qmul(
        np.array(CAMERA_CHILD_QUAT, np.float32),
        np.array(CAMERA_PARENT_QUAT, np.float32),
    )
    pitch, yaw, _ = zm.quat_to_euler(orientation)
    return Camera(
        position=np.array(CAMERA_TRANSLATION, np.float32),
        forward=zm.rotate_vec3(orientation, (0.0, 0.0, -1.0))[:3],
        pitch=float(pitch),
        yaw=float(yaw),
        yfov=CAMERA_YFOV,
        znear=CAMERA_ZNEAR,
        zfar=CAMERA_ZFAR,
        name="Camera",
    )


def make_test_scene() -> tuple:
    """Two cube nodes + one camera, mirroring the reference test scene layout."""
    mesh_data = MeshData()
    cube = make_cube_mesh(mesh_data)

    scene = Scene()
    scene.nodes.append(
        Node(mesh_indices=[cube], transform_index=0, mobility=Mobility.STATIC, name="Cube")
    )
    scene.transforms.append(zm.identity())
    scene.nodes.append(
        Node(
            mesh_indices=[cube],
            transform_index=1,
            mobility=Mobility.STATIC,
            name="Cube.002",
        )
    )
    scene.transforms.append(zm.translation(*CUBE2_TRANSLATION))
    scene.cameras.append(make_test_camera())
    return scene, mesh_data


def make_stress_scene(num_triangles: int = 1_000_000, seed: int = 0) -> tuple:
    """Large-scene stress fixture (BASELINE.json config 4): a dense grid of
    colored cubes baked into one mesh, ~num_triangles triangles, ordered
    row-major so consecutive raster blocks stay spatially coherent (what
    the block/superblock union-bbox binning exploits).

    Built fully vectorized — 83k cubes assemble in milliseconds.
    """
    rng = np.random.default_rng(seed)
    cubes = max(1, num_triangles // 12)
    side = int(np.ceil(cubes ** (1.0 / 3.0)))
    grid = np.stack(
        np.meshgrid(np.arange(side), np.arange(side), np.arange(side),
                    indexing="ij"),
        axis=-1,
    ).reshape(-1, 3)[:cubes]

    # Morton (Z-order) the cubes: consecutive triangles then occupy compact
    # 3D clusters, so raster-block union bboxes stay small on screen — the
    # property the block/superblock binning exploits (the spatial-order
    # preprocessing role meshoptimizer plays in the reference's toolchain).
    def _spread(x):
        x = x.astype(np.uint64)
        x = (x | (x << 32)) & np.uint64(0x1F00000000FFFF)
        x = (x | (x << 16)) & np.uint64(0x1F0000FF0000FF)
        x = (x | (x << 8)) & np.uint64(0x100F00F00F00F00F)
        x = (x | (x << 4)) & np.uint64(0x10C30C30C30C30C3)
        x = (x | (x << 2)) & np.uint64(0x1249249249249249)
        return x

    morton = (
        _spread(grid[:, 0]) | (_spread(grid[:, 1]) << np.uint64(1))
        | (_spread(grid[:, 2]) << np.uint64(2))
    )
    grid = grid[np.argsort(morton)]

    spacing = 2.6
    centers = (grid - (side - 1) / 2.0) * spacing  # centered lattice

    # One canonical cube (24 verts, 36 indices), tiled per cube.
    base_md = MeshData()
    make_cube_mesh(base_md, size=1.0)
    base_verts = base_md.vertices_of(base_md.meshes[0])  # (24, 16)
    base_idx = base_md.indices_of(base_md.meshes[0]).astype(np.int64)  # (36,)

    verts = np.tile(base_verts, (cubes, 1)).reshape(cubes, 24, 16)
    verts[:, :, 0:3] += centers[:, None, :].astype(np.float32)
    colors = rng.uniform(0.1, 1.0, (cubes, 1, 3)).astype(np.float32)
    verts[:, :, 5:8] = colors  # per-cube flat color
    verts[:, :, 8] = 1.0
    verts = verts.reshape(cubes * 24, 16)

    idx = (base_idx[None, :] + (np.arange(cubes) * 24)[:, None]).reshape(-1)
    mesh_data = MeshData()
    mesh_data.append_mesh(verts, idx.astype(np.uint32))

    scene = Scene()
    scene.nodes.append(Node(mesh_indices=[0], transform_index=0, name="lattice"))
    scene.transforms.append(zm.identity())
    dist = side * spacing * 1.35
    eye = np.array([dist * 0.55, dist * 0.4, dist], np.float32)
    fwd = -eye / np.linalg.norm(eye)
    scene.cameras.append(
        Camera(
            position=eye,
            forward=fwd.astype(np.float32),
            yfov=0.9,
            znear=0.5,
            zfar=float(6 * dist),
            name="stress-cam",
        )
    )
    return scene, mesh_data


def make_triangle_soup(
    num_triangles: int,
    seed: int = 0,
    extent: float = 4.0,
    behind_camera_fraction: float = 0.0,
    triangle_size: float = 1.0,
) -> tuple:
    """Random triangle soup scene for stress/parity tests and benchmarks.
    ``triangle_size`` scales each triangle around its center (1 unit is
    ~108 px at the default camera; dense-overlap benchmarks use ~0.1)."""
    rng = np.random.default_rng(seed)
    n = num_triangles * 3
    verts = np.zeros((n, 16), np.float32)
    centers = rng.uniform(-extent, extent, size=(num_triangles, 1, 3))
    offsets = rng.uniform(-1.0, 1.0, size=(num_triangles, 3, 3)) * triangle_size
    pos = (centers + offsets).reshape(n, 3)
    if behind_camera_fraction > 0:
        k = int(num_triangles * behind_camera_fraction) * 3
        pos[:k, 2] += 40.0  # push past the camera to exercise clipping
    verts[:, 0:3] = pos
    verts[:, 5:9] = rng.uniform(0, 1, size=(n, 4)).astype(np.float32)
    verts[:, 8] = 1.0
    indices = np.arange(n, dtype=np.uint32)

    mesh_data = MeshData()
    mesh = mesh_data.append_mesh(verts, indices)
    scene = Scene()
    scene.nodes.append(Node(mesh_indices=[mesh], transform_index=0, name="soup"))
    scene.transforms.append(zm.identity())
    scene.cameras.append(
        Camera(
            position=np.array([0, 0, 12], np.float32),
            forward=np.array([0, 0, -1], np.float32),
            yfov=0.8,
            znear=0.1,
            zfar=100.0,
            name="soupcam",
        )
    )
    return scene, mesh_data


def make_sphere_field(num_triangles: int = 1_000_000, seed: int = 0,
                      stacks: int = 64, slices: int = 128) -> tuple:
    """Field of UV spheres — the meshlet-culling fixture: closed convex
    surfaces where ~half of every sphere's 128-triangle clusters face
    away from any camera (the lattice's camera-facing quads never
    exercise the backface cone).  Spheres are Morton-ordered on a grid
    and each sphere's UV triangle order is spatially compact, so
    consecutive raster blocks cluster tightly (the meshlet table's
    coherence assumption, engine/upload.py build_meshlet_table)."""
    rng = np.random.default_rng(seed)
    per_sphere = 2 * stacks * slices
    count = max(1, num_triangles // per_sphere)
    side = int(np.ceil(count ** (1.0 / 3.0)))
    grid = np.stack(
        np.meshgrid(np.arange(side), np.arange(side), np.arange(side),
                    indexing="ij"),
        axis=-1,
    ).reshape(-1, 3)[:count]

    def _spread(x):
        x = x.astype(np.uint64)
        x = (x | (x << 32)) & np.uint64(0x1F00000000FFFF)
        x = (x | (x << 16)) & np.uint64(0x1F0000FF0000FF)
        x = (x | (x << 8)) & np.uint64(0x100F00F00F00F00F)
        x = (x | (x << 4)) & np.uint64(0x10C30C30C30C30C3)
        x = (x | (x << 2)) & np.uint64(0x1249249249249249)
        return x

    morton = (
        _spread(grid[:, 0]) | (_spread(grid[:, 1]) << np.uint64(1))
        | (_spread(grid[:, 2]) << np.uint64(2))
    )
    grid = grid[np.argsort(morton)]
    spacing = 3.0
    centers = (grid - (side - 1) / 2.0) * spacing

    # One canonical UV sphere.
    theta = np.linspace(0.0, np.pi, stacks + 1)
    phi = np.linspace(0.0, 2.0 * np.pi, slices + 1)
    tt, pp = np.meshgrid(theta, phi, indexing="ij")
    sx = np.sin(tt) * np.cos(pp)
    sy = np.cos(tt)
    sz = np.sin(tt) * np.sin(pp)
    sv = np.stack([sx, sy, sz], axis=-1).reshape(-1, 3).astype(np.float32)
    nv = len(sv)
    base_verts = np.zeros((nv, 16), np.float32)
    base_verts[:, 0:3] = sv
    base_verts[:, 8] = 1.0
    base_verts[:, 9:12] = sv  # outward normal

    i0 = (np.arange(stacks)[:, None] * (slices + 1)
          + np.arange(slices)[None, :])
    quads = np.stack(
        [i0, i0 + slices + 1, i0 + slices + 2, i0 + 1], axis=-1
    ).reshape(-1, 4)
    # PATCH-major quad order: 8x8 (stack, slice) tiles, so each
    # 128-triangle meshlet block is one compact angular patch with a
    # TIGHT normal cone (~16 deg half-angle at the default
    # tessellation).  Ring-major order would wrap each block around a
    # full 360-deg ring, making every cone degenerate and the backface
    # cull a no-op.
    P = 8
    if stacks % P == 0 and slices % P == 0:
        tiles = (np.arange(stacks * slices)
                 .reshape(stacks // P, P, slices // P, P)
                 .transpose(0, 2, 1, 3).reshape(-1))
        quads = quads[tiles]
    # CCW front faces seen from outside (matches the raster's front
    # rule); quad-major interleave keeps the two halves of each quad in
    # the same meshlet block.
    base_idx = np.stack(
        [quads[:, [0, 1, 2]], quads[:, [0, 2, 3]]], axis=1
    ).reshape(-1, 3).astype(np.int64)

    verts = np.tile(base_verts, (count, 1)).reshape(count, nv, 16)
    verts[:, :, 0:3] += centers[:, None, :].astype(np.float32)
    colors = rng.uniform(0.1, 1.0, (count, 1, 3)).astype(np.float32)
    verts[:, :, 5:8] = colors
    verts = verts.reshape(count * nv, 16)
    idx = (base_idx[None] + (np.arange(count) * nv)[:, None, None])
    idx = idx.reshape(-1)

    mesh_data = MeshData()
    mesh_data.append_mesh(verts, idx.astype(np.uint32))
    scene = Scene()
    scene.nodes.append(
        Node(mesh_indices=[0], transform_index=0, name="sphere-field"))
    scene.transforms.append(zm.identity())
    dist = max(side * spacing * 1.35, 6.0)
    eye = np.array([dist * 0.55, dist * 0.4, dist], np.float32)
    fwd = -eye / np.linalg.norm(eye)
    scene.cameras.append(
        Camera(
            position=eye,
            forward=fwd.astype(np.float32),
            yfov=0.9,
            znear=0.5,
            zfar=float(6 * dist),
            name="sphere-cam",
        )
    )
    return scene, mesh_data
