"""Engine tests: renderer end-to-end (XLA backend on CPU), pools, stats,
config, profiling shims."""

import logging

import numpy as np
import pytest

from zrenderer_tpu.engine.config import RenderConfig
from zrenderer_tpu.engine.pools import Handle, PipelineCache, ResourcePool
from zrenderer_tpu.engine.renderer import Renderer
from zrenderer_tpu.engine.stats import FrameStats
from zrenderer_tpu.profiling import ztracy
from zrenderer_tpu.scene.procedural import make_test_scene

pytestmark = pytest.mark.slow  # heavyweight; excluded from the smoke tier


@pytest.fixture(scope="module")
def renderer():
    config = RenderConfig(width=192, height=108, backend="xla", tri_align=64)
    r = Renderer(config)
    scene, mesh_data = make_test_scene()
    r.load_scene(scene, mesh_data)
    return r


def test_render_frame_end_to_end(renderer):
    img, depth = renderer.render_and_read()
    assert img.shape == (108, 192, 4) and img.dtype == np.uint8
    assert depth.shape == (108, 192)
    coverage = (depth < 1.0).mean()
    assert 0.2 < coverage < 0.9
    assert (img[..., 3] == 255).all()


def test_render_matches_cpu_oracle(renderer):
    from zrenderer_tpu.raster_ref import render_scene_cpu

    scene, mesh_data = make_test_scene()
    img_cpu, depth_cpu = render_scene_cpu(scene, mesh_data, 192, 108)
    img, depth = renderer.render_and_read()
    # Full-pipeline device-vs-oracle contract (docs/RASTER_SPEC.md §5):
    # u8 within 1 LSB on a vanishing pixel fraction (XLA division rounding).
    diff = np.abs(img.astype(np.int32) - img_cpu.astype(np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 1e-4


def test_pipeline_cache_reuse(renderer):
    misses_before = renderer.pipelines.misses
    renderer.render_and_read()
    renderer.render_and_read()
    assert renderer.pipelines.misses == misses_before
    assert renderer.pipelines.hits >= 2


def test_dynamic_transforms_no_recompile(renderer):
    """Per-frame transforms are traced args: moving a node must not
    recompile (SURVEY.md §7.4 item 4)."""
    misses_before = renderer.pipelines.misses
    transforms = renderer.flat.node_to_world.copy()
    transforms[1][3, 0] += 1.5  # move the second cube
    img_moved, _ = renderer.render_and_read(transforms=transforms)
    img_home, _ = renderer.render_and_read()
    assert renderer.pipelines.misses == misses_before
    assert (img_moved != img_home).any()


def test_camera_override(renderer):
    from zrenderer_tpu.scene.scene import Camera

    cam = Camera(
        position=np.array([0, 0, 30], np.float32),
        forward=np.array([0, 0, -1], np.float32),
        yfov=0.4, znear=0.1, zfar=100.0,
    )
    img_far, depth_far = renderer.render_and_read(camera=cam)
    cov_far = (depth_far < 1.0).mean()
    img_home, depth_home = renderer.render_and_read()
    assert cov_far < (depth_home < 1.0).mean()  # scene smaller from afar


# -- pools -------------------------------------------------------------------


def test_resource_pool_generational_handles():
    pool = ResourcePool(capacity=4)
    h1 = pool.add("a")
    assert pool.is_valid(h1) and pool.lookup(h1) == "a"
    pool.destroy(h1)
    assert not pool.is_valid(h1) and pool.lookup(h1) is None
    h2 = pool.add("b")
    assert h2.index == h1.index and h2.generation != h1.generation
    assert not pool.is_valid(h1)  # stale handle stays invalid


def test_resource_pool_exhaustion():
    pool = ResourcePool(capacity=2)
    pool.add(1)
    pool.add(2)
    with pytest.raises(RuntimeError):
        pool.add(3)


def test_pipeline_cache_dedup():
    cache = PipelineCache()
    built = []
    fn = cache.get_or_create("k", lambda: built.append(1) or "exe")
    fn2 = cache.get_or_create("k", lambda: built.append(1) or "exe2")
    assert fn == fn2 == "exe" and len(built) == 1
    assert cache.hits == 1 and cache.misses == 1


def test_null_handle():
    assert Handle(0, 0).is_null()
    pool = ResourcePool(capacity=1)
    assert not pool.is_valid(Handle(0, 0))


# -- stats / config / profiling ----------------------------------------------


def test_frame_stats_accumulates():
    stats = FrameStats("t")
    for _ in range(3):
        stats.update(triangles=10, pixels=100)
    line = stats.format_line()
    assert "FPS" in line and "Mtri/s" in line


def test_config_padding():
    c = RenderConfig(width=1920, height=1080)
    assert c.pad_width == 1920 and c.pad_height == 1088
    assert c.pad_width % 128 == 0 and c.pad_height % 32 == 0
    assert c.content_hash() != c.with_(width=640).content_hash()


def test_ztracy_zones():
    with ztracy.zone("outer") as z:
        assert z.name == "outer"
    z = ztracy.zone_nc("colored", color=0xFF0000)
    z.end()
    before = ztracy.frame_index()
    ztracy.frame_mark()
    assert ztracy.frame_index() == before + 1


def test_debug_validation_mode():
    """config.debug is the debug-layer analog: frames are validated
    (finite depth in range) at render time."""
    config = RenderConfig(width=96, height=64, backend="xla", debug=True,
                          tri_align=64)
    r = Renderer(config)
    scene, mesh_data = make_test_scene()
    r.load_scene(scene, mesh_data)
    img, depth = r.render_and_read()  # passes validation
    assert np.isfinite(depth).all()
    # A corrupted frame trips the validator.
    import jax.numpy as jnp

    with pytest.raises(FloatingPointError):
        r._validate_frame(
            jnp.zeros((64, 96, 4), jnp.uint8),
            jnp.full((64, 96), jnp.nan, jnp.float32),
        )


def test_upload_ring_allocates_and_exhausts():
    """The per-frame staging heap (GpuMemoryHeap analog): bump allocation
    with 512-B alignment, None on exhaustion, rotation resets."""
    from zrenderer_tpu.engine.upload_ring import UploadRing

    ring = UploadRing(frame_bytes=2048, frames=2)
    a = ring.stage(np.arange(128, dtype=np.float32))  # 512 B
    np.testing.assert_array_equal(a, np.arange(128, dtype=np.float32))
    b = ring.stage(np.arange(256, dtype=np.float32))  # 1024 B at offset 512
    assert b is not None
    assert ring.stage(np.zeros(256, np.float32)) is None  # would exceed 2048
    ring.begin_frame()  # rotate: fresh budget
    assert ring.stage(np.zeros(256, np.float32)) is not None
    # stage_all is atomic: partial overflow rolls back.
    ring.begin_frame()
    out = ring.stage_all([np.zeros(128, np.float32), np.zeros(512, np.float32)])
    assert out is None
    assert ring.stage(np.zeros(300, np.float32)) is not None  # space intact


def test_upload_backpressure_stalls_and_recovers():
    """Exhausting the per-frame constants budget stalls (finishGpuCommands
    analog) and retries instead of crashing — zd3d12.zig:1240-1250."""
    scene, mesh_data = make_test_scene()
    # Budget fits ONE frame's matrices (2 draws x 64 B = 128 B of 512 budget);
    # rendering twice without present() accumulates and trips back-pressure.
    config = RenderConfig(width=96, height=64, backend="xla", tri_align=64,
                          upload_heap_bytes=512)
    r = Renderer(config)
    r.load_scene(scene, mesh_data)
    r.render()
    r.render()  # same ring frame (no present): second stage exhausts
    assert r.upload_ring.stall_count == 1
    img, depth = r.render_and_read()
    assert np.isfinite(depth).all()
    # A budget too small for even one frame fails loudly.
    r2 = Renderer(RenderConfig(width=96, height=64, backend="xla",
                               tri_align=64, upload_heap_bytes=64))
    r2.load_scene(scene, mesh_data)
    with pytest.raises(MemoryError):
        r2.render()


def test_frames_in_flight_pacing():
    """present() fences only older frames (2-frames-in-flight,
    zd3d12.zig:45/:663-667): after render+present exactly one frame stays
    outstanding; frames_in_flight=1 presents fully synchronously; bare
    render() loops stay bounded; finish_gpu_commands drains everything."""
    scene, mesh_data = make_test_scene()
    r = Renderer(RenderConfig(width=96, height=64, backend="xla",
                              tri_align=64))
    r.load_scene(scene, mesh_data)
    for _ in range(3):
        r.render()
        r.present()
    assert len(r._in_flight) == 1  # the newest frame is still "on the GPU"
    r.finish_gpu_commands()
    assert len(r._in_flight) == 0
    for _ in range(4):
        r.render()  # present-less loop: pacing bounds the queue
    assert len(r._in_flight) <= 2
    img, _ = r.render_and_read()  # read_frame syncs + clears
    assert len(r._in_flight) == 0
    assert (img[..., :3].sum(axis=-1) > 0).any()

    r1 = Renderer(RenderConfig(width=96, height=64, backend="xla",
                               tri_align=64, frames_in_flight=1))
    r1.load_scene(scene, mesh_data)
    r1.render()
    r1.present()
    assert len(r1._in_flight) == 0  # fully synchronous present


def test_resource_pool_is_load_bearing():
    """The render data path resolves device buffers through generational
    handles: destroying one makes the next render fail loudly, and
    reloading a scene recycles pool slots."""
    scene, mesh_data = make_test_scene()
    r = Renderer(RenderConfig(width=96, height=64, backend="xla", tri_align=64))
    r.load_scene(scene, mesh_data)
    r.render_and_read()
    n_before = len(r.resources)
    # Reload: old buffers destroyed, slots recycled (no pool growth).
    r.load_scene(scene, mesh_data)
    r.render_and_read()
    assert len(r.resources) == n_before
    # Destroying a live handle is detected at render time.
    r.resources.destroy(r._buffer_handles["positions"])
    with pytest.raises(RuntimeError, match="stale resource handle"):
        r.render()


def test_compute_pipeline_create_dispatch_destroy():
    """createComputeShaderPipeline / Dispatch / destroyPipeline analogs:
    arbitrary device programs run through the pooled pipeline handles (here:
    the mipmap-generation compute pass, the reference's own compute demo)."""
    import jax.numpy as jnp

    from zrenderer_tpu.ops.mipmap import generate_mip_chain

    r = Renderer(RenderConfig(width=96, height=64, backend="xla"))
    h = r.create_compute_pipeline(
        lambda img: generate_mip_chain(img, 3), static_argnums=()
    )
    img = jnp.ones((16, 16, 4), jnp.float32) * 0.5
    chain = r.dispatch(h, img)
    assert len(chain) == 3 and chain[1].shape == (8, 8, 4)
    np.testing.assert_allclose(np.asarray(chain[2]), 0.5)
    r.destroy_pipeline(h)
    with pytest.raises(RuntimeError, match="stale"):
        r.dispatch(h, img)


def test_mesh_pipeline_device_generated_geometry():
    """createMeshShaderPipeline analog: geometry emitted by a device
    program renders identically to the same geometry uploaded as buffers
    (both go through the identical raster path/backend)."""
    import jax.numpy as jnp

    from zrenderer_tpu.ops import geometry as g
    from zrenderer_tpu.ops.raster_xla import render_frame_xla
    from zrenderer_tpu.scene.procedural import make_test_scene

    n = 6  # n x n grid of quads in the z=0 plane, vertex-colored by height

    def grid_np():
        xs = np.linspace(-1.0, 1.0, n + 1, dtype=np.float32)
        px, py = np.meshgrid(xs, xs, indexing="xy")
        v = (n + 1) * (n + 1)
        positions = np.stack(
            [px.ravel(), py.ravel(), np.zeros(v, np.float32),
             np.ones(v, np.float32)], axis=1)
        attrs = np.zeros((v, 12), np.float32)
        attrs[:, 2] = (py.ravel() + 1.0) * 0.5  # color.r from height
        attrs[:, 3] = 0.3
        attrs[:, 5] = 1.0  # alpha
        cell = np.arange(n * n, dtype=np.int32)
        r0 = (cell // n) * (n + 1) + (cell % n)
        quads = np.stack([r0, r0 + 1, r0 + n + 2, r0, r0 + n + 2, r0 + n + 1],
                         axis=1)
        tri_vidx = quads.reshape(-1, 3)
        return positions, attrs, tri_vidx, np.zeros(v, np.int32)

    def grid_device():
        p, a, t, vn = grid_np()  # numpy consts trace as device constants;
        # a real mesh shader computes them with jnp — do one field that way
        # to prove device math feeds the raster:
        a = jnp.asarray(a).at[:, 4].set(jnp.asarray(p)[:, 0] * 0.0 + 0.25)
        return jnp.asarray(p), a, jnp.asarray(t), jnp.asarray(vn)

    scene, _ = make_test_scene()
    w, h = 96, 64
    vp = g.view_proj_from_camera(scene.active_camera, w, h)
    matrices = vp[None].astype(np.float32)

    r = Renderer(RenderConfig(width=w, height=h, backend="xla",
                              vert_align=32, tri_align=64))
    handle = r.create_mesh_pipeline(grid_device)
    color_ms, depth_ms = r.dispatch(handle, matrices)

    # Oracle: identical geometry through the plain buffer path.
    p, a, t, vn = grid_np()
    a[:, 4] = 0.25
    pad_v = 32 - len(p) % 32
    pad_t = 64 - len(t) % 64
    p = np.concatenate([p, np.zeros((pad_v, 4), np.float32)])
    a = np.concatenate([a, np.zeros((pad_v, 12), np.float32)])
    vn = np.concatenate([vn, np.zeros(pad_v, np.int32)])
    t = np.concatenate([t, np.zeros((pad_t, 3), np.int32)])
    color_ref, depth_ref = render_frame_xla(p, a, t, matrices, vn, w, h)

    np.testing.assert_array_equal(np.asarray(color_ms), np.asarray(color_ref))
    np.testing.assert_array_equal(np.asarray(depth_ms), np.asarray(depth_ref))
    assert (np.asarray(color_ms)[..., :3].sum(axis=-1) > 0).any()
    r.destroy_pipeline(handle)


def test_custom_vertex_shader():
    """The programmable vertex-stage capability: a custom VS (object-space
    displacement) changes the image; unbinding restores it."""
    import jax.numpy as jnp

    scene, mesh_data = make_test_scene()
    r = Renderer(RenderConfig(width=96, height=64, backend="xla", tri_align=64))
    r.load_scene(scene, mesh_data)
    base, _ = r.render_and_read()

    def wobble(positions, attrs):
        offs = 0.35 * jnp.sin(positions[:, 1:2] * 9.0)
        positions = positions.at[:, 0:1].add(offs)
        return positions, attrs

    r.set_vertex_shader(wobble, name="wobble-v1")
    warped, _ = r.render_and_read()
    assert (warped != base).any()
    r.set_vertex_shader(None)
    again, _ = r.render_and_read()
    np.testing.assert_array_equal(again, base)


def test_render_animation_digests_and_last_frame(renderer):
    """The single-dispatch animation scan yields one positive digest per
    frame and the returned last frame equals a plain render of the same
    camera (the presented frame is re-rendered once outside the scan)."""
    digests, (color, depth) = renderer.render_animation(num_frames=3)
    d = np.asarray(digests)
    assert d.shape == (3,) and (d > 0).all()
    img, dep = renderer.render_and_read()
    np.testing.assert_array_equal(np.asarray(color), img)
    np.testing.assert_array_equal(np.asarray(depth), dep)


def test_render_animation_pallas_raw_digest_path():
    """The flat/pallas scan body (raw packed-u32 digest, no crop/unpack)
    agrees with the presented frame and produces stable digests across
    identical frames (interpret-mode kernel on CPU)."""
    config = RenderConfig(width=128, height=64, backend="pallas",
                          debug=True, tri_align=64)
    r = Renderer(config)
    scene, mesh_data = make_test_scene()
    r.load_scene(scene, mesh_data)
    digests, (color, depth) = r.render_animation(num_frames=2)
    d = np.asarray(digests)
    assert d.shape == (2,) and (d > 0).all()
    assert d[0] == d[1]  # same camera both frames
    img, _ = r.render_and_read()
    np.testing.assert_array_equal(np.asarray(color), img)


def test_clip_overflow_counter():
    """The capped clipper's silent drop has a runtime signal now
    (VERDICT r2 weak #5): clip_overflow_count reports
    max(crossing - cap, 0) in both geometry modes."""
    import jax.numpy as jnp

    from zrenderer_tpu.ops import geometry as g

    rng = np.random.default_rng(3)
    nt = 64
    # Triangles straddling the near plane: vertex z spans negative to
    # positive in clip space -> every one of them is "crossing".
    pos = rng.standard_normal((nt * 3, 4)).astype(np.float32)
    pos[:, 3] = 2.0
    pos[0::3, 2] = -0.5
    pos[1::3, 2] = +0.5
    pos[2::3, 2] = +0.5
    attrs = np.zeros((nt * 3, 12), np.float32)
    tvi = np.arange(nt * 3, dtype=np.int32).reshape(nt, 3)
    node_ids = np.zeros(nt * 3, np.int32)
    mats = np.eye(4, dtype=np.float32)[None]

    full = int(g.clip_overflow_count(
        np, pos, attrs, tvi, mats, node_ids, 64, 64, clip_cap=nt))
    assert full == 0  # capacity covers them all
    dropped = int(g.clip_overflow_count(
        np, pos, attrs, tvi, mats, node_ids, 64, 64, clip_cap=16))
    assert dropped == nt - 16
    dropped_j = int(g.clip_overflow_count(
        jnp, jnp.asarray(pos), jnp.asarray(attrs), jnp.asarray(tvi),
        jnp.asarray(mats), jnp.asarray(node_ids), 64, 64, clip_cap=16))
    assert dropped_j == dropped
    # Matches what clip_triangles_capped actually drops: crossing count
    # equals the subset demand.
    clip_pos = g.transform_positions(np, pos, mats, node_ids)
    tris = g.assemble_triangles(np, clip_pos, attrs, tvi)
    _, _, idx = g.clip_triangles_capped(np, tris, 64, 64, 16)
    assert len(np.unique(idx)) == 16


def test_clip_overflow_counter_cols_mode(renderer):
    """Cols-mode counter runs against the real engine buffers and reports
    zero drops for the test scene (nothing crosses a plane)."""
    b = renderer._buffers()
    mats = renderer.camera_matrices()
    assert renderer.clip_overflow(mats) == 0
    assert renderer.stats.clip_dropped == 0


def test_debug_render_raises_on_clip_overflow(monkeypatch):
    """config.debug surfaces clip overflow loudly (VERDICT r2 item 6)."""
    config = RenderConfig(width=64, height=64, backend="xla", debug=True,
                          tri_align=64)
    r = Renderer(config)
    scene, mesh_data = make_test_scene()
    r.load_scene(scene, mesh_data)
    r.render()  # clean frame passes validation
    assert r.stats.clip_dropped == 0
    monkeypatch.setattr(r, "clip_overflow", lambda m: 3)
    with pytest.raises(RuntimeError, match="dropped 3"):
        r.render()
    assert r.stats.clip_dropped == 3


def test_host_constants_vectorized(renderer):
    """camera_matrices/_lit_constants are batched (no per-node Python
    loop): correct per-draw products for a many-node transform set."""
    n = renderer.flat.node_to_world.shape[0]
    rng = np.random.default_rng(0)
    tr = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    tr[:, :3, :3] += rng.standard_normal((n, 3, 3)).astype(np.float32) * 0.1
    tr[:, 3, :3] = rng.standard_normal((n, 3)).astype(np.float32)
    mats = renderer.camera_matrices(transforms=tr)
    vp = np.asarray(mats[0]) @ np.linalg.inv(tr[0])  # consistency probe
    c = renderer._lit_constants(transforms=tr)
    for i in range(n):
        np.testing.assert_allclose(
            c["normal_mats"][i], np.linalg.inv(tr[i][:3, :3]).T,
            rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            c["matrices"][i], tr[i] @ c["view_proj"], rtol=1e-5, atol=1e-4)
