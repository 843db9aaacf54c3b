"""Multi-host (DCN analog) frame rendering — parallel/multihost.py.

Spawns two coordinator-connected CPU processes (4 virtual devices each, the
standard JAX pattern for testing multi-controller code without a cluster),
renders the test scene over the global 8-device tile mesh, and checks
bit-exact parity with the single-device raster plus the locality contract
(each host's local_bands cover exactly its half of the frame).
"""

import json
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

W, H = 96, 64  # 8 bands of 8 rows across 2 hosts x 4 devices

_WORKER = textwrap.dedent("""
    import json, sys
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")

    port, pid = sys.argv[1], int(sys.argv[2])
    from zrenderer_tpu.parallel import multihost
    multihost.initialize(coordinator_address=f"127.0.0.1:{port}",
                         num_processes=2, process_id=pid)
    assert jax.device_count() == 8 and jax.local_device_count() == 4

    from zrenderer_tpu.engine.upload import flatten_scene
    from zrenderer_tpu.ops import geometry as g
    from zrenderer_tpu.ops.raster_xla import render_frame_xla
    from zrenderer_tpu.scene.procedural import make_test_scene

    W, H = 96, 64
    scene, mesh_data = make_test_scene()
    flat = flatten_scene(scene, mesh_data, pad=True, tri_align=64)
    vp = g.view_proj_from_camera(scene.active_camera, W, H)
    matrices = np.einsum("nij,jk->nik", flat.node_to_world, vp).astype(
        np.float32)

    mesh = multihost.global_tile_mesh()
    # host-major: this process's devices own a contiguous band block
    assert [d.process_index for d in mesh.devices.ravel()] == \\
        [0, 0, 0, 0, 1, 1, 1, 1]
    frame_fn, shard_inputs = multihost.make_multihost_frame(mesh, W, H)
    args = shard_inputs(flat.positions, flat.attrs, flat.tri_vidx,
                        matrices, flat.vert_node)
    color, depth = frame_fn(*args)

    bands = multihost.local_bands(color)
    rows = sorted(r for r, _ in bands)
    assert len(bands) == 4 and all(b.shape == (8, W, 4) for _, b in bands)
    expect0 = [0, 8, 16, 24] if pid == 0 else [32, 40, 48, 56]
    assert rows == expect0, (rows, expect0)

    full = multihost.gather_frame(color)
    ref_color, ref_depth = render_frame_xla(
        flat.positions, flat.attrs, flat.tri_vidx, matrices,
        flat.vert_node, W, H)
    np.testing.assert_array_equal(full, np.asarray(ref_color))
    local_ok = all(
        np.array_equal(b, np.asarray(ref_color)[r:r + 8])
        for r, b in bands)
    assert local_ok
    cov = float((full[..., :3].sum(axis=-1) > 0).mean())
    assert cov > 0.1, cov
    print(json.dumps({"pid": pid, "ok": True, "coverage": cov}), flush=True)
""")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dcn_frame_parity():
    port = _free_port()
    env = {
        "PATH": "/usr/bin:/bin:/usr/local/bin",
        "HOME": "/tmp",
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "PYTHONPATH": ".",
    }
    import os

    env = {**os.environ, **env}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(port), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=280)
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        last = [l for l in out.strip().splitlines() if l.startswith("{")][-1]
        res = json.loads(last)
        assert res["ok"] and res["pid"] == pid
