"""Multi-host (DCN) scale-out — the distributed-backend plan of SURVEY §5.8.

The reference is a single-process program; its scale-out analog here is the
standard JAX multi-controller model: one process per host, each seeing its
local TPU chips, composed into one global device mesh.  The screen-tile
frame step (parallel/tiles.py) works unchanged on such a mesh — the design
goal is traffic placement:

* the **raster phase has no communication at all** (each chip owns its
  framebuffer band), so band work never crosses DCN;
* the only collective in the frame, the small triangle-setup
  ``all_gather``, crosses DCN once per frame (setup rows are ~100 bytes per
  triangle — at 1M triangles that is ~100 MB/s at 60 FPS, well inside DCN
  budgets, and it overlaps the raster of the previous frame under async
  dispatch);
* final frame assembly is OPTIONAL (only the host that presents needs it)
  via ``gather_frame``.

Process bootstrap is ``initialize`` (jax.distributed), mesh construction is
``global_tile_mesh`` (host-major device order so every host's bands are
contiguous rows rendered by its local chips), and each host reads back only
its own rows with ``local_bands`` unless it asks for the full frame.

Tested without a cluster by spawning N coordinator-connected CPU processes
(tests/test_multihost.py), the same pattern used for the virtual 8-device
single-process mesh (tests/conftest.py).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

from zrenderer_tpu.parallel import tiles


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None, **kwargs) -> None:
    """Join the multi-controller job (jax.distributed.initialize wrapper).

    With no arguments the standard cluster environment variables
    (JAX_COORDINATOR_ADDRESS / open-source cluster auto-detection) are
    used — on TPU pods jax detects everything automatically.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )


def global_tile_mesh(devices=None) -> Mesh:
    """1D ``tiles`` mesh over every device in the job, HOST-MAJOR.

    Host-major order makes each host's framebuffer bands a contiguous block
    of rows owned by its local chips: raster output stays chip-local, and
    ``local_bands`` can return this host's rows without any cross-host
    traffic.
    """
    devices = list(jax.devices() if devices is None else devices)
    devices.sort(key=lambda d: (d.process_index, d.id))
    return Mesh(np.asarray(devices), (tiles.AXIS,))


def make_multihost_frame(mesh: Mesh, width: int, height: int,
                         use_pallas: bool = False):
    """The multi-host frame step — identical math to the single-host
    sharded frame (the collective compiles to ICI within a host and DCN
    across hosts automatically)."""
    return tiles.make_sharded_frame(mesh, width, height,
                                    use_pallas=use_pallas)


def local_bands(global_array) -> list[tuple[int, np.ndarray]]:
    """This process's rows of a band-sharded frame output as
    [(row_offset, rows_u8), ...] — readback without cross-host traffic."""
    out = []
    for shard in global_array.addressable_shards:
        row0 = shard.index[0].start or 0
        out.append((row0, np.asarray(shard.data)))
    out.sort(key=lambda t: t[0])
    return out


def gather_frame(global_array) -> np.ndarray:
    """Assemble the FULL frame on every host (one DCN all-gather) — the
    presenting host's path; non-presenting hosts skip this entirely."""
    from jax.experimental import multihost_utils

    return np.asarray(
        multihost_utils.process_allgather(global_array, tiled=True)
    )
