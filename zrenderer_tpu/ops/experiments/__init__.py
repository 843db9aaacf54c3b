"""Quarantined kernel experiments — honest negative results.

Every module here is a fully tested, bit-identical alternative raster
design that MEASURED SLOWER than the production kernels it targets (the
barrier'd-scan numbers live in docs/PERFORMANCE.md and in each module's
docstring).  They are kept because the measurements are part of the
performance story — they document why the production design looks the
way it does — but they do not render any production frame:

* ``raster_group8`` — 8-triangle grouped hierarchy kernels;
* ``raster_vis_trans`` — the visibility-buffer split and the
  transposed-group ((8,128), triangles-in-sublanes) kernels;
* ``raster_hbm2`` — the two-class 8-row-windowed HBM kernel
  (537.6 ms vs hbm1's 312.0 at 1M, 2026-08-20);
* ``raster_scanline`` — row-sorted 32-triangle vector groups with the
  MXU one-hot scatter (780.9 ms at 1M, 2026-08-20);
* ``raster_vec`` — block-grouped lane-parallel (32,8,128) evaluation
  with triangle-leading vreg batching (1116.0 ms vs hbm1's 317.1 at
  1M, 2026-08-20 — register spills from ~100 live (32,8,128)
  intermediates swamp the amortized scalar savings).

Their tests are opt-in (``ZRENDERER_RUN_EXPERIMENTS=1``), so the CI
budget tracks production code only.
"""
