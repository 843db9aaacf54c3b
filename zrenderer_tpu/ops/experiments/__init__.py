"""Quarantined kernel experiments — honest negative results.

Every module here is a fully tested, bit-identical alternative raster
design that MEASURED SLOWER than the production kernels it targets (the
barrier'd-scan numbers live in docs/PERFORMANCE.md and in each module's
docstring).  They are kept because the measurements are part of the
performance story — they document why the production design looks the
way it does — but they do not render any production frame:

* ``raster_group8`` — 8-triangle grouped hierarchy kernels;
* ``raster_vis_trans`` — the visibility-buffer split and the
  transposed-group ((8,128), triangles-in-sublanes) kernels.

Their tests are opt-in (``ZRENDERER_RUN_EXPERIMENTS=1``), so the CI
budget tracks production code only.
"""
