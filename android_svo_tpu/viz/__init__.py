"""Visualization layer — the TPU build's replacement for the reference's
GLES2 render thread + preview overlay (L2c: `GLRenderer.cpp`,
`image_process.cpp:188-225`, `svo_system.cpp:54-70`)."""

from android_svo_tpu.viz.overlay import (  # noqa: F401
    Visualizer, draw_cube, draw_features, gray_to_rgb, save_ppm)
