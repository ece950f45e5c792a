"""GuiWindow (C8 interactive-window parity) — headless Agg path.

The reference opens ti.GUI when outputs.gui.enable is set and aborts the
case when the user closes it (core/simulation_ops.py:91-95). These tests
exercise the matplotlib-backed replacement offscreen: frame upload, canvas
render, close -> running=False, and the sim-loop Abort path.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))

from lbm2d_tpu.viz.gui import GuiWindow  # noqa: E402


def test_gui_window_headless_render_and_close():
    gui = GuiWindow("test", res=(64, 96))
    assert gui.running
    assert not gui.interactive  # no DISPLAY in CI

    # float frame in [0,1]
    frame = np.zeros((96, 64, 3), np.float32)
    frame[10:20, :, 0] = 1.0  # red band near the top
    gui.set_image(frame)
    gui.show()
    rgb = gui.frame_rgb()
    assert rgb is not None and rgb.shape == (96, 64, 3)
    band = rgb[12:18].reshape(-1, 3).mean(axis=0)
    rest = rgb[40:90].reshape(-1, 3).mean(axis=0)
    assert band[0] > 180 and rest[0] < 80  # the band actually rendered red

    # uint8 frame is accepted as-is
    gui.set_image(np.full((96, 64, 3), 255, np.uint8))
    gui.show()

    gui.close()
    assert not gui.running
    gui.close()  # idempotent


def test_gui_close_aborts_sim_loop():
    import test_pipeline_e2e as e2e
    from lbm2d_tpu.pipeline import run_one_case
    from lbm2d_tpu.utils.config import load_config

    import tempfile

    with tempfile.TemporaryDirectory() as root:
        cfg_name = e2e.make_project(root, nx=64, ny=32)
        cfg_path = os.path.join(root, "SimCases", "TestProj", "configs", cfg_name)
        cfg = load_config(cfg_path)
        cfg["outputs"]["gui"]["enable"] = True
        mask_path = cfg["mask"]["path"]

        engine, composer, gui, recorder, writer = run_one_case.init_simulation_env(
            cfg, mask_path, None, None
        )
        assert gui is not None and gui.running
        try:
            # simulate the user closing the window before the run
            gui._on_close(None)
            from lbm2d_tpu.pipeline.sim_loop import run_simulation_loop

            md = run_simulation_loop(
                cfg, engine, composer, recorder, writer, 60,
                gui=gui, progress=False,
            )
            assert md["status"] == "Aborted"
            assert "GUI closed" in md["reason"]
            assert md["final_steps"] == 0
        finally:
            gui.close()


def test_gui_receives_frames_during_run():
    import test_pipeline_e2e as e2e
    from lbm2d_tpu.pipeline import run_one_case

    import tempfile

    with tempfile.TemporaryDirectory() as root:
        cfg_name = e2e.make_project(root, nx=64, ny=32)
        cfg_path = os.path.join(root, "SimCases", "TestProj", "configs", cfg_name)
        from lbm2d_tpu.utils.config import load_config

        cfg = load_config(cfg_path)
        cfg["outputs"]["gui"]["enable"] = True
        cfg["outputs"]["video"]["enable"] = False
        cfg["outputs"]["dataset"]["enable"] = False
        cfg["simulation"]["max_steps"] = 40

        engine, composer, gui, recorder, writer = run_one_case.init_simulation_env(
            cfg, cfg["mask"]["path"], None, None
        )
        shows = []
        orig_show = gui.show
        gui.show = lambda: (shows.append(1), orig_show())[-1]
        try:
            from lbm2d_tpu.pipeline.sim_loop import run_simulation_loop

            md = run_simulation_loop(
                cfg, engine, composer, recorder, writer, 40,
                gui=gui, progress=False,
            )
            assert md["status"] == "Success"
            # gui interval 20 -> frames at steps 20 and 40
            assert len(shows) == 2
        finally:
            gui.close()
