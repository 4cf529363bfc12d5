from orb_slam2_tpu.viz.viewer import render_map, render_trajectory  # noqa
