"""Visualization smoke tests (headless Agg backend).

Covers the reference's plotting surface (`plot_utils.py`) including the
animation/GIF export the notebooks produce via imagemagick/ffmpeg
(DDP-replicate notebook cell 22) — here FuncAnimation + PillowWriter.
"""

import numpy as np
import pytest

mpl = pytest.importorskip("matplotlib")
mpl.use("Agg")

from ilqr_admm_tpu.viz import (  # noqa: E402
    animate_arm,
    animate_car,
    animate_trajectory,
    plot_car,
    plot_convergence,
    plotArm,
)


def _car_traj(n=12):
    t = np.linspace(0, 1, n)
    xs = np.stack([t, t**2, 0.5 * t, t], axis=-1)
    us = np.stack([0.3 * np.sin(6 * t), np.cos(6 * t)], axis=-1)
    return xs, us


def test_plot_car_patch_count_and_axis_binding():
    import matplotlib.pyplot as plt

    xs, us = _car_traj()
    fig, ax = plt.subplots()
    patches = plot_car(xs[0], us[0], ax=ax)
    # reference-fidelity car (plot_utils.py:199-235): 4 wheels + body +
    # window + 2 headlights + 2 origin-cross bars
    assert len(patches) == 10
    for p in patches:
        ax.add_patch(p)
    # the window is white and the two headlights are yellow
    face_colors = [p.get_facecolor()[:3] for p in patches]
    assert face_colors.count((1.0, 1.0, 1.0)) >= 1  # window
    assert face_colors.count((1.0, 1.0, 0.0)) == 2  # headlights
    plt.close(fig)


def test_animate_car_writes_gif(tmp_path):
    xs, us = _car_traj()
    out = tmp_path / "car.gif"
    path = animate_car(xs, us, str(out), stride=3, fps=5)
    assert out.exists() and out.stat().st_size > 0
    with open(path, "rb") as f:
        assert f.read(6) in (b"GIF87a", b"GIF89a")
    from PIL import Image

    with Image.open(path) as im:
        assert getattr(im, "n_frames", 1) == 4  # 12 frames / stride 3


def test_animate_arm_writes_gif(tmp_path):
    qs = np.linspace(0.0, 0.5, 6)[:, None] * np.array([1.0, -0.5, 0.25])
    out = tmp_path / "arm.gif"
    animate_arm(qs, (1.0, 1.0, 1.0), str(out), fps=5, target=(1.5, 1.0))
    assert out.exists() and out.stat().st_size > 0


def test_animate_trajectory_custom_frames(tmp_path):
    seen = []

    def draw(ax, t):
        seen.append(t)
        ax.plot([0, t], [0, 1])

    out = tmp_path / "anim.gif"
    animate_trajectory(draw, 9, str(out), stride=4, fps=3)
    # frames 0, 4, 8; FuncAnimation may re-invoke the first frame once
    assert sorted(set(seen)) == [0, 4, 8]
    assert out.exists()


def test_plot_convergence_smoke():
    import matplotlib.pyplot as plt

    ax = plot_convergence([3.0, 2.0, 1.5, 1.49])
    assert ax.get_xlabel() == "# of iterations"
    plt.close("all")


def test_plot_arm_smoke():
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    plotArm(ax, (1.0, 1.0, 1.0), np.array([0.3, -0.2, 0.1]))
    plt.close(fig)
