"""Smoke tests for the viz layer (role of /root/reference/etc/viz_motion.py
animation_plot:14-145) — Agg-backend render of a tiny clip to file.
"""

import os

import matplotlib

matplotlib.use("Agg")

import numpy as np

from mocha_sigasia2023_tpu.viz import animation_plot

PARENTS = np.concatenate(
    [[-1], np.array([-1, 0, 1, 2, 3, 0, 5, 6, 7, 8, 9, 10, 11, 8, 13,
                     14, 8, 16, 17, 18, 0, 20, 21, 22]) + 1])


def _tiny_anim(T=3, seed=0):
    rng = np.random.RandomState(seed)
    J = len(PARENTS)
    pos = rng.randn(T, J, 3).astype(np.float32) * 0.05
    pos[:, 0, 1] = 1.0  # root above the floor
    rot = np.tile(np.array([1.0, 0, 0, 0], np.float32), (T, J, 1))
    contact = (rng.rand(T, 2) > 0.5).astype(np.float32)
    feet = np.array([5, 24])
    return [pos, rot, contact, feet, PARENTS]


class TestAnimationPlot:
    def test_renders_to_file(self, tmp_path):
        """3-frame, 2-stream render to GIF: file exists and is non-empty
        (viz_motion.py's side-by-side layout, contacts, heading ray)."""
        out = str(tmp_path / "anim.gif")
        ani = animation_plot([_tiny_anim(seed=0), _tiny_anim(seed=1)],
                             save_path=out, show=False)
        assert ani is not None
        assert os.path.exists(out) and os.path.getsize(out) > 0

    def test_global_space_and_no_contacts(self, tmp_path):
        """The viz_motion_X/no_contact variants: pre-FK'd positions,
        contacts off."""
        out = str(tmp_path / "anim_g.gif")
        anim = _tiny_anim(seed=2)
        animation_plot([anim], global_space=True, show_contacts=False,
                       save_path=out, show=False)
        assert os.path.getsize(out) > 0
