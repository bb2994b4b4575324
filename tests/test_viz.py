"""Visualization tests: hand-volume cuboid geometry (plotHand3D parity) and
headless rendering."""

import numpy as np

from gpd_tpu.viz import (hand_segments, hand_volume_boxes, plot_hands_3d,
                         plot_hand_geometry, plot_volumes_3d, volume_box)


class TestHandVolumes:
    def test_box_geometry_identity_frame(self):
        b = hand_volume_boxes(np.zeros(3), np.eye(3), outer_diameter=0.12,
                              depth=0.06, finger_width=0.01, height=0.02)
        assert b.shape == (4, 8, 3)
        left, right, base, stub = b
        # Fingers span [0, depth] along approach (x), centered at
        # -/+ (hw - fw/2) along binormal (y) — plot.cpp:388-394.
        assert abs(left[:, 0].min()) < 1e-12
        assert abs(left[:, 0].max() - 0.06) < 1e-12
        np.testing.assert_allclose(left[:, 1].mean(), -0.055, atol=1e-12)
        np.testing.assert_allclose(right[:, 1].mean(), 0.055, atol=1e-12)
        # Base bar: 0.02 deep, centered 0.01 behind the hand.
        np.testing.assert_allclose(base[:, 0].mean(), -0.01, atol=1e-12)
        assert abs((base[:, 1].max() - base[:, 1].min()) - 0.12) < 1e-12
        # Approach stub: half height.
        assert abs((stub[:, 2].max() - stub[:, 2].min()) - 0.01) < 1e-12

    def test_rotation_equivariance(self, rng):
        A = rng.normal(size=(3, 3))
        q, _ = np.linalg.qr(A)
        if np.linalg.det(q) < 0:
            q[:, 0] = -q[:, 0]
        p = rng.normal(size=3)
        b0 = hand_volume_boxes(np.zeros(3), np.eye(3))
        b1 = hand_volume_boxes(p, q)
        np.testing.assert_allclose(b1, b0 @ q.T + p, atol=1e-12)

    def test_render_headless(self, rng, tmp_path):
        pts = rng.normal(scale=0.03, size=(300, 3))
        gs = [dict(position=np.zeros(3), orientation=np.eye(3), score=1.0,
                   full_antipodal=True),
              dict(position=np.array([0.05, 0, 0]), orientation=np.eye(3),
                   score=0.2)]
        for cb in ("score", "antipodal", "fixed"):
            out = tmp_path / f"h_{cb}.png"
            plot_hands_3d(pts, gs, path=str(out), color_by=cb)
            assert out.stat().st_size > 10000

    def test_segments_shape(self):
        s = hand_segments(np.zeros(3), np.eye(3))
        assert s.shape == (4, 2, 3)

    def test_volume_box_extents(self):
        """Image-volume cube (plotVolumes3D, plot.cpp:117-126): centered
        0.5*volume_depth along approach, reference extents."""
        b = volume_box(np.zeros(3), np.eye(3), 0.06, 0.10, 0.04)
        assert b.shape == (8, 3)
        np.testing.assert_allclose(b[:, 0].mean(), 0.03, atol=1e-12)
        assert abs((b[:, 0].max() - b[:, 0].min()) - 0.06) < 1e-12
        assert abs((b[:, 1].max() - b[:, 1].min()) - 0.10) < 1e-12
        assert abs((b[:, 2].max() - b[:, 2].min()) - 0.04) < 1e-12

    def test_volume_and_geometry_views_render(self, rng, tmp_path):
        pts = rng.normal(scale=0.03, size=(300, 3))
        gs = [dict(position=np.zeros(3), orientation=np.eye(3), score=1.0)]
        out1 = tmp_path / "volumes.png"
        plot_volumes_3d(pts, gs, path=str(out1))
        assert out1.stat().st_size > 10000
        out2 = tmp_path / "handgeom.png"
        plot_hand_geometry(gs[0], pts, path=str(out2))
        assert out2.stat().st_size > 10000
