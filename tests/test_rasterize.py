"""Rasterizer tests vs the reference cv2 pipeline (weap_util/lidar.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from red_gym_tpu.ops.rasterize import lidar_to_bitmap

from tests._assets import requires_reference

pytestmark = requires_reference


def _ref_bitmap(scan, **kw):
    """Reference rasterizer (cv2) loaded from the read-only checkout."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "weap_lidar", "/root/reference/weap_util/weap_util/lidar.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.lidar_to_bitmap(list(scan), **kw)


def _iou(a, b, fg):
    a, b = (np.asarray(a) == fg), (np.asarray(b) == fg)
    return (a & b).sum() / max((a | b).sum(), 1)


@pytest.fixture(scope="module")
def scan():
    rng = np.random.default_rng(0)
    base = 5.0 + 3.0 * np.sin(np.linspace(0, 4 * np.pi, 1080))
    return np.clip(base + rng.normal(0, 0.05, 1080), 0.5, 30.0)


@pytest.mark.parametrize("mode,min_iou", [("FILL", 0.97), ("POLYGON", 0.55),
                                          ("RAYS", 0.75)])
def test_modes_vs_cv2(scan, mode, min_iou):
    """FILL must track cv2 closely; outline modes differ along thin lines
    (different line rasterizers), so their IoU bar is lower."""
    kw = dict(bg_color="black", draw_mode=mode)
    ours = lidar_to_bitmap(jnp.asarray(scan), **kw)
    ref = _ref_bitmap(scan, **kw)
    assert ours.shape == ref.shape == (256, 256)
    iou = _iou(ours, ref, 255)
    assert iou > min_iou, f"{mode} IoU {iou:.3f}"


def test_fill_white_bg(scan):
    ours = np.asarray(lidar_to_bitmap(jnp.asarray(scan), bg_color="white",
                                      draw_mode="FILL"))
    ref = _ref_bitmap(scan, bg_color="white", draw_mode="FILL")
    assert _iou(ours, ref, 0) > 0.97  # drawn region is 0 on white bg


def test_channels(scan):
    g = lidar_to_bitmap(jnp.asarray(scan), channels=1)
    rgb = lidar_to_bitmap(jnp.asarray(scan), channels=3)
    rgba = lidar_to_bitmap(jnp.asarray(scan), channels=4)
    assert g.shape == (256, 256)
    assert rgb.shape == (256, 256, 3)
    assert rgba.shape == (256, 256, 4)
    np.testing.assert_array_equal(np.asarray(rgb[..., 0]), np.asarray(g))
    assert np.all(np.asarray(rgba[..., 3]) == 255)


def test_center_marker(scan):
    img = np.asarray(lidar_to_bitmap(jnp.asarray(scan), bg_color="black",
                                     draw_mode="FILL", draw_center=True))
    assert np.all(img[126:131, 126:131] == 0)  # bg-colored square in FILL mode
