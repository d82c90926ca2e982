"""Offline lidar-dataset artifact: reference npz schema parity.

The reference ships 448 collected ``.npz`` lidar datasets whose tensors are
built by the collector loop at f1tenth_gym/examples/lidar.py:214-244 and
saved as ``np.savez_compressed(..., data=np.array(dataset))`` (lidar.py:
255-257): one key ``data``, shape (N, 256, 256), dtype uint8, values {0, 1}.
These tests pin (a) our converter's semantics bit-for-bit against a direct
transcription of the reference loop and (b) the committed sample artifact's
schema, so pipelines written against the reference datasets are demonstrably
consumable from our collector (examples/collect_lidar_dataset.py
--legacy-npz).
"""

import os

import numpy as np

from red_gym_tpu.ops.rasterize import scans_to_legacy_tensors

ARTIFACT = os.path.join(os.path.dirname(__file__), "..", "red_gym_tpu",
                        "assets", "data", "lidar_dataset_sample.npz")


def _reference_loop_tensor(lidar_scan, max_range=30.0):
    """Direct transcription of the reference collector's per-scan loop
    (f1tenth_gym/examples/lidar.py:214-244), kept deliberately scalar."""
    angles = np.linspace(-135, 135, len(lidar_scan)) * np.pi / 180.0
    grid_size = 256
    x_min, x_max = -10.0, 10.0
    y_min, y_max = -10.0, 10.0
    tensor = np.zeros((grid_size, grid_size), dtype=np.uint8)
    for beam_idx in range(len(lidar_scan)):
        range_ = lidar_scan[beam_idx]
        if range_ >= max_range:
            continue
        angle = angles[beam_idx]
        x = range_ * np.cos(angle)
        y = range_ * np.sin(angle)
        if not (x_min <= x <= x_max and y_min <= y <= y_max):
            continue
        i_row = int(((x - x_min) / (x_max - x_min)) * (grid_size - 1))
        i_col = int(((y - y_min) / (y_max - y_min)) * (grid_size - 1))
        i_row = np.clip(i_row, 0, grid_size - 1)
        i_col = np.clip(i_col, 0, grid_size - 1)
        tensor[i_row, i_col] = 1
    return tensor


def test_converter_matches_reference_loop():
    rng = np.random.default_rng(7)
    # ranges spanning hits, max-range beams, and out-of-box (>10 m) hits
    scans = rng.uniform(0.05, 35.0, size=(6, 1080))
    scans[0, :200] = 30.0                      # exactly max_range: skipped
    scans[1, 500:600] = 29.9                   # in range but outside the box
    ours = scans_to_legacy_tensors(scans)
    for i in range(scans.shape[0]):
        np.testing.assert_array_equal(ours[i], _reference_loop_tensor(scans[i]))


def test_converter_shapes_and_small_beam_counts():
    # beam count independent of 1080 (the reference linspaces angles over
    # whatever the scan length is)
    scans = np.full((3, 60), 5.0)
    out = scans_to_legacy_tensors(scans)
    assert out.shape == (3, 256, 256) and out.dtype == np.uint8
    for i in range(3):
        np.testing.assert_array_equal(out[i], _reference_loop_tensor(scans[i]))


def test_committed_artifact_schema():
    """The committed sample must look exactly like a reference dataset file."""
    with np.load(ARTIFACT) as z:
        assert list(z.keys()) == ["data"]
        data = z["data"]
    n, h, w = data.shape
    assert (h, w) == (256, 256)
    assert n > 0
    assert data.dtype == np.uint8
    vals = np.unique(data)
    assert set(vals.tolist()) <= {0, 1}
    # every tensor holds at most one point per beam and real scans hit walls
    per = data.reshape(n, -1).sum(axis=1)
    assert per.max() <= 1080
    assert per.min() > 0
