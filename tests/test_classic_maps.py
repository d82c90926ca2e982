"""Classic-map conversion tests (VERDICT r2 item 8): parity workflows run
from the converted package-layout assets, not the reference mount paths."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from red_gym_tpu.config import SimConfig
from red_gym_tpu.maps import classic
from red_gym_tpu.maps.loader import load_map
from red_gym_tpu.ops import scan as scan_ops

from tests._assets import requires_reference

pytestmark = requires_reference

SRC = "/root/reference/gym/f110_gym/envs/maps"


@pytest.fixture(scope="module")
def converted(tmp_path_factory, monkeypatch=None):
    dest = str(tmp_path_factory.mktemp("classic_maps"))
    return classic.import_classic_maps(SRC, dest), dest


def test_conversion_produces_loadable_maps(converted):
    maps, dest = converted
    # levine's pgm is stripped from the reference checkout -> skipped
    assert {"berlin", "skirk", "vegas", "stata_basement"} <= set(maps)
    for name, path in maps.items():
        tmap = load_map(path, ".png", dtype=jnp.float64)
        assert int(tmap.height) > 100 and int(tmap.width) > 100


def test_berlin_scan_from_converted_assets(converted):
    """The berlin scan parity case runs from converted assets and matches
    the same scan computed straight off the reference mount."""
    maps, dest = converted
    cfg = SimConfig(num_agents=1, num_beams=270, fov=4.7, dtype="float64")
    tables = scan_ops.build_tables(cfg, 0.31, 0.58, dtype=jnp.float64)

    t_conv = load_map(maps["berlin"], ".png", dtype=jnp.float64)
    t_ref = load_map(os.path.join(SRC, "berlin.yaml"), ".png",
                     dtype=jnp.float64)
    poses = np.zeros((5, 3))
    poses[:, 2] = np.linspace(-1.0, 1.0, num=5)
    a = np.asarray(scan_ops.trace(jnp.asarray(poses), tables, t_conv, cfg))
    b = np.asarray(scan_ops.trace(jnp.asarray(poses), tables, t_ref, cfg))
    np.testing.assert_array_equal(a, b)


def test_classic_map_path_resolves(tmp_path, monkeypatch):
    monkeypatch.setenv("RED_GYM_TPU_CLASSIC_MAPS", str(tmp_path))
    path = classic.classic_map_path("skirk")   # converts from the mount
    assert os.path.isfile(path)
    again = classic.classic_map_path("skirk")  # second call: cached copy
    assert again == path
    with pytest.raises(KeyError):
        classic.classic_map_path("monaco")
