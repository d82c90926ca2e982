"""Native EDT tests: exactness vs scipy and integration with the loader."""

import numpy as np
import pytest
from scipy.ndimage import distance_transform_edt

from red_gym_tpu import native

from tests._assets import requires_reference

pytestmark = requires_reference


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_edt_matches_scipy_random(lib):
    rng = np.random.default_rng(0)
    for _ in range(10):
        h, w = rng.integers(3, 200, 2)
        occ = (rng.random((h, w)) > 0.2).astype(np.float64) * 255
        want = 0.0625 * distance_transform_edt(occ)
        got = native.edt(occ, 0.0625)
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_edt_edge_cases(lib):
    # all free: infinite distances
    out = native.edt(np.full((4, 5), 255.0), 1.0)
    assert np.all(np.isinf(out))
    # all obstacle: zeros
    out = native.edt(np.zeros((4, 5)), 1.0)
    assert np.all(out == 0)
    # single obstacle pixel
    occ = np.full((7, 7), 255.0)
    occ[3, 3] = 0
    want = distance_transform_edt(occ)
    np.testing.assert_allclose(native.edt(occ, 1.0), want)


def test_edt_on_real_map(lib):
    from red_gym_tpu.maps.loader import load_map_image

    occ = load_map_image("/root/reference/examples/example_map.png")
    want = 0.0625 * distance_transform_edt(occ)
    got = native.edt(occ, 0.0625)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_loader_uses_native(monkeypatch):
    """loader.load_map routes through the native edt wrapper."""
    import jax.numpy as jnp
    from red_gym_tpu.maps import loader

    called = {}
    orig = native.edt

    def spy(occ, res):
        called["yes"] = True
        return orig(occ, res)

    monkeypatch.setattr(loader, "edt", spy, raising=False)
    tmap = loader.load_map("/root/reference/examples/example_map.yaml", ".png",
                           dtype=jnp.float64)
    assert called.get("yes"), "loader did not call the edt wrapper"
