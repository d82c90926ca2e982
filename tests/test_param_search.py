"""CMA-ES parameter search: optimizer sanity + batched evaluator smoke."""

import numpy as np
import jax.numpy as jnp
import pytest

from red_gym_tpu.config import SimConfig
from red_gym_tpu.agents import pure_pursuit as pp
from red_gym_tpu.tuning import CMAES, make_laptime_evaluator

from tests._assets import requires_reference

pytestmark = requires_reference

MAP_YAML = "/root/reference/examples/example_map.yaml"
WPT_CSV = "/root/reference/examples/example_waypoints.csv"


def test_cmaes_minimizes_quadratic():
    target = np.array([0.3, -1.2, 2.0])
    es = CMAES(x0=np.zeros(3), sigma0=1.0, popsize=16, seed=1)
    for _ in range(60):
        xs = es.ask()
        fs = np.sum((xs - target) ** 2, axis=1)
        es.tell(xs, fs)
    assert es.best_f < 1e-4
    np.testing.assert_allclose(es.best_x, target, atol=0.02)


def test_cmaes_respects_bounds():
    bounds = np.array([[0.0, 1.0], [2.0, 3.0]])
    es = CMAES(x0=[0.5, 2.5], sigma0=5.0, popsize=32, seed=2, bounds=bounds)
    xs = es.ask()
    assert np.all(xs[:, 0] >= 0.0) and np.all(xs[:, 0] <= 1.0)
    assert np.all(xs[:, 1] >= 2.0) and np.all(xs[:, 1] <= 3.0)


@pytest.fixture(scope="module")
def evaluator():
    cfg = SimConfig(num_agents=1, num_beams=32, dtype="float64",
                    march_iters=24, scan_noise_std=0.0)
    wpts = pp.load_waypoints_csv(WPT_CSV, dtype=jnp.float64)
    return make_laptime_evaluator(cfg, MAP_YAML, wpts, steps=250,
                                  start_pose=[0.7, 0.0, 1.37079632679])


@pytest.mark.slow
def test_search_end_to_end():
    """Two tiny CMA generations through the real evaluator improve (or at
    least don't corrupt) the incumbent; returns the best dict."""
    from red_gym_tpu.tuning import search

    cfg = SimConfig(num_agents=1, num_beams=32, dtype="float64",
                    march_iters=24, scan_noise_std=0.0)
    wpts = pp.load_waypoints_csv(WPT_CSV, dtype=jnp.float64)
    best, best_f = search(cfg, MAP_YAML, wpts,
                          start_pose=[0.7, 0.0, 1.37079632679],
                          popsize=4, generations=2, steps=120, log=None)
    assert set(best) == {"m", "lf", "tlad", "vgain"}
    assert np.isfinite(best_f)


@pytest.mark.slow
def test_evaluator_population_batch(evaluator):
    """One dispatch evaluates the whole population; per-candidate params
    actually differ (different fitness for sane vs broken controllers)."""
    pop = {
        "m": jnp.asarray([3.74, 3.74, 3.74, 3.74]),
        "lf": jnp.asarray([0.15875] * 4),
        "tlad": jnp.asarray([0.82, 0.82, 0.82, 0.05]),   # last: hopeless lookahead
        "vgain": jnp.asarray([1.0, 1.375, 0.7, 1.375]),
    }
    fs = np.asarray(evaluator(pop))
    assert fs.shape == (4,)
    assert np.all(np.isfinite(fs))
    # 250 steps cannot finish two laps -> all get budget-based fitness, and
    # the degenerate lookahead candidate must not beat the sane ones
    assert fs[3] >= fs.min()
    assert len(np.unique(np.round(fs, 6))) > 1, "population collapsed to one fitness"
