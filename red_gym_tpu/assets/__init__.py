"""Asset resolution for maps and racelines.

The framework ships procedurally generated tracks (see
red_gym_tpu/maps/trackgen.py) under ``red_gym_tpu/assets/data/``.  When a
requested asset is not packaged, we fall back to the read-only reference
checkout (if mounted) so parity demos can run against the original
example_map without copying its binary assets into this tree.
"""

from __future__ import annotations

import os

_PKG_DATA = os.path.join(os.path.dirname(__file__), "data")
_REFERENCE_EXAMPLES = "/root/reference/examples"
_REFERENCE_MAPS = "/root/reference/gym/f110_gym/envs/maps"


def _resolve(candidates):
    for c in candidates:
        if os.path.exists(c):
            return c
    raise FileNotFoundError(f"none of {candidates} exist; generate assets with "
                            "`python -m red_gym_tpu.maps.trackgen`")


def example_map_yaml() -> str:
    return _resolve([os.path.join(_PKG_DATA, "example_map.yaml"),
                     os.path.join(_REFERENCE_EXAMPLES, "example_map.yaml")])


def example_waypoints_csv() -> str:
    return _resolve([os.path.join(_PKG_DATA, "example_waypoints.csv"),
                     os.path.join(_REFERENCE_EXAMPLES, "example_waypoints.csv")])


def named_map_yaml(name: str) -> str:
    return _resolve([os.path.join(_PKG_DATA, f"{name}.yaml"),
                     os.path.join(_REFERENCE_MAPS, f"{name}.yaml")])
