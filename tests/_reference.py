"""Loader for the reference implementation used as a golden test oracle.

The reference (WE-Autopilot/red_gym) is mounted read-only at /root/reference.
Its performance layer is Numba ``@njit`` over pure numpy, so with a no-op
``njit`` shim the kernel modules run as plain Python and provide bit-exact
float64 oracles for parity tests.  Only the dependency-light modules are
loaded (dynamic_models, laser_models, collision_models, base_classes) —
f110_env.py needs gym+pyglet which are not installed, so its thin env logic
is replicated inside the tests that need it.
"""

from __future__ import annotations

import importlib.util
import sys
import types

REF_ROOT = "/root/reference/gym/f110_gym/envs"


class Reference:
    def __init__(self, mods):
        self.dynamic_models = mods["dynamic_models"]
        self.laser_models = mods["laser_models"]
        self.collision_models = mods["collision_models"]
        self.base_classes = mods["base_classes"]


def _install_numba_shim():
    if "numba" in sys.modules:
        return
    numba = types.ModuleType("numba")

    def njit(*args, **kwargs):
        if args and callable(args[0]):
            return args[0]
        return lambda f: f

    numba.njit = njit
    sys.modules["numba"] = numba


def _load_module(qualname: str, path: str):
    if qualname in sys.modules:
        return sys.modules[qualname]
    spec = importlib.util.spec_from_file_location(qualname, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[qualname] = mod
    spec.loader.exec_module(mod)
    return mod


_cached = None


def load() -> Reference:
    global _cached
    if _cached is not None:
        return _cached
    _install_numba_shim()

    # Fake the f110_gym package skeleton so base_classes' absolute imports
    # resolve without executing the real __init__ (which needs `gym`).
    for pkg in ("f110_gym", "f110_gym.envs"):
        if pkg not in sys.modules:
            m = types.ModuleType(pkg)
            m.__path__ = []
            sys.modules[pkg] = m

    mods = {}
    for name in ("dynamic_models", "laser_models", "collision_models", "base_classes"):
        mods[name] = _load_module(f"f110_gym.envs.{name}", f"{REF_ROOT}/{name}.py")
        setattr(sys.modules["f110_gym.envs"], name, mods[name])

    _cached = Reference(mods)
    return _cached
