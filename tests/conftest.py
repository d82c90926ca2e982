"""Test session setup.

Tests run on a virtual 8-device CPU mesh with float64 enabled so that parity
checks against the (float64, CPU) reference implementation are meaningful and
multi-chip sharding can be exercised without a TPU pod
(``--xla_force_host_platform_device_count=8``).

Note: the interpreter may pre-import jax with a TPU platform plugin via
sitecustomize, so the platform is forced to CPU through jax.config (which
works post-import, pre-backend-init) rather than JAX_PLATFORMS.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent XLA compilation cache: the fast lane is compile-dominated on a
# small CI box (~100 jitted programs); repeat runs skip recompilation.
# Harmless when unsupported — jax ignores cache misses/failures silently.
try:
    _cc = os.environ.get(
        "RED_GYM_TPU_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "red_gym_tpu",
                     "jaxcache"))
    if _cc.lower() not in ("0", "off", "none", ""):
        jax.config.update("jax_compilation_cache_dir", _cc)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
except Exception:      # older jax without some knobs: best effort only
    pass

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def reference():
    """The reference gym's kernel modules, or None if unavailable.

    The reference tree is mounted read-only at /root/reference; we import its
    pure-numpy kernel modules (with a numba no-op shim) to use as golden
    oracles. Tests that need it should skip when it is absent.
    """
    from tests import _reference

    try:
        return _reference.load()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference tree unavailable: {e}")
