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
