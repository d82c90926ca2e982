"""Shared test-asset paths + skip guard for the reference tree.

Map/waypoint binaries are read from the read-only reference mount rather
than vendored (parity tests must see the reference's own assets).  On
machines without the mount (e.g. GitHub CI runners) every test that touches
these paths skips via ``requires_reference`` instead of failing with
FileNotFoundError.
"""

import os

import pytest

REFERENCE_ROOT = "/root/reference"
HAVE_REFERENCE = os.path.isdir(REFERENCE_ROOT)

requires_reference = pytest.mark.skipif(
    not HAVE_REFERENCE,
    reason="reference tree not mounted at /root/reference")
