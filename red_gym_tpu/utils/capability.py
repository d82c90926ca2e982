"""Cached on-chip capability record for the Mosaic (Pallas) scan epilogues.

``scan_backend="auto"`` must never hang a user's first jit: the fused edge
epilogue is the measured-best backend for the default scan mode on TPU, but
Mosaic dispatch through a relayed chip has twice been observed to wedge the
backend (round 3: first edge dispatch; round 4: the spectral+iTTC kernel).
So "auto" only resolves to Pallas when a KILLABLE probe has already proven
the edge kernels execute — and measured them faster — on this machine's
backend, and recorded that verdict here.

The record is a tiny JSON file under the texture-cache directory, keyed by
backend + jax version (a toolchain upgrade invalidates it).  It is written
by tools/probe_pallas.py (executes every edge-path kernel in subprocesses)
and tools/ablate_default.py --record (the end-to-end speed A/B); the
library only ever READS it.  ``RGT_PALLAS=on|off`` overrides everything
(e.g. for single-run experiments without touching the cache).
"""

from __future__ import annotations

import functools
import json
import os


def _cache_dir() -> str:
    d = os.environ.get("RED_GYM_TPU_TEXTURE_CACHE")
    if d and d.lower() in ("0", "off", "none", ""):
        d = None
    return d or os.path.join(os.path.expanduser("~"), ".cache",
                             "red_gym_tpu")


def record_path(backend: str | None = None) -> str:
    import jax

    backend = backend or jax.default_backend()
    return os.path.join(_cache_dir(),
                        f"mosaic_capability_{backend}_jax{jax.__version__}.json")


def read_record(backend: str | None = None) -> dict:
    try:
        with open(record_path(backend)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def write_record(updates: dict, backend: str | None = None) -> str:
    """Merge ``updates`` into the capability record (tool-side only)."""
    path = record_path(backend)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rec = read_record(backend)
    rec.update(updates)
    with open(path, "w") as f:
        json.dump(rec, f, indent=1, sort_keys=True)
    return path


@functools.lru_cache(maxsize=None)
def _edge_pallas_cached(backend: str) -> bool:
    rec = read_record(backend)
    return bool(rec.get("edge_ok")) and bool(rec.get("edge_faster"))


def edge_pallas_enabled() -> bool:
    """Resolution of scan_backend="auto" for the edge modes: True iff the
    edge kernels are probe-verified AND A/B-measured faster on this
    backend (or RGT_PALLAS=on forces it)."""
    ov = os.environ.get("RGT_PALLAS", "").lower()
    if ov in ("on", "1", "true"):
        return True
    if ov in ("off", "0", "false"):
        return False
    import jax

    backend = jax.default_backend()
    if backend != "tpu":
        return False          # interpret-mode Pallas is strictly slower
    return _edge_pallas_cached(backend)


def fused_ttc_enabled() -> bool:
    """Resolution of fuse_scan_ttc="auto": additionally requires the fused
    edge+iTTC kernel to be probe-verified and A/B-measured faster."""
    ov = os.environ.get("RGT_FUSE_TTC", "").lower()
    if ov in ("on", "1", "true"):
        return True
    if ov in ("off", "0", "false"):
        return False
    if not edge_pallas_enabled():
        return False
    rec = read_record()
    return bool(rec.get("edge_ttc_ok")) and bool(rec.get("fused_faster"))


def mega_enabled() -> bool:
    """Resolution of scan_megakernel="auto": probe verdict (mega_ok, from
    tools/probe_pallas.py pallas-mega) AND end-to-end A/B (mega_faster,
    from tools/ablate_default.py --record).  RGT_MEGA=on|off overrides."""
    ov = os.environ.get("RGT_MEGA", "").lower()
    if ov in ("on", "1", "true"):
        return True
    if ov in ("off", "0", "false"):
        return False
    if not edge_pallas_enabled():
        return False
    rec = read_record()
    return bool(rec.get("mega_ok")) and bool(rec.get("mega_faster"))


def state_kernel_enabled() -> bool:
    """Resolution of state_kernel="auto".  The fused pre-scan state kernel
    measured END-TO-END NEGATIVE on round-5 hardware (4.76-4.92M vs 5.16M,
    docs/performance.md) so NO tool currently writes the state_ok /
    state_faster record keys — auto therefore always resolves OFF and the
    only way to run the kernel is the RGT_STATE_KERNEL=on override (or
    cfg.state_kernel="on").  The keys are reserved so a future
    re-evaluation on different hardware can flip the default from data
    by writing them."""
    ov = os.environ.get("RGT_STATE_KERNEL", "").lower()
    if ov in ("on", "1", "true"):
        return True
    if ov in ("off", "0", "false"):
        return False
    if not mega_enabled():
        return False
    rec = read_record()
    return bool(rec.get("state_ok")) and bool(rec.get("state_faster"))


def mega_opp_enabled() -> bool:
    """Resolution of fuse_scan_opp="auto" when the MEGAKERNEL carries the
    scan: needs the mega+opp program's own probe + A/B verdicts
    (mega_opp_ok / mega_opp_faster; RGT_MEGA_OPP=on|off overrides)."""
    ov = os.environ.get("RGT_MEGA_OPP", "").lower()
    if ov in ("on", "1", "true"):
        return True
    if ov in ("off", "0", "false"):
        return False
    rec = read_record()
    return bool(rec.get("mega_opp_ok")) and bool(rec.get("mega_opp_faster"))


def fused_opp_enabled() -> bool:
    """Resolution of fuse_scan_opp="auto": the opp-fused kernel is a
    DISTINCT Mosaic program from edge_ttc, so it needs its own probe
    verdict (tools/probe_pallas.py pallas-edge-ttc-opp) and end-to-end
    A/B (tools/ablate_default.py --record, key opp_faster)."""
    ov = os.environ.get("RGT_FUSE_OPP", "").lower()
    if ov in ("on", "1", "true"):
        return True
    if ov in ("off", "0", "false"):
        return False
    if not fused_ttc_enabled():
        return False
    rec = read_record()
    return bool(rec.get("edge_ttc_opp_ok")) and bool(rec.get("opp_faster"))
