"""The cached Mosaic capability record behind scan_backend="auto"
(red_gym_tpu/utils/capability.py): the library must never dispatch Pallas
without a probe-verified, A/B-measured-faster record for THIS backend, and
the env overrides must win over everything."""

import json

import pytest

from red_gym_tpu.config import SimConfig
from red_gym_tpu.ops import scan_fast
from red_gym_tpu.utils import capability


@pytest.fixture
def record_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("RED_GYM_TPU_TEXTURE_CACHE", str(tmp_path))
    monkeypatch.delenv("RGT_PALLAS", raising=False)
    monkeypatch.delenv("RGT_FUSE_TTC", raising=False)
    capability._edge_pallas_cached.cache_clear()
    yield tmp_path
    capability._edge_pallas_cached.cache_clear()


def _write(rec):
    path = capability.write_record(rec)
    capability._edge_pallas_cached.cache_clear()
    return path


def test_no_record_means_xla(record_dir):
    cfg = SimConfig(scan_mode="fast")           # auto backend, edge mode
    assert not scan_fast._use_pallas(cfg)
    assert not scan_fast.use_fused_ttc(cfg)


def test_record_roundtrip_and_merge(record_dir):
    p1 = _write({"edge_ok": True})
    p2 = _write({"edge_faster": True})
    assert p1 == p2
    with open(p1) as f:
        assert json.load(f) == {"edge_ok": True, "edge_faster": True}


def test_cpu_backend_never_auto_pallas(record_dir):
    """Even a fully positive record must not flip auto off-TPU: interpret-
    mode Pallas is strictly slower (docs/performance.md test-jit lesson)."""
    _write({"edge_ok": True, "edge_faster": True,
            "edge_ttc_ok": True, "fused_faster": True})
    assert capability.read_record()["edge_ok"]
    # tests run on the CPU backend (conftest forces it)
    assert not capability.edge_pallas_enabled()
    assert not capability.fused_ttc_enabled()
    cfg = SimConfig(scan_mode="fast")
    assert not scan_fast._use_pallas(cfg)


def test_tpu_backend_resolution(record_dir, monkeypatch):
    """On a (faked) TPU backend: auto needs BOTH the probe verdict and the
    speed verdict; fused additionally needs its own pair."""
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    _write({"edge_ok": True, "edge_faster": False})
    assert not capability.edge_pallas_enabled()
    _write({"edge_ok": True, "edge_faster": True})
    assert capability.edge_pallas_enabled()
    assert not capability.fused_ttc_enabled()       # no fused verdict yet
    _write({"edge_ttc_ok": True, "fused_faster": True})
    assert capability.fused_ttc_enabled()

    cfg = SimConfig(scan_mode="fast")
    assert scan_fast._use_pallas(cfg)
    assert scan_fast.use_fused_ttc(cfg)
    # spectral keeps its quarantine: auto never fuses the spectral kernel
    import dataclasses
    ucfg = dataclasses.replace(cfg, scan_interp="spectral", rt_grad=False,
                               rt_occlusion="off")
    assert not scan_fast._use_pallas(ucfg)
    assert not scan_fast.use_fused_ttc(ucfg)


def test_env_overrides_win(record_dir, monkeypatch):
    monkeypatch.setenv("RGT_PALLAS", "on")
    assert capability.edge_pallas_enabled()         # no record, CPU backend
    monkeypatch.setenv("RGT_PALLAS", "off")
    _write({"edge_ok": True, "edge_faster": True,
            "edge_ttc_ok": True, "fused_faster": True})
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert not capability.edge_pallas_enabled()
    assert not capability.fused_ttc_enabled()       # pallas off kills fused
    monkeypatch.setenv("RGT_PALLAS", "on")
    monkeypatch.setenv("RGT_FUSE_TTC", "off")
    assert capability.edge_pallas_enabled()
    assert not capability.fused_ttc_enabled()
