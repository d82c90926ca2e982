"""Multi-host execution path (BASELINE config 5 precursor).

Launches the sharded PPO training step as 2 OS processes x 4 virtual CPU
devices joined via jax.distributed (the multi-host configuration the
reference never had) and checks it produces the same loss / updated
parameters as the identical program on a single 8-device process: the
cross-process gradient psum must be numerically equivalent to the
single-process one, and params must actually move.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "_distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn(coord, nprocs, pid, out, devcount, *extra):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", "").strip()
        + f" --xla_force_host_platform_device_count={devcount}").strip()
    env.pop("JAX_PLATFORMS", None)   # worker forces cpu via jax.config
    return subprocess.Popen(
        [sys.executable, WORKER, coord, str(nprocs), str(pid), out,
         *map(str, extra)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)


@pytest.mark.slow
def test_two_process_train_step_matches_single_process(tmp_path):
    outs = {n: str(tmp_path / f"out_p{n}.json") for n in ("single", 0, 1)}

    # baseline: one process, 8 virtual devices
    p = _spawn("none", 1, 0, outs["single"], devcount=8)
    log = p.communicate(timeout=900)[0].decode()
    assert p.returncode == 0, f"single-process worker failed:\n{log[-4000:]}"

    # the same global program as 2 processes x 4 devices
    coord = f"127.0.0.1:{_free_port()}"
    procs = [_spawn(coord, 2, pid, outs[pid], devcount=4) for pid in (0, 1)]
    logs = [pr.communicate(timeout=900)[0].decode() for pr in procs]
    for pr, log in zip(procs, logs):
        assert pr.returncode == 0, f"distributed worker failed:\n{log[-4000:]}"

    res = {k: json.load(open(v)) for k, v in outs.items()}
    assert res[0]["process_count"] == 2 and res[1]["process_count"] == 2
    # replicated outputs agree across the two processes bitwise
    assert res[0]["loss"] == res[1]["loss"]
    assert res[0]["param_checksum"] == res[1]["param_checksum"]
    # the update actually happened
    assert res[0]["param_checksum"] != res[0]["param_checksum_before"]
    # and the 2-process program matches the single-process one (same global
    # mesh, same shardings; tolerance covers collective-order rounding)
    np.testing.assert_allclose(res[0]["loss"], res["single"]["loss"],
                               rtol=1e-5)
    np.testing.assert_allclose(res[0]["reward_mean"],
                               res["single"]["reward_mean"], rtol=1e-5)
    np.testing.assert_allclose(res[0]["param_checksum"],
                               res["single"]["param_checksum"], rtol=1e-5)


@pytest.mark.slow
def test_twenty_step_run_multi_shapes_match_single(tmp_path):
    """VERDICT r2 item 3a+3b: a 20-step sharded PPO run in 2 processes x 4
    devices AND 4 processes x 2 devices reproduces the single-process
    20-step loss/checksum trajectory step for step, and training makes
    progress (params keep moving, losses stay finite)."""
    steps = 20
    out_single = str(tmp_path / "single.json")
    p = _spawn("none", 1, 0, out_single, 8, "--steps", steps)
    log = p.communicate(timeout=1800)[0].decode()
    assert p.returncode == 0, f"single-process worker failed:\n{log[-4000:]}"
    base = json.load(open(out_single))
    assert len(base["losses"]) == steps
    assert np.all(np.isfinite(base["losses"]))
    # params move EVERY step (training is live, not a no-op)
    cs = [base["param_checksum_before"]] + base["checksums"]
    assert all(a != b for a, b in zip(cs, cs[1:]))

    for nprocs, dev in ((2, 4), (4, 2)):
        coord = f"127.0.0.1:{_free_port()}"
        outs = [str(tmp_path / f"p{nprocs}_{i}.json") for i in range(nprocs)]
        procs = [_spawn(coord, nprocs, i, outs[i], dev, "--steps", steps)
                 for i in range(nprocs)]
        logs = [pr.communicate(timeout=1800)[0].decode() for pr in procs]
        for pr, log in zip(procs, logs):
            assert pr.returncode == 0, \
                f"{nprocs}-process worker failed:\n{log[-4000:]}"
        res = [json.load(open(o)) for o in outs]
        # all processes see identical replicated outputs
        for r in res[1:]:
            assert r["losses"] == res[0]["losses"]
        # and the multi-process trajectory matches the single-process one
        np.testing.assert_allclose(res[0]["losses"], base["losses"],
                                   rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(res[0]["checksums"], base["checksums"],
                                   rtol=2e-4)


@pytest.mark.slow
def test_worker_death_and_checkpoint_resume(tmp_path):
    """VERDICT r2 item 3c: kill worker 1 abruptly mid-run (os._exit, no
    cleanup), restart BOTH processes from the orbax checkpoint, and the
    resumed loss trajectory must continue exactly where the uninterrupted
    run would be (CPU determinism -> tight tolerance)."""
    steps, ckpt_every, die_at = 10, 4, 6
    ckpt_dir = str(tmp_path / "ckpt")

    # uninterrupted baseline
    out_single = str(tmp_path / "single.json")
    p = _spawn("none", 1, 0, out_single, 8, "--steps", steps)
    log = p.communicate(timeout=1800)[0].decode()
    assert p.returncode == 0, f"baseline worker failed:\n{log[-4000:]}"
    base = json.load(open(out_single))

    # run 1: 2 processes, worker 1 dies before step 6 (after the step-4
    # checkpoint); worker 0 blocks on the next collective and is reaped
    coord = f"127.0.0.1:{_free_port()}"
    outs = [str(tmp_path / f"died_{i}.json") for i in range(2)]
    procs = [_spawn(coord, 2, i, outs[i], 4, "--steps", steps,
                    "--ckpt-every", ckpt_every, "--ckpt-dir", ckpt_dir,
                    "--die-at", die_at) for i in range(2)]
    assert procs[1].wait(timeout=1800) == 9, "worker 1 should die abruptly"
    try:
        procs[0].communicate(timeout=30)
    except subprocess.TimeoutExpired:
        procs[0].kill()       # orchestrator reaps the stranded survivor
        procs[0].communicate()
    assert os.path.exists(os.path.join(ckpt_dir, "STEP"))
    assert int(open(os.path.join(ckpt_dir, "STEP")).read()) == ckpt_every

    # run 2: both workers restart from the checkpoint and finish
    coord = f"127.0.0.1:{_free_port()}"
    outs = [str(tmp_path / f"resumed_{i}.json") for i in range(2)]
    procs = [_spawn(coord, 2, i, outs[i], 4, "--steps", steps,
                    "--ckpt-dir", ckpt_dir, "--resume") for i in range(2)]
    logs = [pr.communicate(timeout=1800)[0].decode() for pr in procs]
    for pr, log in zip(procs, logs):
        assert pr.returncode == 0, f"resumed worker failed:\n{log[-4000:]}"
    res = [json.load(open(o)) for o in outs]
    assert res[0]["start_step"] == ckpt_every
    assert res[0]["losses"] == res[1]["losses"]
    # the resumed tail equals the uninterrupted run's tail
    np.testing.assert_allclose(res[0]["losses"],
                               base["losses"][ckpt_every:], rtol=2e-4,
                               atol=1e-5)
    np.testing.assert_allclose(res[0]["checksums"],
                               base["checksums"][ckpt_every:], rtol=2e-4)
