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


def _spawn(coord, nprocs, pid, out, devcount):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", "").strip()
        + f" --xla_force_host_platform_device_count={devcount}").strip()
    env.pop("JAX_PLATFORMS", None)   # worker forces cpu via jax.config
    return subprocess.Popen(
        [sys.executable, WORKER, coord, str(nprocs), str(pid), out],
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
