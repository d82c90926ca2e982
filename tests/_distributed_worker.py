"""Worker process for tests/test_distributed.py.

Runs ONE sharded PPO training step over a global env mesh and writes the
resulting metrics + a parameter checksum to a JSON file.  Launched either
as a single process with 8 virtual CPU devices (the baseline) or as 2
processes x 4 virtual devices each (the multi-host configuration); both
must produce the same numbers — that is the test.

Usage: python _distributed_worker.py <coordinator> <num_procs> <proc_id> <out.json>
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    coord, nprocs, pid, out_path = sys.argv[1:5]
    nprocs, pid = int(nprocs), int(pid)

    import jax

    # the interpreter may pre-import jax with a TPU plugin via sitecustomize;
    # force CPU post-import (JAX_PLATFORMS in the env is too late)
    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp

    from red_gym_tpu.config import Integrator, SimConfig
    from red_gym_tpu import env as envlib
    from red_gym_tpu.agents.ppo import PPO, PPOConfig, ScanPolicy
    from red_gym_tpu.parallel import distributed as dist
    from red_gym_tpu.parallel import sharding as sh

    if nprocs > 1:
        dist.initialize(coord, nprocs, pid)
    assert jax.process_count() == nprocs, (jax.process_count(), nprocs)
    assert len(jax.devices()) == 8, f"want 8 global devices, got {len(jax.devices())}"

    import glob

    data = os.path.join(os.path.dirname(__file__), "..", "red_gym_tpu",
                        "assets", "data")
    map_yaml = sorted(glob.glob(os.path.join(data, "track_*.yaml")))[0]

    cfg = SimConfig(num_agents=2, num_beams=54, timestep=0.01,
                    integrator=Integrator.RK4, dtype="float32",
                    march_iters=8, scan_noise_std=0.0)
    env_params = envlib.make_params(cfg, map_yaml, ".png")

    mesh = dist.make_env_mesh()
    env_params = sh.shard_params(mesh, env_params)

    n_env = 16
    w = np.loadtxt(map_yaml.replace(".yaml", "_waypoints.csv"),
                   delimiter=";", comments="#")
    th = float(np.arctan2(w[1, 2] - w[0, 2], w[1, 1] - w[0, 1]))
    start = np.asarray([[w[0, 1], w[0, 2], th],
                        [w[8, 1], w[8, 2], th]], np.float32)

    # identical global seeds on every process; each materializes only its rows
    keys = np.asarray(jax.random.split(jax.random.PRNGKey(0), n_env))
    rows = dist.process_env_slice(n_env)
    poses_local = np.tile(start, (rows.stop - rows.start, 1, 1))
    keys_local = keys[rows]

    reset_v = jax.jit(jax.vmap(
        lambda pr, po, k: envlib.reset(cfg, pr, po, k), in_axes=(None, 0, 0)))
    states_l, obs_l, *_ = reset_v(env_params, jnp.asarray(poses_local),
                                  jnp.asarray(keys_local))
    states = dist.global_env_tree(mesh, jax.tree.map(np.asarray, states_l))
    obs = dist.global_env_tree(mesh, jax.tree.map(np.asarray, obs_l))

    ppo = PPO(cfg, env_params,
              PPOConfig(rollout_len=4, minibatches=2, epochs=1),
              ScanPolicy(hidden=32, scan_stride=4))
    pstate = ppo.init(jax.random.PRNGKey(1))
    pstate = sh.replicate(mesh, pstate)

    train = jax.jit(lambda ps, s, o, ep: ppo.train_step(ps, s, o, ep))
    pstate2, states, obs, metrics = train(pstate, states, obs, env_params)

    # all outputs below are replicated -> identical on every process
    loss = float(metrics["loss"])
    reward = float(metrics["reward_mean"])
    checksum = float(sum(jnp.sum(jnp.abs(l)) for l in
                         jax.tree.leaves(pstate2.params)))
    checksum0 = float(sum(jnp.sum(jnp.abs(l)) for l in
                          jax.tree.leaves(pstate.params)))
    out = {"process_count": jax.process_count(),
           "process_index": jax.process_index(),
           "loss": loss, "reward_mean": reward,
           "param_checksum": checksum, "param_checksum_before": checksum0}
    with open(out_path, "w") as f:
        json.dump(out, f)
    print("worker done:", out)


if __name__ == "__main__":
    main()
