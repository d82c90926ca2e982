"""Benchmark: aggregate env-steps/s, 2-agent races with 1080-beam lidar.

Prints one JSON line per measured mode; the LAST line (the one the driver
records) is the LIBRARY-DEFAULT configuration — fast scan_mode with the
round-3 defaults: nearest1 spatial (one texture-row gather), linear theta
interpolation with the occlusion edge/width channels and gradient
pose-correction (error contract: median 3.1 cm, p99 0.38 m,
docs/performance.md).

The reference publishes no absolute throughput number; its closest claim is
"up to 30x realtime" for the full env (reference docs/index.rst:12), i.e.
~3000 env-steps/s at the 0.01s physics step on one CPU.  vs_baseline is the
ratio against that claim.

Un-killable-silent design (round 4): the parent process imports NO jax and
touches NO device — it emits a provisional JSON line immediately, then runs
every preflight and measurement in a killable child subprocess under a hard
total wall budget (BENCH_BUDGET, default 480 s).  Whatever happens to the
device relay, stdout always ends with a parseable JSON line well inside any
sane driver timeout.  The default-mode line is printed FIRST when measured
(so it exists even if a later mode hangs) and re-printed LAST (so the
driver records it).
"""

import dataclasses
import json
import os
import subprocess
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)

N_ENVS = int(os.environ.get("BENCH_ENVS", 16384))
N_AGENTS = int(os.environ.get("BENCH_AGENTS", 2))
# enough steps per timed call that the one forcing transfer (a ~25-30ms
# relay round trip on remote TPU backends) is amortized below 1%
STEPS = int(os.environ.get("BENCH_STEPS", 120))
# "default" = library defaults; "ultra" = spectral/no-edge-channels;
# BENCH_MODES=default skips the ultra lines.  ultrafused (the round-5
# single-chip record, 6.8M) runs through the staged probe gauntlet and is
# ordered dead last as a defensive habit — its spectral+iTTC kernel is the
# one that wedged the r4 relay; the full probe ladder PASSES on the r5
# toolchain (tools/probe_pallas.py, "ALL STAGES PASS") so it is back in
# the default matrix.
MODES = os.environ.get("BENCH_MODES", "ultra,ultrafused,default").split(",")

_MODE_LABELS = {
    "default": "library default: fast/nearest1/linear + edge/grad channels, "
               "pool noise",
    "ultra": "ultra: fast/nearest1/spectral (pre-r3 error class), pool noise",
    "t256": "default @ rt_theta_bins=256 (accuracy knob)",
    "legacy": "pre-r3 default: bilinear/linear, no channels",
    "bilinear": "bilinear/linear + edge/grad channels",
    "fresh": "default + noise_mode=fresh (the reference's per-step stream)",
    "pool": "alias of default (pool noise IS the default since round 5)",
    "fused": "default + fuse_scan_ttc=on (noise+iTTC in-kernel, explicit)",
    "fusedpool": "alias of fused (pool noise is the default since round 5)",
    "fusedopp": "fuse_scan_ttc=on + fuse_scan_opp=on (noise+iTTC+opponent "
                "raycast in-kernel, explicit)",
    "ultrafused": "ultra (spectral) + fuse_scan_ttc=on (noise+iTTC in-kernel)",
}

# the r2-era per-knob vars were replaced by the BENCH_MODES matrix; warn
# loudly instead of silently measuring something else than asked for
for _legacy in ("BENCH_SCAN_MODE", "BENCH_SCAN_INTERP", "BENCH_RT_SPATIAL"):
    if _legacy in os.environ:
        print(f"WARNING: {_legacy} is ignored (removed in round 3) — "
              f"pick a BENCH_MODES entry instead: {sorted(_MODE_LABELS)}",
              file=sys.stderr, flush=True)


def make_cfg(mode: str):
    """Build the SimConfig for a named bench mode (child-process side)."""
    from red_gym_tpu.config import Integrator, SimConfig

    cfg = SimConfig(num_agents=N_AGENTS, num_beams=1080, timestep=0.01,
                    integrator=Integrator.RK4, dtype="float32",
                    scan_mode="fast")
    mut = {
        "default": {},
        # the r2-headline throughput mode: spectral interpolation on a
        # single-channel texture (grad channels triple the row-gather width
        # for an error class spectral doesn't exploit: 5.68M -> 5.11M)
        "ultra": dict(scan_interp="spectral", rt_grad=False,
                      rt_occlusion="off"),
        "t256": dict(rt_theta_bins=256),
        "legacy": dict(rt_occlusion="off", rt_grad=False,
                       rt_spatial="bilinear"),
        "bilinear": dict(rt_spatial="bilinear"),
        "fresh": dict(noise_mode="fresh"),
        "pool": {},
        "fused": dict(fuse_scan_ttc="on", scan_backend="pallas"),
        "fusedpool": dict(fuse_scan_ttc="on", scan_backend="pallas"),
        "fusedopp": dict(fuse_scan_ttc="on", scan_backend="pallas",
                         fuse_scan_opp="on"),
        "ultrafused": dict(scan_interp="spectral", rt_grad=False,
                           rt_occlusion="off", fuse_scan_ttc="on",
                           scan_backend="pallas"),
    }[mode]
    return dataclasses.replace(cfg, **mut)


def measure(cfg) -> float:
    """Timed aggregate env-steps/s for one config (child-process side)."""
    import jax
    import jax.numpy as jnp

    from red_gym_tpu import env as envlib
    from red_gym_tpu.assets import example_map_yaml

    params = envlib.make_params(
        cfg, os.environ.get("BENCH_MAP") or example_map_yaml(), ".png")
    start = envlib.staggered_start_poses(N_AGENTS)
    poses = jnp.tile(jnp.asarray(start[:N_AGENTS], jnp.float32),
                     (N_ENVS, 1, 1))
    init = jax.jit(jax.vmap(lambda po, k: envlib.init_state(cfg, po, k)))
    states = init(poses, jax.random.split(jax.random.PRNGKey(0), N_ENVS))

    @jax.jit
    def run(params, states, key):
        def body(carry, _):
            s, k = carry
            k, ka = jax.random.split(k)
            steer = 0.4 * jax.random.uniform(ka, (N_ENVS, N_AGENTS),
                                             jnp.float32, -1.0, 1.0)
            speed = jnp.full((N_ENVS, N_AGENTS), 3.0, jnp.float32)
            act = jnp.stack([steer, speed], axis=-1)
            s, obs, r, d, _ = jax.vmap(
                lambda ss, aa: envlib.step(cfg, params, ss, aa))(s, act)
            # consume the full observation every step (a policy would): keeps
            # XLA from dead-code-eliminating the scan/raycast pipeline
            return (s, k), (d, jnp.sum(obs.scans))
        (s, _), (dones, ssum) = jax.lax.scan(
            body, (states, key), None, length=STEPS)
        return s, dones, ssum

    # warmup / compile
    t0 = time.time()
    s, dones, ssum = run(params, states, jax.random.PRNGKey(1))
    float(jnp.sum(s.x) + jnp.sum(ssum))  # force full execution
    # (block_until_ready does not reliably block through the axon relay)
    # compile+first-run wall time: the agent-axis scaling study reads this
    # (trace-time growth with num_agents is a reportable cost)
    print(f"COMPILE_S {time.time() - t0:.1f}", flush=True)

    # best of 3 timed runs (run-to-run variance on shared/relayed chips ~5%)
    rate = 0.0
    for i in range(3):
        t0 = time.time()
        s, dones, ssum = run(params, states, jax.random.PRNGKey(2 + i))
        float(jnp.sum(s.x) + jnp.sum(ssum))
        rate = max(rate, N_ENVS * STEPS / (time.time() - t0))
    return rate


def _child_measure(mode: str) -> int:
    """Entry point for `bench.py --measure MODE`: print one RATE line."""
    from red_gym_tpu.utils import platform as _platform
    _platform.apply()          # RGT_PLATFORM=cpu for off-TPU smoke runs

    cfg = make_cfg(mode)
    if os.environ.get("BENCH_FORCE_BACKEND"):
        kw = {"scan_backend": os.environ["BENCH_FORCE_BACKEND"]}
        if kw["scan_backend"] == "xla":
            kw["fuse_scan_ttc"] = "off"
            kw["fuse_scan_opp"] = "off"
        cfg = dataclasses.replace(cfg, **kw)
    if os.environ.get("BENCH_NOISE_MODE"):
        cfg = dataclasses.replace(cfg,
                                  noise_mode=os.environ["BENCH_NOISE_MODE"])
    rate = measure(cfg)
    print(f"RATE {rate:.1f}", flush=True)
    return 0


# ---------------------------------------------------------------------------
# Parent-side orchestration: no jax imports, every device touch is a child.
# ---------------------------------------------------------------------------

_DEADLINE = None  # set in main()


def _remaining() -> float:
    return max(0.0, _DEADLINE - time.time())


def _run_child(code_or_args, timeout: float, extra_env=None):
    """Run a child python under `timeout`; returns CompletedProcess or None."""
    env = dict(os.environ)
    # PREPEND to PYTHONPATH — the TPU plugin may live in a site dir that is
    # itself on PYTHONPATH (e.g. the axon relay plugin); overwriting would
    # make the child unable to initialize the device backend at all.
    env["PYTHONPATH"] = _HERE + os.pathsep + env.get("PYTHONPATH", "")
    if extra_env:
        env.update(extra_env)
    argv = ([sys.executable, "-c", code_or_args]
            if isinstance(code_or_args, str)
            else [sys.executable] + code_or_args)
    try:
        return subprocess.run(argv, env=env, capture_output=True, text=True,
                              timeout=max(1.0, timeout))
    except subprocess.TimeoutExpired:
        return None


def _warm_textures(modes, timeout: float):
    """Build any missing range textures for `modes` in a CPU child.

    A cold build marches the whole map (~13 min for the 1600^2 example map
    on one core) — far beyond any measurement timeout, so an unwarmed cache
    turns every mode into a timeout; worse, killing a TPU client mid-build
    has been observed to wedge the axon relay (round 4).  The texture cache
    is content-addressed and backend-agnostic, so a CPU build (safe to
    kill) serves the TPU measurement children.  Fast path: if every key is
    already cached the child exits in seconds."""
    code = (
        "import os; os.environ['RGT_PLATFORM'] = 'cpu'\n"
        "from red_gym_tpu.utils import platform as p; p.apply()\n"
        "import bench, jax.numpy as jnp\n"
        "from red_gym_tpu.maps.loader import load_map\n"
        "from red_gym_tpu.ops import scan_fast\n"
        "from red_gym_tpu.assets import example_map_yaml\n"
        f"modes = {modes!r}\n"
        "y = os.environ.get('BENCH_MAP') or example_map_yaml()\n"
        "tmap = load_map(y, '.png', dtype=jnp.float32)\n"
        "seen = set()\n"
        "for m in modes:\n"
        "    cfg = bench.make_cfg(m)\n"
        "    if cfg.scan_mode != 'fast': continue\n"
        "    k = scan_fast._texture_cache_path(tmap, cfg)\n"
        "    if k in seen or (k and os.path.exists(k)): continue\n"
        "    seen.add(k)\n"
        "    print('WARM building', m, flush=True)\n"
        "    scan_fast.build_range_texture(tmap, cfg)\n"
        "print('WARM_DONE', flush=True)\n")
    t0 = time.time()
    r = _run_child(code, timeout, extra_env={"RGT_PLATFORM": "cpu"})
    ok = r is not None and r.returncode == 0 and "WARM_DONE" in r.stdout
    if not ok:
        print(f"WARNING: texture warm-up did not finish in {timeout:.0f}s "
              f"(cold cache?) — measurement children may time out building "
              f"textures; raise BENCH_WARM_BUDGET or run "
              f"tools/prebuild_textures.py once",
              file=sys.stderr, flush=True)
    elif time.time() - t0 > 5:
        print(f"texture cache warmed in {time.time() - t0:.0f}s",
              file=sys.stderr, flush=True)
    return ok


def _device_preflight(timeout: float):
    """Returns backend name ('tpu'/'cpu'/...) iff a tiny op executes, else
    None.  The axon TPU relay has been observed to die hard (backend init
    hangs forever in fresh processes); probing in a killable subprocess is
    what keeps the bench from hanging instead of reporting."""
    code = ("from red_gym_tpu.utils import platform as p; p.apply(); "
            "import jax, jax.numpy as jnp; "
            "print('DEV_OK', jax.default_backend(), "
            "float(jnp.sum(jnp.ones((8, 8)))), flush=True)")
    r = _run_child(code, timeout)
    if r is not None and r.returncode == 0:
        for line in r.stdout.splitlines():
            if line.startswith("DEV_OK"):
                return line.split()[1]
    return None


_PROBE_HEADER = """
from red_gym_tpu.utils import platform as _p; _p.apply()
import numpy as np, jax, jax.numpy as jnp
from red_gym_tpu.ops import pallas_scan
r = np.random.default_rng(0); K, T, B = 256, 128, 1080
"""

# One probe per Mosaic kernel, dispatched ONLY for the bench modes that
# need it (the old all-in-one probe dispatched theta_spectral_ttc on every
# TPU bench run — the one kernel that has actually WEDGED the relay
# (round 4, 2026-08-19), which would have taken the chip down before the
# modes that matter were measured).
_PROBES = {
    "edge": """
out = pallas_scan.theta_shuffle_blend_edge(
    *(jnp.asarray(r.normal(size=(K, T)), jnp.float32) for _ in range(3)),
    jnp.asarray(r.uniform(size=(K,)), jnp.float32), jnp.ones((K,), jnp.float32),
    jnp.asarray(r.normal(size=(T, 3 * B)), jnp.float32),
    jnp.asarray(r.uniform(size=(B,)), jnp.float32), 30.0)
print("PALLAS_OK", float(jnp.sum(out)), flush=True)
""",
    "edge_ttc": """
out2, hit = pallas_scan.theta_shuffle_blend_edge_ttc(
    *(jnp.asarray(r.normal(size=(K, T)), jnp.float32) for _ in range(3)),
    jnp.asarray(r.uniform(size=(K,)), jnp.float32), jnp.ones((K,), jnp.float32),
    jnp.asarray(r.uniform(size=(K,)), jnp.float32),
    jnp.asarray(r.normal(size=(T, 3 * B)), jnp.float32),
    jnp.asarray(r.uniform(size=(B,)), jnp.float32),
    jnp.asarray(0.01 * r.normal(size=(K // 2, B)), jnp.float32),
    jnp.asarray(r.uniform(size=(B,), low=-1, high=1), jnp.float32),
    jnp.asarray(r.uniform(size=(B,), low=0.1, high=0.3), jnp.float32),
    30.0, 0.005, 2)
print("PALLAS_OK", float(jnp.sum(out2) + jnp.sum(hit)), flush=True)
""",
    "edge_ttc_opp": """
import numpy as np
opp = np.zeros((K, 10), np.float32)
opp[:, 0] = 100; opp[:, 1] = 700; opp[:, 2] = 1.0; opp[:, 5] = 1.0
opp[:, 6] = -5.0; opp[:, 8] = 1.0; opp[:, 9] = 1.0
out4, hit4 = pallas_scan.theta_shuffle_blend_edge_ttc_opp(
    *(jnp.asarray(r.normal(size=(K, T)), jnp.float32) for _ in range(3)),
    jnp.asarray(r.uniform(size=(K,)), jnp.float32), jnp.ones((K,), jnp.float32),
    jnp.asarray(r.uniform(size=(K,)), jnp.float32),
    jnp.asarray(r.normal(size=(T, 3 * B)), jnp.float32),
    jnp.asarray(r.uniform(size=(B,)), jnp.float32),
    jnp.asarray(0.01 * r.normal(size=(K // 2, B)), jnp.float32),
    jnp.asarray(r.uniform(size=(B,), low=-1, high=1), jnp.float32),
    jnp.asarray(r.uniform(size=(B,), low=-1, high=1), jnp.float32),
    jnp.asarray(r.uniform(size=(B,), low=0.1, high=0.3), jnp.float32),
    jnp.asarray(opp), 30.0, 0.005, 2)
print("PALLAS_OK", float(jnp.sum(out4) + jnp.sum(hit4)), flush=True)
""",
    "mega": """
import numpy as np
raw = np.zeros((K, 5 * T), np.float32)
raw[:, 0:T] = r.uniform(0.01, 28.0, (K, T))
raw[:, T:2*T] = r.uniform(0, 1, (K, T)); raw[:, 2*T:3*T] = r.uniform(0, 1, (K, T))
raw[:, 3*T:5*T] = r.normal(0, 1, (K, 2 * T))
fmat = r.normal(size=(T, T)).astype(np.float32)
out5, hit5 = pallas_scan.mega_edge_ttc(
    jnp.asarray(raw),
    jnp.asarray(r.uniform(-0.1, 0.1, K), jnp.float32),
    jnp.asarray(r.uniform(-0.1, 0.1, K), jnp.float32),
    jnp.asarray(r.uniform(size=(K,)), jnp.float32),
    jnp.asarray(r.integers(0, T, K), jnp.float32),
    jnp.ones((K,), jnp.float32),
    jnp.asarray(r.uniform(-3, 6, K), jnp.float32),
    jnp.asarray(fmat), jnp.asarray(np.roll(fmat, -T // 2, axis=1)),
    jnp.asarray(np.roll(np.eye(T, dtype=np.float32), -1, axis=1)),
    jnp.asarray(r.normal(size=(T, 3 * B)), jnp.float32),
    jnp.asarray(r.uniform(size=(B,)), jnp.float32),
    jnp.asarray(0.01 * r.normal(size=(K // 2, B)), jnp.float32),
    jnp.asarray(r.uniform(size=(B,), low=-1, high=1), jnp.float32),
    jnp.asarray(r.uniform(size=(B,), low=0.1, high=0.3), jnp.float32),
    30.0, 0.005, 2, T)
print("PALLAS_OK", float(jnp.sum(out5) + jnp.sum(hit5)), flush=True)
""",
    # mega + rotation-addressed resident noise pool (noise_mode="pool_rot"):
    # exercises the SMEM offset scalar + the dynamic sublane slice of the
    # VMEM-resident pool — new Mosaic surface, probed before dispatch
    "mega_rot": """
import numpy as np
raw = np.zeros((K, 5 * T), np.float32)
raw[:, 0:T] = r.uniform(0.01, 28.0, (K, T))
raw[:, T:2*T] = r.uniform(0, 1, (K, T)); raw[:, 2*T:3*T] = r.uniform(0, 1, (K, T))
raw[:, 3*T:5*T] = r.normal(0, 1, (K, 2 * T))
fmat = r.normal(size=(T, T)).astype(np.float32)
ROWS = 1024
pool = jnp.asarray(0.01 * r.normal(size=(ROWS + 256, B)), jnp.bfloat16)
out6, hit6 = pallas_scan.mega_edge_ttc(
    jnp.asarray(raw),
    jnp.asarray(r.uniform(-0.1, 0.1, K), jnp.float32),
    jnp.asarray(r.uniform(-0.1, 0.1, K), jnp.float32),
    jnp.asarray(r.uniform(size=(K,)), jnp.float32),
    jnp.asarray(r.integers(0, T, K), jnp.float32),
    jnp.ones((K,), jnp.float32),
    jnp.asarray(r.uniform(-3, 6, K), jnp.float32),
    jnp.asarray(fmat), jnp.asarray(np.roll(fmat, -T // 2, axis=1)),
    jnp.asarray(np.roll(np.eye(T, dtype=np.float32), -1, axis=1)),
    jnp.asarray(r.normal(size=(T, 3 * B)), jnp.float32),
    jnp.asarray(r.uniform(size=(B,)), jnp.float32),
    jnp.asarray(r.integers(0, ROWS, (K // 2, 1)), jnp.int32),
    jnp.asarray(r.uniform(size=(B,), low=-1, high=1), jnp.float32),
    jnp.asarray(r.uniform(size=(B,), low=0.1, high=0.3), jnp.float32),
    30.0, 0.005, 2, T, pool=pool, pool_rows=ROWS)
print("PALLAS_OK", float(jnp.sum(out6) + jnp.sum(hit6)), flush=True)
""",
    "spec_ttc": """
out3, hit3 = pallas_scan.theta_spectral_ttc(
    jnp.asarray(r.normal(size=(K, T)), jnp.float32),
    jnp.asarray(r.uniform(size=(K,)), jnp.float32),
    jnp.asarray(r.uniform(size=(K,), low=-3, high=6), jnp.float32),
    jnp.asarray(r.normal(size=(T, B)), jnp.float32),
    jnp.asarray(0.01 * r.normal(size=(K // 2, B)), jnp.float32),
    jnp.asarray(r.uniform(size=(B,), low=-1, high=1), jnp.float32),
    jnp.asarray(r.uniform(size=(B,), low=0.1, high=0.3), jnp.float32),
    30.0, 0.005, 2)
print("PALLAS_OK", float(jnp.sum(out3) + jnp.sum(hit3)), flush=True)
""",
}


def _pallas_preflight(kernel: str, timeout: float) -> bool:
    """True iff the named Mosaic kernel executes on this backend, probed in
    a killable subprocess so a hang can never take the bench down with it."""
    r = _run_child(_PROBE_HEADER + _PROBES[kernel], timeout)
    return r is not None and r.returncode == 0 and "PALLAS_OK" in r.stdout


def _emit(label: str, value: float, where: str, envs: int = None,
          steps: int = None) -> dict:
    del steps  # (steps only affect timing resolution, not the metric)
    line = {
        "metric": f"env-steps/s aggregate ({N_AGENTS}-agent, 1080-beam "
                  f"lidar, {envs if envs is not None else N_ENVS} envs, "
                  f"{label}, {where})",
        "value": round(value, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(value / 3000.0, 2),
    }
    print(json.dumps(line), flush=True)
    return line


def main():
    global _DEADLINE
    budget = float(os.environ.get("BENCH_BUDGET", 480))
    preflight_t = float(os.environ.get("BENCH_PREFLIGHT_TIMEOUT", 60))

    # Provisional line FIRST: if the relay wedges a child past every timeout
    # or the driver kills us early, the recorded line is this honest one
    # rather than nothing (BENCH_r03 was rc=124 with empty output).
    _emit("PROVISIONAL — bench started, no measurement completed yet; "
          "if this is the recorded line the process was killed before any "
          "mode finished (last hardware numbers, 2026-08-19: default 3.80M,"
          " ultra+pool 6.07M — docs/performance.md round-4 table)",
          0.0, "n/a")

    # Warm the texture cache BEFORE starting the measurement clock: a cold
    # cache otherwise times out every mode (and killing a TPU child
    # mid-build can wedge the relay).  One-time per machine; instant when
    # already cached.
    _warm_textures(list(dict.fromkeys(MODES)),
                   float(os.environ.get("BENCH_WARM_BUDGET", 1200)))
    _DEADLINE = time.time() + budget

    backend = _device_preflight(min(preflight_t, _remaining()))
    if backend is None and os.environ.get("RGT_PLATFORM") == "cpu":
        _emit("UNMEASURED: CPU backend failed the tiny-op preflight "
              "(broken install?)", 0.0, "n/a")
        return
    if backend is None:
        # dead relay: one labeled CPU measurement beats a 0.0 line — the
        # reference's "30x realtime" claim is a CPU number, so vs_baseline
        # stays a fair ratio.  Small shapes so it lands inside the budget.
        cpu_envs = int(os.environ.get("BENCH_ENVS_CPU", 512))
        r = _run_child(
            [os.path.abspath(__file__), "--measure", "default"],
            min(240.0, _remaining()),
            extra_env=dict(RGT_PLATFORM="cpu",
                           BENCH_ENVS=str(cpu_envs), BENCH_STEPS="20"))
        if r is not None:
            sys.stderr.write(r.stderr[-2000:])
        rate = _parse_rate(r)
        if rate is not None:
            _emit(_MODE_LABELS["default"] + " — CPU FALLBACK, TPU relay "
                  "unreachable; last hardware numbers (2026-08-19): default "
                  "3.80M, ultra+pool 6.07M (docs/performance.md round-4 "
                  "table)", rate, "1 CPU host", envs=cpu_envs)
            return
        _emit("UNMEASURED: device backend unreachable — tiny-op preflight "
              "hung/failed and the CPU fallback did not finish in budget; "
              "last hardware numbers (2026-08-19): default 3.80M, ultra+pool "
              "6.07M (docs/performance.md round-4 table)",
              0.0, "n/a")
        return

    where = "1 chip" if backend == "tpu" else f"1 {backend} host"
    edge_modes = {"default", "t256", "bilinear", "pool", "fresh"}
    fused_modes = {"fused", "fusedpool", "fusedopp"}
    # scan_backend="auto" resolves from the cached on-chip capability probe
    # (config.py); the bench additionally re-probes here in a killable
    # subprocess so a regressed Mosaic toolchain can never hang the bench —
    # each mode gets the Pallas path iff ITS kernel's probe passes,
    # measuring the best configuration that provably runs.
    on_tpu = backend == "tpu"
    # probe every Mosaic kernel the edge-family modes could dispatch; each
    # mode is then PINNED to exactly what its probes proved (pallas
    # backend, ttc fusion, opp fusion), so the measured configuration is
    # the best one that provably runs and the label states it — never the
    # resolution of a possibly-stale capability record
    any_edge = any(m in (edge_modes | fused_modes) for m in MODES)
    edge_ok = (on_tpu and any_edge
               and _pallas_preflight("edge", min(preflight_t * 2,
                                                 _remaining())))
    fused_ok = (edge_ok
                and _pallas_preflight("edge_ttc", min(preflight_t * 2,
                                                      _remaining())))
    opp_ok = (fused_ok and N_AGENTS >= 2
              and _pallas_preflight("edge_ttc_opp", min(preflight_t * 2,
                                                        _remaining())))
    mega_ok = (fused_ok
               and _pallas_preflight("mega", min(preflight_t * 2,
                                                 _remaining())))

    # Measure the default mode FIRST (the number the round owes), emit it,
    # then the other modes, then re-emit the default line LAST so it is the
    # recorded one.  "ultrafused" runs at the very END: its spectral+iTTC
    # kernel is the one dispatch that has wedged the relay, so every other
    # number must already be on stdout before we probe or measure it.
    modes = list(dict.fromkeys(MODES))
    if "default" in modes:
        modes.remove("default")
        modes.insert(0, "default")
    if "ultrafused" in modes:
        modes.remove("ultrafused")
        modes.append("ultrafused")
    default_line = None
    for mode in modes:
        if _remaining() < 30:
            print(f"WARNING: budget exhausted, skipping {mode}",
                  file=sys.stderr, flush=True)
            continue
        label = _MODE_LABELS[mode]
        extra = {}
        if mode in edge_modes and edge_ok:
            extra["BENCH_FORCE_BACKEND"] = "pallas"
            extra["RGT_FUSE_TTC"] = "on" if fused_ok else "off"
            # the opp stage is capability-guarded to OFF everywhere: both
            # opp-fused kernels measured SLOWER than their unfused
            # baselines (docs/performance.md round-5) — never pin it on
            extra["RGT_FUSE_OPP"] = "off"
            extra["RGT_MEGA_OPP"] = "off"
            extra["RGT_MEGA"] = "on" if mega_ok else "off"
            label += " [pallas"
            label += "+mega" if mega_ok else ("+ttc" if fused_ok else "")
            label += " fused]" if (fused_ok or mega_ok) else " epilogue]"
        elif mode in edge_modes and on_tpu and any_edge:
            # probe failed: pin XLA so a stale capability record can't
            # steer "auto" into the very dispatch the probe just rejected
            extra["BENCH_FORCE_BACKEND"] = "xla"
        elif mode in fused_modes and on_tpu and not fused_ok:
            extra["BENCH_FORCE_BACKEND"] = "xla"
            label += " [UNFUSED xla fallback: pallas unavailable]"
        elif mode == "fusedopp" and on_tpu and not opp_ok:
            extra["BENCH_FORCE_BACKEND"] = "xla"
            label += " [UNFUSED xla fallback: opp kernel probe failed]"
        elif mode in fused_modes and on_tpu:
            # ONLY fusedopp claims the opponent-fused kernel; pinning it
            # for fused/fusedpool measured the slower opp variant under a
            # noise+iTTC-only label (review round 5)
            extra["RGT_FUSE_OPP"] = \
                "on" if (mode == "fusedopp" and opp_ok) else "off"
            # these modes claim the edge_ttc kernels specifically; a mega
            # capability record must not silently upgrade them
            extra["RGT_MEGA"] = "off"
        elif mode == "ultrafused" and on_tpu:
            if default_line is not None and len(modes) > 1:
                print(json.dumps(default_line), flush=True)  # bank it first
            if not _pallas_preflight("spec_ttc",
                                     min(preflight_t * 2, _remaining())):
                extra["BENCH_FORCE_BACKEND"] = "xla"
                label += " [UNFUSED xla fallback: spec_ttc probe failed]"
        r = _run_child([os.path.abspath(__file__), "--measure", mode],
                       _remaining(), extra_env=extra)
        if r is not None:
            sys.stderr.write(r.stderr[-2000:])
        rate = _parse_rate(r)
        if rate is None:
            print(f"WARNING: mode {mode} failed/timed out "
                  f"(rc={'timeout' if r is None else r.returncode})",
                  file=sys.stderr, flush=True)
            continue
        line = _emit(label, rate, where)
        if mode == "default":
            default_line = line
    if default_line is not None and modes[-1] != "default" and len(modes) > 1:
        print(json.dumps(default_line), flush=True)


def _parse_rate(r):
    if r is None or r.returncode != 0:
        return None
    for line in r.stdout.splitlines():
        if line.startswith("RATE "):
            return float(line.split()[1])
    return None


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--measure":
        sys.exit(_child_measure(sys.argv[2]))
    main()
