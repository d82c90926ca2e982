"""Staged TPU-relay probe: plain XLA -> tiny Mosaic kernel -> edge kernel.

The axon-relayed chip can wedge on a hung device call, taking the whole
relay down with it; before benching a new Pallas kernel, establish in
ORDER (each stage in a fresh subprocess under its own timeout) that:

  1. a plain XLA op executes            (relay alive at all)
  2. a trivial Pallas kernel executes   (Mosaic compile+run through relay)
  3. the fused edge epilogue executes on a micro shape
  4. the fused edge+iTTC epilogue executes
  5. one full default-mode env step executes at a small batch
     -> "EDGE STAGES PASS" (everything the default/fused modes dispatch)
  6. LAST, because it is the one stage that has actually wedged the relay
     (round 4, 2026-08-19: the spec-ttc dispatch hung the backend for
     ~20 min while edge-ttc passed clean): the fused spectral+iTTC kernel
     -> "ALL STAGES PASS"

Usage: python tools/probe_pallas.py [stage ...] — prints one PASS/FAIL
line per stage and stops at the first failure (so a hang never cascades).
Default runs every stage in the order above.
"""

import os
import subprocess
import sys

# the parent needs the repo importable too (for the capability record
# writes); children get it via the PYTHONPATH prepend in main()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGES = {
    "xla": """
from red_gym_tpu.utils import platform as _p; _p.apply()
import jax, jax.numpy as jnp
print("PASS xla", jax.default_backend(),
      float(jnp.sum(jnp.ones((8, 8)))), flush=True)
""",
    "pallas-tiny": """
from red_gym_tpu.utils import platform as _p; _p.apply()
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
def k(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2.0
x = jnp.ones((8, 128), jnp.float32)
y = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
                   in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                   out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                   interpret=jax.default_backend() != "tpu")(x)
print("PASS pallas-tiny", float(jnp.sum(y)), flush=True)
""",
    "pallas-edge": """
from red_gym_tpu.utils import platform as _p; _p.apply()
import numpy as np
import jax, jax.numpy as jnp
from red_gym_tpu.ops import pallas_scan
rng = np.random.default_rng(0)
K, T, B = 512, 128, 1080
out = pallas_scan.theta_shuffle_blend_edge(
    jnp.asarray(rng.normal(size=(K, T)), jnp.float32),
    jnp.asarray(rng.normal(size=(K, T)), jnp.float32),
    jnp.asarray(rng.normal(size=(K, T)), jnp.float32),
    jnp.asarray(rng.uniform(size=(K,)), jnp.float32),
    jnp.ones((K,), jnp.float32),
    jnp.asarray(rng.normal(size=(T, 3 * B)), jnp.float32),
    jnp.asarray(rng.uniform(size=(B,)), jnp.float32), 30.0)
print("PASS pallas-edge", float(jnp.sum(out)), out.shape, flush=True)
""",
    "pallas-edge-ttc": """
from red_gym_tpu.utils import platform as _p; _p.apply()
import numpy as np
import jax, jax.numpy as jnp
from red_gym_tpu.ops import pallas_scan
rng = np.random.default_rng(0)
K, T, B, A = 512, 128, 1080, 2
out, hit = pallas_scan.theta_shuffle_blend_edge_ttc(
    jnp.asarray(rng.normal(size=(K, T)), jnp.float32),
    jnp.asarray(rng.normal(size=(K, T)), jnp.float32),
    jnp.asarray(rng.normal(size=(K, T)), jnp.float32),
    jnp.asarray(rng.uniform(size=(K,)), jnp.float32),
    jnp.ones((K,), jnp.float32),
    jnp.asarray(rng.uniform(size=(K,), low=-3, high=6), jnp.float32),
    jnp.asarray(rng.normal(size=(T, 3 * B)), jnp.float32),
    jnp.asarray(rng.uniform(size=(B,)), jnp.float32),
    jnp.asarray(0.01 * rng.normal(size=(K // A, B)), jnp.float32),
    jnp.asarray(rng.uniform(size=(B,), low=-1, high=1), jnp.float32),
    jnp.asarray(rng.uniform(size=(B,), low=0.1, high=0.3), jnp.float32),
    30.0, 0.005, A)
print("PASS pallas-edge-ttc", float(jnp.sum(out)), float(jnp.sum(hit)),
      flush=True)
""",
    "env-step-default": """
from red_gym_tpu.utils import platform as _p; _p.apply()
import numpy as np
import jax, jax.numpy as jnp
from scipy.ndimage import distance_transform_edt
from red_gym_tpu.config import Integrator, SimConfig
from red_gym_tpu import env as envlib
from red_gym_tpu.maps.loader import TrackMap
cfg = SimConfig(num_agents=2, num_beams=1080, timestep=0.01,
                integrator=Integrator.RK4, dtype="float32", scan_mode="fast")
# tiny synthetic map: this stage proves the full default-mode step EXECUTES
# on chip; a cold example-map texture build is ~13 min of device marching,
# which read as a relay hang here (round 4) and whose timeout-kill can
# wedge the relay itself.  Map size is irrelevant to what is being probed.
n = 64; occ = np.full((n, n), 255.0)
occ[0, :] = occ[-1, :] = occ[:, 0] = occ[:, -1] = 0.0
res = 0.25
z = lambda v: jnp.asarray(v, jnp.float32)
tmap = TrackMap(dt=z(distance_transform_edt(occ) * res), occupancy=z(occ),
                orig_x=z(-8.0), orig_y=z(-8.0), orig_c=z(1.0), orig_s=z(0.0),
                resolution=z(res), height=jnp.asarray(n, jnp.int32),
                width=jnp.asarray(n, jnp.int32))
params = envlib.make_params(cfg, None, tmap=tmap)
poses = jnp.tile(jnp.asarray([[0.7, 0.0, 1.37], [0.7, -1.0, 1.37]],
                             jnp.float32), (256, 1, 1))
states = jax.jit(jax.vmap(lambda p, k: envlib.init_state(cfg, p, k)))(
    poses, jax.random.split(jax.random.PRNGKey(0), 256))
act = jnp.tile(jnp.asarray([[0.05, 3.0], [-0.05, 2.0]], jnp.float32),
               (256, 1, 1))
step = jax.jit(jax.vmap(lambda s, a: envlib.step(cfg, params, s, a)))
s, obs, *_ = step(states, act)
print("PASS env-step-default", float(jnp.sum(obs.scans)), flush=True)
""",
    "pallas-edge-ttc-opp": """
from red_gym_tpu.utils import platform as _p; _p.apply()
import numpy as np
import jax, jax.numpy as jnp
from red_gym_tpu.ops import pallas_scan
rng = np.random.default_rng(0)
K, T, B, A = 512, 128, 1080, 2
opp = np.zeros((K, 10), np.float32)
opp[:, 0] = 100; opp[:, 1] = 700; opp[:, 2] = 1.0; opp[:, 5] = 1.0
opp[:, 6] = -5.0; opp[:, 8] = 1.0; opp[:, 9] = 1.0
out, hit = pallas_scan.theta_shuffle_blend_edge_ttc_opp(
    jnp.asarray(rng.normal(size=(K, T)), jnp.float32),
    jnp.asarray(rng.normal(size=(K, T)), jnp.float32),
    jnp.asarray(rng.normal(size=(K, T)), jnp.float32),
    jnp.asarray(rng.uniform(size=(K,)), jnp.float32),
    jnp.ones((K,), jnp.float32),
    jnp.asarray(rng.uniform(size=(K,), low=-3, high=6), jnp.float32),
    jnp.asarray(rng.normal(size=(T, 3 * B)), jnp.float32),
    jnp.asarray(rng.uniform(size=(B,)), jnp.float32),
    jnp.asarray(0.01 * rng.normal(size=(K // A, B)), jnp.float32),
    jnp.asarray(rng.uniform(size=(B,), low=-1, high=1), jnp.float32),
    jnp.asarray(rng.uniform(size=(B,), low=-1, high=1), jnp.float32),
    jnp.asarray(rng.uniform(size=(B,), low=0.1, high=0.3), jnp.float32),
    jnp.asarray(opp), 30.0, 0.005, A)
print("PASS pallas-edge-ttc-opp", float(jnp.sum(out)), float(jnp.sum(hit)),
      flush=True)
""",
    "pallas-mega": """
from red_gym_tpu.utils import platform as _p; _p.apply()
import numpy as np
import jax, jax.numpy as jnp
from red_gym_tpu.ops import pallas_scan
rng = np.random.default_rng(0)
K, T, B, A = 512, 128, 1080, 2
raw = np.zeros((K, 5 * T), np.float32)
raw[:, 0:T] = rng.uniform(0.01, 28.0, (K, T))        # ranges
raw[:, T:2*T] = rng.uniform(0, 1, (K, T))            # e
raw[:, 2*T:3*T] = rng.uniform(0, 1, (K, T))          # w
raw[:, 3*T:5*T] = rng.normal(0, 1, (K, 2 * T))       # gx gy
fmat = rng.normal(size=(T, T)).astype(np.float32)
out, hit = pallas_scan.mega_edge_ttc(
    jnp.asarray(raw),
    jnp.asarray(rng.uniform(-0.1, 0.1, K), jnp.float32),
    jnp.asarray(rng.uniform(-0.1, 0.1, K), jnp.float32),
    jnp.asarray(rng.uniform(size=(K,)), jnp.float32),
    jnp.asarray(rng.integers(0, T, K), jnp.float32),
    jnp.ones((K,), jnp.float32),
    jnp.asarray(rng.uniform(-3, 6, K), jnp.float32),
    jnp.asarray(fmat), jnp.asarray(np.roll(fmat, -T // 2, axis=1)),
    jnp.asarray(np.roll(np.eye(T, dtype=np.float32), -1, axis=1)),
    jnp.asarray(rng.normal(size=(T, 3 * B)), jnp.float32),
    jnp.asarray(rng.uniform(size=(B,)), jnp.float32),
    jnp.asarray(0.01 * rng.normal(size=(K // A, B)), jnp.float32),
    jnp.asarray(rng.uniform(size=(B,), low=-1, high=1), jnp.float32),
    jnp.asarray(rng.uniform(size=(B,), low=0.1, high=0.3), jnp.float32),
    30.0, 0.005, A, T)
print("PASS pallas-mega", float(jnp.sum(out)), float(jnp.sum(hit)),
      flush=True)
""",
    # ---- spec-ttc WEDGE BISECTION (VERDICT r4 item 2) ----------------
    # Four stages that approach the known relay-wedger from safe sides,
    # each in its own killable subprocess.  Which one first hangs/fails
    # localizes the trigger: compile vs execute, matmul vs consumer tail,
    # multi-tile grid vs single tile.
    "spec-compile-only": """
# AOT compile of the full spec+iTTC kernel WITHOUT dispatching it: Mosaic
# kernel compilation happens inside XLA compilation of the custom call, so
# a hang here = compiler bug, a pass here + execute hang = runtime wedge.
from red_gym_tpu.utils import platform as _p; _p.apply()
import numpy as np
import jax, jax.numpy as jnp
from red_gym_tpu.ops import pallas_scan
K, T, B, A = 512, 128, 1080, 2
fn = lambda s, w, v, m, n, c, d: pallas_scan.theta_spectral_ttc(
    s, w, v, m, n, c, d, 30.0, 0.005, A)
args = (jax.ShapeDtypeStruct((K, T), jnp.float32),
        jax.ShapeDtypeStruct((K,), jnp.float32),
        jax.ShapeDtypeStruct((K,), jnp.float32),
        jax.ShapeDtypeStruct((T, B), jnp.float32),
        jax.ShapeDtypeStruct((K // A, B), jnp.float32),
        jax.ShapeDtypeStruct((B,), jnp.float32),
        jax.ShapeDtypeStruct((B,), jnp.float32))
jax.jit(fn).lower(*args).compile()
print("PASS spec-compile-only", flush=True)
""",
    "spec-plain": """
# the spectral render body ALONE (matmul + mask + clip, one output) in the
# same launch geometry — no noise/iTTC tail, no second output
from red_gym_tpu.utils import platform as _p; _p.apply()
import functools
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from red_gym_tpu.ops.pallas_scan import ROW_TILE, BEAM_TILE
rng = np.random.default_rng(0)
K, T, B = 512, 128, 1080
def kern(spec_ref, wsum_ref, smat_ref, out_ref):
    s = spec_ref[:]
    out = jnp.dot(s, smat_ref[:], preferred_element_type=s.dtype)
    out = jnp.where(wsum_ref[:] > 0.0, out, 0.0)
    out_ref[:] = jnp.clip(out, 0.0, 30.0)
grid = (pl.cdiv(B, BEAM_TILE), pl.cdiv(K, ROW_TILE))
out = pl.pallas_call(
    kern, out_shape=jax.ShapeDtypeStruct((K, B), jnp.float32), grid=grid,
    in_specs=[pl.BlockSpec((ROW_TILE, T), lambda j, i: (i, 0),
                           memory_space=pltpu.VMEM),
              pl.BlockSpec((ROW_TILE, 1), lambda j, i: (i, 0),
                           memory_space=pltpu.VMEM),
              pl.BlockSpec((T, BEAM_TILE), lambda j, i: (0, j),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((ROW_TILE, BEAM_TILE), lambda j, i: (i, j),
                           memory_space=pltpu.VMEM),
    interpret=jax.default_backend() != "tpu",
)(jnp.asarray(rng.normal(size=(K, T)), jnp.float32),
  jnp.asarray(rng.uniform(size=(K, 1)), jnp.float32),
  jnp.asarray(rng.normal(size=(T, B)), jnp.float32))
print("PASS spec-plain", float(jnp.sum(out)), flush=True)
""",
    "spec-tail-only": """
# the noise+iTTC consumer tail and dual-output launch WITHOUT the matmul:
# out starts as a broadcast of the row scalar (same shapes/outputs as the
# full kernel)
from red_gym_tpu.utils import platform as _p; _p.apply()
import functools
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from red_gym_tpu.ops.pallas_scan import (ROW_TILE, BEAM_TILE,
                                         _noise_ttc_tile)
rng = np.random.default_rng(0)
K, T, B, A = 512, 128, 1080, 2
def kern(wsum_ref, vel_ref, noise_ref, cos_ref, side_ref, out_ref, hit_ref):
    out = jnp.broadcast_to(wsum_ref[:], (ROW_TILE, BEAM_TILE))
    out_ref[:], hit_ref[:] = _noise_ttc_tile(
        out, noise_ref[:], vel_ref[:], cos_ref[:], side_ref[:], A, B, 0.005,
        beam_tile=pl.program_id(0))
grid = (pl.cdiv(B, BEAM_TILE), pl.cdiv(K, ROW_TILE))
jn = pl.cdiv(B, BEAM_TILE)
beam_spec = pl.BlockSpec((1, BEAM_TILE), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM)
out, hit = pl.pallas_call(
    kern,
    out_shape=(jax.ShapeDtypeStruct((K, B), jnp.float32),
               jax.ShapeDtypeStruct((8 * jn, K), jnp.float32)),
    grid=grid,
    in_specs=[pl.BlockSpec((ROW_TILE, 1), lambda j, i: (i, 0),
                           memory_space=pltpu.VMEM),
              pl.BlockSpec((ROW_TILE, 1), lambda j, i: (i, 0),
                           memory_space=pltpu.VMEM),
              pl.BlockSpec((ROW_TILE // A, BEAM_TILE), lambda j, i: (i, j),
                           memory_space=pltpu.VMEM),
              beam_spec, beam_spec],
    out_specs=(pl.BlockSpec((ROW_TILE, BEAM_TILE), lambda j, i: (i, j),
                            memory_space=pltpu.VMEM),
               pl.BlockSpec((8, ROW_TILE), lambda j, i: (j, i),
                            memory_space=pltpu.VMEM)),
    interpret=jax.default_backend() != "tpu",
)(jnp.asarray(rng.uniform(size=(K, 1)), jnp.float32),
  jnp.asarray(rng.uniform(size=(K, 1), low=-3, high=6), jnp.float32),
  jnp.asarray(0.01 * rng.normal(size=(K // A, B)), jnp.float32),
  jnp.asarray(rng.uniform(size=(1, B), low=-1, high=1), jnp.float32),
  jnp.asarray(rng.uniform(size=(1, B), low=0.1, high=0.3), jnp.float32))
print("PASS spec-tail-only", float(jnp.sum(out)), float(jnp.sum(hit)),
      flush=True)
""",
    "spec-ttc-1tile": """
# the FULL spec+iTTC kernel on a single-tile grid (K=256, B=384): isolates
# multi-tile grid traversal from the kernel body
from red_gym_tpu.utils import platform as _p; _p.apply()
import numpy as np
import jax, jax.numpy as jnp
from red_gym_tpu.ops import pallas_scan
rng = np.random.default_rng(0)
K, T, B, A = 256, 128, 384, 2
out, hit = pallas_scan.theta_spectral_ttc(
    jnp.asarray(rng.normal(size=(K, T)), jnp.float32),
    jnp.asarray(rng.uniform(size=(K,)), jnp.float32),
    jnp.asarray(rng.uniform(size=(K,), low=-3, high=6), jnp.float32),
    jnp.asarray(rng.normal(size=(T, B)), jnp.float32),
    jnp.asarray(0.01 * rng.normal(size=(K // A, B)), jnp.float32),
    jnp.asarray(rng.uniform(size=(B,), low=-1, high=1), jnp.float32),
    jnp.asarray(rng.uniform(size=(B,), low=0.1, high=0.3), jnp.float32),
    30.0, 0.005, A)
print("PASS spec-ttc-1tile", float(jnp.sum(out)), float(jnp.sum(hit)),
      flush=True)
""",
    # LAST on purpose: the one stage observed to WEDGE the relay (round 4);
    # everything above must already be recorded before this dispatch.
    "pallas-spec-ttc": """
from red_gym_tpu.utils import platform as _p; _p.apply()
import numpy as np
import jax, jax.numpy as jnp
from red_gym_tpu.ops import pallas_scan
rng = np.random.default_rng(0)
K, T, B, A = 512, 128, 1080, 2
out, hit = pallas_scan.theta_spectral_ttc(
    jnp.asarray(rng.normal(size=(K, T)), jnp.float32),
    jnp.asarray(rng.uniform(size=(K,)), jnp.float32),
    jnp.asarray(rng.uniform(size=(K,), low=-3, high=6), jnp.float32),
    jnp.asarray(rng.normal(size=(T, B)), jnp.float32),
    jnp.asarray(0.01 * rng.normal(size=(K // A, B)), jnp.float32),
    jnp.asarray(rng.uniform(size=(B,), low=-1, high=1), jnp.float32),
    jnp.asarray(rng.uniform(size=(B,), low=0.1, high=0.3), jnp.float32),
    30.0, 0.005, A)
print("PASS pallas-spec-ttc", float(jnp.sum(out)), float(jnp.sum(hit)),
      flush=True)
""",
}

# the stages the library-default and edge-fused modes dispatch; a run that
# clears these earns "EDGE STAGES PASS" even if the spectral-fused stage
# later fails/hangs
EDGE_STAGES = ("xla", "pallas-tiny", "pallas-edge", "pallas-edge-ttc",
               "env-step-default")


def main():
    env = dict(os.environ)
    # PREPEND: the TPU plugin may live in a site dir already on PYTHONPATH
    # (axon relay); overwriting would break backend init in the child.
    env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))) + os.pathsep
        + env.get("PYTHONPATH", ""))
    # generous floors: the box can be 1 shared core, where interpreter
    # startup + jax import alone can eat minutes under load
    timeouts = {"xla": 300, "pallas-tiny": 300, "pallas-edge": 420,
                "pallas-edge-ttc": 420, "pallas-spec-ttc": 420,
                "env-step-default": 600, "pallas-edge-ttc-opp": 420,
                "pallas-mega": 420,
                "spec-compile-only": 420, "spec-plain": 420,
                "spec-tail-only": 420, "spec-ttc-1tile": 420}
    names = sys.argv[1:] or list(STAGES)
    unknown = [n for n in names if n not in STAGES]
    if unknown:
        print(f"unknown stages {unknown}; choose from {list(STAGES)}",
              file=sys.stderr)
        return 2
    # which capability-record key each stage's verdict feeds
    # (utils/capability.py; backend parsed from the xla stage's output so
    # the parent never touches the possibly-wedged device itself)
    record_keys = {"pallas-edge": "edge_ok", "pallas-edge-ttc": "edge_ttc_ok",
                   "pallas-edge-ttc-opp": "edge_ttc_opp_ok",
                   "pallas-mega": "mega_ok",
                   "pallas-spec-ttc": "spec_ttc_ok"}
    backend = None

    def record(key, ok):
        if backend is None or key is None:
            return
        from red_gym_tpu.utils import capability

        capability.write_record({key: ok}, backend=backend)

    passed, edge_announced = [], False
    for name in names:
        try:
            r = subprocess.run([sys.executable, "-c", STAGES[name]], env=env,
                               timeout=timeouts[name],
                               capture_output=True, text=True)
        except subprocess.TimeoutExpired:
            print(f"FAIL {name}: TIMEOUT after {timeouts[name]}s", flush=True)
            record(record_keys.get(name), False)
            return 1
        if r.returncode != 0 or "PASS" not in r.stdout:
            print(f"FAIL {name}: rc={r.returncode}\n{r.stderr[-800:]}",
                  flush=True)
            record(record_keys.get(name), False)
            return 1
        if name == "xla":
            backend = r.stdout.split()[2]
        print(r.stdout.strip().splitlines()[-1], flush=True)
        passed.append(name)
        record(record_keys.get(name), True)
        if not edge_announced and set(EDGE_STAGES) <= set(passed):
            # printed BEFORE the spectral stage so a wedge there cannot
            # erase the edge-path verdict
            print("EDGE STAGES PASS", flush=True)
            edge_announced = True
    if set(names) <= set(passed):
        print("ALL STAGES PASS", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
