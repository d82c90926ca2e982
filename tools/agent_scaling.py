"""Agent-axis scaling study (VERDICT r4 item 5).

The reference Simulator supports arbitrary num_agents via a serial Python
loop (reference gym/f110_gym/envs/base_classes.py:445-490).  Here the agent
axis is a vectorized array dimension; above A=4 the opponent ray cast and
the pairwise SAT switch to batched (A, A) masked formulations so the traced
program stays O(1) in agent count (ops/agent_scan.py::ray_cast_all_opponents,
ops/collision.py::pairwise_hits_from_poses).  This tool measures what that
costs on chip: env-step rate, per-ROW rate (rows = envs * agents — the
honest work unit), and compile time, at a constant total row count.

Usage:  python tools/agent_scaling.py [--rows 32768] [--agents 2 4 8 16]
Writes docs/media/agent_scaling.csv and prints one JSON line per config.
"""

import argparse
import csv
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def run_one(agents: int, envs: int, timeout: float):
    env = dict(os.environ, BENCH_AGENTS=str(agents), BENCH_ENVS=str(envs))
    p = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py"), "--measure",
         "default"],
        capture_output=True, text=True, timeout=timeout, env=env)
    rate = compile_s = None
    for line in p.stdout.splitlines():
        if line.startswith("RATE "):
            rate = float(line.split()[1])
        elif line.startswith("COMPILE_S "):
            compile_s = float(line.split()[1])
    if rate is None:
        sys.stderr.write(p.stderr[-2000:] + "\n")
    return rate, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=32768,
                    help="constant total rows = envs * agents")
    ap.add_argument("--agents", type=int, nargs="+", default=[2, 4, 8, 16])
    ap.add_argument("--timeout", type=float, default=900)
    ap.add_argument("--csv", default=os.path.join(
        ROOT, "docs", "media", "agent_scaling.csv"))
    args = ap.parse_args()

    rows_out = []
    for a in args.agents:
        envs = max(1, args.rows // a)
        rate, compile_s = run_one(a, envs, args.timeout)
        rec = {"agents": a, "envs": envs, "rows": envs * a,
               "env_steps_s": None if rate is None else round(rate, 1),
               "row_steps_s": None if rate is None else round(rate * a, 1),
               "compile_s": compile_s}
        rows_out.append(rec)
        print(json.dumps(rec), flush=True)

    ok = [r for r in rows_out if r["env_steps_s"] is not None]
    if ok:
        with open(args.csv, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows_out[0]))
            w.writeheader()
            w.writerows(ok)
        print(f"wrote {args.csv}")


if __name__ == "__main__":
    main()
