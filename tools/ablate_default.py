"""One-off ablation: where does the edge-mode step time go on chip?

Reuses bench.measure on config variants between 'ultra' (5.1M) and the
round-3 default (1.7M) to attribute the gap:
  off+grad/linear  — 3-tap linear tail, single-channel DFT (no e/w rows)
  snap+grad/linear — same + the runtime snap select
  edge default     — 3-row DFT stack + parallax + ramp render
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


VARIANTS = {
    "ultra(spectral+grad)": dict(scan_interp="spectral"),
    "linear/occl-off+grad": dict(rt_occlusion="off"),
    "linear/snap+grad": dict(rt_occlusion="snap"),
    "default(edge+grad)": {},
    # r3 session-3 levers (the pallas edge epilogue is explicit opt-in
    # until verified on chip; "auto" == xla)
    "edge/pallas": dict(scan_backend="pallas"),
    "edge/xla-fallback": dict(scan_backend="xla"),
    "edge/fused-ttc": dict(fuse_scan_ttc="on", scan_backend="pallas"),
    "edge/fused-ttc+pool": dict(fuse_scan_ttc="on", scan_backend="pallas",
                                noise_mode="pool"),
    "edge/nonoise": dict(scan_noise_std=0.0),
    "ultra/pool": dict(scan_interp="spectral", rt_grad=False,
                       rt_occlusion="off", noise_mode="pool"),
    "ultra/fused-ttc": dict(scan_interp="spectral", rt_grad=False,
                            rt_occlusion="off", fuse_scan_ttc="on",
                            scan_backend="pallas"),
}


def main():
    names = sys.argv[1:] or list(VARIANTS)
    for name in names:
        cfg = dataclasses.replace(bench.make_cfg("default"), **VARIANTS[name])
        rate = bench.measure(cfg)
        print(json.dumps({"variant": name, "env_steps_s": round(rate, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
