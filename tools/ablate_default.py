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
    "edge/fused-opp": dict(fuse_scan_ttc="on", scan_backend="pallas",
                           fuse_scan_opp="on"),
    "edge/mega": dict(scan_megakernel="on", scan_backend="pallas",
                      fuse_scan_ttc="on"),
    "edge/mega+poolrot": dict(scan_megakernel="on", scan_backend="pallas",
                              fuse_scan_ttc="on", noise_mode="pool_rot"),
    "edge/mega-opp": dict(scan_megakernel="on", scan_backend="pallas",
                          fuse_scan_ttc="on", fuse_scan_opp="on"),
    "edge/fused-opp+pool": dict(fuse_scan_ttc="on", scan_backend="pallas",
                                fuse_scan_opp="on", noise_mode="pool"),
    "edge/nonoise": dict(scan_noise_std=0.0),
    "ultra/pool": dict(scan_interp="spectral", rt_grad=False,
                       rt_occlusion="off", noise_mode="pool"),
    "ultra/fused-ttc": dict(scan_interp="spectral", rt_grad=False,
                            rt_occlusion="off", fuse_scan_ttc="on",
                            scan_backend="pallas"),
}


def main():
    args = [a for a in sys.argv[1:] if a != "--record"]
    record = "--record" in sys.argv[1:]
    names = args or list(VARIANTS)
    rates = {}
    for name in names:
        print(json.dumps({"measuring": name}), flush=True)
        cfg = dataclasses.replace(bench.make_cfg("default"), **VARIANTS[name])
        rates[name] = rate = bench.measure(cfg)
        print(json.dumps({"variant": name, "env_steps_s": round(rate, 1)}),
              flush=True)

    if record:
        # Persist the end-to-end A/B verdicts that scan_backend="auto" /
        # fuse_scan_ttc="auto" resolve from (utils/capability.py).  Needs
        # the explicit backend variants so the comparison is not polluted
        # by a pre-existing record steering "auto".
        from red_gym_tpu.utils import capability

        upd = {}
        if "edge/pallas" in rates and "edge/xla-fallback" in rates:
            upd["edge_faster"] = rates["edge/pallas"] > rates["edge/xla-fallback"]
            upd["rate_edge_pallas"] = round(rates["edge/pallas"], 1)
            upd["rate_edge_xla"] = round(rates["edge/xla-fallback"], 1)
        if "edge/fused-ttc" in rates and "edge/pallas" in rates:
            upd["fused_faster"] = rates["edge/fused-ttc"] > rates["edge/pallas"]
            upd["rate_edge_fused"] = round(rates["edge/fused-ttc"], 1)
        if "edge/mega-opp" in rates and "edge/mega" in rates:
            upd["mega_opp_faster"] = (rates["edge/mega-opp"]
                                      > rates["edge/mega"])
            upd["mega_opp_ok"] = True   # it just executed end-to-end
            upd["rate_edge_mega_opp"] = round(rates["edge/mega-opp"], 1)
        if "edge/mega" in rates and "edge/fused-ttc" in rates:
            upd["mega_faster"] = rates["edge/mega"] > rates["edge/fused-ttc"]
            upd["rate_edge_mega"] = round(rates["edge/mega"], 1)
        if "edge/fused-opp" in rates and "edge/fused-ttc" in rates:
            upd["opp_faster"] = (rates["edge/fused-opp"]
                                 > rates["edge/fused-ttc"])
            upd["rate_edge_fused_opp"] = round(rates["edge/fused-opp"], 1)
        if upd:
            path = capability.write_record(upd)
            print(json.dumps({"recorded": upd, "path": path}), flush=True)
        else:
            print("--record: need edge/xla-fallback + edge/pallas "
                  "(+ edge/fused-ttc) among the variants", file=sys.stderr)


if __name__ == "__main__":
    main()
