"""Analytic FLOP/byte accounting of the default fast-scan env step.

The XLA cost analysis is unusable through the relayed TPU backend (it
reports the program body without the lax.scan trip count), so the MFU /
roofline table in docs/performance.md is computed HERE from the known
pipeline shapes, with the measured phase times from tools/roofline.py
alongside.  Peaks: TPU v5e, one chip — 197 TFLOP/s bf16 matmul (f32
matmuls at DEFAULT precision round through bf16 passes), 819 GB/s HBM.

Usage: python tools/analytic_roofline.py [--envs 16384] [--agents 2]
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=16384)
    ap.add_argument("--agents", type=int, default=2)
    ap.add_argument("--beams", type=int, default=1080)
    ap.add_argument("--tbins", type=int, default=128)
    ap.add_argument("--channels", type=int, default=5)
    ap.add_argument("--peak-tflops", type=float, default=197.0)
    ap.add_argument("--peak-gbs", type=float, default=819.0)
    # measured phase times (ms/step) from tools/roofline.py at the default
    # 16k-env config; override after remeasuring
    ap.add_argument("--ms-kernel", type=float, default=0.811)
    ap.add_argument("--ms-chain", type=float, default=1.70)
    ap.add_argument("--ms-opp", type=float, default=0.383)
    ap.add_argument("--ms-noise", type=float, default=0.206)
    ap.add_argument("--ms-base", type=float, default=0.868)
    args = ap.parse_args()

    E, A, B, T, C = (args.envs, args.agents, args.beams, args.tbins,
                     args.channels)
    rows = E * A
    f32, bf16 = 4, 2

    stages = []

    def stage(name, flops, hbm_bytes, ms):
        stages.append((name, flops, hbm_bytes, ms))

    # 1. texture-row gather (nearest1): one (C*T) bf16 row per agent-row,
    #    + the correction/blend elementwise (~40 ops per (row, T) element)
    gather_bytes = rows * C * T * bf16
    corr_flops = rows * T * 40
    # blended (rows, 3, T) f32 written, read by the fmat matmul; spec_r
    # (rows, 3, T) written by the twiddle fusion, read by the kernel
    inter_bytes = 4 * rows * 3 * T * f32
    stage("pre-kernel chain (gather+corrections+DFT roll)",
          corr_flops + 2 * rows * 3 * T * T,   # + fmat matmul MACs*2
          gather_bytes + inter_bytes, args.ms_chain)

    # 2. fused Pallas epilogue: 3 f32-class + 4 bf16 (T, B) matmuls per
    #    row + ~30-op ramp/noise/iTTC tail; reads spec_r/e/w + noise,
    #    writes the scan + hit partials
    kernel_flops = rows * (7 * 2 * T * B + 30 * B)
    kernel_bytes = (rows * 3 * T * f32            # spec rows in
                    + E * B * f32                 # noise slab in
                    + rows * B * f32              # scan out
                    + 24 * rows * f32)            # hit partials
    stage("fused epilogue kernel (render+noise+iTTC)",
          kernel_flops, kernel_bytes, args.ms_kernel)

    # 3. separate XLA opponent pass (pre-fusion): read + write scan,
    #    ~25 ops/beam/opponent
    stage("opponent ray cast (XLA pass, pre-fusion)",
          rows * (A - 1) * 25 * B, 2 * rows * B * f32, args.ms_opp)

    # 4. pool-noise materialization: gather (E, B) rows, written + read
    stage("pool-noise slab (materialize+consume)",
          0, 2 * E * B * f32, args.ms_noise)

    # 5. non-lidar base: dynamics RK4 (~300 flops/agent/stage*4) + SAT +
    #    lap logic + state pytree round trip (~30 f32 words/agent-row)
    stage("non-lidar base (dynamics+SAT+lap+state)",
          rows * 1400, 2 * rows * 30 * f32, args.ms_base)

    total_ms = sum(s[3] for s in stages)
    print(f"{args.envs} envs x {A} agents, {B} beams, T={T}, C={C} "
          f"-> {rows} rows; measured step {total_ms:.3f} ms "
          f"({args.envs / total_ms * 1e3 / 1e6:.2f}M env-steps/s)")
    print(f"{'stage':52s} {'GFLOP':>7s} {'MB':>7s} {'ms':>6s} "
          f"{'%MXU':>6s} {'%HBM':>6s} {'bound':>9s}")
    tot_f = tot_b = 0.0
    for name, fl, by, ms in stages:
        tot_f += fl
        tot_b += by
        pct_mxu = fl / (ms * 1e-3) / (args.peak_tflops * 1e12) * 100
        pct_hbm = by / (ms * 1e-3) / (args.peak_gbs * 1e9) * 100
        bound = ("MXU" if pct_mxu > 2 * pct_hbm
                 else "HBM" if pct_hbm > 2 * pct_mxu else "latency/VPU")
        print(f"{name:52s} {fl/1e9:7.2f} {by/1e6:7.1f} {ms:6.3f} "
              f"{pct_mxu:6.1f} {pct_hbm:6.1f} {bound:>9s}")
    pct_mxu = tot_f / (total_ms * 1e-3) / (args.peak_tflops * 1e12) * 100
    pct_hbm = tot_b / (total_ms * 1e-3) / (args.peak_gbs * 1e9) * 100
    print(f"{'TOTAL':52s} {tot_f/1e9:7.2f} {tot_b/1e6:7.1f} "
          f"{total_ms:6.3f} {pct_mxu:6.1f} {pct_hbm:6.1f}")
    print("\nReading: no single phase is near either peak — the step is "
          "bound by\nkernel count / launch+pipeline latency and VPU "
          "elementwise work, not by\nMXU or HBM.  The perf levers are "
          "therefore FEWER PASSES (fusing the\nopponent cast and noise "
          "into the epilogue kernel), not faster math.")


if __name__ == "__main__":
    main()
