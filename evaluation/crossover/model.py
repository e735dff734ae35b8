"""GGMS crossover, model half (reference figure10 claim at P chips).

The measured half (``run.py``) pins the P=1 terms on the real chip; this
model extends the comparison to P chips where the partitioned store's
thesis lives: a REPLICATED cache is capped at one chip's leftover HBM,
while the partitioned store aggregates P×(B − topo/P) of cache and P× the
topology residency — host traffic falls with P for XGNN and stays flat for
SGNN.  Terms:

- ``CDF(c)`` — measured presample access CDF (``cdf.tsv``, written by
  run.py from the real sampler);
- ``T_comp`` — measured single-store step time (bench, real chip);
- ``T_mach`` — measured P=1 dist-graph machinery delta (bench, real chip);
- exchange bytes — read off the program shapes (evaluation/scaling/model.py)
  at the validated 1.25× headroom, over ICI bandwidth;
- host path — bytes/step over a host-link bandwidth parameter (the tunnel
  H2D here is ~14 MB/s garbage; directly-attached hosts move GB/s, so the
  table sweeps {2, 4.6, 10} GB/s — 4.6 is this host's probe-measured
  memcpy rate, 2 ≈ random 512 B rows over PCIe zero-copy, the reference's
  GPUExtract regime).

SGNN(P): per chip, full topology + replicated cache of (B − topo) bytes.
XGNN(P): topology sharded (topo/P per chip) + partitioned cache of
(B − topo/P) bytes per chip, aggregate fraction min(1, P·(B−topo/P)/F).

Output: crossover.tsv — for each (feat_gb/budget ratio, P): hit rates,
host MB/step, step times, and the XGNN/SGNN throughput ratio.  The
crossover row (ratio crossing 1.0) is the figure10 demonstration.

Usage: python evaluation/crossover/model.py [--t-comp MS --t-mach MS ...]
"""

import argparse
import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def load_cdf():
    path = os.path.join(HERE, "cdf.tsv")
    xs, ys = [], []
    with open(path) as f:
        for line in f:
            if line.startswith("#"):
                continue
            a, b = line.split()
            xs.append(float(a))
            ys.append(float(b))
    return np.asarray(xs), np.asarray(ys)


def main():
    ap = argparse.ArgumentParser()
    # bench-anchored measured terms (1× v5e-lite, round-5; both arms run
    # their FULL two-phase pipelines at cache 0.9999 so the host path is
    # ~idle and the step time IS compute+machinery: single-store two-phase
    # 24.55M → 255 ms/step, dist-graph two-phase 20.25M → 309 ms/step
    # (tpu_r5c.log).  Both include ~25 ms of tunnel host-dispatch that a
    # directly-attached host does not pay — it cancels in the comparison.
    ap.add_argument("--t-sgnn", type=float, default=255.0,
                    help="SGNN-arm base step ms (two-phase single-store "
                         "at hit≈1, measured)")
    ap.add_argument("--t-xgnn", type=float, default=309.0,
                    help="XGNN-arm base step ms (two-phase dist-graph "
                         "at hit≈1, P=1, measured)")
    ap.add_argument("--rows-per-step", type=float, default=1.0e6,
                    help="distinct feature rows requested per step "
                         "(bench last-layer frontier)")
    ap.add_argument("--row-bytes", type=int, default=512)
    ap.add_argument("--edges-per-step", type=float, default=6.25e6)
    ap.add_argument("--ici-gbps", type=float, default=100.0)
    # host-path bandwidth sweep: 4.6 GB/s is THIS host's measured memcpy
    # rate (xgnn-convert probe-bandwidth); 2 GB/s ≈ random 512 B rows over
    # PCIe zero-copy (the reference's GPUExtract regime); 10 GB/s ≈ a
    # staged DMA pipeline on a modern host link
    ap.add_argument("--host-gbps", nargs="+", type=float,
                    default=[2.0, 4.6, 10.0])
    ap.add_argument("--budget-gb", type=float, default=4.0,
                    help="per-chip HBM budget for graph stores")
    ap.add_argument("--topo-frac", type=float, default=0.35,
                    help="full topology bytes / budget (papers100M: ~6.5 GB"
                         " topo vs 16 GB V100)")
    ap.add_argument("--feat-ratios", nargs="+", type=float,
                    default=[1.5, 3.0, 6.0, 12.0],
                    help="feature-store bytes / per-chip budget")
    ap.add_argument("--workers", nargs="+", type=int, default=[1, 2, 4, 8])
    args = ap.parse_args()

    xs, ys = load_cdf()
    hit = lambda c: float(np.interp(min(max(c, 0.0), 1.0), xs, ys))

    # per-chip exchange bytes (constant in P; evaluation/scaling/model.py)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "scaling_model",
        os.path.join(os.path.dirname(HERE), "scaling", "model.py"),
    )
    sm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sm)
    topo_x, feat_x = sm.exchange_bytes(
        sm.BENCH_CAPS, sm.BENCH_FANOUTS, sm.FEAT_BYTES, headroom=1.25
    )

    B = args.budget_gb
    T = args.topo_frac * B
    out = os.path.join(HERE, "crossover.tsv")
    with open(out, "w") as f:
        f.write(
            "# GGMS crossover model (measured terms: T_sgnn "
            f"{args.t_sgnn:.0f} ms, T_xgnn {args.t_xgnn:.0f} ms — both "
            "two-phase at hit≈1; presample CDF from run.py; exchange bytes "
            f"at validated 1.25x headroom over {args.ici_gbps:.0f} GB/s "
            "ICI)\n"
            f"# budget {B:.1f} GB/chip, topology {T:.2f} GB full\n"
            "# sgnn = full topo + replicated cache; xgnn = sharded topo + "
            "partitioned cache; ratio > 1 means the partitioned store WINS\n"
            "host_gbps\tfeat_over_budget\tP\thit_sgnn\thit_xgnn\t"
            "host_mb_sgnn\thost_mb_xgnn\tt_sgnn_ms\tt_xgnn_ms\t"
            "xgnn_over_sgnn\n"
        )
        for hg in args.host_gbps:
            for r in args.feat_ratios:
                F = r * B
                for p in args.workers:
                    c_rep = max(B - T, 0.0) / F
                    h_s = hit(c_rep)
                    mb_s = (1 - h_s) * args.rows_per_step * args.row_bytes
                    t_s = args.t_sgnn + mb_s / (hg * 1e9) * 1e3
                    c_agg = p * max(B - T / p, 0.0) / F
                    h_x = hit(c_agg)
                    mb_x = (1 - h_x) * args.rows_per_step * args.row_bytes
                    remote = (p - 1) / p
                    t_ici = (
                        (topo_x + feat_x) * remote / (args.ici_gbps * 1e9)
                        * 1e3
                    )
                    t_x = args.t_xgnn + t_ici + mb_x / (hg * 1e9) * 1e3
                    f.write(
                        f"{hg:.0f}\t{r:.1f}\t{p}\t{h_s:.4f}\t{h_x:.4f}\t"
                        f"{mb_s/1e6:.1f}\t{mb_x/1e6:.1f}\t{t_s:.1f}\t"
                        f"{t_x:.1f}\t{t_s/t_x:.3f}\n"
                    )
    print(f"# wrote {out}")
    with open(out) as f:
        print(f.read())


if __name__ == "__main__":
    main()
