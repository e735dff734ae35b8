"""Analytic ICI-scaling projection for the collocated GGMS step.

Only one physical chip exists in this environment, so hardware scaling
cannot be measured (the cpu_mesh rows in results.tsv validate the SPMD
program, not bandwidth).  This model projects multi-chip scaling the way
the scaling-book does: per-chip compute time is measured (bench step on the
real chip), per-chip exchange volume is READ OFF THE PROGRAM — every
all-to-all in `parallel/collocated.py` has a static padded shape — and
exchange time = volume / ICI bandwidth.

Key structural property: with interleaved sharding and per-partition
segment caps `seg_cap = ceil(cap/P) * 2`, the padded bytes a chip sends and
receives per step are ~CONSTANT in P (P segments of size cap*2/P).  So the
projected efficiency is flat beyond the 1→2 chip drop; the torus provides
more aggregate ICI exactly as fast as the all-to-all demands it.

Per step per chip (use_dist_graph + part_cache, batch B per chip):
  topology, layer l:  ids out  2*cap_l*4 B;  neighbors back 2*cap_l*K_l*4 B
  features:           ids out  2*cap_L*4 B;  rows back      2*cap_L*F*fb B
(the 2x is the exchange headroom factor; useful traffic is further scaled
by the remote fraction (P-1)/P)

Usage: python evaluation/scaling/model.py  →  writes projection.tsv
"""

import argparse
import os

# bench-measured inputs (1x v5e-lite, see BASELINE.md / PERF.md)
BENCH_CAPS = (8000, 133376, 1007360, 2449152)
BENCH_FANOUTS = (15, 10, 5)
FEAT_BYTES = 4 * 128  # f32, 128-wide
T_COMPUTE_MS = 163.0  # bench-anchored: 6.25e6 edges / 38.36M edges/s (the
# round-5 corrected-khop3 single-store headline: the Fisher-Yates kernel
# produces min(K, deg) distinct picks with no dedup sort — more edges AND
# a faster step than the round-4 khop2+dedup mistake)
# per-chip exchange MACHINERY (constant-ish in P, measured at P=1 where the
# wires are free): request planning + response picks (sort-free plan +
# linearized/tiled compositions), the owner-side draw/gather over
# seg-clamped request matrices, and the last-layer dedup sort the
# single-store path avoids via direct extraction.  Round-5 value is the
# P=1 bench delta: 6.25e6/23.25M = 268.8 ms dist-graph step vs 163.0
# single-store — ~106 ms, unchanged from round 4 (the khop fix sped both
# paths by the same kernel)
T_MACHINERY_MS = 105.8
T_HOST_MS = 25.0      # per-step host dispatch (tunnel artifact; ~0 locally)
EDGES_PER_STEP = 6.25e6


def exchange_bytes(caps, fanouts, feat_bytes, headroom=2.0):
    """Per-chip padded bytes moved through all-to-all per step (send+recv
    counted once each; returns (topology_bytes, feature_bytes))."""
    topo = 0.0
    for cap, k in zip(caps[:-1], fanouts):
        topo += headroom * cap * 4            # request ids out
        topo += headroom * cap * k * 4        # neighbor lists back
    feat = headroom * caps[-1] * 4            # feature-request ids
    feat += headroom * caps[-1] * feat_bytes  # feature rows back
    return topo, feat


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ici-gbps", nargs="+", type=float,
                    default=[45.0, 100.0, 180.0],
                    help="effective per-chip all-to-all bandwidth (GB/s); "
                         "v5e 2D torus ~100, v5p 3D torus ~180, "
                         "DCN-limited cross-pod ~45")
    ap.add_argument("--workers", nargs="+", type=int,
                    default=[1, 2, 4, 8, 16, 64])
    args = ap.parse_args()

    # headroom 1.25 = the shipped default (config.exchange_headroom),
    # justified by MEASURED per-peer occupancy: interleaved placement
    # balances to max/mean <= 1.08 at small counts, <= 1.003 at bench
    # shapes (measured_traffic.tsv, real sampled frontiers on the chip);
    # the 2.0 rows preserve the round-2 projection for comparison
    topo_b, feat_b = exchange_bytes(
        BENCH_CAPS, BENCH_FANOUTS, FEAT_BYTES, headroom=1.25
    )
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "projection.tsv")
    with open(out, "w") as f:
        f.write(
            "# Projected scaling of the collocated GGMS step (bench config: "
            "khop3 (15,10,5) batch 8000/chip, f32 128-wide features)\n"
            f"# per-chip per-step exchange: topology {topo_b/1e6:.1f} MB, "
            f"features {feat_b/1e6:.1f} MB (padded at the measured-validated "
            "1.25x headroom, constant in P; measured useful bytes 1041 MB "
            "and per-peer imbalance <= 1.08 — measured_traffic.tsv)\n"
            f"# compute {T_COMPUTE_MS:.0f} ms/step/chip + exchange machinery "
            f"{T_MACHINERY_MS:.0f} ms/step/chip (both measured: the "
            "machinery is the P=1 dist-graph bench delta, constant in P); "
            "efficiency = throughput(P) / (P * throughput_partitioned(1)); "
            "sharding_tax = throughput_partitioned(1) / "
            "throughput_single_store(1)\n"
            "ici_gbps\tworkers\tt_exchange_ms\tt_step_ms\t"
            "edges_per_sec_per_chip\tefficiency_serial\tefficiency_overlap\t"
            "vs_single_store\n"
        )
        t_base = T_COMPUTE_MS + T_MACHINERY_MS
        for w_gbps in args.ici_gbps:
            for p in args.workers:
                if p == 1:
                    t_x = 0.0
                else:
                    remote = (p - 1) / p
                    t_x = (topo_b + feat_b) * remote / (w_gbps * 1e9) * 1e3
                # serial: exchange fully exposed; overlap: exchange hidden
                # behind compute up to max()
                t_serial = t_base + t_x
                t_overlap = max(t_base, t_x)
                eps = EDGES_PER_STEP / (t_serial * 1e-3)
                f.write(
                    f"{w_gbps:.0f}\t{p}\t{t_x:.1f}\t{t_serial:.1f}\t"
                    f"{eps/1e6:.2f}M\t"
                    f"{t_base / t_serial:.3f}\t"
                    f"{t_base / t_overlap:.3f}\t"
                    f"{T_COMPUTE_MS / t_serial:.3f}\n"
                )
    print(f"# wrote {out}")
    with open(out) as f:
        print(f.read())


if __name__ == "__main__":
    main()
