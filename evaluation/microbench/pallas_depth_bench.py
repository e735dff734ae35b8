"""In-flight-depth sweep for the Pallas per-row DMA gather.

Round 2 measured `ops/pallas_gather.gather_rows_pallas` at ~31 GB/s with 16
row-DMAs in flight per grid step and recorded it as a negative vs XLA's
native gather (48-62 GB/s).  VERDICT r3 item 2 asks whether a *deeper*
multi-row pipeline changes the verdict: descriptor issue is the suspected
bound, and issue cost amortizes with depth.  This sweeps rows_per_step and
prints GB/s per depth — the datapoint that either justifies a fused
Pallas SpMM (gather+reduce in one pass) or closes the question with a
measured floor argument.

Usage: python evaluation/microbench/pallas_depth_bench.py [--rows N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def _sync(x):
    # block_until_ready returns early through the axon tunnel; a tiny D2H
    # pull forces completion (evaluation/microbench/run.py convention)
    np.asarray(jax.device_get(x.ravel()[:1]))


def main():
    from xgnn_tpu.ops.pallas_gather import gather_rows_pallas

    # default divisible by every swept depth (2^21) so no depth trips the
    # rows_per_step divisibility assert
    n_rows = int(sys.argv[sys.argv.index("--rows") + 1]) if "--rows" in sys.argv else 2_097_152
    table_rows = 2_449_152
    f = 128
    feat = jnp.asarray(
        np.random.default_rng(0).standard_normal((table_rows, f), np.float32)
    )
    ids = jnp.asarray(
        np.random.default_rng(1).integers(0, table_rows, n_rows, np.int32)
    )
    bytes_moved = n_rows * f * 4

    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "pallas_depth_bench.tsv"
    )
    rows = ["depth\tms\tGBps"]
    # XLA control
    ctl = jax.jit(lambda t, i: jnp.take(t, i, axis=0, mode="clip"))
    _sync(ctl(feat, ids))
    t0 = time.perf_counter(); _sync(ctl(feat, ids)); t_ctl = time.perf_counter() - t0
    rows.append(f"xla_take\t{t_ctl*1e3:.1f}\t{bytes_moved/t_ctl/1e9:.1f}")
    print(rows[-1])

    for depth in (16, 32, 64, 128, 256, 512):
        try:
            fn = lambda: gather_rows_pallas(feat, ids, rows_per_step=depth)
            _sync(fn())
            t0 = time.perf_counter(); _sync(fn()); dt = time.perf_counter() - t0
            rows.append(f"{depth}\t{dt*1e3:.1f}\t{bytes_moved/dt/1e9:.1f}")
        except Exception as e:  # depth too deep for sems/VMEM: record it
            rows.append(f"{depth}\tfail\t{type(e).__name__}")
        print(rows[-1])

    with open(out_path, "w") as fh:
        fh.write("\n".join(rows) + "\n")
    print(f"# wrote {out_path}")


if __name__ == "__main__":
    main()
