"""Measured exchange-traffic validation of the scaling projection.

The projection (``model.py``) reads exchange volume off the program's
static padded shapes.  This script validates those terms against REAL
sampled frontiers at bench shapes: it runs the khop frontier loop on the
actual bench graph, owner-counts every layer's request ids on device
(``bincount(ids % P)``) for several partition counts, and reports

- per-layer frontier occupancy vs the padded capacity (``n_l / cap_l``),
- per-peer load imbalance (max-peer / mean-peer) of the interleaved
  ``id % P`` placement,
- the minimal overflow-free per-peer segment size vs the shipped
  ``seg_cap = ceil(cap/P * headroom)`` rule (config.exchange_headroom),
- useful vs shipped bytes per step (and therefore how much of the
  projection's traffic term is padding).

Writes ``measured_traffic.tsv`` next to this file.  Run on the real chip
(bench shapes) or ``--small`` for a CPU smoke run.

Reference axis: Fig 13 scalability (``evaluation/figure13/run.sh``) — the
reference measures scaling on hardware; with one chip here, the projection
+ this measured-traffic validation is the honest substitute.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

BENCH = dict(num_node=2_449_029, num_edge=62_000_000, batch=8000,
             fanouts=(15, 10, 5), feat_bytes=4 * 128)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parts", nargs="+", type=int, default=[2, 4, 8, 16])
    ap.add_argument("--batches", type=int, default=5)
    ap.add_argument("--headroom", type=float, default=1.25,
                    help="seg_cap headroom to evaluate shipped bytes at "
                         "(config.exchange_headroom; round 2 shipped 2.0)")
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()

    import jax

    if args.small:
        jax.config.update("jax_platforms", "cpu")
        BENCH.update(num_node=30_000, num_edge=300_000, batch=500)

    import jax.numpy as jnp
    import numpy as np

    from xgnn_tpu.config import SampleType
    from xgnn_tpu.constants import EMPTY_KEY
    from xgnn_tpu.engine.shuffler import Shuffler
    from xgnn_tpu.ops import unique
    from xgnn_tpu.sampler import _sample_layer, default_capacities
    from xgnn_tpu.synthetic_device import make_device_dataset

    t0 = time.time()
    ds = make_device_dataset(
        BENCH["num_node"], BENCH["num_edge"], 16, 8,
        train_frac=0.08, seed=0, name="traffic_synth", dedup=False,
    )
    graph = ds.graph
    print(f"# graph on device in {time.time()-t0:.0f}s: {ds.num_node} nodes "
          f"{ds.num_edge} edges", file=sys.stderr)

    fanouts = BENCH["fanouts"]
    caps = default_capacities(BENCH["batch"], fanouts, ds.num_node)
    max_p = max(args.parts)

    def one_batch(graph, seeds, num_seed, key):
        """The khop3 frontier loop, emitting per-layer owner counts
        (mirrors sampler._sample_minibatch — re-run here because the
        engine path doesn't retain intermediate frontier ids).  ``graph``
        is an ARGUMENT (closing over it would embed the whole CSR in the
        serialized computation — the remote compiler rejects >100MB
        payloads)."""
        frontier = seeds
        num_frontier = num_seed
        per_layer = []  # (count_matrix (len(parts), max_p), n) per layer
        for layer, fanout in enumerate(fanouts):
            valid = (jnp.arange(frontier.shape[0]) < num_frontier) & (
                frontier != EMPTY_KEY
            )
            counts = []
            for p in args.parts:
                owner = jnp.where(valid, frontier % p, max_p)
                c = jnp.bincount(owner, length=max_p + 1)[:max_p]
                counts.append(c)
            per_layer.append((jnp.stack(counts), jnp.sum(valid)))
            key, k_layer = jax.random.split(key)
            nbr, _ = _sample_layer(
                graph, frontier, fanout, k_layer, SampleType.KHOP3,
                (0, 0, 0.0),
            )
            ids = jnp.concatenate([frontier, nbr.reshape(-1)])
            out_cap = caps[layer + 1]
            uids, num_unique, _ = unique.unique_seeded(
                ids, num_frontier, frontier.shape[0], out_cap
            )
            frontier = uids
            num_frontier = jnp.minimum(num_unique, out_cap)
        # final feature-request exchange
        valid = (jnp.arange(frontier.shape[0]) < num_frontier) & (
            frontier != EMPTY_KEY
        )
        counts = []
        for p in args.parts:
            owner = jnp.where(valid, frontier % p, max_p)
            counts.append(jnp.bincount(owner, length=max_p + 1)[:max_p])
        per_layer.append((jnp.stack(counts), jnp.sum(valid)))
        return per_layer

    fn = jax.jit(one_batch)
    shuffler = Shuffler(ds.train_set, BENCH["batch"], seed=7)
    rows_acc = None
    for i, (seeds_np, n) in enumerate(shuffler.epoch_batches(0)):
        if i >= args.batches:
            break
        seeds = np.full(caps[0], EMPTY_KEY, np.int32)
        seeds[: len(seeds_np)] = seeds_np
        out = fn(
            graph, jnp.asarray(seeds), jnp.int32(n),
            jax.random.fold_in(jax.random.key(11), i),
        )
        host = [(np.asarray(c), int(nv)) for c, nv in out]
        rows_acc = (
            host if rows_acc is None
            else [
                (np.maximum(a[0], b[0]), max(a[1], b[1]))
                for a, b in zip(rows_acc, host)
            ]
        )
        print(f"# batch {i}: layer sizes "
              f"{[nv for _, nv in host]}", file=sys.stderr)

    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "measured_traffic.tsv"
    )
    fb = BENCH["feat_bytes"]
    with open(out_path, "w") as f:
        f.write(
            "# layer\tP\tn_ids(max over batches)\tcap\toccupancy"
            "\tmax_peer\tmean_peer\timbalance\tmin_seg_cap"
            "\tshipped_seg_cap\tuseful_MB\tshipped_MB\n"
        )
        for layer, (counts, n) in enumerate(rows_acc):
            cap = caps[min(layer, len(caps) - 1)]
            is_feat = layer == len(rows_acc) - 1
            k = 1 if is_feat else fanouts[layer]
            # bytes per id position: request id out (4B) + response back
            # (K neighbor ids, or one feature row)
            resp = fb if is_feat else 4 * k
            for pi, p in enumerate(args.parts):
                c = counts[pi][:p].astype(np.int64)
                mx, mean = int(c.max()), float(n) / p
                ship_seg = max(int(np.ceil(cap / p * args.headroom)), 128)
                useful = n * (4 + resp) / 1e6
                shipped = p * ship_seg * (4 + resp) / 1e6
                f.write(
                    f"{'feat' if is_feat else layer}\t{p}\t{n}\t{cap}\t"
                    f"{n/cap:.3f}\t{mx}\t{mean:.0f}\t"
                    f"{mx/max(mean,1):.3f}\t{mx}\t{ship_seg}\t"
                    f"{useful:.2f}\t{shipped:.2f}\n"
                )
    print(f"# wrote {out_path}")
    # one-line summary vs the projection's static terms
    from model import exchange_bytes  # noqa: E402 (same dir)

    topo_mb, feat_mb = (
        b / 1e6
        for b in exchange_bytes(caps, fanouts, fb, headroom=args.headroom)
    )
    useful_total = sum(
        n * (4 + (fb if i == len(rows_acc) - 1 else 4 * fanouts[i])) / 1e6
        for i, (_, n) in enumerate(rows_acc)
    )
    print(
        f"test_result:traffic:model_shipped_mb={topo_mb + feat_mb:.1f}"
    )
    print(f"test_result:traffic:measured_useful_mb={useful_total:.1f}")
    print(
        "test_result:traffic:padding_factor="
        f"{(topo_mb + feat_mb) / max(useful_total, 1e-9):.3f}"
    )


if __name__ == "__main__":
    main()
