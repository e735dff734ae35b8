"""Exchange-plan microbench: argsort-based (round 2/3a) vs sort-free
prefix-count (current ``plan_exchange``) grouping + response un-permute.

The exchange plan runs once per sampling layer AND once per feature fetch on
the partitioned-store path (``dist_topology.sample_layer_partitioned``,
``exchange.partitioned_gather``).  The round-3a design paid, per call,

- a stable argsort of the full request vector (2.45M int32 at bench shapes),
- a gather of ids into sorted order,
- and on the response side an inverse-permutation SCATTER of full rows
  (F=128 f32 -> ~1.3 GB scattered per feature exchange).

The sort-free plan computes each request's rank inside its owner segment as
P unrolled cumsums (owner = id % P, a tiny static key space) and addresses
response slots in REQUEST order, so the response comes back with a gather.

Usage: python evaluation/microbench/exchange_bench.py [--small]
Appends to exchange_bench.tsv.  No collectives are timed (this isolates the
per-chip plan/unpermute machinery; the all_to_all wires are P=1-degenerate
on this one-chip environment anyway).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--n", type=int, default=2_449_152)
    ap.add_argument("--parts", nargs="+", type=int, default=[4, 8, 16])
    ap.add_argument("--feat", type=int, default=128)
    args = ap.parse_args()

    import jax

    if args.small:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from run import timeit  # evaluation/microbench/run.py helpers
    from xgnn_tpu.constants import EMPTY_KEY
    from xgnn_tpu.parallel.exchange import plan_exchange

    n = 30_000 if args.small else args.n
    f = 16 if args.small else args.feat
    rng = np.random.default_rng(0)
    ids_np = rng.integers(0, 50_000_000, n).astype(np.int32)
    ids_np[rng.random(n) < 0.2] = EMPTY_KEY  # realistic padding tail
    ids = jnp.asarray(ids_np)

    def old_plan(ids, num_parts, seg_cap):
        """The round-2/3a argsort-based plan, kept inline for comparison."""
        cap = ids.shape[0]
        valid = ids != EMPTY_KEY
        owner = jnp.where(valid, ids % num_parts, num_parts)
        perm = jnp.argsort(owner, stable=True)
        owner_sorted = owner[perm]
        ids_sorted = ids[perm]
        counts = jnp.zeros(num_parts + 1, jnp.int32).at[owner].add(1)
        start = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1]]
        )
        rank = jnp.arange(cap, dtype=jnp.int32) - start[owner_sorted]
        send = (
            jnp.full((num_parts, seg_cap), EMPTY_KEY, ids.dtype)
            .at[
                jnp.where(owner_sorted < num_parts, owner_sorted, num_parts),
                rank,
            ]
            .set(ids_sorted, mode="drop")
        )
        return send, perm, owner_sorted, rank

    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "exchange_bench.tsv"
    )
    header = not os.path.exists(out)
    mode = "cpu" if args.small else "tpu"
    with open(out, "a") as fh:
        if header:
            fh.write(
                "# mode\tn\tP\tF\told_plan_ms\tnew_plan_ms\t"
                "old_unperm_ms\tnew_unperm_ms\n"
            )
        for p in args.parts:
            seg = max(int(np.ceil(n / p * 1.25)), 128)

            @jax.jit
            def run_old(ids):
                send, perm, owner_s, rank = old_plan(ids, p, seg)
                return send, perm, owner_s, rank

            @jax.jit
            def run_new(ids):
                return plan_exchange(ids, p, seg)

            t_old = timeit(run_old, ids, iters=10) * 1e3
            t_new = timeit(run_new, ids, iters=10) * 1e3

            # response un-permute: rows picked out of the (P, seg, F) resp
            resp = jnp.ones((p, seg, f), jnp.float32)
            send, perm, owner_s, rank = jax.jit(
                lambda i: old_plan(i, p, seg)
            )(ids)
            _, owner, rank_new, _ = run_new(ids)

            @jax.jit
            def unperm_old(resp, perm, owner_s, rank):
                so = jnp.minimum(owner_s, p - 1)
                sr = jnp.clip(rank, 0, seg - 1)
                picked = resp[so, sr]
                picked = picked * (owner_s < p)[:, None].astype(picked.dtype)
                return jnp.zeros_like(picked).at[perm].set(picked)

            @jax.jit
            def unperm_new(resp, owner, rank):
                so = jnp.minimum(owner, p - 1)
                sr = jnp.clip(rank, 0, seg - 1)
                out = resp[so, sr]
                ok = (owner < p) & (rank < seg)
                return out * ok[:, None].astype(out.dtype)

            @jax.jit
            def unperm_linear(resp, owner, rank):
                # explicit 1-D linearization of the (owner, rank) pick
                so = jnp.minimum(owner, p - 1)
                sr = jnp.clip(rank, 0, seg - 1)
                out = jnp.take(
                    resp.reshape(p * seg, -1), so * seg + sr, axis=0
                )
                ok = (owner < p) & (rank < seg)
                return out * ok[:, None].astype(out.dtype)

            @jax.jit
            def plan_linear(ids):
                # prefix-count rank + 1-D linearized send scatter
                valid = ids != EMPTY_KEY
                owner = jnp.where(valid, ids % p, p).astype(jnp.int32)
                rank = jnp.zeros(ids.shape[0], jnp.int32)
                for k in range(p):
                    m = owner == k
                    rank = rank + jnp.where(m, jnp.cumsum(m) - 1, 0)
                tgt = jnp.where(
                    (owner < p) & (rank < seg), owner * seg + rank,
                    p * seg,
                )
                send = (
                    jnp.full(p * seg, EMPTY_KEY, ids.dtype)
                    .at[tgt]
                    .set(ids, mode="drop")
                )
                return send.reshape(p, seg), owner, rank

            t_uold = timeit(unperm_old, resp, perm, owner_s, rank,
                            iters=10) * 1e3
            t_unew = timeit(unperm_new, resp, owner, rank_new, iters=10) * 1e3
            t_ulin = timeit(unperm_linear, resp, owner, rank_new,
                            iters=10) * 1e3
            t_plin = timeit(plan_linear, ids, iters=10) * 1e3
            fh.write(
                f"{mode}\t{n}\t{p}\t{f}\t{t_old:.2f}\t{t_new:.2f}\t"
                f"{t_uold:.2f}\t{t_unew:.2f}\t{t_ulin:.2f}\t{t_plin:.2f}\n"
            )
            print(
                f"test_result:exchange:P={p}:plan_ms={t_old:.2f}->{t_new:.2f}"
                f"(lin {t_plin:.2f}):unperm_ms={t_uold:.2f}->{t_unew:.2f}"
                f"(lin {t_ulin:.2f})"
            )

        # miss-split compaction: stable bool argsort (round 2/3a) vs the
        # unpayloaded int32 key sort (ops.unique.compact_mask_positions)
        from xgnn_tpu.ops.unique import compact_mask_positions

        mask = jnp.asarray(rng.random(n) < 0.2)

        @jax.jit
        def compact_old(mask):
            return jnp.argsort(~mask, stable=True)[: n // 2]

        @jax.jit
        def compact_new(mask):
            return compact_mask_positions(mask, n // 2)

        t_co = timeit(compact_old, mask, iters=10) * 1e3
        t_cn = timeit(compact_new, mask, iters=10) * 1e3
        with open(out, "a") as fh:
            fh.write(
                f"# compaction {mode} n={n}: argsort {t_co:.2f} ms, "
                f"keysort {t_cn:.2f} ms\n"
            )
        print(f"test_result:compact:argsort_ms={t_co:.2f}:keysort_ms={t_cn:.2f}")
    print(f"# appended to {out}")


if __name__ == "__main__":
    main()
