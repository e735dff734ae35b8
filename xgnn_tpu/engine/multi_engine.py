"""Multi-chip collocated engine (the arch6/XGNN execution mode, end to end).

Drives :func:`xgnn_tpu.parallel.collocated.make_collocated_train_step` over a
named mesh: every chip samples, fetches features from the partitioned store,
and trains, with gradient psum — the whole per-step pipeline is ONE compiled
SPMD program.  The host loop only shuffles seeds and feeds per-chip shards
(reference: one fork()ed process per GPU + shm barriers,
``example/samgraph/sgnn/train_gcn.py:359-389``; here one process, one mesh).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from .. import profiler as P
from ..config import RunConfig
from ..models import build_model
from ..parallel.collocated import (
    make_collocated_train_step,
    put_replicated,
    put_sharded,
)
from ..parallel.dist_topology import partition_csr_host
from ..parallel.exchange import shard_interleaved
from ..parallel.mesh import make_mesh
from ..sampler import Sampler, default_capacities
from ..train import init_state
from ..types import Graph
from .shuffler import Shuffler


class MultiChipEngine:
    """Data-parallel + partitioned-store training over all local chips."""

    def __init__(self, dataset, config: RunConfig, devices=None):
        self.ds = dataset
        self.config = config
        self.devices = devices or jax.devices()[: config.num_worker]
        assert len(self.devices) == config.num_worker, (
            f"need {config.num_worker} chips, have {len(self.devices)}"
        )
        self.mesh = make_mesh(devices=self.devices)
        self.profiler = P.Profiler(profile_level=config.profile_level)
        self.num_parts = config.num_worker

    def init(self):
        cfg = self.config
        p = self.num_parts
        t0 = time.perf_counter()

        indptr = np.asarray(self.ds.indptr)
        indices = np.asarray(
            self.ds.graph.indices
            if getattr(self.ds, "graph", None) is not None
            else self.ds.indices
        )
        from ..ops.tiled import pad_tile

        graph = Graph(
            indptr=jnp.asarray(pad_tile(indptr)),
            indices=jnp.asarray(pad_tile(indices)),
            n_node=int(len(indptr) - 1),
            n_edge=int(len(indices)),
        )

        caps = cfg.frontier_capacities or default_capacities(
            cfg.batch_size, cfg.fanout, self.ds.num_node
        )
        self.capacities = [int(c) for c in caps]
        seg_cap = max(-(-self.capacities[-1] // p) * 2, 128)

        # stores: partitioned features + labels (the part-cache analog);
        # topology either replicated or partitioned (use_dist_graph)
        self.feat_parts = put_sharded(
            shard_interleaved(np.asarray(self.ds.feat), p), self.mesh
        )
        self.lab_parts = put_sharded(
            shard_interleaved(
                np.asarray(self.ds.label).astype(np.int32), p
            ),
            self.mesh,
        )
        if cfg.use_dist_graph:
            li, lx = partition_csr_host(indptr, indices, p)
            self.topo = (
                put_sharded(li, self.mesh),
                put_sharded(lx, self.mesh),
            )
        else:
            self.topo = put_replicated(graph, self.mesh)
        self.profiler.log_init("store_build_time", time.perf_counter() - t0)

        t0 = time.perf_counter()
        self.model = build_model(cfg, self.ds.feat_dim, self.ds.num_class)
        sampler = Sampler(graph, cfg, self.capacities)
        seeds0 = np.full(self.capacities[0], C.EMPTY_KEY, C.ID_DTYPE)
        take = min(len(self.ds.train_set), cfg.batch_size)
        seeds0[:take] = np.asarray(self.ds.train_set[:take])
        b0 = sampler.sample(jnp.asarray(seeds0), take, jax.random.key(0))
        x0 = jnp.zeros((self.capacities[-1], self.ds.feat_dim), jnp.float32)
        self.state = put_replicated(
            init_state(self.model, cfg, b0.blocks, x0, jax.random.key(cfg.seed)),
            self.mesh,
        )
        self.step_fn = make_collocated_train_step(
            self.model, cfg, self.mesh, self.capacities, seg_cap,
            use_dist_graph=cfg.use_dist_graph,
        )
        self.profiler.log_init("model_init_time", time.perf_counter() - t0)
        return self

    def train_epoch(self, epoch: int) -> dict:
        cfg = self.config
        p = self.num_parts
        shufflers = [
            Shuffler(
                np.asarray(self.ds.train_set), cfg.batch_size,
                num_worker=p, worker_id=w, seed=cfg.seed + 1,
            )
            for w in range(p)
        ]
        iters = [s.epoch_batches(epoch) for s in shufflers]
        # run the MAX local steps; workers with a short/empty shard feed
        # empty (num_valid=0) batches — the reference's global-vs-local step
        # accounting (DistShuffler::NumStep), without silently dropping steps
        num_steps = max(s.num_local_step for s in shufflers)
        base_key = jax.random.fold_in(jax.random.key(cfg.seed ^ 0xD1), epoch)

        losses, accs, overflows = [], [], []
        t_epoch = time.perf_counter()
        t_prev = t_epoch
        for step in range(num_steps):
            seeds = np.full((p, self.capacities[0]), C.EMPTY_KEY, C.ID_DTYPE)
            nums = np.zeros((p,), np.int32)
            for w, it in enumerate(iters):
                s, n = next(it, (None, 0))
                if s is not None:
                    seeds[w, : len(s)] = s
                nums[w] = n
            step_key = jax.random.fold_in(base_key, step)
            keys = jax.random.key_data(jax.random.split(step_key, p))
            dkeys = jax.random.key_data(
                jax.random.split(jax.random.fold_in(step_key, 1 << 20), p)
            )
            self.state, metrics = self.step_fn(
                self.state,
                self.topo,
                self.feat_parts,
                self.lab_parts,
                put_sharded(seeds, self.mesh),
                put_sharded(nums, self.mesh),
                put_sharded(keys, self.mesh),
                put_sharded(dkeys, self.mesh),
            )
            losses.append(metrics["loss"])
            accs.append(metrics["acc"])
            overflows.append(metrics["exchange_overflow"])
            now = time.perf_counter()
            # the whole sample+extract+train pipeline is one fused SPMD
            # program here; its wall time is logged as train time
            self.profiler.log_step(epoch, step, P.L1_TRAIN_TIME, now - t_prev)
            t_prev = now
        stats = np.asarray(
            jnp.stack([jnp.stack(losses), jnp.stack(accs),
                       jnp.stack(overflows).astype(jnp.float32)])
        )
        dt = time.perf_counter() - t_epoch
        self.profiler.log_epoch_add(epoch, "epoch_time", dt)
        n_over = int(stats[2].sum())
        if n_over:
            print(f"warning: {n_over} steps hit exchange/frontier capacity")
        return {
            "epoch": epoch,
            "loss": float(np.nanmean(stats[0])),
            "train_acc": float(np.nanmean(stats[1])),
            "time": dt,
            "steps": num_steps,
        }

    def run(self) -> dict:
        self.init()
        results = [self.train_epoch(e) for e in range(self.config.num_epoch)]
        extra = {"final_train_acc": results[-1]["train_acc"] if results else 0.0}
        out = self.profiler.test_results(extra=extra)
        return {"epochs": results, "test_results": out}
