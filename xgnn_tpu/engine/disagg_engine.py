"""Disaggregated engine: dedicated sampler chips feed data-parallel trainer
chips (reference arch5 / FGNN mode, end to end).

The reference runs ``num_sample_worker`` sampler processes and
``num_train_worker`` trainer processes connected by a shared-memory task
queue, with a per-trainer feature cache and DDP
(``dist_loops_arch5.cc:56-297``, ``dist/dist_cache_manager*``,
``example/samgraph/multi_gpu/train_gcn.py``).  Here:

- sampler chips run the sampling jit round-robin
  (``parallel.disaggregated.DisaggregatedSampler``);
- each batch ships to its trainer chip via async D2D ``device_put``; the M
  per-trainer batches are stitched into globally-sharded arrays
  (``assemble_sharded`` — the MessageTaskQueue analog, zero host staging);
- each trainer holds its own feature source (HBM-resident, or the tiered
  HBM-cache + host-RAM store when ``cache_percentage < 1`` — the
  ``DistCacheManager`` analog);
- the train step is ONE SPMD program over the trainer mesh with gradient
  psum (DDP).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from .. import profiler as P
from ..config import CachePolicy, RunConfig
from ..models import build_model
from ..parallel.disaggregated import (
    DisaggregatedSampler,
    assemble_sharded,
    make_disagg_train_step,
)
from ..parallel.collocated import pack_batch, put_replicated
from ..parallel.mesh import make_mesh
from ..store import build_ranking, presample_ranking
from ..store.feature_store import (
    HBMFeatureSource,
    LabelSource,
    TieredFeatureSource,
)
from ..train import init_state, make_eval_step
from .pipeline import Prefetcher
from .shuffler import Shuffler
from .engine import _nanmean


class DisaggregatedEngine:
    """N sampler chips → M data-parallel trainer chips."""

    def __init__(self, dataset, config: RunConfig, devices=None):
        self.ds = dataset
        self.config = config
        devices = devices or jax.devices()
        ns, nt = config.num_sample_worker, config.num_train_worker
        if len(devices) >= ns + nt:
            self.sample_devices = devices[:ns]
            self.train_devices = devices[ns : ns + nt]
        else:
            # role-degenerate mode: fewer chips than roles — sampler and
            # trainer roles share chips round-robin (the P=1 benchmark
            # shape: the full arch5 machinery runs, the D2D handoff
            # degenerates to an on-chip no-op; the reference cannot run
            # arch5 on one GPU at all)
            assert len(devices) >= 1 and nt <= len(devices), (
                f"{nt} trainers need distinct chips, have {len(devices)}"
            )
            self.sample_devices = [
                devices[i % len(devices)] for i in range(ns)
            ]
            self.train_devices = [
                devices[(ns + i) % len(devices)] for i in range(nt)
            ]
        self.train_mesh = make_mesh(devices=self.train_devices)
        self.num_trainer = config.num_train_worker
        self.profiler = P.Profiler(profile_level=config.profile_level)

    def init(self):
        cfg = self.config
        # bf16 feature STORAGE (halves cache bytes + D2D handoff bytes)
        self._feat_dt = (
            jnp.bfloat16 if cfg.feat_dtype == "bfloat16" else None
        )
        t0 = time.perf_counter()
        self.svc = DisaggregatedSampler(
            self.ds, cfg, self.sample_devices, cfg.frontier_capacities
        )
        self.profiler.log_init("sample_init_time", time.perf_counter() - t0)

        # --- per-trainer feature sources (DistCacheManager analog)
        t0 = time.perf_counter()
        tiered = 0.0 < cfg.cache_percentage < 1.0
        ranking = None
        if tiered:
            access_freq = None
            if cfg.cache_policy in (
                CachePolicy.PRE_SAMPLE,
                CachePolicy.PRE_SAMPLE_STATIC,
                CachePolicy.FAKE_OPTIMAL,
                CachePolicy.DYNAMIC,
            ):
                # presample rides sampler chip 0 (reference: worker 0
                # presamples, dist_engine.cc:453-469)
                sampler = self.svc.samplers[0]
                if cfg.cache_policy == CachePolicy.PRE_SAMPLE_STATIC:
                    if sampler.tier is None:
                        # exact all-neighbor closure (full topology on the
                        # presampling sampler chip)
                        from ..store.presample import static_exact_ranking

                        access_freq = static_exact_ranking(
                            sampler.graph, self.ds.train_set, cfg,
                            self.ds.num_node,
                        )
                    else:
                        from ..sampler import Sampler
                        from ..store.presample import static_presample_config

                        approx = Sampler(
                            sampler.graph, static_presample_config(cfg),
                            tier=sampler.tier, num_node=sampler.num_node,
                        )
                        access_freq = presample_ranking(
                            approx, self.ds.train_set, cfg, self.ds.num_node,
                        )
                else:
                    access_freq = presample_ranking(
                        sampler, self.ds.train_set, cfg, self.ds.num_node,
                    )
            ranking = build_ranking(self.ds, cfg, access_freq)
        self._ranking = ranking
        self.feature_sources = []
        self.label_sources = []
        for dev in self.train_devices:
            if tiered:
                src = TieredFeatureSource(
                    np.asarray(self.ds.feat), ranking, cfg.cache_percentage,
                    device=dev, dtype=self._feat_dt,
                )
            else:
                src = HBMFeatureSource(self.ds.feat, dev, dtype=self._feat_dt)
            self.feature_sources.append(src)
            self.label_sources.append(LabelSource(self.ds.label, dev))
        self.profiler.log_init("cache_build_time", time.perf_counter() - t0)

        t0 = time.perf_counter()
        self.model = build_model(cfg, self.ds.feat_dim, self.ds.num_class)
        seeds = np.full(self.svc.capacities[0], C.EMPTY_KEY, C.ID_DTYPE)
        take = min(len(self.ds.train_set), cfg.batch_size)
        seeds[:take] = np.asarray(self.ds.train_set[:take])
        b0 = self.svc.sample_to(
            seeds, take, jax.random.key(0), self.train_devices[0]
        )
        x0, _ = self.feature_sources[0].extract(b0.input_nodes, b0.num_input)
        self.state = put_replicated(
            init_state(self.model, cfg, b0.blocks, x0, jax.random.key(cfg.seed)),
            self.train_mesh,
        )
        self._train_step = make_disagg_train_step(
            self.model, cfg, self.train_mesh
        )
        self._eval_step = make_eval_step(self.model)
        self.profiler.log_init("train_init_time", time.perf_counter() - t0)
        return self

    # ------------------------------------------------------------- pipeline
    def _produce(self, item):
        """One global step: M per-trainer batches sampled on the sampler
        chips, shipped D2D, extracted per trainer, stitched into sharded
        mesh arrays (runs in the prefetch thread when pipelining).

        NOTE: wall times here measure host dispatch, not sampler-chip
        occupancy — per-chip time needs the trace profiler."""
        shards, keys = item
        t0 = time.perf_counter()
        trees = []
        for t, ((seeds, n), key) in enumerate(zip(shards, keys)):
            batch = self.svc.sample_to(
                seeds, n, key, self.train_devices[t]
            )
            if self.config.sanity_check:
                from ..ops import sanity

                flags = int(sanity.check_batch(batch))
                if flags:
                    raise RuntimeError(
                        f"sanity check failed: {sanity.explain(flags)}"
                    )
            x, info = self.feature_sources[t].extract(
                batch.input_nodes, batch.num_input
            )
            labels = self.label_sources[t].extract(
                batch.output_nodes, batch.num_output
            )
            tree = pack_batch(batch)
            tree["x"] = x
            tree["labels"] = labels
            trees.append(tree)
        t1 = time.perf_counter()
        stitched = assemble_sharded(trees, self.train_mesh)
        return stitched, (t1 - t0,)

    def train_epoch(self, epoch: int) -> dict:
        cfg = self.config
        m = self.num_trainer
        shufflers = [
            Shuffler(
                np.asarray(self.ds.train_set), cfg.batch_size,
                num_worker=m, worker_id=t, seed=cfg.seed + 1,
            )
            for t in range(m)
        ]
        iters = [s.epoch_batches(epoch) for s in shufflers]
        num_steps = max(s.num_local_step for s in shufflers)
        base = jax.random.fold_in(jax.random.key(cfg.seed ^ 0xA5), epoch)

        def work():
            for step in range(num_steps):
                shards, keys = [], []
                for t, it in enumerate(iters):
                    s, n = next(
                        it,
                        (
                            np.full(cfg.batch_size, C.EMPTY_KEY, C.ID_DTYPE),
                            0,
                        ),
                    )
                    shards.append((s, n))
                    keys.append(
                        jax.random.fold_in(base, step * m + t)
                    )
                yield shards, keys

        stream = (
            Prefetcher(work(), self._produce, depth=cfg.prefetch_depth)
            if cfg.pipeline
            else map(self._produce, work())
        )
        losses, accs, overs = [], [], []
        t_epoch = time.perf_counter()
        try:
            for step, (stitched, (t_dispatch,)) in enumerate(stream):
                dkeys = jax.random.key_data(
                    jax.random.split(
                        jax.random.fold_in(base, (1 << 20) + step), m
                    )
                )
                from ..parallel.collocated import put_sharded

                x = stitched.pop("x")
                labels = stitched.pop("labels")
                if cfg.dump_trace:
                    self.profiler.trace_begin(epoch, step, "train")
                self.state, metrics = self._train_step(
                    self.state, stitched, x, labels,
                    put_sharded(dkeys, self.train_mesh),
                )
                if cfg.dump_trace:
                    jax.block_until_ready(metrics["loss"])
                    self.profiler.trace_end(epoch, step, "train")
                self.profiler.log_step(
                    epoch, step, P.L1_SAMPLE_TIME, t_dispatch
                )
                self.profiler.log_epoch_add(
                    epoch, "sample_dispatch", t_dispatch
                )
                losses.append(metrics["loss"])
                accs.append(metrics["acc"])
                overs.append(metrics["exchange_overflow"])
        finally:
            if isinstance(stream, Prefetcher):
                stream.close()
        stats = (
            np.asarray(
                jnp.stack(
                    [
                        jnp.stack(losses), jnp.stack(accs),
                        jnp.stack(overs).astype(jnp.float32),
                    ]
                )
            )
            if losses
            else np.full((3, 1), np.nan)
        )
        dt = time.perf_counter() - t_epoch
        self.profiler.log_epoch_add(epoch, "epoch_time", dt)
        n_over = int(np.nansum(stats[2]))
        if n_over:
            # overflowed steps were skipped on device; grow the sampling
            # service's frontier capacities for the next epoch (the same
            # recover path as the other two engines — without it a
            # persistently-overflowing config would skip every update
            # forever)
            print(
                f"warning: {n_over} steps overflowed capacity in epoch "
                f"{epoch}; growing sampler capacities"
            )
            grown = self.svc.samplers[0].grow().capacities
            self.svc = DisaggregatedSampler(
                self.ds, cfg, self.sample_devices, grown
            )
        return {
            "epoch": epoch,
            "loss": _nanmean(stats[0]),
            "train_acc": _nanmean(stats[1]),
            "time": dt,
            "steps": num_steps,
        }

    def evaluate(self, split: str = "valid", max_batches=None) -> float:
        """Single-trainer evaluation through sampler chip 0 + trainer 0's
        feature source."""
        nodes = self.ds.valid_set if split == "valid" else self.ds.test_set
        if len(nodes) == 0:
            return float("nan")
        shuffler = Shuffler(np.asarray(nodes), self.config.batch_size, seed=0)
        # place the replicated params on trainer 0 ONCE — a per-batch
        # host round-trip of the whole model would dominate eval time
        params = jax.device_put(
            jax.tree.map(np.asarray, self.state.params),
            self.train_devices[0],
        )
        accs, weights = [], []
        for i, (seeds, n) in enumerate(shuffler.epoch_batches(0)):
            if max_batches is not None and i >= max_batches:
                break
            batch = self.svc.sample_to(
                seeds, n, jax.random.fold_in(jax.random.key(123), i),
                self.train_devices[0],
            )
            x, _ = self.feature_sources[0].extract(
                batch.input_nodes, batch.num_input
            )
            labels = self.label_sources[0].extract(
                batch.output_nodes, batch.num_output
            )
            acc = self._eval_step(
                params, batch.blocks, x, labels, batch.num_output,
            )
            accs.append(float(acc))
            weights.append(n)
        return float(np.average(accs, weights=weights)) if accs else float("nan")

    # ----------------------------------------------- balance switcher analog
    def _rebalance(self, num_sample: int, num_train: int):
        """Re-role chips between sampler and trainer pools (the
        balance_switcher analog): rebuild the sampling service, per-trainer
        stores, trainer mesh and train step; model/optimizer state carries
        over.  Called between epochs — a one-time recompile per new split
        (amortized by the persistent compile cache)."""
        cfg = self.config
        devices = list(self.sample_devices) + list(self.train_devices)
        assert num_sample + num_train <= len(devices)
        assert num_sample >= 1 and num_train >= 1
        state_host = jax.tree.map(np.asarray, self.state)
        cfg.num_sample_worker = num_sample
        cfg.num_train_worker = num_train
        self.sample_devices = devices[:num_sample]
        self.train_devices = devices[num_sample : num_sample + num_train]
        self.train_mesh = make_mesh(devices=self.train_devices)
        self.num_trainer = num_train
        self.svc = DisaggregatedSampler(
            self.ds, cfg, self.sample_devices, self.svc.capacities
        )
        srcs, labs = [], []
        for dev in self.train_devices:
            if 0.0 < cfg.cache_percentage < 1.0:
                src = TieredFeatureSource(
                    np.asarray(self.ds.feat),
                    self._ranking,
                    cfg.cache_percentage,
                    device=dev,
                    dtype=self._feat_dt,
                )
            else:
                src = HBMFeatureSource(self.ds.feat, dev, dtype=self._feat_dt)
            srcs.append(src)
            labs.append(LabelSource(self.ds.label, dev))
        self.feature_sources, self.label_sources = srcs, labs
        self.state = put_replicated(state_host, self.train_mesh)
        self._train_step = make_disagg_train_step(
            self.model, cfg, self.train_mesh
        )
        print(
            f"balance_switcher: re-roled to {num_sample} samplers + "
            f"{num_train} trainers"
        )

    def _maybe_rebalance(self, result: dict):
        """Epoch-boundary heuristic: sampling-bound → grow the sampler pool,
        train-bound → grow the trainer pool."""
        cfg = self.config
        sample_frac = (
            self.profiler._epoch_items[result["epoch"]].get("sample_dispatch", 0.0)
            / max(result["time"], 1e-9)
        )
        if sample_frac > 0.6 and cfg.num_train_worker > 1:
            self._rebalance(
                cfg.num_sample_worker + 1, cfg.num_train_worker - 1
            )
        elif sample_frac < 0.2 and cfg.num_sample_worker > 1:
            self._rebalance(
                cfg.num_sample_worker - 1, cfg.num_train_worker + 1
            )

    def run(self) -> dict:
        self.init()
        cfg = self.config
        ckpt = None
        start_epoch = 0
        if cfg.checkpoint_dir:
            from ..checkpoint import CheckpointManager

            ckpt = CheckpointManager(cfg.checkpoint_dir)
            state, extra = ckpt.restore(jax.tree.map(np.asarray, self.state))
            if state is not None:
                self.state = put_replicated(state, self.train_mesh)
                start_epoch = (extra or {}).get("epoch", -1) + 1
                print(f"resumed from checkpoint at epoch {start_epoch}")
        results = []
        for e in range(start_epoch, cfg.num_epoch):
            r = self.train_epoch(e)
            results.append(r)
            if ckpt and (e + 1) % cfg.checkpoint_every == 0:
                ckpt.save(
                    e, jax.tree.map(np.asarray, self.state),
                    extra={"epoch": e},
                )
            if cfg.balance_switcher and e + 1 < cfg.num_epoch:
                self._maybe_rebalance(r)
        if ckpt:
            ckpt.close()
        if cfg.dump_trace:
            path = "xgnn_trace.json"
            self.profiler.dump_trace(path)
            print(f"trace dumped to {path}")
        if self.config.report_acc:
            acc = self.evaluate("valid")
            print(f"test_result:valid_acc={acc:.4f}")
        out = self.profiler.test_results(
            extra={"final_train_acc": results[-1]["train_acc"] if results else 0.0}
        )
        return {"epochs": results, "test_results": out}
