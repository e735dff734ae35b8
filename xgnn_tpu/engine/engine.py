"""The training engine: init, calibration, epoch loops, evaluation.

TPU-native re-expression of the reference engine family
(``common/engine.{h,cc}``, ``dist/dist_engine.cc``): one host process drives
the local chips; the fork/shm/barrier machinery of ``DistEngine::Init``
disappears.  Init order mirrors the reference
(LoadGraphDataset → SampleInit → PreSample → cache build → TrainInit,
dist_engine.cc:91-700):

1. dataset → device topology (``Graph``)
2. sampler build + capacity calibration (PredictNumNodes analog)
3. presample frequency ranking → feature source (HBM or tiered GGMS)
4. model + optimizer state
5. pipelined epoch loop (sample → extract → train) with profiler
"""

from __future__ import annotations

import functools
import logging
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from .. import profiler as P
from ..config import CachePolicy, RunConfig, SampleType
from ..dataset import Dataset
from ..models import build_model
from ..sampler import Sampler, _layer_fanouts, default_capacities
from ..store import build_ranking, presample_ranking
from ..store.feature_store import (
    DynamicTieredFeatureSource,
    HBMFeatureSource,
    LabelSource,
    TieredFeatureSource,
)
from ..train import init_state, make_eval_step, make_train_step
from ..types import Graph
from .pipeline import Prefetcher
from .shuffler import Shuffler


def _make_fused_epoch(sampler_fn, train_step, direct: bool):
    """One jitted program for an ENTIRE epoch (``config.device_loop``):
    ``lax.scan`` over steps, each iteration = sample → extract → train.
    Zero host dispatches between steps — the host-driven loop pays a
    per-step dispatch round-trip that XLA control flow does not.

    ``graph``/``feat``/``label`` are jit ARGUMENTS: a closure-captured
    device array would be embedded as a program constant and hauled
    host-side by the compiler.  Key folding replicates the host loop
    exactly (``fold_in(base, step)``), so both paths are numerically
    identical given the same shuffle order."""
    from ..store.feature_store import _gather_rows

    @functools.partial(jax.jit, donate_argnums=(0,))
    def epoch_program(
        state, graph, feat, label, seeds_all, nv_all, sample_base, drop_base
    ):
        def body(st, xs):
            i, seeds, nv = xs
            batch = sampler_fn(
                graph, seeds, nv, jax.random.fold_in(sample_base, i)
            )
            if direct:
                x = feat  # the table IS the input (direct extract)
            else:
                x = _gather_rows(feat, batch.input_nodes, batch.num_input)
            labels = _gather_rows(
                label[:, None], batch.output_nodes, batch.num_output
            )[:, 0]
            st, m = train_step(
                st, batch.blocks, x, labels, batch.num_output,
                jax.random.fold_in(drop_base, i), batch.overflow,
            )
            return st, (
                m["loss"],
                m["acc"],
                batch.overflow.astype(jnp.float32),
                batch.num_input.astype(jnp.float32),
            )

        steps = seeds_all.shape[0]
        xs = (jnp.arange(steps), seeds_all, nv_all)
        return jax.lax.scan(body, state, xs)

    return epoch_program


def _nanmean(v) -> float:
    """np.nanmean without the all-NaN RuntimeWarning (an epoch where every
    step overflowed legitimately has no valid losses)."""
    v = np.asarray(v)
    return float(np.nanmean(v)) if np.isfinite(v).any() else float("nan")


def _align_up(n: int, num_node: int) -> int:
    a = C.CAPACITY_ALIGN
    return min(
        int(np.ceil(max(num_node, 1) / a)) * a, int(np.ceil(max(n, 1) / a)) * a
    )


class Engine:
    def __init__(
        self,
        dataset: Dataset,
        config: RunConfig,
        device=None,
        feat_dtype=None,
    ):
        self.ds = dataset
        self.config = config
        self.device = device
        if feat_dtype is None and config.feat_dtype == "bfloat16":
            feat_dtype = jnp.bfloat16
        self.feat_dtype = feat_dtype
        self.profiler = P.Profiler(profile_level=config.profile_level)
        self.graph: Optional[Graph] = None
        self.sampler: Optional[Sampler] = None
        self.feature_source = None
        self.label_source = None
        self.model = None
        self.state = None
        self._train_step = None
        self._eval_step = None
        self._key = jax.random.key(config.seed)
        self._sample_key = jax.random.key(config.seed ^ 0x5A3F1E)
        self._dropout_key = jax.random.key(config.seed ^ 0xD20F00)
        self._fused_program = None
        self._fused_steps = -1

    # ------------------------------------------------------------------ init
    def init(self):
        cfg = self.config
        if cfg.auto_placement:
            # PartitionSolver analog: solve the store split from the HBM
            # budget + degree skew (parallel/placement.py); group_size=1 —
            # this engine owns one chip's store
            from ..parallel.placement import resolve_auto_placement

            cfg, plan = resolve_auto_placement(
                cfg, self.ds, group_size=1, device=self.device
            )
            self.config = cfg
            self.placement_plan = plan
            self.profiler.log_init(
                "auto_dist_graph_percentage", cfg.dist_graph_percentage
            )
            self.profiler.log_init(
                "auto_cache_percentage", cfg.cache_percentage
            )
        t0 = time.perf_counter()
        weighted = cfg.sample_type in (
            SampleType.WEIGHTED_KHOP,
            SampleType.WEIGHTED_KHOP_PREFIX,
            SampleType.WEIGHTED_KHOP_HASH_DEDUP,
        )
        self._tier = None
        self._full_num_node = None
        if cfg.use_dist_graph and cfg.dist_graph_percentage < 1.0:
            # single-store out-of-core topology (reference single-GPU
            # large-graph mode, evaluation/large_graph --use-dist-graph
            # 0.85): hot edge prefix on device, host CSR serves the rest
            from ..sampler import make_tiered_topology

            indptr = np.asarray(self.ds.indptr)
            indices = np.asarray(
                self.ds.graph.indices
                if getattr(self.ds, "graph", None) is not None
                else self.ds.indices
            )
            gt = lambda n: (
                np.asarray(getattr(self.ds, n))
                if getattr(self.ds, n, None) is not None else None
            )
            self.graph, self._tier, self._full_num_node = (
                make_tiered_topology(
                    indptr, indices, cfg.dist_graph_percentage,
                    cfg.sample_type,
                    prob_table=gt("prob_table") if weighted else None,
                    alias_table=gt("alias_table") if weighted else None,
                    prob_prefix_table=(
                        gt("prob_prefix_table") if weighted else None
                    ),
                    device=self.device,
                )
            )
        elif getattr(self.ds, "graph", None) is not None:
            self.graph = self.ds.graph  # device-resident dataset
        else:
            self.graph = Graph.from_dataset(
                self.ds, self.device, weighted=weighted
            )
        self.profiler.log_init("graph_load_time", time.perf_counter() - t0)
        self.profiler.log_mem_usage("graph_load", self.device)

        t0 = time.perf_counter()
        # direct-extract fast path (the --gpu-extract analog): whole feature
        # matrix HBM-resident ⇒ the last sampling layer skips dedup and the
        # first GNN layer reads the table directly.  Every model qualifies
        # since the aggregate-first reorder: SAGE/PinSAGE take dst rows via
        # Block.dst_ids, GCN/GAT consume global-id blocks natively
        self._direct = cfg.gpu_extract and not (
            0.0 < cfg.cache_percentage < 1.0
        )
        tier_kw = {}
        if self._tier is not None:
            ncn, hs, _ = self._tier
            caps0 = cfg.frontier_capacities or default_capacities(
                cfg.batch_size, _layer_fanouts(cfg), self._full_num_node
            )
            tier_kw = dict(
                tier=(ncn, hs, max(int(caps0[-1]) // 4, 128)),
                num_node=self._full_num_node,
            )
        self.sampler = Sampler(
            self.graph, cfg, direct_extract=self._direct, **tier_kw
        )
        self._calibrate()
        self.profiler.log_init("sampler_build_time", time.perf_counter() - t0)

        t0 = time.perf_counter()
        self._build_feature_source()
        self.label_source = LabelSource(self.ds.label, self.device)
        self.profiler.log_init("cache_build_time", time.perf_counter() - t0)
        self.profiler.log_mem_usage("cache_build", self.device)

        t0 = time.perf_counter()
        self.model = build_model(cfg, self.ds.feat_dim, self.ds.num_class)
        seeds, n = self._first_batch_seeds()
        self._key, k1, k2 = jax.random.split(self._key, 3)
        batch = self.sampler.sample(seeds, n, k1)
        if self._direct:
            x = self.feature_source.feat  # the table IS the input
        else:
            x, _ = self.feature_source.extract(
                batch.input_nodes, batch.num_input
            )
        self.state = init_state(self.model, cfg, batch.blocks, x, k2)
        self._train_step = make_train_step(self.model, cfg)
        self._eval_step = make_eval_step(self.model)
        self.profiler.log_init("model_init_time", time.perf_counter() - t0)
        self.profiler.log_mem_usage("model_init", self.device)
        return self

    def _first_batch_seeds(self):
        seeds = np.full(self.sampler.capacities[0], C.EMPTY_KEY, C.ID_DTYPE)
        take = min(len(self.ds.train_set), self.config.batch_size)
        seeds[:take] = self.ds.train_set[:take]
        return jnp.asarray(seeds), take

    def _calibrate(self):
        """Tighten per-layer frontier capacities from warmup batches
        (ALLOC_SCALE headroom; the PredictNumNodes analog)."""
        cfg = self.config
        if cfg.frontier_capacities is not None or cfg.calibration_batches <= 0:
            return
        shuffler = Shuffler(self.ds.train_set, cfg.batch_size, seed=cfg.seed)
        observed = [0] * (len(self.sampler.fanouts) + 1)
        observed[0] = cfg.batch_size
        key = jax.random.key(cfg.seed ^ 0xCA11B)
        for i, (seeds, n) in enumerate(shuffler.epoch_batches(0)):
            if i >= cfg.calibration_batches:
                break
            key, k = jax.random.split(key)
            batch = self.sampler.sample(jnp.asarray(seeds), n, k)
            # frontier sizes innermost-first = reversed block order
            sizes = [int(b.num_src) for b in batch.blocks]  # outer..inner
            for layer, size in enumerate(reversed(sizes)):
                observed[layer + 1] = max(observed[layer + 1], size)
        caps = [self.sampler.capacities[0]] + [
            _align_up(int(s * C.ALLOC_SCALE), self.sampler.num_node)
            for s in observed[1:]
        ]
        self.sampler = Sampler(
            self.graph, cfg, caps, direct_extract=self._direct,
            tier=self.sampler.tier, num_node=self.sampler.num_node,
        )
        self.profiler.log_init("calibrated_input_cap", caps[-1])

    def _build_feature_source(self):
        cfg = self.config
        # cache_percentage 0 means "no cache requested" → whole-matrix HBM
        # residency (reference arch1 / full-cache case); >= 1 is the same
        if not (0.0 < cfg.cache_percentage < 1.0):
            self.feature_source = HBMFeatureSource(
                self.ds.feat, self.device, self.feat_dtype
            )
            return
        access_freq = freq_a = freq_b = None
        if cfg.cache_policy in (
            CachePolicy.PRE_SAMPLE,
            CachePolicy.PRE_SAMPLE_STATIC,
            CachePolicy.DYNAMIC,
            # fake_optimal ranks by observed access frequency (the reference
            # builds it from prior node-access logs; presample counts are the
            # same statistic gathered online)
            CachePolicy.FAKE_OPTIMAL,
        ):
            t0 = time.perf_counter()
            sampler = self.sampler
            if (
                cfg.cache_policy == CachePolicy.PRE_SAMPLE_STATIC
                and self._tier is None
            ):
                # EXACT all-neighbor expansion (edge-parallel bitmask
                # closure) — needs the full device-resident topology
                from ..store.presample import static_exact_ranking

                access_freq = static_exact_ranking(
                    self.graph, self.ds.train_set, cfg, self.graph.num_node
                )
            else:
                if cfg.cache_policy == CachePolicy.PRE_SAMPLE_STATIC:
                    # tiered topology: wide-khop approximation (exact for
                    # deg <= presample_static_fanout)
                    from ..store.presample import static_presample_config

                    sampler = Sampler(
                        self.graph, static_presample_config(cfg),
                        tier=self.sampler.tier,
                        num_node=self.sampler.num_node,
                    )
                access_freq, freq_a, freq_b = presample_ranking(
                    sampler, self.ds.train_set, cfg, self.sampler.num_node,
                    halves=True,
                )
            self.profiler.log_init("presample_time", time.perf_counter() - t0)
            if (
                access_freq is not None
                and getattr(self, "placement_plan", None) is not None
            ):
                # posterior hit expectation: the degree proxy the placement
                # SOLVED with systematically over-weights hubs (per-batch
                # dedup counts a hub once however many rows pick it, and the
                # without-replacement khop family spreads picks wider than
                # degree mass).  Estimated OUT-OF-SAMPLE where the presample
                # was sampled (rank the even-batch counts, score the odd —
                # the in-sample CDF saturates at one epoch's reach and
                # overestimates; crossover README measured 0.94 vs 0.70);
                # the exact static closure is deterministic, so its
                # in-sample counts ARE the access distribution.
                k = int(len(access_freq) * self.config.cache_percentage)
                if cfg.cache_policy == CachePolicy.PRE_SAMPLE_STATIC:
                    w = np.sort(np.asarray(access_freq, np.float64))[::-1]
                    hit = float(w[:k].sum() / max(w.sum(), 1.0))
                else:
                    fa = np.asarray(freq_a, np.float64)
                    fb = np.asarray(freq_b, np.float64)
                    order = np.argsort(-fa, kind="stable")
                    hit = float(
                        fb[order][:k].sum() / max(fb.sum(), 1.0)
                    )
                self.placement_plan.expected_feat_hit = hit
        ranking = build_ranking(self.ds, cfg, access_freq)
        cls = (
            DynamicTieredFeatureSource
            if cfg.cache_policy == CachePolicy.DYNAMIC
            else TieredFeatureSource
        )
        # sync-free fixed miss bucket sized to the expected miss fraction
        # (grown on overflow); kills the per-step scalar device→host syncs
        miss_frac = min(1.0, 1.25 * (1.0 - cfg.cache_percentage))
        miss_cap = max(
            int(self.sampler.capacities[-1] * miss_frac), C.CAPACITY_ALIGN
        )
        self.feature_source = cls(
            self.ds.feat,
            ranking,
            cfg.cache_percentage,
            self.device,
            self.feat_dtype,
            miss_cap=miss_cap,
        )
        if cfg.cache_policy == CachePolicy.DYNAMIC:
            self._dyn_freq = jnp.zeros((self.graph.num_node,), jnp.int32)

    # ----------------------------------------------------------------- steps
    def _produce(self, item):
        """Sampler+extract stage (runs in the prefetch thread when
        pipelining)."""
        (seeds, num_valid), key, (epoch, step) = item
        if self.config.dump_trace:
            self.profiler.trace_begin(epoch, step, "sample")
        t0 = time.perf_counter()
        batch = self.sampler.sample(jnp.asarray(seeds), num_valid, key)
        # NOTE: no host sync on batch.overflow here — the train step skips
        # the update on device when overflowed, and the epoch loop checks the
        # flags once per epoch (device->host syncs cost seconds through the
        # TPU tunnel of this environment).
        if self.config.sanity_check:
            from ..ops import sanity

            flags = int(sanity.check_batch(batch))
            if flags:
                raise RuntimeError(
                    f"sanity check failed: {sanity.explain(flags)}"
                )
        if self.profiler._log_node_access:
            ids = np.asarray(batch.input_nodes)[: int(batch.num_input)]
            self.profiler.log_node_access(ids)
        if getattr(self, "_dyn_freq", None) is not None:
            from ..store.presample import _accumulate

            self._dyn_freq = _accumulate(
                self._dyn_freq, batch.input_nodes, batch.num_input
            )
        t1 = time.perf_counter()
        if self.config.dump_trace:
            self.profiler.trace_end(epoch, step, "sample")
            self.profiler.trace_begin(epoch, step, "copy")
        if self._direct:
            x, info = self.feature_source.feat, {
                "hit_rate": 1.0, "miss_bytes": 0,
            }
        else:
            x, info = self.feature_source.extract(
                batch.input_nodes, batch.num_input
            )
        labels = self.label_source.extract(batch.output_nodes, batch.num_output)
        t2 = time.perf_counter()
        if self.config.dump_trace:
            self.profiler.trace_end(epoch, step, "copy")
        return batch, x, labels, info, (t1 - t0, t2 - t1)

    def _fused_ok(self) -> bool:
        """device_loop eligibility: the scan body must be pure device work —
        all-HBM features and no per-step host-side instrumentation."""
        return (
            isinstance(self.feature_source, HBMFeatureSource)
            and not self.config.dump_trace
            and not self.config.sanity_check
            and not self.profiler._log_node_access
            and getattr(self, "_dyn_freq", None) is None
        )

    def _train_epoch_fused(self, epoch: int) -> dict:
        """The ``device_loop`` epoch: one program, zero per-step dispatches."""
        cfg = self.config
        prof = self.profiler
        shuffler = Shuffler(
            self.ds.train_set, cfg.batch_size, seed=cfg.seed + 1, num_worker=1
        )
        steps = shuffler.num_local_step
        seeds_np = np.empty((steps, cfg.batch_size), C.ID_DTYPE)
        nv_np = np.empty((steps,), np.int32)
        for s, (seeds, n) in enumerate(shuffler.epoch_batches(epoch)):
            seeds_np[s], nv_np[s] = seeds, n
        if self._fused_program is None or self._fused_steps != steps:
            from ..train import make_train_step as _mts

            self._fused_program = _make_fused_epoch(
                self.sampler._fn, _mts(self.model, cfg, donate=False),
                self._direct,
            )
            self._fused_steps = steps
        t0 = time.perf_counter()
        seeds_all = jax.device_put(jnp.asarray(seeds_np), self.device)
        nv_all = jax.device_put(jnp.asarray(nv_np), self.device)
        self.state, ys = self._fused_program(
            self.state, self.graph, self.feature_source.feat,
            self.label_source.label, seeds_all, nv_all,
            jax.random.fold_in(self._sample_key, epoch),
            jax.random.fold_in(self._dropout_key, epoch),
        )
        # ONE device->host pull; forces completion (tunnel-safe timing)
        stats = np.asarray(jnp.stack(ys))
        dt = time.perf_counter() - t0
        loss_v, acc_v, over_v, nin_v = stats
        for s in range(steps):
            prof.log_step(epoch, s, P.L1_NUM_NODE, float(nin_v[s]))
        n_over = int(over_v.sum())
        if n_over:
            print(
                f"warning: {n_over} batches overflowed capacity in epoch "
                f"{epoch}"
            )
            prof.log_step(epoch, 0, P.L3_OVERFLOW_RETRY, float(n_over))
            self.sampler = self.sampler.grow()
            self._fused_program = None  # capacities changed: rebuild
        loss = _nanmean(loss_v)
        acc = _nanmean(np.where(np.isnan(loss_v), np.nan, acc_v))
        prof.log_epoch_add(epoch, "epoch_time", dt)
        return {"epoch": epoch, "loss": loss, "train_acc": acc, "time": dt}

    def train_epoch(self, epoch: int) -> dict:
        cfg = self.config
        if cfg.device_loop:
            if self._fused_ok():
                return self._train_epoch_fused(epoch)
            if epoch == 0:
                logging.getLogger(__name__).warning(
                    "device_loop requested but ineligible (needs all-HBM "
                    "features, no per-step host instrumentation); using the "
                    "host-driven loop"
                )
        shuffler = Shuffler(
            self.ds.train_set, cfg.batch_size, seed=cfg.seed + 1, num_worker=1
        )
        prof = self.profiler

        sample_base = jax.random.fold_in(self._sample_key, epoch)

        def work():
            for step, step_item in enumerate(shuffler.epoch_batches(epoch)):
                yield step_item, jax.random.fold_in(sample_base, step), (epoch, step)

        produce = self._produce
        stream = (
            Prefetcher(work(), produce, depth=cfg.prefetch_depth)
            if cfg.pipeline
            else map(produce, work())
        )

        losses, accs, overflows, num_inputs = [], [], [], []
        samp_overflows, hits, misses = [], [], []
        t_epoch = time.perf_counter()
        drop_base = jax.random.fold_in(self._dropout_key, epoch)
        try:
            for step, (batch, x, labels, info, (t_sample, t_extract)) in enumerate(
                stream
            ):
                k_drop = jax.random.fold_in(drop_base, step)
                if cfg.dump_trace:
                    prof.trace_begin(epoch, step, "train")
                t0 = time.perf_counter()
                samp_over = batch.overflow
                skip = samp_over
                if info.get("overflow") is not None:
                    # sync-free tiered store: miss-bucket overflow poisons
                    # the combined features → skip the update on device
                    skip = skip | info["overflow"]
                self.state, metrics = self._train_step(
                    self.state, batch.blocks, x, labels, batch.num_output,
                    k_drop, skip,
                )
                if not cfg.pipeline:
                    jax.block_until_ready(metrics["loss"])
                t_train = time.perf_counter() - t0
                if cfg.dump_trace:
                    prof.trace_end(epoch, step, "train")
                prof.log_step(epoch, step, P.L1_SAMPLE_TIME, t_sample)
                prof.log_step(epoch, step, P.L1_COPY_TIME, t_extract)
                prof.log_step(epoch, step, P.L1_TRAIN_TIME, t_train)
                if info.get("hit_rate") is not None:
                    prof.log_step(
                        epoch, step, P.L2_CACHE_HIT_RATE, info["hit_rate"]
                    )
                else:
                    hits.append(info["num_hit"])
                    misses.append(info["num_miss"])
                prof.log_step(epoch, step, P.L1_MISS_BYTES, info["miss_bytes"])
                losses.append(metrics["loss"])
                accs.append(metrics["acc"])
                overflows.append(skip)
                samp_overflows.append(samp_over)
                num_inputs.append(batch.num_input)
        finally:
            # stop the producer thread even if the train loop raises — it
            # must not keep dispatching device work after the consumer died
            if isinstance(stream, Prefetcher):
                stream.close()
        # ONE device->host pull for the whole epoch's metrics
        epoch_hit_rate = float("nan")
        if losses:
            cols = [
                jnp.stack(losses),
                jnp.stack(accs),
                jnp.stack(overflows).astype(jnp.float32),
                jnp.stack(samp_overflows).astype(jnp.float32),
                jnp.stack(num_inputs).astype(jnp.float32),
            ]
            if hits:
                cols.append(jnp.stack(hits).astype(jnp.float32))
                cols.append(jnp.stack(misses).astype(jnp.float32))
            stats = np.asarray(jnp.stack(cols))
            loss_v, acc_v, over_v, samp_over_v, nin_v = stats[:5]
            if hits:
                h_sum, m_sum = stats[5].sum(), stats[6].sum()
                hit_rate = epoch_hit_rate = float(
                    h_sum / max(h_sum + m_sum, 1.0)
                )
                prof.log_step(epoch, 0, P.L2_CACHE_HIT_RATE, hit_rate)
                max_miss = stats[6].max()
                if max_miss > self.feature_source.miss_cap:
                    self.feature_source.grow_miss_cap(max_miss)
            for step in range(len(losses)):
                prof.log_step(epoch, step, P.L1_NUM_NODE, float(nin_v[step]))
            n_over = int(over_v.sum())
            if n_over:
                # overflowed steps were skipped on device; grow for next epoch
                print(
                    f"warning: {n_over} batches overflowed capacity in epoch "
                    f"{epoch}"
                )
                prof.log_step(epoch, 0, P.L3_OVERFLOW_RETRY, float(n_over))
            if samp_over_v.sum():
                # only a SAMPLER overflow justifies regrowing capacities (a
                # recompile) — miss-bucket overflow is handled above
                self.sampler = self.sampler.grow()
            loss = _nanmean(loss_v)
            acc = _nanmean(np.where(np.isnan(loss_v), np.nan, acc_v))
        else:
            loss = acc = float("nan")
        dt = time.perf_counter() - t_epoch
        prof.log_epoch_add(epoch, "epoch_time", dt)
        refresh_gate = (
            cfg.barriered_epoch in (-1, 0) or epoch == cfg.barriered_epoch
        )  # reference cuda_loops_arch4.cc:203
        if getattr(self, "_dyn_freq", None) is not None and refresh_gate:
            # dynamic cache refresh (arch4 analog): hottest nodes by the
            # running access frequency; one small D2H per epoch
            k = self.feature_source.num_cache
            if k > 0:
                top = np.asarray(
                    jax.lax.top_k(self._dyn_freq, k)[1].astype(jnp.int32)
                )
                self.feature_source.refresh(top)
        return {
            "epoch": epoch, "loss": loss, "train_acc": acc, "time": dt,
            "hit_rate": epoch_hit_rate,
        }

    def evaluate(self, split: str = "valid", max_batches: Optional[int] = None) -> float:
        nodes = self.ds.valid_set if split == "valid" else self.ds.test_set
        if len(nodes) == 0:
            return float("nan")
        shuffler = Shuffler(nodes, self.config.batch_size, seed=0)
        accs, weights = [], []
        for i, (seeds, n) in enumerate(shuffler.epoch_batches(0)):
            if max_batches is not None and i >= max_batches:
                break
            k = jax.random.fold_in(jax.random.key(123), i)
            batch, x, labels, _, _ = self._produce(((seeds, n), k, (-1, i)))
            acc = self._eval_step(
                self.state.params, batch.blocks, x, labels, batch.num_output
            )
            accs.append(acc)
            weights.append(n)
        accs = np.asarray(jnp.stack(accs))  # single device->host pull
        return float(np.average(accs, weights=weights))

    # ------------------------------------------------------------------- run
    def run(self) -> dict:
        self.init()
        ckpt = None
        start_epoch = 0
        if self.config.checkpoint_dir:
            from ..checkpoint import CheckpointManager

            ckpt = CheckpointManager(self.config.checkpoint_dir)
            state, extra = ckpt.restore(self.state)
            if state is not None:
                self.state = state
                start_epoch = (extra or {}).get("epoch", -1) + 1
                print(f"resumed from checkpoint at epoch {start_epoch}")
        results = []
        for epoch in range(start_epoch, self.config.num_epoch):
            r = self.train_epoch(epoch)
            results.append(r)
            if self.config.report_acc and epoch % max(self.config.report_acc, 1) == 0:
                r["valid_acc"] = self.evaluate("valid")
            if ckpt and (epoch + 1) % self.config.checkpoint_every == 0:
                ckpt.save(epoch, self.state, extra={"epoch": epoch})
        if ckpt:
            ckpt.close()
        if self.config.dump_trace:
            path = "xgnn_trace.json"
            self.profiler.dump_trace(path)
            print(f"trace dumped to {path}")
        if self.profiler._log_node_access:
            # the three reference analytics files (profiler.cc:659-795)
            deg = self.ds.degrees
            self.profiler.dump_node_access(
                "node_access.txt", in_degrees=deg, out_degrees=deg
            )
            self.profiler.dump_node_access_frequency(
                "node_access_frequency.txt", self.ds.num_node
            )
            self.profiler.dump_node_access_similarity(
                "node_access_similarity.txt"
            )
            opt = self.profiler.optimal_cache_hit_rate(
                max(self.config.cache_percentage, 0.0), self.ds.num_node
            )
            print(f"test_result:optimal_cache_hit_rate={opt:.6f}")
        out = self.profiler.test_results(
            extra={"final_train_acc": results[-1]["train_acc"] if results else 0.0}
        )
        return {"epochs": results, "test_results": out}
