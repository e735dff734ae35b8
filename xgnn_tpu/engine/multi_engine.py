"""Multi-chip collocated engine (the arch6/XGNN execution mode, end to end).

Feature parity with the single-chip :class:`~xgnn_tpu.engine.engine.Engine`
and the reference ``DistEngine`` init/run path
(``dist/dist_engine.cc:91-700``): capacity calibration, on-device presample
(``PreSampler``), cache build honoring ``cache_percentage`` /
``cache_policy`` / ``part_cache``, the ``dist_graph_percentage`` host
topology tier, pipelined stepping, ``evaluate()``, checkpointing, and
overflow-grow.

Execution shapes (see ``parallel/collocated.py``):

- everything-in-HBM (``cache_percentage >= 1``): ONE fused SPMD program per
  step (sample → exchange-extract → train).
- the full GGMS (partial cache): two programs with the host miss path
  between them, double-buffered so program A of step n+1 runs on device
  while the host gathers step n's miss rows — the ``--pipeline`` overlap of
  ``dist_loops_arch6.cc:55-199``.

The host loop only shuffles seeds and feeds per-chip shards (reference: one
fork()ed process per GPU + shm barriers,
``example/samgraph/sgnn/train_gcn.py:359-389``; here one process, one mesh).
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import clib
from .. import constants as C
from .. import profiler as P
from ..config import CachePolicy, RunConfig
from ..models import build_model
from ..parallel.collocated import (
    make_collocated_train_step,
    make_combine_train_step,
    make_eval_step,
    make_fused_eval_step,
    make_presample_step,
    make_sample_split_step,
    put_replicated,
    put_sharded,
)
from ..parallel.dist_topology import (
    LocalTopo,
    WEIGHTED_TYPES,
    partition_csr_host,
)
from ..parallel.exchange import shard_interleaved
from ..parallel.ggms import (
    HostColdSampler,
    build_cache,
    clamp_num_cache_node_int32,
    compute_num_cache_node,
)
from ..parallel.mesh import DATA_AXIS, DCN_AXIS, make_mesh, make_mesh_2d
from ..sampler import Sampler, _layer_fanouts, default_capacities
from ..train import init_state
from ..types import Graph
from .shuffler import Shuffler
from .engine import _nanmean

EMPTY = C.EMPTY_KEY

_PRESAMPLE_POLICIES = (
    CachePolicy.PRE_SAMPLE,
    CachePolicy.PRE_SAMPLE_STATIC,
    CachePolicy.FAKE_OPTIMAL,
    CachePolicy.DYNAMIC,
)


def _align_up(n: int, limit: int) -> int:
    a = C.CAPACITY_ALIGN
    return min(
        int(np.ceil(max(limit, 1) / a)) * a, int(np.ceil(max(n, 1) / a)) * a
    )


def _to_host(x) -> np.ndarray:
    """Pull a (possibly globally-sharded) array to every host — one
    allgather under multi-controller JAX, a plain D2H otherwise."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def _make_mc_fused_epoch(step_fn, with_sanity: bool = False):
    """Multi-chip ``device_loop``: scan the fused SPMD step over every step
    of an epoch in ONE program.  All per-step host work (seed sharding,
    key staging, program dispatch — multiplied by chip count in the host
    loop) collapses to a single device_put + one dispatch per epoch.
    Store arrays stay scan-invariant arguments; per-step seeds/keys carry a
    leading step axis sharded ``PS(None, data)`` so each scan slice lands
    pre-sharded for the inner shard_map."""
    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def epoch_program(
        state, topo, feat_parts, lab_parts,
        seeds_all, nums_all, keys_all, dkeys_all,
    ):
        def body(st, xs):
            st, m = step_fn(st, topo, feat_parts, lab_parts, *xs)
            ys = (
                m["loss"], m["acc"],
                m["exchange_overflow"].astype(jnp.float32),
            )
            if with_sanity:
                ys = ys + (m["sanity"].astype(jnp.float32),)
            return st, ys

        return jax.lax.scan(
            body, state, (seeds_all, nums_all, keys_all, dkeys_all)
        )

    return epoch_program


class MultiChipEngine:
    """Data-parallel training over all local chips on the composed GGMS."""

    def __init__(self, dataset, config: RunConfig, devices=None):
        self.ds = dataset
        if config.auto_placement:
            # PartitionSolver analog (parallel/placement.py): stores shard
            # over the ICI group; DCN groups replicate
            from ..parallel.placement import resolve_auto_placement

            config, self.placement_plan = resolve_auto_placement(
                config, dataset,
                group_size=config.num_worker // config.num_dcn_groups,
                device=(devices or jax.devices())[0],
            )
        self.config = config
        self.devices = devices or jax.devices()[: config.num_worker]
        assert len(self.devices) == config.num_worker, (
            f"need {config.num_worker} chips, have {len(self.devices)}"
        )
        self.profiler = P.Profiler(profile_level=config.profile_level)
        self._mc_epoch_program = None
        self._mc_epoch_steps = -1
        # full GGMS (two-phase) iff a PARTIAL feature cache is requested
        # (0 < pct < 1).  pct == 0 means "no cache knob" and pct >= 1 means
        # everything-fits: both keep the fused all-HBM interleaved store —
        # part_cache alone must NOT select the two-phase path, or an unset
        # percentage would silently build an EMPTY cache and fetch 100% of
        # features from host RAM every step
        pct = config.cache_percentage
        self.partial_cache = 0.0 < pct < 1.0
        self.two_phase = self.partial_cache
        # hierarchical mesh: store shards span each ICI group; batches span
        # every chip (the PartitionSolver-analog placement) — in BOTH
        # execution shapes (fused and two-phase GGMS)
        self.num_groups = config.num_dcn_groups
        if self.num_groups > 1:
            assert config.num_worker % self.num_groups == 0
            self.mesh = make_mesh_2d(self.num_groups, devices=self.devices)
        else:
            self.mesh = make_mesh(devices=self.devices)
        # store partition count = chips per ICI group
        self.num_parts = config.num_worker // self.num_groups
        self._dcn = DCN_AXIS if self.num_groups > 1 else None

    # ------------------------------------------------------------------ init
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
        self._host_indptr = indptr
        self._host_indices = indices
        if len(indptr) > 1:
            # static property of the LOADED graph (not a tuning knob):
            # always recompute so a RunConfig reused across engines/datasets
            # never carries a stale value — an undersized search would
            # silently bias weighted picks toward low prefix offsets
            cfg.max_degree = int(np.max(np.diff(indptr)))
        weighted = cfg.sample_type in WEIGHTED_TYPES

        def _table(name):
            # host datasets carry tables as attributes; device datasets
            # (make_device_dataset(weighted=True)) carry them on ds.graph —
            # pull to host for partitioning, like indptr/indices above
            if not weighted:
                return None
            t = getattr(self.ds, name, None)
            if t is None and getattr(self.ds, "graph", None) is not None:
                t = getattr(self.ds.graph, name, None)
            return np.asarray(t) if t is not None else None

        prob = _table("prob_table")
        alias = _table("alias_table")
        prefix = _table("prob_prefix_table")

        # --- topology: replicated, fully partitioned, or partitioned with
        #     a host cold tier (dist_graph_percentage)
        self.num_cache_node = None
        self.host_sampler = None
        from ..ops.tiled import TILE, pad_tile

        big_offsets = len(indptr) > 1 and int(indptr[-1]) >= 2**31
        if big_offsets and not cfg.use_dist_graph:
            raise ValueError(
                f"graph has {int(indptr[-1])} edges (>= 2^31): device edge "
                "offsets are int32 by design — run with use_dist_graph "
                "(partitioned topology rebases per-part offsets; the int64 "
                "host tier serves any clamped remainder)"
            )
        if big_offsets:
            # stub single-store graph: used only to shape the state-init
            # sample (line `Sampler(self._graph, ...)`) — a zero-edge CSR
            # with the real node count yields identically-shaped batches.
            # Weighted sample types dispatch through the stub too, so it
            # must carry (tiny, zero) edge-aligned tables
            graph = Graph(
                indptr=jnp.zeros(
                    pad_tile(np.zeros(len(indptr), np.int32)).shape, jnp.int32
                ),
                indices=jnp.zeros((TILE,), jnp.int32),
                prob_table=(
                    jnp.zeros((TILE,), jnp.float32) if prob is not None else None
                ),
                alias_table=(
                    jnp.zeros((TILE,), jnp.int32) if alias is not None else None
                ),
                prob_prefix_table=(
                    jnp.ones((TILE,), jnp.float32) if prefix is not None else None
                ),
                n_node=int(len(indptr) - 1),
                n_edge=0,
                n_max_deg=cfg.max_degree,
            )
        else:
            graph = Graph(
                indptr=jnp.asarray(pad_tile(indptr, fill=int(indptr[-1]))),
                indices=jnp.asarray(pad_tile(indices)),
                prob_table=jnp.asarray(pad_tile(prob)) if prob is not None else None,
                alias_table=jnp.asarray(pad_tile(alias)) if alias is not None else None,
                prob_prefix_table=(
                    jnp.asarray(pad_tile(prefix)) if prefix is not None else None
                ),
                n_node=int(len(indptr) - 1),
                n_edge=int(len(indices)),
                n_max_deg=cfg.max_degree,
            )
        if cfg.use_dist_graph:
            ncn = len(indptr) - 1
            if cfg.dist_graph_percentage < 1.0:
                ncn = compute_num_cache_node(
                    indptr, cfg.dist_graph_percentage
                )
            # >= 2^31-edge graphs: clamp the hot prefix so every part's
            # REBASED offsets fit int32 (no-op otherwise)
            ncn = clamp_num_cache_node_int32(indptr, ncn, p)
            if ncn < len(indptr) - 1:
                self.num_cache_node = ncn
                self.host_sampler = HostColdSampler(
                    indptr, indices, cfg.sample_type,
                    prob_table=prob, alias_table=alias,
                    prob_prefix_table=prefix,
                )
            lt = partition_csr_host(
                indptr, indices, p,
                num_cache_node=self.num_cache_node,
                prob=prob, alias=alias, prefix=prefix,
            )
            self.topo = LocalTopo(
                *(
                    put_sharded(t, self.mesh) if t is not None else None
                    for t in lt
                )
            )
        else:
            self.topo = put_replicated(graph, self.mesh)
        self._graph = graph

        # labels: always 100% interleaved in HBM (int32 per node is small)
        self.lab_parts = put_sharded(
            shard_interleaved(
                np.asarray(self.ds.label).astype(np.int32), p
            ),
            self.mesh,
        )
        self.profiler.log_init("graph_load_time", time.perf_counter() - t0)
        self.profiler.log_mem_usage("graph_load", self.devices[0])

        # --- capacities: calibrate from warmup presample batches
        t0 = time.perf_counter()
        caps = cfg.frontier_capacities or default_capacities(
            cfg.batch_size, _layer_fanouts(cfg), self.ds.num_node
        )
        self.capacities = [int(c) for c in caps]
        self._derive_exchange_caps()
        freq = self._presample_and_calibrate()
        self.profiler.log_init(
            "presample_time", time.perf_counter() - t0
        )

        # --- feature store
        t0 = time.perf_counter()
        feat_host = np.asarray(self.ds.feat)
        if cfg.feat_dtype == "bfloat16" and feat_host.dtype == np.float32:
            # bf16 STORAGE: halves HBM-shard bytes, ICI exchange bytes, and
            # host miss-gather H2D bytes (the accumulator stays f32 in the
            # model — see models/gnn.fanout_reduce)
            import ml_dtypes

            feat_host = feat_host.astype(ml_dtypes.bfloat16)
        self._feat_host = feat_host
        if self.two_phase:
            from ..store import build_ranking

            if freq is None and cfg.cache_policy in _PRESAMPLE_POLICIES:
                # zero-size cache: the ranking is irrelevant
                ranking = np.arange(self.ds.num_node, dtype=np.int32)
            else:
                ranking = build_ranking(self.ds, cfg, freq)
            self._build_feature_cache(ranking)
        else:
            self.feat_parts = put_sharded(
                shard_interleaved(feat_host, p), self.mesh
            )
            self.num_cache = self.ds.num_node
        self.profiler.log_init("cache_build_time", time.perf_counter() - t0)
        self.profiler.log_mem_usage("cache_build", self.devices[0])

        # --- model + step programs
        t0 = time.perf_counter()
        self.model = build_model(cfg, self.ds.feat_dim, self.ds.num_class)
        sampler = Sampler(self._graph, cfg, self.capacities)
        seeds0 = np.full(self.capacities[0], EMPTY, C.ID_DTYPE)
        take = min(len(self.ds.train_set), cfg.batch_size)
        seeds0[:take] = np.asarray(self.ds.train_set[:take])
        b0 = sampler.sample(jnp.asarray(seeds0), take, jax.random.key(0))
        x0 = jnp.zeros((self.capacities[-1], self.ds.feat_dim), jnp.float32)
        self.state = put_replicated(
            init_state(self.model, cfg, b0.blocks, x0, jax.random.key(cfg.seed)),
            self.mesh,
        )
        self._build_step_fns()
        self.profiler.log_init("model_init_time", time.perf_counter() - t0)
        self.profiler.log_mem_usage("model_init", self.devices[0])
        return self

    def _build_feature_cache(self, ranking: np.ndarray):
        """(Re)build the partitioned feature cache from a hottest-first
        ranking: posmap (replicated node→position hashtable) + interleaved
        cache partitions.  Used at init and by the dynamic-cache refresh
        (reference ``GPUDynamicCacheManager::ReplaceCache``,
        ``cuda/cuda_cache_manager.h:98-149``)."""
        cfg = self.config
        p = self.num_parts
        posmap, cache_parts, self.num_cache = build_cache(
            self._feat_host, ranking, cfg.cache_percentage,
            p if cfg.part_cache else 1,
        )
        from ..ops.tiled import pad_tile as _pt

        self.posmap = put_replicated(
            jnp.asarray(_pt(posmap, fill=EMPTY)), self.mesh
        )
        if cfg.part_cache:
            self.cache_parts = put_sharded(cache_parts, self.mesh)
        else:  # SGNN mode: the same cache replicated on every chip
            self.cache_parts = put_sharded(
                np.broadcast_to(
                    cache_parts.reshape(1, *cache_parts.shape[1:]),
                    (p,) + cache_parts.shape[1:],
                ).copy(),
                self.mesh,
            )

    def _dynamic_refresh(self, next_epoch: int):
        """arch4 parity on the mesh: re-rank the cache from the access
        frequency of the UPCOMING epoch's first batches (the reference
        prefetches coming batches and replaces the cache with their hot set;
        ``cuda_loops_arch4.cc``) and rebuild posmap/cache partitions."""
        cfg = self.config
        lanes = cfg.num_worker
        p = self.num_parts
        rows = -(-self.ds.num_node // p)
        fn = make_presample_step(
            cfg, self.mesh, self.capacities, self.seg_cap,
            use_dist_graph=cfg.use_dist_graph, dcn_axis=self._dcn,
            **self._tier_kwargs(),
        )
        shufflers = [
            Shuffler(
                np.asarray(self.ds.train_set), cfg.batch_size,
                num_worker=lanes, worker_id=w, seed=cfg.seed + 1,
            )
            for w in range(lanes)
        ]
        iters = [s.epoch_batches(next_epoch) for s in shufflers]
        num_probe = max(cfg.calibration_batches, 1)
        base = jax.random.fold_in(
            jax.random.key(cfg.seed ^ 0xD1), next_epoch
        )
        freq = self._put_lanes(np.zeros((lanes, rows), np.int32))
        for step in range(num_probe):
            seeds, nums = self._seed_shards(iters, lanes)
            keys = np.asarray(jax.random.key_data(
                jax.random.split(jax.random.fold_in(base, step), lanes)
            ))
            freq, _ = fn(
                freq, self.topo, self._put_batch(seeds),
                self._put_batch(nums), self._put_batch(keys),
            )
        parts = _to_host(freq).reshape(self.num_groups, p, -1).sum(axis=0)
        full = np.zeros(parts.shape[0] * parts.shape[1], np.int64)
        for w in range(p):
            full[w::p] = parts[w]
        ranking = np.argsort(
            -full[: self.ds.num_node], kind="stable"
        ).astype(np.int32)
        self._build_feature_cache(ranking)

    def _derive_exchange_caps(self):
        p = self.num_parts
        h = self.config.exchange_headroom
        # a per-peer segment can never need more than the full request cap
        # (at P=1 that makes the headroom provably dead padding — 25% of the
        # owner-side gather and the response buffer for nothing)
        self.seg_cap = min(
            max(int(np.ceil(self.capacities[-1] / p * h)), 128),
            self.capacities[-1],
        )
        # miss buffer sized to the expected miss fraction (hot-ranked caches
        # miss *less* than 1-pct by count; 1.25x headroom, grown on overflow)
        pct = self.config.cache_percentage if self.two_phase else 1.0
        miss_frac = min(1.0, 1.25 * max(1.0 - pct, 0.0))
        self.miss_cap = max(
            _align_up(
                int(self.capacities[-1] * miss_frac), self.capacities[-1]
            ),
            C.CAPACITY_ALIGN,
        )
        self.cold_cap = (
            max(self.capacities[-1] // 4, 128)
            if self.num_cache_node is not None
            else 0
        )

    def _tier_kwargs(self):
        return dict(
            num_cache_node=self.num_cache_node,
            host_sampler=self.host_sampler,
            cold_cap=self.cold_cap,
        )

    def _build_step_fns(self):
        cfg = self.config
        if self.two_phase:
            self._fn_a = make_sample_split_step(
                cfg, self.mesh, self.capacities, self.seg_cap, self.miss_cap,
                use_dist_graph=cfg.use_dist_graph,
                partitioned_cache=cfg.part_cache,
                dcn_axis=self._dcn,
                **self._tier_kwargs(),
            )
            self._fn_b = make_combine_train_step(
                self.model, cfg, self.mesh, dcn_axis=self._dcn
            )
            self._fn_eval = make_eval_step(
                self.model, self.mesh, dcn_axis=self._dcn
            )
        else:
            # node-access analytics needs the fused program to emit its
            # frontier (captured at build time: enable via env or
            # enable_node_access_log() BEFORE init)
            self._emit_access = self.profiler._log_node_access
            self.step_fn = make_collocated_train_step(
                self.model, cfg, self.mesh, self.capacities, self.seg_cap,
                use_dist_graph=cfg.use_dist_graph,
                dcn_axis=DCN_AXIS if self.num_groups > 1 else None,
                emit_input_nodes=self._emit_access,
            )
            self._fn_eval = make_fused_eval_step(
                self.model, cfg, self.mesh, self.capacities, self.seg_cap,
                use_dist_graph=cfg.use_dist_graph,
                dcn_axis=DCN_AXIS if self.num_groups > 1 else None,
            )

    # ----------------------------------------------------- presample + calib
    def _presample_and_calibrate(self) -> Optional[np.ndarray]:
        """Run warmup batches through the on-device presample program:
        tighten frontier capacities (PredictNumNodes analog), then — for
        frequency-ranked cache policies — finish the presample epoch(s) and
        return per-node access counts (reference PreSampler::DoPreSample +
        DistEngine presample barrier, dist_engine.cc:453-469)."""
        cfg = self.config
        p = self.num_parts
        lanes = cfg.num_worker  # G*P chips, each presampling its batch shard
        need_freq = (
            self.two_phase
            and cfg.cache_policy in _PRESAMPLE_POLICIES
            and cfg.cache_percentage > 0.0
        )
        need_calib = cfg.frontier_capacities is None and cfg.calibration_batches > 0
        if not (need_freq or need_calib):
            return None

        rows = -(-self.ds.num_node // p)
        freq = self._put_lanes(np.zeros((lanes, rows), np.int32))

        def run_steps(fn, num_steps, epoch, freq):
            shufflers = [
                Shuffler(
                    np.asarray(self.ds.train_set), cfg.batch_size,
                    num_worker=lanes, worker_id=w, seed=cfg.seed ^ 0x5EED,
                )
                for w in range(lanes)
            ]
            iters = [s.epoch_batches(epoch) for s in shufflers]
            total = max(s.num_local_step for s in shufflers)
            if num_steps is not None:
                total = min(total, num_steps)
            base = jax.random.fold_in(
                jax.random.key(cfg.seed ^ 0x9A3), epoch
            )
            sizes_acc = []
            for step in range(total):
                seeds = np.full((lanes, self.capacities[0]), EMPTY, C.ID_DTYPE)
                nums = np.zeros((lanes,), np.int32)
                for w, it in enumerate(iters):
                    s, n = next(it, (None, 0))
                    if s is not None:
                        seeds[w, : len(s)] = s
                    nums[w] = n
                keys = jax.random.key_data(
                    jax.random.split(jax.random.fold_in(base, step), lanes)
                )
                freq, sizes = fn(
                    freq,
                    self.topo,
                    self._put_batch(seeds),
                    self._put_batch(nums),
                    self._put_batch(np.asarray(keys)),
                )
                sizes_acc.append(sizes)
            return freq, sizes_acc

        def freq_fn(capacities, seg_cap):
            """Frequency-collection program: presample_static swaps in the
            all-neighbor expansion (reference DoGPUSampleAllNeighbour).

            All-HBM stores (partitioned or replicated) run it EXACTLY via the
            owner-parallel edge closure (make_presample_static_exact_step —
            every neighbor counted, no fanout truncation); only the tiered
            engines (host cold tier holds edges no chip can reach) keep the
            wide-khop APPROXIMATION (exact for deg <=
            presample_static_fanout)."""
            if cfg.cache_policy != CachePolicy.PRE_SAMPLE_STATIC:
                return make_presample_step(
                    cfg, self.mesh, capacities, seg_cap,
                    use_dist_graph=cfg.use_dist_graph, dcn_axis=self._dcn,
                    **self._tier_kwargs(),
                )
            if self.num_cache_node is None:
                from ..parallel.collocated import (
                    make_presample_static_exact_step,
                )

                return make_presample_static_exact_step(
                    cfg, self.mesh, self.ds.num_node, capacities[0],
                    use_dist_graph=cfg.use_dist_graph, dcn_axis=self._dcn,
                )
            from ..store.presample import static_presample_config

            scfg = static_presample_config(cfg)
            scaps = default_capacities(
                cfg.batch_size, _layer_fanouts(scfg), self.ds.num_node
            )
            return make_presample_step(
                scfg, self.mesh, scaps,
                max(int(np.ceil(scaps[-1] / p * cfg.exchange_headroom)), 128),
                use_dist_graph=cfg.use_dist_graph, dcn_axis=self._dcn,
                **self._tier_kwargs(),
            )

        fn = make_presample_step(
            cfg, self.mesh, self.capacities, self.seg_cap,
            use_dist_graph=cfg.use_dist_graph, dcn_axis=self._dcn,
            **self._tier_kwargs(),
        )
        sizes_acc = []
        if need_calib:
            # warm-up batches ONLY when calibration is wanted — their counts
            # are discarded below (the frequency epochs re-run from step 0,
            # so keeping them would double-count the first batches)
            freq, sizes_acc = run_steps(
                fn, max(cfg.calibration_batches, 1), 0, freq
            )
        if need_calib and sizes_acc:
            # one host pull for all calibration sizes
            sizes = np.asarray(jnp.stack(sizes_acc, axis=0))
            observed = sizes.max(axis=0)  # (L+1,) max over steps (chips pmaxed)
            caps = [self.capacities[0]] + [
                _align_up(int(s * C.ALLOC_SCALE), self.ds.num_node)
                for s in observed[1:]
            ]
            self.capacities = caps
            self._derive_exchange_caps()
            self.profiler.log_init("calibrated_input_cap", caps[-1])
            if need_freq:
                # rebuild the presample program with tight shapes (or the
                # all-neighbor expansion for presample_static)
                fn = freq_fn(self.capacities, self.seg_cap)
                freq = self._put_lanes(np.zeros((lanes, rows), np.int32))
                freq, _ = run_steps(fn, None, 0, freq)
                for e in range(1, cfg.presample_epoch):
                    freq, _ = run_steps(fn, None, e, freq)
        elif need_freq:
            # no calibration ran: freq is still zero — run the full
            # presample epoch(s) directly
            if cfg.cache_policy == CachePolicy.PRE_SAMPLE_STATIC:
                fn = freq_fn(self.capacities, self.seg_cap)
            freq, _ = run_steps(fn, None, 0, freq)
            for e in range(1, cfg.presample_epoch):
                freq, _ = run_steps(fn, None, e, freq)

        if not need_freq:
            return None
        # interleaved shards → full per-node counts: lane (g, p) row r =
        # node p + P*r; groups hold counts of DIFFERENT batches over the
        # SAME node shard p, so sum over the group axis first
        parts = _to_host(freq).reshape(
            self.num_groups, p, -1
        ).sum(axis=0)  # (P, rows), one D2H/allgather
        full = np.zeros(parts.shape[0] * parts.shape[1], np.int64)
        for w in range(p):
            full[w::p] = parts[w]
        return full[: self.ds.num_node]

    # ----------------------------------------------------------------- steps
    def _seed_shards(self, iters, p):
        seeds = np.full((p, self.capacities[0]), EMPTY, C.ID_DTYPE)
        nums = np.zeros((p,), np.int32)
        for w, it in enumerate(iters):
            s, n = next(it, (None, 0))
            if s is not None:
                seeds[w, : len(s)] = s
            nums[w] = n
        return seeds, nums

    def _gather_miss_rows(self, miss_ids, miss_cap: int = None) -> jax.Array:
        """Host tier of the feature store: gather miss rows from host RAM
        (OMP clib, the CPUExtract / GPUExtractMissData analog).

        Each controller serves ONLY its addressable chips' miss buffers —
        no cross-process allgather of ids or rows; under multi-controller
        JAX every host touches exactly the shards it owns (the reference's
        per-trainer-process miss pipeline, ``dist/dist_loops.cc:811-936``).
        The result is device-resident and sharded like program B expects.
        """
        from jax.sharding import NamedSharding, PartitionSpec as PS

        feat = self._feat_host
        spec = (
            PS(DATA_AXIS)
            if self.num_groups == 1
            else PS((DCN_AXIS, DATA_AXIS))
        )
        lanes = self.config.num_worker
        arrays = []
        for shard in miss_ids.addressable_shards:
            ids = np.asarray(shard.data).reshape(-1).astype(np.int64)
            ids = np.where(ids == EMPTY, -1, ids)
            rows = clib.gather_rows(feat, ids)
            arrays.append(
                jax.device_put(
                    rows.reshape(1, len(ids), feat.shape[1]), shard.device
                )
            )
        return jax.make_array_from_single_device_arrays(
            (lanes, miss_cap or self.miss_cap, feat.shape[1]),
            NamedSharding(self.mesh, spec),
            arrays,
        )

    def _finish_step(
        self, pending, losses, accs, overflows, hits, misses, sanities
    ):
        outs, dkeys = pending
        t0 = time.perf_counter()
        # D2H sync point (per-shard pulls) — overlapped with the next
        # step's program A
        miss_rows = self._gather_miss_rows(outs["miss_ids"])
        t_copy = time.perf_counter() - t0
        self.state, metrics = self._fn_b(
            self.state, outs, miss_rows, self._put_lanes(dkeys),
        )
        losses.append(metrics["loss"])
        accs.append(metrics["acc"])
        overflows.append(metrics["exchange_overflow"])
        hits.append(outs["num_hit"])
        misses.append(outs["num_miss"])
        if "sanity" in metrics:
            sanities.append(metrics["sanity"])
        if self.profiler._log_node_access:
            # node-access analytics (XGNN_LOG_NODE_ACCESS): per-chip valid
            # input prefixes, host-pulled — opt-in analysis mode only
            # (shard_map concatenates per-chip lanes along dim 0)
            ids = _to_host(outs["input_nodes"]).reshape(
                self.config.num_worker, -1
            )
            nin = _to_host(outs["num_input"]).reshape(-1)
            for w in range(ids.shape[0]):
                self.profiler.log_node_access(ids[w, : int(nin[w])])
        return t_copy

    def _put_batch(self, arr):
        """Place a per-chip-leading host array: 1-axis sharding, or
        (group, chip) sharding on a hierarchical mesh."""
        from jax.sharding import PartitionSpec as PS

        if self.num_groups > 1:
            arr = np.asarray(arr).reshape(
                (self.num_groups, self.num_parts) + arr.shape[1:]
            )
            return put_sharded(arr, self.mesh, spec=PS(DCN_AXIS, DATA_AXIS))
        return put_sharded(arr, self.mesh)

    def _put_lanes(self, arr):
        """Place an ``(L, ...)`` per-chip-lane host array (group-major lane
        order when hierarchical): one leading dim over ALL chips."""
        from jax.sharding import PartitionSpec as PS

        if self.num_groups > 1:
            return put_sharded(
                arr, self.mesh, spec=PS((DCN_AXIS, DATA_AXIS))
            )
        return put_sharded(arr, self.mesh)

    def _put_steps(self, arr):
        """Place a (steps, chips, ...) host array so each scan slice lands
        pre-sharded like ``_put_batch``'s output."""
        from jax.sharding import PartitionSpec as PS

        arr = np.asarray(arr)
        if self.num_groups > 1:
            arr = arr.reshape(
                (arr.shape[0], self.num_groups, self.num_parts)
                + arr.shape[2:]
            )
            return put_sharded(
                arr, self.mesh, spec=PS(None, DCN_AXIS, DATA_AXIS)
            )
        return put_sharded(arr, self.mesh, spec=PS(None, DATA_AXIS))

    def _train_epoch_fused(self, epoch, iters, num_steps, base_key):
        """The ``device_loop`` epoch on the fused all-HBM path: one scanned
        SPMD program, zero per-step host dispatches.  Key folding matches
        the host loop exactly, so metrics are numerically identical."""
        cfg = self.config
        p = cfg.num_worker
        S = num_steps
        seeds_np = np.full((S, p, self.capacities[0]), EMPTY, C.ID_DTYPE)
        nums_np = np.zeros((S, p), np.int32)
        keys_np, dkeys_np = [], []
        for s in range(S):
            seeds_np[s], nums_np[s] = self._seed_shards(iters, p)
            step_key = jax.random.fold_in(base_key, s)
            keys_np.append(
                np.asarray(jax.random.key_data(jax.random.split(step_key, p)))
            )
            dkeys_np.append(
                np.asarray(jax.random.key_data(
                    jax.random.split(jax.random.fold_in(step_key, 1 << 20), p)
                ))
            )
        if self._mc_epoch_program is None or self._mc_epoch_steps != S:
            self._mc_epoch_program = _make_mc_fused_epoch(
                self.step_fn, with_sanity=cfg.sanity_check
            )
            self._mc_epoch_steps = S
        t0 = time.perf_counter()
        self.state, ys = self._mc_epoch_program(
            self.state, self.topo, self.feat_parts, self.lab_parts,
            self._put_steps(seeds_np), self._put_steps(nums_np),
            self._put_steps(np.stack(keys_np)),
            self._put_steps(np.stack(dkeys_np)),
        )
        stats = _to_host(jnp.stack(ys))  # one pull; forces completion
        dt = time.perf_counter() - t0
        self.profiler.log_epoch_add(epoch, "epoch_time", dt)
        if cfg.sanity_check:
            smax = int(stats[3].max())
            if smax:
                from ..ops import sanity

                raise RuntimeError(
                    f"sanity check failed: {sanity.explain(smax)}"
                )
        over_flags = stats[2] > 0
        n_over = int(over_flags.sum())
        extra_losses, extra_accs = [], []
        if n_over:
            print(
                f"warning: {n_over} steps hit exchange/frontier capacity in "
                f"epoch {epoch}; growing capacities and replaying them"
            )
            records = [
                (seeds_np[s], nums_np[s], jax.random.fold_in(base_key, s))
                for s in range(S)
            ]
            self._replay_overflowed(
                records, over_flags, extra_losses, extra_accs
            )
            dt = time.perf_counter() - t0
        return {
            "epoch": epoch,
            "loss": _nanmean(np.concatenate([stats[0], extra_losses])),
            "train_acc": _nanmean(np.concatenate([stats[1], extra_accs])),
            "time": dt,
            "steps": S,
            "hit_rate": 1.0,
            "contributed_steps": int(np.isfinite(stats[0]).sum())
            + len(extra_losses),
        }

    def train_epoch(self, epoch: int) -> dict:
        cfg = self.config
        p = cfg.num_worker
        shufflers = [
            Shuffler(
                np.asarray(self.ds.train_set), cfg.batch_size,
                num_worker=p, worker_id=w, seed=cfg.seed + 1,
            )
            for w in range(p)
        ]
        iters = [s.epoch_batches(epoch) for s in shufflers]
        num_steps = max(s.num_local_step for s in shufflers)
        base_key = jax.random.fold_in(jax.random.key(cfg.seed ^ 0xD1), epoch)

        if (
            cfg.device_loop
            and not self.two_phase
            and not self.profiler._log_node_access
        ):
            # node-access logging needs per-step host pulls, which the
            # scanned epoch has none of — fall back to the host loop
            return self._train_epoch_fused(epoch, iters, num_steps, base_key)

        losses, accs, overflows = [], [], []
        hits, misses, sanities = [], [], []
        records = []  # (seeds, nums, step_key) per step — the replay source
        t_epoch = time.perf_counter()
        t_prev = t_epoch
        copy_time = 0.0

        if self.two_phase:
            pending = None
            for step in range(num_steps):
                seeds, nums = self._seed_shards(iters, p)
                step_key = jax.random.fold_in(base_key, step)
                records.append((seeds, nums, step_key))
                keys = jax.random.key_data(jax.random.split(step_key, p))
                dkeys = jax.random.key_data(
                    jax.random.split(jax.random.fold_in(step_key, 1 << 20), p)
                )
                if cfg.dump_trace:
                    self.profiler.trace_begin(epoch, step, "sample")
                outs = self._fn_a(
                    self.topo, self.posmap, self.cache_parts, self.lab_parts,
                    self._put_batch(seeds),
                    self._put_batch(nums),
                    self._put_batch(np.asarray(keys)),
                )
                if cfg.dump_trace:
                    self.profiler.trace_end(epoch, step, "sample")
                    self.profiler.trace_begin(epoch, step, "train")
                if pending is not None and cfg.pipeline:
                    copy_time += self._finish_step(
                        pending, losses, accs, overflows, hits, misses,
                        sanities,
                    )
                    pending = None
                if cfg.pipeline:
                    pending = (outs, dkeys)
                else:
                    copy_time += self._finish_step(
                        (outs, dkeys), losses, accs, overflows, hits, misses,
                        sanities,
                    )
                now = time.perf_counter()
                if cfg.dump_trace:
                    self.profiler.trace_end(epoch, step, "train")
                self.profiler.log_step(
                    epoch, step, P.L1_TRAIN_TIME, now - t_prev
                )
                t_prev = now
            if pending is not None:
                copy_time += self._finish_step(
                    pending, losses, accs, overflows, hits, misses, sanities
                )
        else:
            for step in range(num_steps):
                seeds, nums = self._seed_shards(iters, p)
                step_key = jax.random.fold_in(base_key, step)
                records.append((seeds, nums, step_key))
                keys = jax.random.key_data(jax.random.split(step_key, p))
                dkeys = jax.random.key_data(
                    jax.random.split(jax.random.fold_in(step_key, 1 << 20), p)
                )
                if cfg.dump_trace:
                    self.profiler.trace_begin(epoch, step, "train")
                outs = self.step_fn(
                    self.state,
                    self.topo,
                    self.feat_parts,
                    self.lab_parts,
                    self._put_batch(seeds),
                    self._put_batch(nums),
                    self._put_batch(keys),
                    self._put_batch(dkeys),
                )
                if getattr(self, "_emit_access", False):
                    self.state, metrics, access = outs
                    ids = np.asarray(access["input_nodes"]).reshape(p, -1)
                    nin = np.asarray(access["num_input"]).reshape(p)
                    for w in range(p):
                        self.profiler.log_node_access(ids[w, : int(nin[w])])
                else:
                    self.state, metrics = outs
                losses.append(metrics["loss"])
                accs.append(metrics["acc"])
                overflows.append(metrics["exchange_overflow"])
                if "sanity" in metrics:
                    sanities.append(metrics["sanity"])
                if cfg.dump_trace:
                    jax.block_until_ready(metrics["loss"])
                    self.profiler.trace_end(epoch, step, "train")
                now = time.perf_counter()
                # the whole sample+extract+train pipeline is one fused SPMD
                # program here; its wall time is logged as train time
                self.profiler.log_step(
                    epoch, step, P.L1_TRAIN_TIME, now - t_prev
                )
                t_prev = now

        # ONE device->host pull for the whole epoch's metrics
        stat_list = [
            jnp.stack(losses), jnp.stack(accs),
            jnp.stack(overflows).astype(jnp.float32),
        ]
        if hits:
            stat_list.append(jnp.stack(hits).sum(axis=1).astype(jnp.float32))
            stat_list.append(
                jnp.stack(misses).sum(axis=1).astype(jnp.float32)
            )
        stats = np.asarray(jnp.stack([s.astype(jnp.float32) for s in stat_list[:3]]))
        hit_rate = 1.0
        if hits:
            # hit/miss counters are lane-sharded before the sum — pull via
            # the multi-controller-safe path
            hm = _to_host(jnp.stack(stat_list[3:]))
            total = hm.sum(axis=1)
            hit_rate = float(total[0] / max(total[0] + total[1], 1.0))
            self.profiler.log_step(epoch, 0, P.L2_CACHE_HIT_RATE, hit_rate)
            self.profiler.log_epoch_add(epoch, "copy_time", copy_time)
        dt = time.perf_counter() - t_epoch
        self.profiler.log_epoch_add(epoch, "epoch_time", dt)
        if sanities:
            smax = int(np.asarray(jnp.stack(sanities)).max())
            if smax:
                from ..ops import sanity

                raise RuntimeError(
                    f"sanity check failed: {sanity.explain(smax)}"
                )
        over_flags = stats[2] > 0
        n_over = int(over_flags.sum())
        extra_losses, extra_accs = [], []
        if n_over:
            print(
                f"warning: {n_over} steps hit exchange/frontier capacity in "
                f"epoch {epoch}; growing capacities and replaying them"
            )
            self._replay_overflowed(
                records, over_flags, extra_losses, extra_accs
            )
            dt = time.perf_counter() - t_epoch
        refresh_gate = (
            cfg.barriered_epoch in (-1, 0) or epoch == cfg.barriered_epoch
        )  # reference cuda_loops_arch4.cc:203
        if (
            self.two_phase
            and cfg.cache_policy == CachePolicy.DYNAMIC
            and refresh_gate
            and epoch + 1 < cfg.num_epoch
        ):
            self._dynamic_refresh(epoch + 1)
        return {
            "epoch": epoch,
            "loss": _nanmean(np.concatenate([stats[0], extra_losses])),
            "train_acc": _nanmean(np.concatenate([stats[1], extra_accs])),
            "time": dt,
            "steps": num_steps,
            "hit_rate": hit_rate,
            "contributed_steps": int(np.isfinite(stats[0]).sum())
            + len(extra_losses),
        }

    def _grow_capacities(self):
        """Overflow response: scale every static capacity and rebuild the
        step programs (the single-chip Sampler.grow analog)."""
        self.capacities = [self.capacities[0]] + [
            _align_up(int(c * 2), self.ds.num_node)
            for c in self.capacities[1:]
        ]
        self.seg_cap *= 2
        self.miss_cap *= 2
        if self.cold_cap:
            self.cold_cap *= 2
        self._build_step_fns()
        self._mc_epoch_program = None  # scan wraps the rebuilt step

    def _run_one_step(self, seeds, nums, step_key):
        """Run ONE training step outside the pipelined loop (the replay
        path).  Key derivation matches the epoch loops exactly, so a
        replayed step consumes the same randomness its skipped original
        would have."""
        cfg = self.config
        p = cfg.num_worker
        keys = np.asarray(jax.random.key_data(jax.random.split(step_key, p)))
        dkeys = np.asarray(
            jax.random.key_data(
                jax.random.split(jax.random.fold_in(step_key, 1 << 20), p)
            )
        )
        if self.two_phase:
            outs = self._fn_a(
                self.topo, self.posmap, self.cache_parts, self.lab_parts,
                self._put_batch(seeds), self._put_batch(nums),
                self._put_batch(keys),
            )
            miss_rows = self._gather_miss_rows(outs["miss_ids"])
            self.state, metrics = self._fn_b(
                self.state, outs, miss_rows, self._put_lanes(dkeys)
            )
        else:
            outs = self.step_fn(
                self.state, self.topo, self.feat_parts, self.lab_parts,
                self._put_batch(seeds), self._put_batch(nums),
                self._put_batch(keys), self._put_batch(dkeys),
            )
            if getattr(self, "_emit_access", False):
                self.state, metrics, _ = outs
            else:
                self.state, metrics = outs
        # metrics are replicated scalars — addressable on every controller
        loss = float(np.asarray(metrics["loss"]))
        acc = float(np.asarray(metrics["acc"]))
        of = bool(np.asarray(metrics["exchange_overflow"]))
        return loss, acc, of

    _MAX_GROWTHS = 4

    def _replay_overflowed(self, records, flags, losses_out, accs_out):
        """Re-run every overflowed step with its original seeds and keys
        after growing capacities — no batch is ever dropped (the reference
        allocates per task and never skips, ``dist/dist_loops.cc:130-136``;
        with static shapes the equivalent guarantee is replay-after-growth).
        Overflowed steps skipped their update on device, so each batch
        contributes exactly one update."""
        todo = [records[i] for i in np.nonzero(flags)[0]]
        attempts = 0
        while todo and attempts < self._MAX_GROWTHS:
            attempts += 1
            self._grow_capacities()
            print(
                f"replaying {len(todo)} overflowed steps at grown "
                f"capacities {self.capacities}"
            )
            still = []
            for seeds, nums, step_key in todo:
                loss, acc, of = self._run_one_step(seeds, nums, step_key)
                if of:
                    still.append((seeds, nums, step_key))
                else:
                    losses_out.append(loss)
                    accs_out.append(acc)
            todo = still
        if todo:
            raise RuntimeError(
                f"{len(todo)} steps still overflow after {attempts} "
                f"capacity growths (capacities {self.capacities})"
            )

    def _transient_eval_fns(self, scale: int) -> dict:
        """Grown-capacity EVAL programs that leave the training programs,
        ``self.capacities`` and every exchange cap untouched (VERDICT r3
        weak #6): an eval-set outlier frontier must not reshape or recompile
        the training path mid-run.  The returned dict is consumed only by
        ``evaluate``'s retry loop and dropped afterwards."""
        cfg = self.config
        caps = [self.capacities[0]] + [
            _align_up(int(c * scale), self.ds.num_node)
            for c in self.capacities[1:]
        ]
        seg = self.seg_cap * scale
        cold = self.cold_cap * scale if self.cold_cap else 0
        tier = dict(
            num_cache_node=self.num_cache_node,
            host_sampler=self.host_sampler, cold_cap=cold,
        )
        if self.two_phase:
            miss = self.miss_cap * scale
            fn_a = make_sample_split_step(
                cfg, self.mesh, caps, seg, miss,
                use_dist_graph=cfg.use_dist_graph,
                partitioned_cache=cfg.part_cache,
                dcn_axis=self._dcn, **tier,
            )
            return {"fn_a": fn_a, "miss_cap": miss}
        fn_eval = make_fused_eval_step(
            self.model, cfg, self.mesh, caps, seg,
            use_dist_graph=cfg.use_dist_graph,
            dcn_axis=DCN_AXIS if self.num_groups > 1 else None,
        )
        return {"fn_eval": fn_eval}

    # ------------------------------------------------------------- evaluate
    def evaluate(self, split: str = "valid", max_batches=None) -> float:
        """Mesh-wide evaluation over the valid/test split (reference
        DistEngine evaluation path — works in both execution shapes)."""
        nodes = (
            self.ds.valid_set if split == "valid" else self.ds.test_set
        )
        if len(nodes) == 0:
            return float("nan")
        p = self.config.num_worker
        shufflers = [
            Shuffler(
                np.asarray(nodes), self.config.batch_size,
                num_worker=p, worker_id=w, seed=0,
            )
            for w in range(p)
        ]
        iters = [s.epoch_batches(0) for s in shufflers]
        num_steps = max(s.num_local_step for s in shufflers)
        if max_batches is not None:
            num_steps = min(num_steps, max_batches)
        correct = total = 0.0
        params = self.state.params

        def eval_one(seeds, nums, step, fns=None):
            keys = np.asarray(jax.random.key_data(
                jax.random.split(
                    jax.random.fold_in(jax.random.key(123), step), p
                )
            ))
            if self.two_phase:
                fn_a = fns["fn_a"] if fns else self._fn_a
                outs = fn_a(
                    self.topo, self.posmap, self.cache_parts, self.lab_parts,
                    self._put_batch(seeds),
                    self._put_batch(nums),
                    self._put_batch(keys),
                )
                miss_rows = self._gather_miss_rows(
                    outs["miss_ids"], fns["miss_cap"] if fns else None
                )
                c, t, of = self._fn_eval(params, outs, miss_rows)
            else:
                fn_eval = fns["fn_eval"] if fns else self._fn_eval
                c, t, of = fn_eval(
                    params, self.topo, self.feat_parts, self.lab_parts,
                    self._put_batch(seeds),
                    self._put_batch(nums),
                    self._put_batch(keys),
                )
            return float(c), float(t), bool(np.asarray(of).max())

        retry = []
        issued = 0
        for step in range(num_steps):
            seeds, nums = self._seed_shards(iters, p)
            issued += int(np.sum(nums))
            c, t, of = eval_one(seeds, nums, step)
            if of:
                # the step's counts are zeroed on device — re-run it below
                # with grown capacities so every node is counted once
                retry.append((seeds, nums, step))
                continue
            correct += c
            total += t
        attempts = 0
        while retry and attempts < self._MAX_GROWTHS:
            attempts += 1
            print(
                f"re-running {len(retry)} overflowed eval batches through a "
                f"transient {2 ** attempts}x-capacity eval program"
            )
            # TRANSIENT eval-only growth: the training programs, capacities
            # and exchange caps are untouched (an eval outlier must not
            # recompile or reshape the training path)
            fns = self._transient_eval_fns(2 ** attempts)
            still = []
            for seeds, nums, step in retry:
                c, t, of = eval_one(seeds, nums, step, fns)
                if of:
                    still.append((seeds, nums, step))
                else:
                    correct += c
                    total += t
            retry = still
        if retry:
            raise RuntimeError(
                f"{len(retry)} eval batches still overflow after "
                f"{attempts} capacity growths"
            )
        # exact-count invariant: every issued seed counted exactly once
        assert int(total) == issued, (total, issued)
        self._last_eval_total = int(total)
        if total == 0.0:
            return float("nan")
        return correct / total

    # ------------------------------------------------------------------- run
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
                self.state = put_replicated(state, self.mesh)
                start_epoch = (extra or {}).get("epoch", -1) + 1
                print(f"resumed from checkpoint at epoch {start_epoch}")
        results = []
        for epoch in range(start_epoch, cfg.num_epoch):
            r = self.train_epoch(epoch)
            if cfg.report_acc and epoch % max(cfg.report_acc, 1) == 0:
                r["valid_acc"] = self.evaluate("valid")
            results.append(r)
            if ckpt and (epoch + 1) % cfg.checkpoint_every == 0:
                ckpt.save(
                    epoch, jax.tree.map(np.asarray, self.state),
                    extra={"epoch": epoch},
                )
        if ckpt:
            ckpt.close()
        if cfg.dump_trace:
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
                max(cfg.cache_percentage, 0.0), self.ds.num_node
            )
            print(f"test_result:optimal_cache_hit_rate={opt:.6f}")
        extra = {"final_train_acc": results[-1]["train_acc"] if results else 0.0}
        if results and "hit_rate" in results[-1]:
            extra["cache_hit_rate"] = results[-1]["hit_rate"]
        out = self.profiler.test_results(extra=extra)
        return {"epochs": results, "test_results": out}
