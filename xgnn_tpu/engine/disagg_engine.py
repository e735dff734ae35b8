"""Disaggregated engine: dedicated sampler chips feed trainer chips
(reference arch5 / FGNN mode, end to end).

The reference runs ``num_sample_worker`` sampler processes and
``num_train_worker`` trainer processes connected by a shared-memory task
queue (``dist_loops_arch5.cc``).  Here: sampler chips run the sampling jit,
batches ship to the trainer chip via async D2D ``device_put``, and the host
prefetch pipeline keeps both sides busy.  One trainer chip per engine
instance (multi-trainer data parallelism is the collocated engine's job).
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
from ..parallel.disaggregated import DisaggregatedSampler
from ..store.feature_store import HBMFeatureSource, LabelSource
from ..train import init_state, make_train_step
from .pipeline import Prefetcher
from .shuffler import Shuffler


class DisaggregatedEngine:
    def __init__(self, dataset, config: RunConfig, devices=None):
        self.ds = dataset
        self.config = config
        devices = devices or jax.devices()
        need = config.num_sample_worker + config.num_train_worker
        assert len(devices) >= need, (
            f"need {need} chips ({config.num_sample_worker} samplers + "
            f"{config.num_train_worker} trainers), have {len(devices)}"
        )
        assert config.num_train_worker == 1, (
            "disaggregated engine drives one trainer chip; use the "
            "collocated engine for data-parallel training"
        )
        self.sample_devices = devices[: config.num_sample_worker]
        self.train_device = devices[config.num_sample_worker]
        self.profiler = P.Profiler(profile_level=config.profile_level)

    def init(self):
        cfg = self.config
        t0 = time.perf_counter()
        self.svc = DisaggregatedSampler(
            self.ds, cfg, self.sample_devices, cfg.frontier_capacities
        )
        self.feature_source = HBMFeatureSource(self.ds.feat, self.train_device)
        self.label_source = LabelSource(self.ds.label, self.train_device)
        self.profiler.log_init("sample_init_time", time.perf_counter() - t0)

        t0 = time.perf_counter()
        self.model = build_model(cfg, self.ds.feat_dim, self.ds.num_class)
        seeds = np.full(self.svc.capacities[0], C.EMPTY_KEY, C.ID_DTYPE)
        take = min(len(self.ds.train_set), cfg.batch_size)
        seeds[:take] = np.asarray(self.ds.train_set[:take])
        b0 = self.svc.sample_to(seeds, take, jax.random.key(0), self.train_device)
        x, _ = self.feature_source.extract(b0.input_nodes, b0.num_input)
        self.state = init_state(self.model, cfg, b0.blocks, x, jax.random.key(cfg.seed))
        self._train_step = make_train_step(self.model, cfg)
        self.profiler.log_init("train_init_time", time.perf_counter() - t0)
        return self

    def _produce(self, item):
        (seeds, n), key = item
        t0 = time.perf_counter()
        batch = self.svc.sample_to(seeds, n, key, self.train_device)
        t1 = time.perf_counter()
        x, info = self.feature_source.extract(batch.input_nodes, batch.num_input)
        labels = self.label_source.extract(batch.output_nodes, batch.num_output)
        t2 = time.perf_counter()
        return batch, x, labels, info, (t1 - t0, t2 - t1)

    def train_epoch(self, epoch: int) -> dict:
        cfg = self.config
        shuffler = Shuffler(
            np.asarray(self.ds.train_set), cfg.batch_size, seed=cfg.seed + 1
        )
        base = jax.random.fold_in(jax.random.key(cfg.seed ^ 0xA5), epoch)

        def work():
            for step, item in enumerate(shuffler.epoch_batches(epoch)):
                yield item, jax.random.fold_in(base, step)

        stream = (
            Prefetcher(work(), self._produce, depth=cfg.prefetch_depth)
            if cfg.pipeline
            else map(self._produce, work())
        )
        losses, accs = [], []
        t_epoch = time.perf_counter()
        for step, (batch, x, labels, info, (ts, te)) in enumerate(stream):
            self.state, metrics = self._train_step(
                self.state, batch.blocks, x, labels, batch.num_output,
                jax.random.fold_in(base, (1 << 20) + step), batch.overflow,
            )
            self.profiler.log_step(epoch, step, P.L1_SAMPLE_TIME, ts)
            self.profiler.log_step(epoch, step, P.L1_COPY_TIME, te)
            losses.append(metrics["loss"])
            accs.append(metrics["acc"])
        stats = (
            np.asarray(jnp.stack([jnp.stack(losses), jnp.stack(accs)]))
            if losses
            else np.full((2, 1), np.nan)
        )
        dt = time.perf_counter() - t_epoch
        return {
            "epoch": epoch,
            "loss": float(np.nanmean(stats[0])),
            "train_acc": float(np.nanmean(stats[1])),
            "time": dt,
        }

    def run(self) -> dict:
        self.init()
        results = [self.train_epoch(e) for e in range(self.config.num_epoch)]
        out = self.profiler.test_results(
            extra={"final_train_acc": results[-1]["train_acc"] if results else 0.0}
        )
        return {"epochs": results, "test_results": out}
