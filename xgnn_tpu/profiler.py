"""Profiler: step/epoch/init metric store, trace events, stdout contract.

Mirror of the reference ``Profiler`` (``samgraph/common/profiler.h:188-243``,
``profiler.cc``): three metric tiers (init / per-step / per-epoch), warm-up
epoch excluded from averages (profiler.cc:302-327), Chrome trace-event JSON
dumps with one tid per pipeline stage (profiler.cc:349-380), and the
``test_result:key=value`` stdout protocol consumed by the evaluation harness
(``evaluation/*/parse_res.py``).
"""

from __future__ import annotations

import collections
import json
import time
from typing import Optional


# canonical step items (reference profiler.h LogStepItem taxonomy)
L1_SAMPLE_TIME = "sample_time"
L1_COPY_TIME = "copy_time"
L1_CONVERT_TIME = "convert_time"
L1_TRAIN_TIME = "train_time"
L1_FEATURE_BYTES = "feature_bytes"
L1_LABEL_BYTES = "label_bytes"
L1_GRAPH_BYTES = "graph_bytes"
L1_MISS_BYTES = "miss_bytes"
L1_NUM_NODE = "num_nodes"
L1_NUM_SAMPLE = "num_samples"
L2_CACHE_HIT_RATE = "cache_hit_rate"
L2_SHUFFLE_TIME = "shuffle_time"
L2_CORE_SAMPLE_TIME = "core_sample_time"
L2_ID_REMAP_TIME = "id_remap_time"
L2_EXTRACT_TIME = "extract_time"
L3_OVERFLOW_RETRY = "overflow_retries"

_STAGE_TIDS = {"sample": 1, "copy": 2, "convert": 3, "train": 4}


class Profiler:
    def __init__(self, num_step_per_epoch: int = 0, profile_level: int = 0):
        self.profile_level = profile_level
        self.num_step_per_epoch = num_step_per_epoch
        self._step_items = collections.defaultdict(dict)  # key -> {item: val}
        self._epoch_items = collections.defaultdict(
            lambda: collections.defaultdict(float)
        )
        self._init_items = {}
        self._trace = []
        self._node_access = collections.Counter()
        self._log_node_access = False

    # --- step/epoch/init logging (reference Profiler::LogStep etc.) -------
    def log_step(self, epoch: int, step: int, item: str, value: float):
        self._step_items[(epoch, step)][item] = value

    def log_step_add(self, epoch: int, step: int, item: str, value: float):
        cur = self._step_items[(epoch, step)].get(item, 0.0)
        self._step_items[(epoch, step)][item] = cur + value

    def log_epoch_add(self, epoch: int, item: str, value: float):
        self._epoch_items[epoch][item] += value

    def log_init(self, item: str, value: float):
        self._init_items[item] = value

    # --- node-access analytics (reference Profiler::LogNodeAccess) --------
    def enable_node_access_log(self):
        self._log_node_access = True

    def log_node_access(self, node_ids):
        if self._log_node_access:
            self._node_access.update(node_ids.tolist())

    def node_access_frequency(self):
        return self._node_access.most_common()

    def dump_node_access(self, path: str):
        """Write per-node access frequencies, hottest first (reference
        node-access analytics files, profiler.cc:659-795)."""
        with open(path, "w") as f:
            for node, count in self._node_access.most_common():
                f.write(f"{node}\t{count}\n")

    # --- trace events (reference TraceItem + DumpTrace) -------------------
    def trace_begin(self, epoch: int, step: int, stage: str):
        self._trace.append((stage, epoch, step, "B", time.perf_counter_ns() // 1000))

    def trace_end(self, epoch: int, step: int, stage: str):
        self._trace.append((stage, epoch, step, "E", time.perf_counter_ns() // 1000))

    def dump_trace(self, path: str):
        """Chrome trace-event JSON, one tid per pipeline stage
        (reference profiler.cc:349-380)."""
        events = [
            {
                "name": f"{stage} e{epoch}s{step}",
                "ph": ph,
                "ts": ts,
                "pid": 0,
                "tid": _STAGE_TIDS.get(stage, 9),
            }
            for stage, epoch, step, ph, ts in self._trace
        ]
        with open(path, "w") as f:
            json.dump({"traceEvents": events}, f)

    # --- reports ----------------------------------------------------------
    def _steps_after_warmup(self, item: str):
        vals = [
            v[item]
            for (epoch, _), v in self._step_items.items()
            if epoch > 0 and item in v
        ]
        return vals

    def step_average(self, item: str) -> Optional[float]:
        """Average excluding epoch 0 (warm-up skip, profiler.cc:302-327)."""
        vals = self._steps_after_warmup(item)
        return sum(vals) / len(vals) if vals else None

    def step_sum_per_epoch(self, item: str) -> Optional[float]:
        vals = self._steps_after_warmup(item)
        if not vals:
            return None
        epochs = {e for (e, _) in self._step_items.keys() if e > 0}
        return sum(vals) / max(len(epochs), 1)

    def epoch_average(self, item: str) -> Optional[float]:
        vals = [v[item] for e, v in self._epoch_items.items() if e > 0 and item in v]
        return sum(vals) / len(vals) if vals else None

    def report_step_average(self, epoch: int, step: int):
        items = {
            k: self.step_average(k)
            for k in (L1_SAMPLE_TIME, L1_COPY_TIME, L1_CONVERT_TIME, L1_TRAIN_TIME)
        }
        parts = " | ".join(
            f"{k} {v:.6f}" for k, v in items.items() if v is not None
        )
        print(f"[Step(average) Profiler Level 1 E{epoch} S{step}] {parts}")

    def report_init(self):
        for k, v in sorted(self._init_items.items()):
            print(f"[Init Profiler] {k}={v:.6f}")

    def test_results(self, extra: Optional[dict] = None) -> dict:
        """Emit the ``test_result:`` stdout protocol
        (reference train_gcn.py:316-347)."""
        out = {}
        for item, name in (
            (L1_SAMPLE_TIME, "epoch_time:sample_total"),
            (L1_COPY_TIME, "epoch_time:copy_time"),
            (L1_TRAIN_TIME, "epoch_time:train_total"),
            (L1_CONVERT_TIME, "epoch_time:convert_time"),
        ):
            v = self.step_sum_per_epoch(item)
            if v is not None:
                out[name] = v
        hit = self.step_average(L2_CACHE_HIT_RATE)
        if hit is not None:
            out["cache_hit_rate"] = hit
        nodes = self.step_sum_per_epoch(L1_NUM_NODE)
        if nodes is not None:
            out["epoch:sample_nodes"] = nodes
        times = [
            out.get(k, 0.0)
            for k in ("epoch_time:sample_total", "epoch_time:copy_time", "epoch_time:train_total")
        ]
        out["epoch_time:total"] = sum(times)
        if extra:
            out.update(extra)
        for k, v in out.items():
            if isinstance(v, float):
                print(f"test_result:{k}={v:.6f}")
            else:
                print(f"test_result:{k}={v}")
        return out
