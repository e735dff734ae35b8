"""Two-process multi-host smoke test (CPU backend, gloo collectives).

Validates the multi-controller path: global mesh over 2 processes x 2
devices, process-local sharded array construction, and a psum through the
collocated building blocks.  Skipped cleanly if the CPU distributed runtime
is unavailable.
"""

import os
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1])
jax.distributed.initialize("localhost:29731", num_processes=2, process_id=pid)
import numpy as np
import jax.numpy as jnp
from xgnn_tpu.parallel.multihost import global_mesh, put_sharded_global
from jax.sharding import PartitionSpec as PS
from jax import shard_map

assert jax.process_count() == 2
assert jax.device_count() == 4
mesh = global_mesh()

arr = np.arange(4 * 3, dtype=np.float32).reshape(4, 3)
g = put_sharded_global(arr, mesh)

def f(x):
    s = jax.lax.psum(jnp.sum(x), "data")
    return x * 0 + s

out = jax.jit(
    shard_map(f, mesh=mesh, in_specs=PS("data"), out_specs=PS("data"))
)(g)
local = np.asarray([np.asarray(s.data) for s in out.addressable_shards])
expected = arr.sum()
assert np.all(local == expected), (local, expected)
print(f"proc {pid} OK psum={float(local.ravel()[0])}")
"""


def test_two_process_mesh(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=90)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.skip("distributed CPU runtime timed out in this environment")
        outs.append((p.returncode, out))
    for rc, out in outs:
        if rc != 0 and ("UNIMPLEMENTED" in out or "not available" in out):
            pytest.skip(f"distributed CPU collectives unavailable: {out[-200:]}")
        assert rc == 0, out
        assert "OK psum=66.0" in out


ENGINE_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1])
jax.distributed.initialize("localhost:29741", num_processes=2, process_id=pid)
import numpy as np
from xgnn_tpu import RunConfig, synthetic
from xgnn_tpu.engine.multi_engine import MultiChipEngine

ds = synthetic.make_synthetic_dataset(
    num_node=2000, avg_degree=6, feat_dim=16, num_class=4, seed=3,
    train_frac=0.3,
)
config = RunConfig(
    batch_size=64, fanout=(4, 3), num_layer=2, num_hidden=16,
    model="graphsage", sample_type="khop3", num_worker=4,
    use_dist_graph=True, part_cache=True, num_epoch=1, lr=0.01,
    root_path="/tmp",
)
eng = MultiChipEngine(ds, config).init()
r = eng.train_epoch(0)
assert np.isfinite(r["loss"]), r
print(f"proc {pid} OK loss={r['loss']:.6f}")
"""


def test_two_process_engine(tmp_path):
    """Full collocated engine (dist-graph + part-cache + dp) across 2
    processes — the multi-host GGMS path end to end."""
    _run_two_process_engine(tmp_path, ENGINE_WORKER)


TWO_PHASE_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1])
jax.distributed.initialize("localhost:29751", num_processes=2, process_id=pid)
import numpy as np
from xgnn_tpu import RunConfig, synthetic
from xgnn_tpu.engine.multi_engine import MultiChipEngine

ds = synthetic.make_synthetic_dataset(
    num_node=2000, avg_degree=6, feat_dim=16, num_class=4, seed=3,
    train_frac=0.3,
)
config = RunConfig(
    batch_size=64, fanout=(4, 3), num_layer=2, num_hidden=16,
    model="graphsage", sample_type="khop3", num_worker=4,
    use_dist_graph=True, dist_graph_percentage=0.7,
    part_cache=True, cache_percentage=0.3, cache_policy="pre_sample",
    presample_epoch=1, pipeline=True, num_epoch=1, lr=0.01,
    root_path="/tmp",
)
eng = MultiChipEngine(ds, config).init()
assert eng.two_phase
r = eng.train_epoch(0)
assert np.isfinite(r["loss"]), r
assert 0.05 < r["hit_rate"] < 0.999, r
acc = eng.evaluate("valid", max_batches=2)
assert np.isfinite(acc), acc
print(f"proc {pid} OK loss={r['loss']:.6f} hit={r['hit_rate']:.4f} acc={acc:.4f}")
"""


HIER_WORKER = TWO_PHASE_WORKER.replace(
    'localhost:29751', 'localhost:29761'
).replace(
    'part_cache=True, cache_percentage=0.3, cache_policy="pre_sample",',
    'part_cache=True, cache_percentage=0.3, cache_policy="pre_sample",\n'
    '    num_dcn_groups=2,',
).replace(
    "assert eng.two_phase",
    "assert eng.two_phase and eng.num_groups == 2 and eng.num_parts == 2",
)


def test_two_process_hierarchical_two_phase(tmp_path):
    """The deployment shape: 2 controllers x 2 devices with the DCN mesh
    axis ON the process boundary — GGMS shards span each process's local
    devices (ICI) and replicate across processes, while the two-phase miss
    pipeline and presample run per-controller.  Identical replicated loss
    and hit rate on both controllers."""
    _run_two_process_engine(tmp_path, HIER_WORKER, check_hit=True)


def test_two_process_two_phase_ggms(tmp_path):
    """The FULL two-phase GGMS under multi-controller execution (VERDICT
    round-2 item 2): partial partitioned cache + per-process host miss
    gathers (each controller serves only its addressable chips) + host
    topology cold tier + presample, across 2 processes.  Both controllers
    must report the identical replicated loss and hit rate."""
    _run_two_process_engine(tmp_path, TWO_PHASE_WORKER, check_hit=True)


def _run_two_process_engine(tmp_path, worker_src, check_hit=False):
    script = tmp_path / "engine_worker.py"
    script.write_text(worker_src)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=repo,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.skip("distributed CPU runtime timed out")
        outs.append((p.returncode, out))
    losses, hits = [], []
    for rc, out in outs:
        assert rc == 0, out
        for line in out.splitlines():
            if "OK loss=" in line:
                losses.append(float(line.split("loss=")[1].split()[0]))
                if "hit=" in line:
                    hits.append(float(line.split("hit=")[1].split()[0]))
    # both controllers must compute the identical replicated loss
    assert len(losses) == 2 and abs(losses[0] - losses[1]) < 1e-6, losses
    if check_hit:
        assert len(hits) == 2 and abs(hits[0] - hits[1]) < 1e-6, hits


STATIC_EXACT_WORKER = TWO_PHASE_WORKER.replace(
    'localhost:29751', 'localhost:29771'
).replace(
    'use_dist_graph=True, dist_graph_percentage=0.7,\n'
    '    part_cache=True, cache_percentage=0.3, cache_policy="pre_sample",',
    'use_dist_graph=True,\n'
    '    part_cache=True, cache_percentage=0.3, cache_policy="presample_static",',
)


def test_two_process_presample_static_exact(tmp_path):
    """The EXACT all-neighbor presample closure under multi-controller
    execution: the per-layer psum_scatter of owner partials crosses the
    process boundary (all-HBM store, so the engine picks
    make_presample_static_exact_step).  Identical replicated loss/hit on
    both controllers."""
    _run_two_process_engine(tmp_path, STATIC_EXACT_WORKER, check_hit=True)
