"""Profiler: warm-up exclusion, test_result protocol, traces, node access."""

import json

import numpy as np

from xgnn_tpu import profiler as P


def test_step_average_excludes_warmup():
    p = P.Profiler()
    # epoch 0 (warm-up) has huge values that must not pollute averages
    p.log_step(0, 0, P.L1_SAMPLE_TIME, 100.0)
    p.log_step(1, 0, P.L1_SAMPLE_TIME, 1.0)
    p.log_step(1, 1, P.L1_SAMPLE_TIME, 3.0)
    p.log_step(2, 0, P.L1_SAMPLE_TIME, 2.0)
    assert p.step_average(P.L1_SAMPLE_TIME) == 2.0


def test_test_results_protocol(capsys):
    p = P.Profiler()
    for e in range(2):
        for s in range(3):
            p.log_step(e, s, P.L1_SAMPLE_TIME, 1.0)
            p.log_step(e, s, P.L1_TRAIN_TIME, 2.0)
            p.log_step(e, s, P.L2_CACHE_HIT_RATE, 0.5)
    out = p.test_results()
    captured = capsys.readouterr().out
    assert "test_result:epoch_time:sample_total=3.000000" in captured
    assert "test_result:cache_hit_rate=0.500000" in captured
    assert out["epoch_time:train_total"] == 6.0


def test_trace_dump(tmp_path):
    p = P.Profiler()
    p.trace_begin(0, 0, "sample")
    p.trace_end(0, 0, "sample")
    p.trace_begin(0, 0, "train")
    p.trace_end(0, 0, "train")
    path = str(tmp_path / "trace.json")
    p.dump_trace(path)
    trace = json.load(open(path))
    events = trace["traceEvents"]
    assert len(events) == 4
    assert {e["ph"] for e in events} == {"B", "E"}
    assert {e["tid"] for e in events} == {1, 4}  # sample=1, train=4


def test_node_access(tmp_path):
    p = P.Profiler()
    p.enable_node_access_log()
    p.log_node_access(np.array([1, 2, 2, 3, 3, 3]))
    freq = p.node_access_frequency()
    assert freq[0] == (3, 3)
    path = str(tmp_path / "freq.tsv")
    deg = np.array([0, 5, 7, 9])
    p.dump_node_access(path, in_degrees=deg, out_degrees=deg)
    lines = open(path).read().strip().split("\n")
    # reference layout: node access in_deg out_deg (profiler.cc:754-759)
    assert lines[0] == "3 3 9 9"


def test_node_access_analytics(tmp_path):
    """Frequency curve (optimal-cache-hit), similarity, memory accounting."""
    p = P.Profiler()
    p.enable_node_access_log()
    p.log_node_access(np.array([1, 2, 3, 4]))      # step 0
    p.log_node_access(np.array([2, 3, 4, 5]))      # step 1: overlap 3/4
    path = str(tmp_path / "freq.txt")
    p.dump_node_access_frequency(path, num_node=10)
    rows = [l.split() for l in open(path).read().strip().split("\n")]
    # freq 2 covers nodes {2,3,4}: count 3, access 6 of 8 total
    assert rows[0][0] == "2" and rows[0][1] == "3"
    assert abs(float(rows[-1][6]) - 1.0) < 1e-6  # access prefix ends at 1

    # optimal hit caching the 3 hottest of 10 nodes = 6/8
    assert abs(p.optimal_cache_hit_rate(0.3, 10) - 6 / 8) < 1e-6

    spath = str(tmp_path / "sim.txt")
    p.dump_node_access_similarity(spath)
    lines = open(spath).read().strip().split("\n")
    assert lines[1] == "1 4 3 0.750000"

    p.log_mem_usage("test_phase")  # works on any backend (0 on CPU)
    assert "mem:test_phase:bytes_in_use" in p._init_items
