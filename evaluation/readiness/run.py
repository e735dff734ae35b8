"""Real-data readiness drill (round-5 verdict item 5).

The first run on a real dataset should not be the first time the full path
runs end-to-end at scale.  This drill generates an RMAT graph **in the
published OGB papers100M raw layout** (``raw/data.npz`` with ``edge_index``
(2, E) + ``node_feat``, ``raw/node-label.npz``, ``split/time/*.csv.gz`` —
the exact files `python -m datagen papers100M` consumes), then runs with
ZERO manual steps:

    raw npz  →  python -m datagen papers100M  →  examples/train.py
             →  examples/accuracy.py (full-graph inference on the ckpt)

and records a per-stage timing breakdown plus papers100M wall-time
extrapolations from the measured converter throughput (conversion is
O(E log E) lexsort + O(feat bytes) streaming copy).

The >=2^31-edge offset regime this pipeline must survive on friendster/
mag240m is covered by ``tests/test_big_offsets.py`` (sparse-file CSR through
load → tier/partition → sample) and the uint32-space assert in
``datagen.coo_to_csr``.

Usage: python evaluation/readiness/run.py [--nodes N] [--cpu] [--keep]
Appends to results.tsv.
"""

import argparse
import gzip
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

HERE = os.path.dirname(os.path.abspath(__file__))

# published papers100M scale (datagen/README.md:55-66)
P100M_NODES = 111_059_956
P100M_EDGES = 1_615_685_872
P100M_FEAT = 128


def make_raw(raw_root: str, num_node: int, avg_degree: int, feat_dim: int,
             num_class: int, seed: int = 0) -> dict:
    """Write an RMAT graph in the papers100M raw layout; returns timings."""
    import numpy as np

    from xgnn_tpu.synthetic import rmat_edges

    t = {}
    t0 = time.time()
    src, dst = rmat_edges(num_node, num_node * avg_degree, seed=seed)
    t["rmat_gen"] = time.time() - t0

    t0 = time.time()
    rng = np.random.default_rng(seed)
    feat = rng.standard_normal((num_node, feat_dim), dtype=np.float32)
    label = rng.integers(0, num_class, num_node).astype(np.float64)
    label[rng.random(num_node) < 0.4] = np.nan  # papers100M: NaN = unlabeled
    t["feat_gen"] = time.time() - t0

    t0 = time.time()
    os.makedirs(os.path.join(raw_root, "raw"), exist_ok=True)
    os.makedirs(os.path.join(raw_root, "split", "time"), exist_ok=True)
    # papers100M stores the citation graph transposed (converter swaps)
    np.savez(
        os.path.join(raw_root, "raw", "data.npz"),
        edge_index=np.stack([dst, src]).astype(np.int64),
        node_feat=feat,
    )
    np.savez(
        os.path.join(raw_root, "raw", "node-label.npz"), node_label=label
    )
    labeled = np.nonzero(~np.isnan(label))[0]
    rng.shuffle(labeled)
    n_tr = max(1, len(labeled) // 20)
    n_va = max(1, len(labeled) // 100)
    for name, ids in (
        ("train", labeled[:n_tr]),
        ("valid", labeled[n_tr : n_tr + n_va]),
        ("test", labeled[n_tr + n_va : n_tr + 2 * n_va]),
    ):
        with gzip.open(
            os.path.join(raw_root, "split", "time", f"{name}.csv.gz"), "wt"
        ) as f:
            f.write("\n".join(map(str, ids.tolist())))
    t["raw_write"] = time.time() - t0
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=1_000_000)
    ap.add_argument("--degree", type=int, default=15)
    ap.add_argument("--feat-dim", type=int, default=128)
    ap.add_argument("--num-class", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--batch-size", type=int, default=8000)
    ap.add_argument("--cpu", action="store_true",
                    help="train on CPU (smoke); default drives the chip")
    ap.add_argument("--workdir", default=None,
                    help="keep artifacts here instead of a temp dir")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(HERE))
    work = args.workdir or tempfile.mkdtemp(prefix="readiness_")
    raw_root = os.path.join(work, "papers_synth_raw")
    out_dir = os.path.join(work, "papers_synth")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(out_dir, exist_ok=True)
    timings = {}

    print(f"# workdir {work}", file=sys.stderr)
    t = make_raw(raw_root, args.nodes, args.degree, args.feat_dim,
                 args.num_class)
    timings.update(t)
    print(f"# raw layout written: {t}", file=sys.stderr)

    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    def step(name, cmd, timeout=3000):
        t0 = time.time()
        r = subprocess.run(
            cmd, cwd=repo, env=env, timeout=timeout,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        timings[name] = time.time() - t0
        sys.stderr.write(
            "\n".join("#   " + ln for ln in r.stdout.splitlines()[-6:])
            + "\n"
        )
        assert r.returncode == 0, f"{name} failed:\n{r.stdout[-4000:]}"
        return r.stdout

    step("convert", [
        sys.executable, "-m", "datagen", "papers100M", raw_root, out_dir,
    ])

    train_cmd = [
        sys.executable, "examples/train.py",
        "--root-path", work, "--dataset", "papers_synth",
        "--model", "graphsage", "--num-epoch", str(args.epochs),
        "--batch-size", str(args.batch_size), "--fanout", "15", "10", "5",
        "--num-hidden", "256", "--checkpoint-dir", ckpt,
    ]
    if args.cpu:
        train_cmd.insert(2, "--cpu")
    train_out = step("train", train_cmd)
    assert "test_result:" in train_out

    acc_cmd = [
        sys.executable, "examples/accuracy.py",
        "--root-path", work, "--dataset", "papers_synth",
        "--model", "graphsage", "--num-hidden", "256",
        "--checkpoint-dir", ckpt,
    ]
    if args.cpu:
        acc_cmd.append("--cpu")
    acc_out = step("accuracy", acc_cmd)
    assert "full_test_acc" in acc_out

    num_edge = args.nodes * args.degree  # pre-dedup draw count (approx)
    # converter throughput → papers100M extrapolation: lexsort+dedup+CSR is
    # the edge term, feat/label streaming the byte term
    conv_eps = num_edge / timings["convert"]
    p100m_conv = (
        P100M_EDGES / conv_eps
        + (P100M_NODES * P100M_FEAT * 4) / max(
            args.nodes * args.feat_dim * 4 / timings["convert"], 1.0
        )
    ) / 2
    out = os.path.join(HERE, "results.tsv")
    new = not os.path.isfile(out)
    with open(out, "a") as f:
        if new:
            f.write(
                "# nodes\tedges_drawn\tmode\trmat_s\traw_write_s\t"
                "convert_s\ttrain_s\taccuracy_s\tconvert_edges_per_s\t"
                "papers100M_convert_extrap_s\n"
            )
        f.write(
            f"{args.nodes}\t{num_edge}\t{'cpu' if args.cpu else 'tpu'}\t"
            f"{timings['rmat_gen']:.1f}\t{timings['raw_write']:.1f}\t"
            f"{timings['convert']:.1f}\t{timings['train']:.1f}\t"
            f"{timings['accuracy']:.1f}\t{conv_eps:.0f}\t{p100m_conv:.0f}\n"
        )
    print(f"# appended to {out}")
    if not args.workdir:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
