"""Render each experiment's committed results.tsv into a figure.

The reference ships a gnuplot ``figure.plt`` next to every experiment's
``run.sh`` + ``parse_res.py`` (``/root/reference/evaluation/*/figure.plt``);
this is the analog for the collapsed run.py/results.tsv harness: one shared
renderer, one PNG per experiment directory.

Usage: python evaluation/plot.py [experiment ...]   (default: all with data)

Design notes: categorical series use the first three slots of a validated
palette (blue / orange / aqua — all-pairs CVD-safe); single-hue charts use
the blue sequential ramp; grids are hairline and recessive; text wears ink
tokens, never series colors; every >=2-series panel carries a legend.
"""

import csv
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))

# validated reference palette (light mode) — slots 1..3 + chrome tokens
S1, S2, S3 = "#2a78d6", "#eb6834", "#1baf7a"  # blue / orange / aqua
S4 = "#8c5ac8"  # violet — fused-epoch bars (no stage split)
INK = "#0b0b0b"
INK2 = "#52514e"
MUTED = "#898781"
GRID = "#e1e0d9"
BASE = "#c3c2b7"
SURFACE = "#fcfcfb"
DEEMPH = "#c3c2b7"  # de-emphasis gray for context series

plt.rcParams.update({
    "figure.facecolor": SURFACE,
    "axes.facecolor": SURFACE,
    "savefig.facecolor": SURFACE,
    "text.color": INK,
    "axes.edgecolor": BASE,
    "axes.labelcolor": INK2,
    "xtick.color": MUTED,
    "ytick.color": MUTED,
    "axes.grid": True,
    "grid.color": GRID,
    "grid.linewidth": 1.0,
    "axes.spines.top": False,
    "axes.spines.right": False,
    "axes.axisbelow": True,
    "font.family": "sans-serif",
    "font.size": 10,
    "legend.frameon": False,
})


def _read_tsv(path):
    rows = []
    with open(path) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            rows.append(line.rstrip("\n").split("\t"))
    header, body = rows[0], rows[1:]
    return [dict(zip(header, r)) for r in body]


def _read_commented_tsv(path):
    """TSVs whose header line starts with '# ' (scaling/tiered/time_to_acc)."""
    header = None
    out = []
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line.strip():
                continue
            if line.startswith("#"):
                cand = line.lstrip("# ").split("\t")
                if len(cand) > 2:
                    header = [c.split()[0] for c in cand]
                continue
            if header is None:
                header = [c.split()[0] for c in line.split("\t")]
                continue
            out.append(dict(zip(header, line.split("\t"))))
    return out


def _save(fig, name):
    out = os.path.join(HERE, name, "figure.png")
    fig.savefig(out, dpi=150, bbox_inches="tight")
    plt.close(fig)
    print(f"wrote {out}")


def plot_overall():
    rows = _read_tsv(os.path.join(HERE, "overall", "results.tsv"))
    names = [r["name"] for r in rows]
    stages = [
        ("epoch_time:sample_total", "sample", S1),
        ("epoch_time:copy_time", "extract", S2),
        ("epoch_time:train_total", "train", S3),
    ]
    fig, ax = plt.subplots(figsize=(7, 0.45 * len(rows) + 1.2))
    left = [0.0] * len(rows)
    for key, label, color in stages:
        # device-loop rows are ONE fused program: no stage split exists
        vals = [float(r[key] or 0.0) for r in rows]
        ax.barh(names, vals, left=left, height=0.55, color=color,
                label=label, edgecolor=SURFACE, linewidth=2)
        left = [a + b for a, b in zip(left, vals)]
    fused = [
        float(r["epoch_time:total"]) - l if l == 0.0 else 0.0
        for r, l in zip(rows, left)
    ]
    if any(fused):
        ax.barh(names, fused, left=left, height=0.55, color=S4,
                label="fused epoch (one program)", edgecolor=SURFACE,
                linewidth=2)
        left = [a + b for a, b in zip(left, fused)]
    for i, r in enumerate(rows):
        ax.text(left[i] + 0.03, i, f"{float(r['epoch_time:total']):.2f}s",
                va="center", color=INK2, fontsize=9)
    ax.invert_yaxis()
    ax.set_xlabel("epoch time (s), stage split")
    ax.set_title("Model zoo × sampling algorithm — epoch time by stage",
                 color=INK, loc="left")
    ax.legend(loc="center left", bbox_to_anchor=(1.02, 0.5),
              labelcolor=INK2)
    ax.grid(axis="y", visible=False)
    _save(fig, "overall")


def plot_cache_policy():
    rows = _read_tsv(os.path.join(HERE, "cache_policy", "results.tsv"))
    series = {}
    for r in rows:
        if r["name"] == "no_cache_hbm":
            continue
        policy, pct = r["name"].rsplit("_", 1)
        series.setdefault(policy, []).append(
            (float(pct), float(r["cache_hit_rate"]))
        )
    colors = {"pre_sample": S1, "degree": S2, "random": S3}
    fig, ax = plt.subplots(figsize=(5.2, 3.6))
    ax.plot([0, 0.4], [0, 0.4], color=DEEMPH, linewidth=1.5,
            linestyle=(0, (4, 3)), zorder=1)
    ax.text(0.315, 0.345, "hit = cache size", color=MUTED, fontsize=8,
            rotation=31, rotation_mode="anchor")
    for policy, pts in series.items():
        pts.sort()
        xs, ys = zip(*pts)
        ax.plot(xs, ys, color=colors[policy], linewidth=2, marker="o",
                markersize=5, markeredgecolor=SURFACE, markeredgewidth=2,
                label=policy, solid_capstyle="round")
    ax.set_xlabel("cache fraction of nodes")
    ax.set_ylabel("feature cache hit rate")
    ax.set_xlim(0, 0.42)
    ax.set_ylim(0, 0.9)
    ax.set_title("Cache policy hit rates (tiered store, power-law graph)",
                 color=INK, loc="left")
    ax.legend(loc="upper left", labelcolor=INK2)
    _save(fig, "cache_policy")


def plot_scaling():
    rows = _read_commented_tsv(os.path.join(HERE, "scaling", "projection.tsv"))
    # serial-exchange efficiency per ICI generation; the overlapped schedule
    # is 1.0 at every point (exchange hides under compute) so it is drawn
    # once as the reference line rather than three coincident series
    fams = {}
    for r in rows:
        fams.setdefault(int(r["ici_gbps"]), []).append(
            (int(r["workers"]), float(r["efficiency_serial"]))
        )
    colors = {45: S3, 100: S2, 180: S1}
    fig, ax = plt.subplots(figsize=(5.6, 3.6))
    xs_all = sorted({w for pts in fams.values() for w, _ in pts})
    ax.plot(xs_all, [1.0] * len(xs_all), color=DEEMPH, linewidth=1.5,
            linestyle=(0, (4, 3)))
    ax.text(xs_all[1], 1.025, "exchange overlapped (any ICI)", color=MUTED,
            fontsize=8)
    for ici in sorted(fams, reverse=True):
        pts = sorted(fams[ici])
        xs, ys = zip(*pts)
        ax.plot(xs, ys, color=colors[ici], linewidth=2, marker="o",
                markersize=5, markeredgecolor=SURFACE, markeredgewidth=2,
                label=f"serial, {ici} GB/s ICI")
    ax.set_xscale("log", base=2)
    ax.set_xticks(xs_all, [str(x) for x in xs_all])
    ax.set_ylim(0, 1.1)
    ax.set_xlabel("chips (interleaved GGMS shards)")
    ax.set_ylabel("per-chip efficiency vs 1 chip")
    ax.set_title("Projected GGMS scaling (bench step model)",
                 color=INK, loc="left")
    ax.legend(loc="lower left", labelcolor=INK2)
    _save(fig, "scaling")


def plot_time_to_acc():
    rows = _read_commented_tsv(os.path.join(HERE, "time_to_acc", "results.tsv"))
    # the cpu smoke and the chip run train DIFFERENT graphs (50k vs 100k
    # nodes) — faceting keeps each on its own honest time axis
    series = {}
    for r in rows:
        series.setdefault(r["mode"], []).append(
            (float(r["walltime_s"]), float(r["valid_acc"]), r["config"])
        )
    modes = [m for m in ("tpu", "cpu") if m in series]
    fig, axes = plt.subplots(1, len(modes), figsize=(4.2 * len(modes), 3.4),
                             sharey=True)
    axes = [axes] if len(modes) == 1 else list(axes)
    for ax, mode in zip(axes, modes):
        pts = sorted(series[mode])
        xs, ys = zip(*[(x, y) for x, y, _ in pts])
        ax.plot(xs, ys, color=S1, linewidth=2, marker="o", markersize=5,
                markeredgecolor=SURFACE, markeredgewidth=2)
        ax.set_xlabel("walltime (s)")
        ax.set_title(f"{mode} — {pts[0][2].split(' batch')[0]}", color=INK,
                     loc="left", fontsize=10)
    axes[0].set_ylabel("validation accuracy")
    fig.suptitle("Time to accuracy (--report-acc curve per epoch)",
                 color=INK, x=0.02, ha="left")
    fig.tight_layout()
    _save(fig, "time_to_acc")


def plot_partial_graph_cache():
    rows = _read_tsv(
        os.path.join(HERE, "partial_graph_cache", "results.tsv")
    )
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(8.4, 3.4))
    g_sweep = sorted(
        (float(r["graph_pct"]), float(r["frontier_hot_frac"]))
        for r in rows if r["feat_cache_pct"] == "0.25"
    )
    xs, ys = zip(*g_sweep)
    ax1.plot(xs, ys, color=S1, linewidth=2, marker="o", markersize=5,
             markeredgecolor=SURFACE, markeredgewidth=2)
    ax1.set_xlabel("dist-graph percentage (hot topology prefix)")
    ax1.set_ylabel("frontier served from hot tier")
    ax1.set_ylim(0, 1.05)
    ax1.set_title("Topology tier", color=INK, loc="left", fontsize=10)

    f_sweep = sorted(
        (float(r["feat_cache_pct"]), float(r["feat_hit_rate"]))
        for r in rows if r["graph_pct"] == "0.5"
    )
    xs, ys = zip(*f_sweep)
    ax2.plot(xs, ys, color=S1, linewidth=2, marker="o", markersize=5,
             markeredgecolor=SURFACE, markeredgewidth=2)
    ax2.set_xlabel("partitioned feature-cache percentage")
    ax2.set_ylabel("feature cache hit rate")
    ax2.set_ylim(0, 1.05)
    ax2.set_title("Feature tier", color=INK, loc="left", fontsize=10)
    fig.suptitle("GGMS partial-cache sweeps (8-chip mesh, both tiers)",
                 color=INK, x=0.02, ha="left")
    fig.tight_layout()
    _save(fig, "partial_graph_cache")


def plot_placement():
    rows = _read_commented_tsv(
        os.path.join(HERE, "placement", "results.tsv")
    )
    xs = [float(r["budget_frac"]) for r in rows]
    fig, ax = plt.subplots(figsize=(5.6, 3.6))
    ax.plot(xs, [float(r["dist_graph_pct"]) for r in rows], color=S1,
            linewidth=2, marker="o", markersize=5, markeredgecolor=SURFACE,
            markeredgewidth=2, label="topology coverage (solved)")
    ax.plot(xs, [float(r["cache_pct"]) for r in rows], color=S2,
            linewidth=2, marker="o", markersize=5, markeredgecolor=SURFACE,
            markeredgewidth=2, label="feature cache coverage (solved)")
    ax.plot(xs, [float(r["exp_feat_hit"]) for r in rows], color=S2,
            linewidth=1.2, linestyle=(0, (4, 3)),
            label="expected feature hit rate")
    meas = [
        (x, float(r["measured_hit"])) for x, r in zip(xs, rows)
        if r["measured_hit"] not in ("nan", "")
        and r["measured_hit"] == r["measured_hit"]
        and float(r["measured_hit"]) == float(r["measured_hit"])
    ]
    if meas:
        mx, my = zip(*meas)
        ax.scatter(mx, my, s=70, color=S2, edgecolor=INK, linewidth=1.2,
                   zorder=5, label="measured hit rate (engine run)")
    ax.set_xlabel("per-chip HBM budget / full-residency bytes")
    ax.set_ylabel("fraction")
    ax.set_ylim(0, 1.05)
    ax.set_title("Placement solver: budget → store split (greedy "
                 "marginal-accesses-per-byte)", color=INK, loc="left",
                 fontsize=10)
    ax.legend(loc="lower right", labelcolor=INK2, fontsize=8)
    _save(fig, "placement")


def plot_ablation():
    path = os.path.join(HERE, "ablation", "results.tsv")
    if not os.path.isfile(path):
        print("ablation/results.tsv not present yet — skipped")
        return
    rows = _read_tsv(path)
    names = [r["name"] for r in rows]
    vals = [float(r["epoch_time:total"]) for r in rows]
    fig, ax = plt.subplots(figsize=(6.5, 0.45 * len(rows) + 1.2))
    ax.barh(names, vals, height=0.55, color=S1, edgecolor=SURFACE,
            linewidth=2)
    for i, v in enumerate(vals):
        ax.text(v + max(vals) * 0.01, i, f"{v:.2f}s", va="center",
                color=INK2, fontsize=9)
    ax.invert_yaxis()
    ax.set_xlabel("epoch time (s)")
    ax.set_title("Optimization ablation — epoch time per configuration",
                 color=INK, loc="left")
    ax.grid(axis="y", visible=False)
    _save(fig, "ablation")


def plot_tiered():
    rows = _read_commented_tsv(os.path.join(HERE, "tiered", "results.tsv"))
    rows = [r for r in rows if r["mode"] == "tpu"] or rows
    fig, (a1, a2) = plt.subplots(1, 2, figsize=(7.5, 2.8))
    labels = [f'{r["mode"]}\n{int(r["nodes"]) // 1000}k nodes' for r in rows]
    a1.bar(labels, [float(r["hit_rate"]) for r in rows], width=0.5,
           color=S1, edgecolor=SURFACE, linewidth=2)
    a1.set_ylim(0, 1)
    a1.set_ylabel("cache hit rate")
    a1.set_title("Hit rate @ configured cache %", color=INK, loc="left",
                 fontsize=10)
    a2.bar(labels, [float(r["edges_per_sec"]) / 1e3 for r in rows],
           width=0.5, color=S2, edgecolor=SURFACE, linewidth=2)
    a2.set_ylabel("edges/s (thousands)")
    a2.set_title("Out-of-core throughput", color=INK, loc="left", fontsize=10)
    for a in (a1, a2):
        a.grid(axis="x", visible=False)
    fig.suptitle("Tiered store, features > HBM (miss H2D rides the "
                 "tunnel here)", color=INK2, fontsize=9, y=1.02)
    _save(fig, "tiered")


def plot_microbench():
    fig, axes = plt.subplots(1, 3, figsize=(11, 3.2))
    panels = [
        ("fanout_bench.tsv", "fanout aggregation", axes[0], _read_tsv),
        ("sort_bench.tsv", "dedup sort strategies", axes[1], _read_tsv),
        ("fetch_bench.tsv", "neighbor fetch", axes[2], _read_commented_tsv),
    ]
    for fname, title, ax, reader in panels:
        rows = reader(os.path.join(HERE, "microbench", fname))
        if fname == "fanout_bench.tsv":
            # fwd+bwd rows only (the decision metric); fold shape into label
            rows = [r for r in rows if "_fb_" in r["kernel"]]
            names = [
                r["kernel"].replace("_fb_", " ").replace("dst", "")
                .replace("_k", "·K") for r in rows
            ]
        else:
            names = [r.get("kernel") or r.get("variant") for r in rows]
        vals = [float(r["time_ms"]) for r in rows]
        ax.barh(names, vals, height=0.55, color=S1, edgecolor=SURFACE,
                linewidth=2)
        ax.invert_yaxis()
        ax.set_xlabel("time (ms)")
        ax.set_title(title, color=INK, loc="left", fontsize=10)
        ax.grid(axis="y", visible=False)
        ax.tick_params(axis="y", labelsize=7)
    fig.tight_layout()
    _save(fig, "microbench")


PLOTS = {
    "overall": plot_overall,
    "tiered": plot_tiered,
    "microbench": plot_microbench,
    "cache_policy": plot_cache_policy,
    "scaling": plot_scaling,
    "time_to_acc": plot_time_to_acc,
    "partial_graph_cache": plot_partial_graph_cache,
    "placement": plot_placement,
    "ablation": plot_ablation,
}

if __name__ == "__main__":
    targets = sys.argv[1:] or list(PLOTS)
    for name in targets:
        PLOTS[name]()
