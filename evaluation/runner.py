"""Generic experiment matrix runner (the reference ``example/runner.py`` /
``evaluation/*/run.sh`` analog).

Runs a list of configurations through ``examples/train.py``, captures the
``test_result:key=value`` stdout protocol, and writes a TSV.  Each experiment
directory defines CONFIGS and the columns to report (the reference's
per-figure ``run.sh`` + ``parse_res.py`` pairs collapse into one module).
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def parse_test_results(stdout: str) -> dict:
    """Parse the ``test_result:key=value`` protocol (reference
    ``evaluation/*/parse_res.py``)."""
    out = {}
    for line in stdout.splitlines():
        if line.startswith("test_result:"):
            key, _, value = line[len("test_result:"):].partition("=")
            try:
                out[key] = float(value)
            except ValueError:
                out[key] = value
    return out


def run_config(args: list[str], timeout: int = 1800) -> dict:
    cmd = [sys.executable, "-u", os.path.join(REPO, "examples", "train.py")] + args
    proc = subprocess.run(
        cmd, capture_output=True, text=True, timeout=timeout, cwd=REPO
    )
    results = parse_test_results(proc.stdout)
    results["_returncode"] = proc.returncode
    if proc.returncode != 0:
        results["_stderr_tail"] = proc.stderr[-2000:]
    return results


def run_matrix(
    configs: dict[str, list[str]],
    columns: list[str],
    out_path: str,
    append: bool = False,
):
    """``append=True`` merges rows into an existing TSV — a re-run of a name
    replaces its old row in place (used to finish or refresh a matrix across
    multiple sessions of a time-boxed device)."""
    rows = []
    for name, args in configs.items():
        print(f"=== running {name}: {' '.join(args)}", flush=True)
        res = run_config(args)
        rows.append((name, res))
        print(f"    -> { {c: res.get(c) for c in columns} }", flush=True)
    fmt = {
        name: name + "\t" + "\t".join(str(res.get(c, "")) for c in columns)
        for name, res in rows
    }
    lines = []
    if append and os.path.exists(out_path):
        replaced = set()
        for ln in open(out_path).read().splitlines()[1:]:
            if not ln.strip():
                continue
            name = ln.split("\t", 1)[0]
            if name in replaced:  # stale duplicate of a refreshed name
                continue
            if name in fmt:
                lines.append(fmt.pop(name))
                replaced.add(name)
            else:
                lines.append(ln)
    lines += list(fmt.values())
    with open(out_path, "w") as f:
        f.write("name\t" + "\t".join(columns) + "\n")
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out_path}")
    return rows


def cli_subset(configs: dict[str, list[str]]) -> tuple[dict, bool]:
    """Parse ``--only a,b,c`` from argv: returns (subset, append_mode)."""
    if "--only" in sys.argv:
        names = sys.argv[sys.argv.index("--only") + 1].split(",")
        return {n: configs[n] for n in names}, True
    return configs, False
