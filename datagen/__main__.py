"""CLI: ``python -m datagen <dataset> <raw_dir> <out_dir> [--rankings]
[--weights]``.

``--rankings``/``--weights`` run the C++ toolkit (``cpp/xgnn-convert``) on
the converted directory afterwards — cache-by-degree ranking and
alias/prefix weighted-sampling tables (the reference's
``utility/data-process`` post-steps).
"""

import argparse
import subprocess
import sys

from . import convert


def main(argv=None):
    ap = argparse.ArgumentParser(prog="python -m datagen")
    ap.add_argument("dataset", choices=[
        "products", "papers100M", "com-friendster", "mag240m-homo",
    ])
    ap.add_argument("raw_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--rankings", action="store_true",
                    help="run xgnn-convert cache-by-degree afterwards")
    ap.add_argument("--weights", action="store_true",
                    help="run xgnn-convert create-weights afterwards")
    args = ap.parse_args(argv)
    convert(args.dataset, args.raw_dir, args.out_dir)
    if args.rankings or args.weights:
        from xgnn_tpu.clib import convert_path

        tool = convert_path()
        if tool is None:
            sys.exit("cpp/xgnn-convert unavailable (g++ missing?)")
        if args.rankings:
            subprocess.run([tool, "cache-by-degree", args.out_dir], check=True)
        if args.weights:
            subprocess.run([tool, "create-weights", args.out_dir], check=True)


if __name__ == "__main__":
    main()
