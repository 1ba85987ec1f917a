"""Benchmark CLI: working form of cmd/benchmark (which never compiled -
parseStringSlice had no return, cmd/benchmark/main.go:334-336 - and whose
"benchmark" slept instead of rendering, :111-152).

Usage:
    python -m raytrace_tpu.bench.cli --width 400 --height 300 \
        --samples 4,16 --scenes ring --output report.json
"""

from __future__ import annotations

import argparse
import os
import sys

# Fixed hash seed keeps Pallas program fingerprints (and thus the
# persistent compilation cache keys) stable across processes; see bench.py.
# Re-exec through -m so package-relative imports keep working.
if os.environ.get("PYTHONHASHSEED") != "0":
    os.environ["PYTHONHASHSEED"] = "0"
    os.execv(sys.executable,
             [sys.executable, "-m", "raytrace_tpu.bench.cli"]
             + sys.argv[1:])

# Honor RT_PLATFORM before any JAX computation (the environment may
# force-register a TPU plugin via sitecustomize; see ../cli.py).
if os.environ.get("RT_PLATFORM"):
    import jax
    jax.config.update("jax_platforms", os.environ["RT_PLATFORM"])


def parse_int_slice(s: str):
    """Comma-separated ints (the fixed parseIntSlice,
    cmd/benchmark/main.go:330-332 ignored its input)."""
    return tuple(int(x) for x in s.split(",") if x.strip())


def parse_string_slice(s: str):
    """The fixed parseStringSlice (main.go:334-336 had no return)."""
    return tuple(x.strip() for x in s.split(",") if x.strip())


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="rt-benchmark",
        description="Grid-sweep render benchmark (actually renders)")
    p.add_argument("--width", type=int, default=400)
    p.add_argument("--height", type=int, default=300)
    p.add_argument("--samples", type=parse_int_slice, default=(4, 16))
    p.add_argument("--max-depth", type=int, default=50)
    p.add_argument("--scenes", type=parse_string_slice, default=("ring",),
                   help="'ring' or paths to scene JSON files")
    p.add_argument("--repetitions", type=int, default=3)
    p.add_argument("--warmup", type=int, default=1)
    p.add_argument("--output", default="benchmark_report.json")
    p.add_argument("--profile", action="store_true",
                   help="dump a jax.profiler trace to ./profiles")
    p.add_argument("--metrics", action="store_true",
                   help="print device/host memory stats after the run")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from .suite import BenchmarkConfig, BenchmarkSuite
    from .. import obs

    profiler = obs.Profiler() if args.profile else None
    if profiler:
        profiler.start()
    suite = BenchmarkSuite(BenchmarkConfig(
        width=args.width, height=args.height,
        samples_list=args.samples, max_depth=args.max_depth,
        scenes=args.scenes, repetitions=args.repetitions,
        warmup=args.warmup))
    try:
        suite.run()
    finally:
        if profiler:
            profiler.stop()
    suite.print_table()
    suite.save_report(args.output)
    print(f"report saved to {args.output}")
    if args.metrics:
        import json
        print(json.dumps(obs.Profiler().get_stats(), indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
