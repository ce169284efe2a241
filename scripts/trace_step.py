"""Capture a jax.profiler trace of the real bench train step and print the
per-op time breakdown (aggregated by HLO op-name prefix).

The K-chain harness in profile_step.py measures ops in ISOLATION (different
XLA fusion context than the full step); this parses the actual device trace
of the production scan-megastep, so the numbers add up to the real step.

Usage: python scripts/trace_step.py [--workload nerf|neus] [--steps 16]
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workload", default="nerf", choices=("nerf", "neus"))
    p.add_argument("--steps", type=int, default=16)
    p.add_argument("--outdir", default="/tmp/trace_step")
    p.add_argument("--encoding", default=None)
    args = p.parse_args()

    from bench import build_neus_system, build_system

    build = build_neus_system if args.workload == "neus" else build_system
    system = build(encoding=args.encoding or "cp")
    state = system.init_state(seed=0)
    # settle: warmup occ, compile the chunk, converge packing
    state, m = system.train_chunk(state, 64)
    float(m["train/loss"])

    t0 = time.perf_counter()
    state, m = system.train_chunk(state, args.steps)
    float(m["train/loss"])
    wall = (time.perf_counter() - t0) / args.steps
    print(f"steady-state {wall * 1e3:.2f} ms/step (wall, {args.steps} steps)")

    os.makedirs(args.outdir, exist_ok=True)
    jax.profiler.start_trace(args.outdir)
    state, m = system.train_chunk(state, args.steps)
    float(m["train/loss"])
    jax.profiler.stop_trace()

    traces = sorted(
        glob.glob(
            os.path.join(args.outdir, "**", "*.trace.json.gz"), recursive=True
        ),
        key=os.path.getmtime,
    )
    if not traces:
        print("no trace file found under", args.outdir)
        return
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)

    events = data.get("traceEvents", [])
    # device-side complete events: pid/tid of the TPU op track carry
    # per-op durations (us). Aggregate by displayed op name.
    by_name = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        cat = e.get("args", {}).get("device_type", "")
        name = e.get("name", "")
        dur = float(e.get("dur", 0.0))
        # keep only TPU op-track events (heuristic: events with run_id/hlo
        # args, or the biggest pid track); fall back to all X events
        if not name or dur <= 0:
            continue
        args_d = e.get("args", {})
        if "hlo_op" in args_d or "hlo_module" in args_d or cat:
            key = name.split(".")[0].split("{")[0]
            by_name[key] = by_name.get(key, 0.0) + dur
            total += dur
    if not by_name:  # fallback: aggregate every complete event by name
        for e in events:
            if e.get("ph") != "X":
                continue
            name, dur = e.get("name", ""), float(e.get("dur", 0.0))
            if not name or dur <= 0:
                continue
            key = name.split(".")[0].split("{")[0]
            by_name[key] = by_name.get(key, 0.0) + dur
            total += dur

    n = args.steps
    print(f"\ntop ops over {n} steps (device us total -> us/step):")
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {name[:72]:74s} {dur:10.0f} {dur / n:9.1f}")
    print(f"  {'TOTAL':74s} {total:10.0f} {total / n:9.1f}")


if __name__ == "__main__":
    main()
