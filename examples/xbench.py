"""xprof-based micro-benchmark harness.

Wall-clock timing of small jitted calls is unreliable on this platform
(dispatches overlap through the tunnel; measured 0.04 ms for ops whose true
device time is 4 ms), so every kernel experiment runs under the JAX profiler
and reports per-op DEVICE self-time parsed from the xplane trace.

Usage:
    from examples.xbench import xbench
    xbench({"name": (fn, args), ...}, iters=10)
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import tempfile

import jax


def _parse(trace_dir: str):
    from xprof.convert import raw_to_tool_data as rtd

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    out, _ = rtd.xspace_to_tool_data(paths, "framework_op_stats", {})
    data = json.loads(out)
    rows = data[0]["rows"] if isinstance(data, list) else data["rows"]
    ops = []
    for r in rows:
        c = [x["v"] for x in r["c"]]
        if c[1] != "Device":
            continue
        # name, occurrences, total_self_us
        ops.append((c[3], int(c[4]), float(c[7])))
    return ops


def xbench(cases: dict, iters: int = 10, top: int = 6, quiet: bool = False):
    """Run each case under one trace; report device ms/call per case.

    Each case value is (fn, args_tuple).  Functions should be pre-compiled
    (call once before) to keep compile out of the trace.  Case attribution
    relies on jit function names appearing in op paths — wrap each fn in a
    distinctly named jit (e.g. via naming the python function).
    Returns {case: device_ms_per_call}.
    """
    for name, (fn, args) in cases.items():
        out = fn(*args)
    jax.block_until_ready(out)

    tdir = tempfile.mkdtemp(prefix="xbench_")
    results = {}
    try:
        for name, (fn, args) in cases.items():
            case_dir = os.path.join(tdir, name.replace("/", "_"))
            jax.profiler.start_trace(case_dir)
            for _ in range(iters):
                out = fn(*args)
            jax.block_until_ready(out)
            jax.profiler.stop_trace()
            ops = _parse(case_dir)
            total_us = sum(t for _, _, t in ops)
            results[name] = total_us / iters / 1000.0
            if not quiet:
                print(f"{name:<40} {results[name]:8.3f} ms/call  (device)")
                for op, occ, t in sorted(ops, key=lambda o: -o[2])[:top]:
                    if t / iters > 20:  # >20us/call
                        print(f"    {op[:66]:<66} {t/iters:8.1f} us")
    finally:
        shutil.rmtree(tdir, ignore_errors=True)
    return results
