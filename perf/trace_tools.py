"""Profiler-trace capture + per-op reporting (reusable; round-2 tooling).

capture(fn): runs ``fn()`` under ``jax.profiler.trace`` and returns the trace
directory. report(tdir): parses the perfetto ``*.trace.json.gz``, aggregates
device-track op durations, and prints a table sorted by total time.

Usage as a module:
    from trace_tools import capture, report
    report(capture(lambda: float(run(...))))

CLI:  python perf/trace_tools.py <trace_dir>   # re-print a saved trace
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys

import jax


def capture(fn, tdir=None):
    tdir = tdir or "/tmp/octseg_trace"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        fn()
    return tdir


def _load_events(tdir):
    paths = glob.glob(f"{tdir}/plugins/profile/*/*.trace.json.gz")
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {tdir}")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", data if isinstance(data, list) else [])
    # name the process/thread tracks
    pnames, tnames = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e["args"]["name"]
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e["pid"], e.get("tid"))] = e["args"]["name"]
    return events, pnames, tnames


def report(tdir, top=40, track_filter=("TPU", "/device", "XLA Ops"),
           min_ms=0.0, merge_digits=True):
    """Per-op duration table over device compute tracks."""
    import re

    events, pnames, tnames = _load_events(tdir)
    by_op = collections.defaultdict(lambda: [0.0, 0])
    track_total = collections.defaultdict(float)
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pnames.get(e["pid"], "")
        tname = tnames.get((e["pid"], e.get("tid")), "")
        track = f"{pname}//{tname}"
        if not any(s in pname or s in tname for s in track_filter):
            continue
        dur_ms = e.get("dur", 0) / 1e3
        name = e["name"]
        if merge_digits:
            name = re.sub(r"\d+", "#", name)
        by_op[(track, name)][0] += dur_ms
        by_op[(track, name)][1] += 1
        track_total[track] += dur_ms
    for track, tot in sorted(track_total.items(), key=lambda kv: -kv[1]):
        print(f"\n== {track}: total {tot:.2f} ms ==")
        rows = [(v[0], v[1], n) for (t, n), v in by_op.items() if t == track]
        for dur, cnt, name in sorted(rows, reverse=True)[:top]:
            if dur < min_ms:
                break
            print(f"  {dur:9.2f} ms  x{cnt:<5d} {name[:110]}")
    return by_op


if __name__ == "__main__":
    report(sys.argv[1], top=int(sys.argv[2]) if len(sys.argv) > 2 else 40)
