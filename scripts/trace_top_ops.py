"""Summarize a jax.profiler trace: top XLA ops by total device time.

Usage: python scripts/trace_top_ops.py <profile_dir> [--top 30]
(profile_dir = what was passed to jax.profiler.start_trace / --profile-dir;
the newest run under plugins/profile/ is used.)

Works from the trace-viewer JSON (trace.json.gz) the TPU profiler emits --
no TensorBoard needed. Aggregates complete events on device tracks by event
name, prints total ms, count, and % of the busiest device track's span.
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re


def load_trace(profile_dir):
    runs = sorted(glob.glob(os.path.join(profile_dir, "plugins", "profile", "*")))
    if not runs:
        raise SystemExit(f"no profile runs under {profile_dir}/plugins/profile")
    run = runs[-1]
    traces = glob.glob(os.path.join(run, "*.trace.json.gz"))
    if not traces:
        raise SystemExit(f"no trace.json.gz under {run}")
    with gzip.open(traces[0], "rt") as f:
        return json.load(f), traces[0]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("profile_dir")
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--device-re", default="TPU|/device|XLA Op", help="track-name filter")
    a = p.parse_args()

    data, path = load_trace(a.profile_dir)
    events = data["traceEvents"]

    # pid/tid -> track names
    proc = {}
    thread = {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                proc[e["pid"]] = e["args"].get("name", "")
            elif e.get("name") == "thread_name":
                thread[(e["pid"], e.get("tid"))] = e["args"].get("name", "")

    dev_re = re.compile(a.device_re, re.I)
    by_name = collections.Counter()
    count = collections.Counter()
    span_lo, span_hi = {}, {}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        tname = thread.get((e.get("pid"), e.get("tid")), "")
        pname = proc.get(e.get("pid"), "")
        if not (dev_re.search(pname) or dev_re.search(tname)):
            continue
        key = e["name"]
        by_name[key] += e["dur"]
        count[key] += 1
        tk = (e.get("pid"), e.get("tid"))
        span_lo[tk] = min(span_lo.get(tk, e["ts"]), e["ts"])
        span_hi[tk] = max(span_hi.get(tk, 0), e["ts"] + e["dur"])

    if not by_name:
        tracks = sorted({proc.get(p2, "") + "/" + t for (p2, _), t in thread.items()})
        raise SystemExit(f"no device events matched; tracks present: {tracks[:40]}")

    total_span = max(hi - span_lo[k] for k, hi in span_hi.items())
    print(f"trace: {path}")
    print(f"busiest-track span: {total_span/1e3:.3f} ms")
    print(f"{'total ms':>10}  {'count':>7}  {'% span':>7}  op")
    for name, dur in by_name.most_common(a.top):
        print(f"{dur/1e3:10.3f}  {count[name]:7d}  {100*dur/total_span:6.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
