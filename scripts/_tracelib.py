"""Shared trace-viewer JSON aggregation for the profiling scripts.

The device trace carries two *nested* lanes — "XLA Modules" (one event
per executable run) and "XLA Ops" (the HLO ops inside them); summing
both double-counts, so executable time comes from the module lane and
per-op shares from the op lane (BASELINE.md "Post-fusion apply trace").
"""

import glob
import gzip
import json
import os
from collections import defaultdict


def load_latest_trace(tracedir):
    paths = glob.glob(
        os.path.join(tracedir, "**", "*.trace.json.gz"), recursive=True
    )
    if not paths:
        return None
    with gzip.open(sorted(paths)[-1], "rt") as f:
        return json.load(f).get("traceEvents", [])


def aggregate_lanes(events):
    """-> (module_by_name, op_by_name): name -> [dur_us, count]."""
    proc_names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            proc_names[ev["pid"]] = ev.get("args", {}).get("name", "")
    dev_pids = {
        pid for pid, name in proc_names.items()
        if any(k in name.lower() for k in ("tpu", "device", "/device"))
        and "host" not in name.lower()
    }
    if not dev_pids:  # CPU smoke: no device lane; aggregate everything
        dev_pids = set(proc_names)

    thread_names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            thread_names[(ev["pid"], ev.get("tid"))] = (
                ev.get("args", {}).get("name", "")
            )

    op_by_name = defaultdict(lambda: [0.0, 0])
    module_by_name = defaultdict(lambda: [0.0, 0])
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        lane = thread_names.get((ev["pid"], ev.get("tid")), "")
        dur = float(ev.get("dur", 0.0))  # microseconds
        tgt = module_by_name if "module" in lane.lower() else op_by_name
        tgt[ev.get("name", "?")][0] += dur
        tgt[ev.get("name", "?")][1] += 1
    return module_by_name, op_by_name


def print_tables(module_by_name, op_by_name, n_imgs, top=30):
    print("# module lane (per-executable device time):")
    for name, (dur, cnt) in sorted(
        module_by_name.items(), key=lambda kv: -kv[1][0]
    ):
        print(f"#   {name[:60]:60s} {dur / 1e3:10.3f} ms  x{cnt}")
    op_total = sum(d for d, _ in op_by_name.values())
    print(f"# op lane total: {op_total / 1e3:.2f} ms")
    print(f"{'op':60s} {'ms total':>10s} {'x':>5s} {'us/img':>8s} {'%':>6s}")
    for name, (dur, cnt) in sorted(
        op_by_name.items(), key=lambda kv: -kv[1][0]
    )[:top]:
        print(
            f"{name[:60]:60s} {dur / 1e3:10.3f} {cnt:5d} "
            f"{dur / n_imgs:8.3f} {100 * dur / max(op_total, 1e-9):6.1f}"
        )
    return op_total
