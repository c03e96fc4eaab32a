"""Post-fusion device-time trace of the fused product apply.

Round-4 evidence tool (VERDICT item 4): the round-2 profiler cross-check
predated the denorm/NCHW fusion into the Pallas tail and showed 0.72 ms
of layout copies per 512-image batch (26% of device time).  This script
re-traces the *current* fused apply at the bench's headline batch and
prints a per-op device-time table so BASELINE.md's roofline section can
state what the chip actually executes now.

Usage (real TPU, serialized with any other tunnel work):

    python scripts/trace_apply.py [batch] [n_calls]

Parses the profiler's trace-viewer JSON (``*.trace.json.gz``) directly:
aggregates wall-duration by event name over the TPU device lanes
(pid whose process_name metadata mentions the device), skipping host
threads, and prints ns totals + per-batch / per-image breakdowns.
"""

import glob
import gzip
import json
import os
import sys
import tempfile
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    n_calls = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    import jax

    import bench
    from cae_tools_tpu.ops import convops

    convops.set_precision("high")
    spec = bench._spec()
    forward, x = bench.build_jax_forward(
        spec, bench._LATENT, bench._FC, batch, fused_tail=True
    )

    # warm: compile/load outside the trace window
    forward(x).block_until_ready()

    tracedir = tempfile.mkdtemp(prefix="fused_apply_trace_")
    t0 = time.perf_counter()
    with jax.profiler.trace(tracedir):
        for _ in range(n_calls):
            out = forward(x)
        out.block_until_ready()
        # hazard 3: block_until_ready may return early on the tunnel —
        # end with a scalar device->host read
        float(out.ravel()[0])
    wall_s = time.perf_counter() - t0
    print(f"# wall: {wall_s * 1e3:.1f} ms for {n_calls} calls of batch {batch} "
          f"({batch * n_calls / wall_s:,.0f} img/s wall)")

    paths = glob.glob(
        os.path.join(tracedir, "**", "*.trace.json.gz"), recursive=True
    )
    if not paths:
        print(f"# no trace.json.gz under {tracedir}; contents:")
        for p in glob.glob(os.path.join(tracedir, "**", "*"), recursive=True):
            print("#  ", p)
        return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])

    # device lanes: processes whose name mentions TPU/device; fall back to
    # any non-host process carrying X-duration events
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
    print(f"# processes: {proc_names}; device pids: {sorted(dev_pids)}")

    # device traces carry two nested lanes: "XLA Modules" (one event per
    # executable run, e.g. jit_forward) and "XLA Ops" (the HLO ops INSIDE
    # those executables).  Summing both double-counts; device-side img/s
    # must come from the module lane, and per-op shares from the op lane.
    thread_names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            thread_names[(ev["pid"], ev.get("tid"))] = (
                ev.get("args", {}).get("name", "")
            )

    by_name = defaultdict(lambda: [0.0, 0])  # name -> [dur_us, count]
    module_by_name = defaultdict(lambda: [0.0, 0])
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        lane = thread_names.get((ev["pid"], ev.get("tid")), "")
        dur = float(ev.get("dur", 0.0))  # microseconds
        tgt = module_by_name if "module" in lane.lower() else by_name
        tgt[ev.get("name", "?")][0] += dur
        tgt[ev.get("name", "?")][1] += 1

    n_imgs = batch * n_calls
    if not module_by_name and not by_name:
        print("# no duration events on the selected lanes")
        return
    print("# module lane (per-executable device time):")
    fwd_us = 0.0
    for name, (dur, cnt) in sorted(
        module_by_name.items(), key=lambda kv: -kv[1][0]
    ):
        print(f"#   {name[:52]:52s} {dur / 1e3:10.3f} ms  x{cnt}")
        if "forward" in name:
            fwd_us += dur
    if fwd_us:
        print(f"# forward executable: {fwd_us / n_calls / 1e3:.3f} ms/batch "
              f"-> {n_imgs / (fwd_us / 1e6):,.0f} img/s device-side")
    op_total = sum(d for d, _ in by_name.values())
    print(f"# op lane: {op_total / 1e3:.2f} ms total over {n_calls} calls")
    print(f"{'op':52s} {'ms total':>10s} {'x':>4s} {'us/img':>8s} {'%':>6s}")
    for name, (dur, cnt) in sorted(by_name.items(), key=lambda kv: -kv[1][0])[:25]:
        print(f"{name[:52]:52s} {dur / 1e3:10.3f} {cnt:4d} {dur / n_imgs:8.3f} "
              f"{100 * dur / op_total:6.1f}")


if __name__ == "__main__":
    main()
