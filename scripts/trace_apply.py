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

    by_name = defaultdict(float)
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        dur = float(ev.get("dur", 0.0))  # microseconds
        by_name[ev.get("name", "?")] += dur
        total += dur

    n_imgs = batch * n_calls
    if total <= 0.0:
        print("# no duration events on the selected lanes")
        return
    print(f"# device-lane events: {total / 1e3:.2f} ms total over {n_calls} "
          f"calls -> {total / n_calls / 1e3:.3f} ms/batch, "
          f"{n_imgs / (total / 1e6):,.0f} img/s device-side")
    print(f"{'op':60s} {'ms total':>10s} {'us/img':>8s} {'%':>6s}")
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{name[:60]:60s} {dur / 1e3:10.3f} {dur / n_imgs:8.3f} "
              f"{100 * dur / total:6.1f}")


if __name__ == "__main__":
    main()
