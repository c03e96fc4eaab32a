"""Post-fusion device-time trace of the fused product apply.

Round-4 evidence tool (VERDICT item 4): the round-2 profiler cross-check
predated the denorm/NCHW fusion into the Pallas tail and showed 0.72 ms
of layout copies per 512-image batch (26% of device time).  This script
re-traces the *current* fused apply at the bench's headline batch and
prints a per-op device-time table so BASELINE.md's roofline section can
state what the chip actually executes now.

Usage (real TPU, serialized with any other tunnel work):

    python scripts/trace_apply.py [batch] [n_calls]

Lane parsing/aggregation is shared with ``trace_gan.py`` via
``_tracelib`` (module lane = per-executable time, op lane = HLO ops).
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _tracelib import aggregate_lanes, load_latest_trace, print_tables  # noqa: E402


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

    events = load_latest_trace(tracedir)
    if events is None:
        print(f"# no trace.json.gz under {tracedir}")
        return
    module_by_name, op_by_name = aggregate_lanes(events)
    n_imgs = batch * n_calls
    if not module_by_name and not op_by_name:
        print("# no duration events on the selected lanes")
        return
    print_tables(module_by_name, op_by_name, n_imgs, top=25)
    fwd_us = sum(
        d for name, (d, _) in module_by_name.items() if "forward" in name
    )
    if fwd_us:
        print(f"# forward executable: {fwd_us / n_calls / 1e3:.3f} ms/batch "
              f"-> {n_imgs / (fwd_us / 1e6):,.0f} img/s device-side")


if __name__ == "__main__":
    main()
