"""Device-time trace of the VarAE train step (MS-SSIM loss active).

Round-5 evidence tool: `train_varae` records ~14k img/s @b256 — the
slowest AE-family member and the only one whose loss graph carries the
MS-SSIM value+grad (Pallas pyramid kernels on TPU).  The roofline row
models the conv core only, so this trace answers where the other time
goes: is the Pallas MS-SSIM VJP the dominant lane (structural, like the
GAN's critic passes) or is there a fixable hotspot (relayout copies,
unfused pyramid stages)?

Uses the bench's own builder (``bench.build_jax_varae_train`` — the
same λ_mse·MSE + λ_kl·KL + λ_ssim·(1−MS-SSIM) step the driver metric
times, reference loss contract per SURVEY §2.11), runs one warm K-step
scan dispatch, traces a second one, and aggregates the device lanes.

Usage (real TPU, serialized with any other tunnel work):

    python scripts/trace_varae.py [batch] [k_steps]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _tracelib import aggregate_lanes, load_latest_trace, print_tables  # noqa: E402


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    import jax

    import bench
    from cae_tools_tpu.ops import convops
    from cae_tools_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    convops.set_precision("high")
    run, carry, data = bench.build_jax_varae_train(batch, k)

    rng = jax.random.PRNGKey(0)
    carry, _ = run(carry, rng, *data)  # compile/load + warm
    jax.block_until_ready(carry)

    tracedir = tempfile.mkdtemp(prefix="varae_trace_")
    t0 = time.perf_counter()
    with jax.profiler.trace(tracedir):
        carry, loss = run(carry, jax.random.fold_in(rng, 1), *data)
        float(loss)  # scalar device->host read (hazard 3)
    wall_s = time.perf_counter() - t0
    n_imgs = batch * k
    print(
        f"# wall: {wall_s * 1e3:.1f} ms for one {k}-step scan of batch "
        f"{batch} ({n_imgs / wall_s:,.0f} img/s wall)"
    )

    events = load_latest_trace(tracedir)
    if events is None:
        print(f"# no trace.json.gz under {tracedir}")
        return
    module_by_name, op_by_name = aggregate_lanes(events)
    print_tables(module_by_name, op_by_name, n_imgs)
    run_us = sum(
        d for name, (d, _) in module_by_name.items() if "jit" in name
    )
    if run_us:
        print(
            f"# scan executable: {run_us / 1e3:.2f} ms -> "
            f"{run_us / k / 1e3:.3f} ms/step, "
            f"{n_imgs / (run_us / 1e6):,.0f} img/s device-side"
        )


if __name__ == "__main__":
    main()
