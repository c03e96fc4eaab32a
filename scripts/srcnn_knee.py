"""SRCNNRes train batch-knee sweep + precision-ladder A/B (round 5).

Round-4 VERDICT weak #4 / next-step #3: SRCNNRes is the one FLOP-bound
model in the suite (583 img/s @b64 == ~13 TFLOP/s sustained, ~20% of the
3-pass effective MXU peak) with no batch-knee sweep or precision A/B
recorded.  This sweeps (precision x batch) in ONE long-lived process
with scan-dispatch timing (the method that is immune to the tunnel's
dispatch-tax and memoization hazards; see BASELINE.md "measurement
isolation"), so the bench default `CAE_BENCH_SRCNN_BATCH` can move to
the knee.

Usage (real TPU, serialized with any other tunnel work):

    python scripts/srcnn_knee.py [batches...]     # default 64 128 256
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    batches = [int(a) for a in sys.argv[1:]] or [64, 128, 256]

    import bench
    from cae_tools_tpu.ops import convops
    from cae_tools_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    k = bench._TRAIN_SCAN_STEPS
    results = {}
    for prec in ("high", "default"):
        convops.set_precision(prec)
        for b in batches:
            t0 = time.perf_counter()
            try:
                run, carry, data = bench.build_jax_srcnn_train(b, k)
                ips = b / bench.time_jax_train_scan(run, carry, data, k)
            except Exception as e:  # OOM at large b is a datapoint
                print(f"# srcnn prec={prec} b={b}: FAILED {type(e).__name__}:"
                      f" {str(e)[:200]}", flush=True)
                continue
            results[(prec, b)] = ips
            print(
                f"# srcnn prec={prec} b={b}: {ips:,.0f} img/s "
                f"({3 * 7.5e9 * ips / 1e12:.1f} TFLOP/s train) "
                f"[{time.perf_counter() - t0:.0f}s incl compile]",
                flush=True,
            )
            del run, carry, data
    print({f"{p}_b{b}": round(v, 1) for (p, b), v in results.items()},
          flush=True)


if __name__ == "__main__":
    main()
