"""Smoke test for the driver-facing benchmark harness.

``bench.py`` is the round's performance evidence: the driver runs it
headless at the end of every round and records the LAST printed JSON
line.  A syntax error, a renamed key, or a budget-logic regression would
otherwise only surface in that unattended run (see BENCH_r02: rc=124,
nothing recorded).  This test runs the real harness end-to-end on CPU
with tiny shapes/iters and asserts the printed record's contract.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def test_bench_emits_parseable_headline_record():
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        CAE_BENCH_BATCH="8",
        CAE_BENCH_ITERS="2",
        CAE_BENCH_TORCH_ITERS="2",
        CAE_BENCH_SCAN_STEPS="2",
        # K interpret-mode Pallas applies per scan dispatch is the
        # dominant CPU cost of the apply_suite members; 2 exercises the
        # scan-timing path at 1/48th the default device-sized K
        CAE_BENCH_APPLY_SCAN_K="2",
        # budget small: headline + train metrics only, rest -> "skipped"
        CAE_BENCH_BUDGET_S="240",
        CAE_BENCH_HEADLINE_CAP_S="120",
        CAE_BENCH_APPLY_SUITE_CAP_S="60",
        CAE_BENCH_RETRY_PER_MEMBER_S="30",
        # interpret-mode Pallas grads are minutes-slow on CPU; the fused
        # train metrics are covered by tests/test_train_tail.py instead.
        # srcnn/gan: full-res 256x256 conv stacks whose CPU compile alone
        # is minutes — their builders are exercised on the real TPU
        # (CAE_BENCH_ONLY warm-up) and by the model-level tests
        CAE_BENCH_SKIP="train_convae_fused,train_unet_fused,"
        "train_convae_fused_bf16,train_unetres_fused,"
        "train_srcnn,train_srcnn_bf16,train_gan",
    )
    out = subprocess.run(
        [sys.executable, BENCH], env=env, text=True, timeout=420,
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
    )
    assert out.returncode == 0
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert lines, out.stdout
    for line in lines:  # every emitted line must be a complete record
        rec = json.loads(line)
        assert rec["metric"] == "apply_convae_16x16_to_256x256_images_per_sec"
        assert rec["unit"] == "images/sec"
        assert isinstance(rec["skipped"], list)
    final = json.loads(lines[-1])
    assert final["value"] > 0, final
    assert final["headline_path"] in ("fused_pallas_tail", "xla_high")
    assert final["baseline_torch_cpu_images_per_sec"] > 0
    assert final["vs_baseline"] > 0


def test_bench_metric_registry_consistent():
    """Suite membership, _ALL_KEYS, and the result-name table must agree.

    A metric missing from _ALL_KEYS would never be reported as skipped; a
    metric missing from _build_result's name table would be measured and
    then silently dropped from the record.  Both are exactly the drift
    that cost round 3 its comparison baselines."""
    sys.path.insert(0, REPO)
    import bench

    members = (
        {"apply_fused"} | set(bench._APPLY_SUITE) | set(bench._TRAIN_METRICS)
    )
    assert members == set(bench._ALL_KEYS)

    rates = {k: 123.0 for k in bench._ALL_KEYS}
    rec = bench._build_result(rates, (1.0, 0.0, 1.0, 0.0), 1.0)
    assert rec["skipped"] == []
    assert rec["value"] == 123.0  # headline = apply_fused
    reported = sum(1 for v in rec.values() if v == 123.0)
    # every measured metric must appear in the record under some name
    assert reported >= len(bench._ALL_KEYS), rec
