"""ModelMetric parity (scipy formulas) and the jitted fast path."""

import numpy as np
import pytest
from scipy.stats import pearsonr

import jax.numpy as jnp

from cae_tools_tpu.models.metrics import ModelMetric, fast_metrics


def test_model_metric_matches_scipy_manual():
    rng = np.random.default_rng(0)
    mm = ModelMetric()
    actuals, estimates = [], []
    for _ in range(5):
        a = rng.normal(size=(1, 12, 12)).astype(np.float64)
        e = a + rng.normal(scale=0.3, size=a.shape)
        mask = (rng.random(a.shape) > 0.2).astype(np.float32)
        mm.accumulate(a, e, mask)
        sel = mask.flatten().astype(bool)
        actuals.append(a.flatten()[sel])
        estimates.append(e.flatten()[sel])
    metrics = mm.get_metrics()
    all_a = np.concatenate(actuals)
    all_e = np.concatenate(estimates)
    assert metrics["mse"] == pytest.approx(np.mean((all_a - all_e) ** 2))
    assert metrics["mae"] == pytest.approx(np.mean(np.abs(all_a - all_e)))
    corr = np.mean([pearsonr(a, e)[0] for a, e in zip(actuals, estimates)])
    assert metrics["mean_pearson_correlation"] == pytest.approx(corr)


def test_metric_mask_broadcast_over_channels():
    mm = ModelMetric()
    a = np.ones((2, 4, 4))
    e = np.zeros((2, 4, 4))
    mask = np.ones((1, 4, 4))
    mm.accumulate(a, e, mask)
    assert mm.get_metrics()["mse"] == pytest.approx(1.0)


def test_fast_metrics_matches_model_metric():
    rng = np.random.default_rng(1)
    n = 6
    a = rng.normal(size=(n, 16, 16, 1)).astype(np.float32)
    e = (a + rng.normal(scale=0.2, size=a.shape)).astype(np.float32)
    mask = (rng.random((n, 16, 16, 1)) > 0.15).astype(np.float32)

    mm = ModelMetric()
    for i in range(n):
        mm.accumulate(a[i], e[i], mask[i])
    host = mm.get_metrics()

    fast = fast_metrics(jnp.asarray(a), jnp.asarray(e), jnp.asarray(mask))
    fast = {k: float(v) for k, v in fast.items()}
    for k in host:
        assert fast[k] == pytest.approx(host[k], rel=2e-4), k
