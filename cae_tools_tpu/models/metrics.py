"""Evaluation metric accumulator (parity with reference ``model_metric.py:19-71``).

Accumulates per-instance masked (actual, estimate) vectors on the host and
emits ``mse``, ``rmse``, ``mae`` and ``mean_pearson_correlation`` (scipy
``pearsonr`` per instance, averaged).  Used by ``BaseModel.evaluate`` on
denormalised values.
"""

from __future__ import annotations

import numpy as np
from scipy.stats import pearsonr


def fast_metrics(actual, estimate, mask):
    """Jittable whole-dataset metrics, exactly matching ModelMetric.

    actual/estimate/mask: (N, H, W, C) arrays (mask broadcastable).  Computes
    masked global mse/rmse/mae and the per-instance masked Pearson
    correlation averaged over instances — identical math to scipy's
    ``pearsonr`` over the masked vector of each instance.
    """
    import jax.numpy as jnp

    m = jnp.broadcast_to(mask, actual.shape).astype(jnp.float64)
    a = actual.astype(jnp.float64)
    e = estimate.astype(jnp.float64)
    n = a.shape[0]
    af = a.reshape(n, -1)
    ef = e.reshape(n, -1)
    mf = m.reshape(n, -1)

    diff = (af - ef) * mf
    count = jnp.sum(mf)
    mse = jnp.sum(diff**2) / count
    mae = jnp.sum(jnp.abs(diff)) / count

    cnt_i = jnp.sum(mf, axis=1)
    mean_a = jnp.sum(af * mf, axis=1) / cnt_i
    mean_e = jnp.sum(ef * mf, axis=1) / cnt_i
    ca = (af - mean_a[:, None]) * mf
    ce = (ef - mean_e[:, None]) * mf
    cov = jnp.sum(ca * ce, axis=1)
    var_a = jnp.sum(ca**2, axis=1)
    var_e = jnp.sum(ce**2, axis=1)
    corr = cov / jnp.sqrt(var_a * var_e)
    mean_corr = jnp.mean(corr)

    return {
        "mse": mse,
        "rmse": jnp.sqrt(mse),
        "mae": mae,
        "mean_pearson_correlation": mean_corr,
    }


class ModelMetric:
    def __init__(self):
        self.actuals = []
        self.estimates = []

    def accumulate(self, actual: np.ndarray, estimates: np.ndarray, mask: np.ndarray):
        if actual.shape != estimates.shape:
            raise ValueError("The shapes of 'actual' and 'estimates' must match.")
        actual_flat = np.asarray(actual).flatten()
        estimates_flat = np.asarray(estimates).flatten()
        mask_flat = np.asarray(mask).flatten().astype(bool)
        if mask_flat.size != actual_flat.size:
            # broadcast a (1, H, W)-style mask over channels
            mask_full = np.broadcast_to(
                np.asarray(mask), np.asarray(actual).shape
            ).flatten().astype(bool)
        else:
            mask_full = mask_flat
        self.actuals.append(actual_flat[mask_full])
        self.estimates.append(estimates_flat[mask_full])

    def get_metrics(self) -> dict:
        if not self.actuals or not self.estimates:
            raise ValueError("No data accumulated to calculate metrics.")
        all_actuals = np.concatenate(self.actuals)
        all_estimates = np.concatenate(self.estimates)

        mse = float(np.mean((all_actuals - all_estimates) ** 2))
        rmse = float(np.sqrt(mse))
        mae = float(np.mean(np.abs(all_actuals - all_estimates)))

        correlations = []
        for actual, estimate in zip(self.actuals, self.estimates):
            if actual.size == 0 or estimate.size == 0:
                continue
            correlation, _ = pearsonr(actual, estimate)
            correlations.append(correlation)
        mean_pearson = float(np.mean(correlations)) if correlations else 0.0

        return {
            "mse": mse,
            "rmse": rmse,
            "mae": mae,
            "mean_pearson_correlation": mean_pearson,
        }
