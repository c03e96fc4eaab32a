"""Evaluation metric accumulator (parity with reference ``model_metric.py:19-71``).

Accumulates per-instance masked (actual, estimate) vectors on the host and
emits ``mse``, ``rmse``, ``mae`` and ``mean_pearson_correlation`` (scipy
``pearsonr`` per instance, averaged).  Used by ``BaseModel.evaluate`` on
denormalised values.
"""

from __future__ import annotations

import numpy as np
from scipy.stats import pearsonr


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
