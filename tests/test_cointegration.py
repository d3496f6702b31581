"""Cointegration tests: planted cointegrated pair vs independent walks."""

import numpy as np

from feasts_ray.functions.cointegration import (
    cointegration_johansen,
    cointegration_phillips_ouliaris,
)


def _pairs(seed=0, n=400):
    rng = np.random.default_rng(seed)
    w = np.cumsum(rng.standard_normal(n))
    y = 2.0 * w + 0.5 * rng.standard_normal(n)
    coint = np.column_stack([y, w])
    indep = np.column_stack([np.cumsum(rng.standard_normal(n)),
                             np.cumsum(rng.standard_normal(n))])
    return coint, indep


def test_phillips_ouliaris():
    coint, indep = _pairs()
    assert cointegration_phillips_ouliaris(coint)["po_pvalue"] <= 0.05
    assert cointegration_phillips_ouliaris(indep)["po_pvalue"] >= 0.10


def test_johansen():
    coint, indep = _pairs()
    jc = cointegration_johansen(coint)
    ji = cointegration_johansen(indep)
    assert jc["johansen_pvalue"] <= 0.05 and jc["johansen_rank"] == 1.0
    assert ji["johansen_pvalue"] >= 0.10 and ji["johansen_rank"] == 0.0


def test_short_and_degenerate():
    out = cointegration_phillips_ouliaris(np.zeros((5, 2)))
    assert np.isnan(out["po_stat"])
    out = cointegration_johansen(np.zeros((8, 2)))
    assert np.isnan(out["johansen_trace"])


def test_nan_rows_dropped():
    coint, _ = _pairs()
    coint[10, 0] = np.nan
    out = cointegration_phillips_ouliaris(coint)
    assert np.isfinite(out["po_stat"])
