"""Exponential-smoothing forecasting over grid-sized series.

Holt's linear-trend method (double exponential smoothing, Holt 1957;
the trend-capable sibling of the `monthly_revenue_mase` naive
baselines):

    l_t = α·y_t + (1-α)·(l_{t-1} + b_{t-1})
    b_t = β·(l_t - l_{t-1}) + (1-β)·b_{t-1}
    ŷ_t = l_{t-1} + b_{t-1}          (one-step-ahead fit)

The recurrence is sequential and non-associative — the one shape a
distributed fold cannot reorder — but its INPUT is a monthly/daily
aggregate: grid-sized metadata by construction (≈ 80 rows for seven
years of months), so the right execution is the Markov-solver
discipline (PERF_NOTES r9): Spark does the one data-sized aggregate,
the driver runs the O(grid) loop, and the result ships back as a tiny
DataFrame.

Cross-engine determinism: α = β = 1/2 makes every multiply exact in
binary64; each recurrence line then performs exactly one rounded IEEE
addition in a FIXED order, mirrored literally by a DuckDB recursive
CTE over the same integer-cent inputs — both engines execute the
identical correctly-rounded op sequence, so the fit matches bit-for-
bit with no tolerance.
"""

from __future__ import annotations


def holt_linear_fit(ys: list[float]) -> list[tuple[float, float, float | None]]:
    """[(level, trend, one-step-ahead fit)] per observation, α=β=1/2.

    Init (standard): l_1 = y_1, b_1 = y_2 − y_1; the t=1 fit is None
    (no prior state to predict from). Inputs should be exact integers
    (cents / micro-units) represented as doubles so the only rounding
    is the recurrence's own additions — the oracle mirrors exactly."""
    if len(ys) < 2:
        raise ValueError("Holt's method needs at least 2 observations")
    level, trend = float(ys[0]), float(ys[1]) - float(ys[0])
    out: list[tuple[float, float, float | None]] = [(level, trend, None)]
    for y in ys[1:]:
        prev = level + trend  # one rounded add — mirrored in the oracle
        new_level = 0.5 * float(y) + 0.5 * prev
        new_trend = 0.5 * (new_level - level) + 0.5 * trend
        out.append((new_level, new_trend, prev))
        level, trend = new_level, new_trend
    return out
