import numpy as np

from feasts_ray.functions.timeutils import (
    floor_time,
    interval_to_period,
    lag,
    phase_of,
    round_period,
    time_offset_origin,
    within_bounds,
)


def test_lag_semantics():
    x = np.array([1.0, 2.0, 3.0, 4.0])
    out = lag(x, 2)
    assert np.isnan(out[:2]).all() and list(out[2:]) == [1.0, 2.0]
    lead = lag(x, -1)
    assert list(lead[:3]) == [2.0, 3.0, 4.0] and np.isnan(lead[3])
    assert np.isnan(lag(x, 10)).all()


def test_within_bounds_filters():
    x = np.array([-5.0, 0.0, 3.0, 7.0, np.nan])
    assert list(within_bounds(x, 0, 5)) == [0.0, 3.0]


def test_floor_time_matches_r_flooring():
    ts = np.array([0, 59, 60, 61, 3601])
    assert list(floor_time(ts, 60)) == [0, 0, 60, 60, 3600]
    # non-zero origin: (x - origin) %/% unit * unit + origin
    assert list(floor_time(ts, 60, origin_s=30)) == [-30, 30, 30, 30, 3570]


def test_round_period_carry():
    assert round_period(60, "second") == (1, "minute")
    assert round_period(3600, "second") == (1, "hour")
    assert round_period(24, "hour") == (1, "day")
    assert round_period(90, "second") == (90, "second")


def test_interval_to_period():
    p = interval_to_period(60)
    assert p["hour"] == 60 and p["day"] == 1440 and "minute" not in p


def test_phase_and_offset():
    b = np.array([0, 3600, 86400 + 7200])
    assert list(phase_of(b, 3600, "day")) == [0, 1, 2]
    assert list(time_offset_origin(b, "day")) == [0, 3600, 7200]
    # 1970-01-01 is a Thursday -> phase 3 in a Monday-start week
    assert phase_of(np.array([0]), 86400, "week")[0] == 3
