"""Solar-geometry scalar functions (SURVEY.md §2.9, F1-F10).

Every function returns a native Column expression (constant-folded /
codegen'd by Catalyst). Formulas are the published Duffie & Beckman /
Cooper / Spencer equations, the same ones the reference implements
(pvsystemprofiler/utilities/{equation_of_time,declination_equation}.py,
sunrise_sunset_estimation.py:381-489).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEG = math.pi / 180.0


def day_angle(doy: Column) -> Column:
    """B = 2*pi*(n-1)/365 (radians)."""
    return 2.0 * math.pi * (doy - 1) / 365.0


def eot_duffie(doy: Column) -> Column:
    """F1 — equation of time, minutes (Duffie & Beckman eq. 1.5.3)."""
    b = day_angle(doy)
    return 229.2 * (
        0.000075
        + 0.001868 * F.cos(b)
        - 0.032077 * F.sin(b)
        - 0.014615 * F.cos(2 * b)
        - 0.04089 * F.sin(2 * b)
    )


def eot_da_rosa(doy: Column) -> Column:
    """F2 — equation of time, minutes (da Rosa / Haghdadi form)."""
    b = 2.0 * math.pi * (doy - 81) / 364.0
    return 9.87 * F.sin(2 * b) - 7.53 * F.cos(b) - 1.5 * F.sin(b)


def delta_cooper(doy: Column) -> Column:
    """F3 — solar declination, degrees (Cooper 1969)."""
    return 23.45 * F.sin(2.0 * math.pi * (284 + doy) / 365.0)


def delta_spencer(doy: Column) -> Column:
    """F3 — solar declination, radians (Spencer 1971 Fourier series)."""
    b = day_angle(doy)
    return (
        0.006918
        - 0.399912 * F.cos(b)
        + 0.070257 * F.sin(b)
        - 0.006758 * F.cos(2 * b)
        + 0.000907 * F.sin(2 * b)
        - 0.002697 * F.cos(3 * b)
        + 0.00148 * F.sin(3 * b)
    )


def sunset_hour_angle(lat_deg: Column | float, delta_deg: Column) -> Column:
    """F4 — geometric sunset hour angle (degrees):
    ws = acos(-tan(lat) tan(delta))."""
    lat = F.lit(lat_deg) if not isinstance(lat_deg, Column) else lat_deg
    cos_ws = -F.tan(lat * _DEG) * F.tan(delta_deg * _DEG)
    clamped = F.greatest(F.lit(-1.0), F.least(F.lit(1.0), cos_ws))
    return F.acos(clamped) / _DEG


def num_daylight_hours(lat_deg: Column | float, delta_deg: Column) -> Column:
    """F4 — daylight hours = 2*ws/15."""
    return 2.0 * sunset_hour_angle(lat_deg, delta_deg) / 15.0


def solar_to_clock_minutes(
    solar_noon_min: Column, eot_min: Column, lon_deg: Column | float, gmt_offset: float
) -> Column:
    """F5 — clock time = solar time - EoT - 4*(lon - 15*gmt_offset) minutes."""
    lon = F.lit(lon_deg) if not isinstance(lon_deg, Column) else lon_deg
    return solar_noon_min - eot_min - 4.0 * (lon - 15.0 * gmt_offset)


def hour_angle(solar_hour: Column) -> Column:
    """F6 — omega = 15*(solar_hour - 12), degrees."""
    return 15.0 * (solar_hour - 12.0)


def calc_lon(noon_minutes: Column, eot_min: Column, gmt_offset: float) -> Column:
    """F7 — longitude estimate per day:
    (720 - noon_minutes - eot)/4 + 15*gmt_offset; aggregate with median."""
    return (720.0 - noon_minutes - eot_min) / 4.0 + 15.0 * gmt_offset


def calc_lat(hours_daylight: Column, delta_deg: Column) -> Column:
    """F8 — latitude from daylight hours + declination (degrees):
    lat = atan(-cos(15*H/2) / tan(delta))."""
    return (
        F.atan(
            -F.cos(15.0 * hours_daylight / 2.0 * _DEG) / F.tan(delta_deg * _DEG)
        )
        / _DEG
    )


def cos_theta(
    delta_deg: Column,
    omega_deg: Column,
    lat_deg: Column | float,
    tilt_deg: Column | float,
    azimuth_deg: Column | float,
) -> Column:
    """F9 — angle-of-incidence cosine, full form (Duffie & Beckman 1.6.2)."""
    lat = (F.lit(lat_deg) if not isinstance(lat_deg, Column) else lat_deg) * _DEG
    beta = (F.lit(tilt_deg) if not isinstance(tilt_deg, Column) else tilt_deg) * _DEG
    gamma = (
        F.lit(azimuth_deg) if not isinstance(azimuth_deg, Column) else azimuth_deg
    ) * _DEG
    d = delta_deg * _DEG
    w = omega_deg * _DEG
    return (
        F.sin(d) * F.sin(lat) * F.cos(beta)
        - F.sin(d) * F.cos(lat) * F.sin(beta) * F.cos(gamma)
        + F.cos(d) * F.cos(lat) * F.cos(beta) * F.cos(w)
        + F.cos(d) * F.sin(lat) * F.sin(beta) * F.cos(gamma) * F.cos(w)
        + F.cos(d) * F.sin(beta) * F.sin(gamma) * F.sin(w)
    )


def custom_round(col: Column, base: float) -> Column:
    """F10 — round to nearest multiple of ``base`` (capacity_change.py:221)."""
    return F.round(col / base) * base
