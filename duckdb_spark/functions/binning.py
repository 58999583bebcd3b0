"""equi_width_bins: DuckDB's "nice bins" boundary generator.

Semantics: reference `extension/core_functions/scalar/generic/binning.cpp`
(EquiWidthBinsInteger/Double/Timestamp + MakeNumberNice/MakeIntervalNice/
MakeTimestampNice). Re-derived clean-room in Python over arbitrary-precision
ints / IEEE doubles / datetimes.

In the reference this is a scalar SQL function; in practice every call site
passes constants (it exists to feed histogram()'s bin list), so the dialect
layer constant-folds calls with literal arguments through this module and
inlines the resulting array literal — zero runtime cost, and Catalyst sees
a plain literal it can use for pruning. Column-argument calls are left
unresolved (same surface as an unregistered function).

Notable faithful quirks:
- integer boundaries are computed in 1000x fixed point with C++
  truncating division (`_tdiv`);
- MakeNumberNice with a step of 1 (fixed-point) hits the reference's
  divide-by-zero-times-zero path and yields step 0, which keeps the
  original un-niced step — emulated by `_round_to(x, 0) == 0`;
- double boundary rounding multiplies by 10/previous_power_of_ten(step)
  computed BEFORE nice-ing the step;
- the first (max) boundary is clamped up to the input max, then the list
  is reversed to ascending.
"""

from __future__ import annotations

import datetime
import math

MAX_BIN_COUNT = 1_000_000

_MICROS_PER_SEC = 1_000_000
_MICROS_PER_MINUTE = 60 * _MICROS_PER_SEC
_MICROS_PER_HOUR = 60 * _MICROS_PER_MINUTE
_MICROS_PER_DAY = 24 * _MICROS_PER_HOUR
_DAYS_PER_MONTH = 30


def _tdiv(a: int, b: int) -> int:
    """C++ truncating integer division; division by zero yields 0 (the
    reference's bit-division garbage is always multiplied by the zero
    divisor right after, so the product is 0)."""
    if b == 0:
        return 0
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def _prev_power_of_ten_int(x: int) -> int:
    p = 1
    while p < x:
        p *= 10
    return _tdiv(p, 10)


def _round_to_int(x: int, num: int, ceiling: bool) -> int:
    if num == 0:
        return 0
    if ceiling:
        return _tdiv(x + (num - 1), num) * num
    return _tdiv(x + _tdiv(num, 2), num) * num


def _make_nice_int(x: int, step: int, ceiling: bool = False) -> int:
    p = _prev_power_of_ten_int(step)
    two, five = p * 2, p
    if p * 3 <= step:
        two *= 5
    if p * 2 <= step:
        five *= 5
    r2 = _round_to_int(x, two, ceiling)
    r5 = _round_to_int(x, five, ceiling)
    return r2 if abs(x - r2) < abs(x - r5) else r5


def _bins_int(input_min: int, input_max: int, count: int, nice: bool) -> list[int]:
    FACTOR = 1000
    mn, mx = input_min * FACTOR, input_max * FACTOR
    step = _tdiv(mx - mn, count)
    if nice:
        new_step = _make_nice_int(step, step)
        new_max = _round_to_int(mx, new_step, ceiling=True)
        if new_max != mn and new_step != 0:
            mx, step = new_max, new_step
        count *= 2
    I64_MIN, I64_MAX = -(1 << 63), (1 << 63) - 1
    result: list[int] = []
    b = mx
    while b > mn:
        # int64 narrowing saturates (a niced max can exceed the i64 range;
        # the reference's cast clamps it back to the type bound)
        real = min(max(_tdiv(b, FACTOR), I64_MIN), I64_MAX)
        if result:
            if real < input_min or len(result) >= count:
                break
            if real == result[-1]:
                b -= step
                continue
        result.append(real)
        if step == 0:
            break
        b -= step
    return result


def _prev_power_of_ten_dbl(x: float) -> float:
    p = 1.0
    if x < 1:
        while p > x:
            p /= 10
        return p
    while p < x:
        p *= 10
    return p / 10


def _round_to_dbl(x: float, num: float, ceiling: bool) -> float:
    if num == 0:
        return x  # round(x/0)=inf -> non-finite -> keep input
    # C++ std::round: half away from zero; Python round() is banker's
    q = x / num
    r = (math.ceil(q) if ceiling else math.floor(abs(q) + 0.5) * (1 if q >= 0 else -1)) * num
    return x if not math.isfinite(r) else r


def _make_nice_dbl(x: float, step: float, ceiling: bool = False) -> float:
    if x == 0:
        return 0.0
    p = _prev_power_of_ten_dbl(step)
    two, five = p * 2, p
    if p * 3 <= step:
        two *= 5
    if p * 2 <= step:
        five *= 5
    r2 = _round_to_dbl(x, two, ceiling)
    r5 = _round_to_dbl(x, five, ceiling)
    return r2 if abs(x - r2) < abs(x - r5) else r5


def _bins_dbl(input_min: float, input_max: float, count: int, nice: bool) -> list[float]:
    mn, mx = input_min, input_max
    span = mx - mn
    if not math.isfinite(span):
        step = mx / count - mn / count
    else:
        step = span / count
    step_p10 = _prev_power_of_ten_dbl(step)
    if nice:
        step = _make_nice_dbl(step, step)
        mx = _round_to_dbl(input_max, step, ceiling=True)
        count *= 2
    if step == 0:
        raise ValueError("equi_width_bins: step is 0")
    round_mult = 10 / step_p10
    result: list[float] = []
    b = mx
    while b > mn:
        real = b
        if nice:
            r = math.copysign(math.floor(abs(b * round_mult) + 0.5), b) / round_mult
            if math.isfinite(r):
                # beyond 1e22 powers of ten stop being exact doubles, so the
                # round-trip through round_mult picks up 1-ulp noise on an
                # already-nice boundary; snap to the shortest 15-digit decimal
                real = float(f"{r:.15g}") if abs(r) > 1e22 else r
        if result and result[-1] == real:
            b -= step
            continue
        if real <= mn or len(result) >= count:
            break
        result.append(real)
        b -= step
    return result


# ---------------------------------------------------------------- timestamps


def _ts_components(ts: datetime.datetime):
    return (ts.year, ts.month, ts.day, ts.hour, ts.minute, ts.second, ts.microsecond)


def _next_month(y: int, m: int):
    m += 1
    if m == 13:
        return y + 1, 1
    return y, m


def _make_interval_nice(months: int, days: int, micros: int):
    def rdiv(n, d):
        return _tdiv(n + _tdiv(d, 2), d) * d

    if months >= 6:
        days = micros = 0
    elif months > 0 or days >= 5:
        micros = 0
    elif days > 0 or micros >= 6 * _MICROS_PER_HOUR:
        micros = rdiv(micros, _MICROS_PER_HOUR)
    elif micros >= _MICROS_PER_HOUR:
        micros = rdiv(micros, _MICROS_PER_MINUTE * 15)
    elif micros >= _MICROS_PER_MINUTE * 10:
        micros = rdiv(micros, _MICROS_PER_MINUTE)
    elif micros >= _MICROS_PER_MINUTE:
        micros = rdiv(micros, _MICROS_PER_SEC * 15)
    elif micros >= _MICROS_PER_SEC * 10:
        micros = rdiv(micros, _MICROS_PER_SEC)
    return months, days, micros


def _make_timestamp_nice(ts: datetime.datetime, months: int, days: int, micros: int):
    y, mo, d, h, mi, s, us = _ts_components(ts)
    if months >= 12:
        if d > 1 or h > 0 or mi > 0 or s > 0 or us > 0:
            y, mo = _next_month(y, mo)
            d, h, mi, s, us = 1, 0, 0, 0, 0
    elif months > 0 or days >= 1:
        if h > 0 or mi > 0 or s > 0 or us > 0:
            base = datetime.date(y, mo, d) + datetime.timedelta(days=1)
            y, mo, d = base.year, base.month, base.day
            h = mi = s = us = 0
    elif days > 0 or micros >= _MICROS_PER_HOUR:
        if mi > 0 or s > 0 or us > 0:
            base = datetime.datetime(y, mo, d, h) + datetime.timedelta(hours=1)
            y, mo, d, h = base.year, base.month, base.day, base.hour
            mi = s = us = 0
    elif micros >= _MICROS_PER_MINUTE:
        if s > 0 or us > 0:
            base = datetime.datetime(y, mo, d, h, mi) + datetime.timedelta(minutes=1)
            y, mo, d, h, mi = base.year, base.month, base.day, base.hour, base.minute
            s = us = 0
    elif micros >= _MICROS_PER_SEC:
        if us > 0:
            base = datetime.datetime(y, mo, d, h, mi, s) + datetime.timedelta(seconds=1)
            y, mo, d, h, mi, s = (
                base.year, base.month, base.day, base.hour, base.minute, base.second,
            )
            us = 0
    return datetime.datetime(y, mo, d, h, mi, s, us)


def _sub_interval(ts: datetime.datetime, months: int, days: int, micros: int):
    """timestamp - interval, DuckDB calendar semantics: months first (day
    clamped to the target month's length), then days, then micros."""
    if months:
        total = (ts.year * 12 + ts.month - 1) - months
        y, mo = divmod(total, 12)
        mo += 1
        last = [31, 29 if (y % 4 == 0 and (y % 100 != 0 or y % 400 == 0)) else 28,
                31, 30, 31, 30, 31, 31, 30, 31, 30, 31][mo - 1]
        ts = ts.replace(year=y, month=mo, day=min(ts.day, last))
    return ts - datetime.timedelta(days=days, microseconds=micros)


def _epoch_us(ts: datetime.datetime) -> int:
    return (ts - datetime.datetime(1970, 1, 1)) // datetime.timedelta(microseconds=1)


def _bins_ts(mn: datetime.datetime, mx: datetime.datetime, count: int, nice: bool):
    if not nice:
        return [
            datetime.datetime(1970, 1, 1) + datetime.timedelta(microseconds=v)
            for v in _bins_int(_epoch_us(mn), _epoch_us(mx), count, False)
        ]
    ny, nmo, nd, nh, nmi, ns, nus = _ts_components(mn)
    xy, xmo, xd, xh, xmi, xs, xus = _ts_components(mx)
    diff_months = (xy - ny) * 12 + (xmo - nmo)
    diff_days = xd - nd
    diff_micros = (
        (xh - nh) * _MICROS_PER_HOUR + (xmi - nmi) * _MICROS_PER_MINUTE
        + (xs - ns) * _MICROS_PER_SEC + (xus - nus)
    )
    step_months = diff_months / count
    step_days = diff_days / count
    step_micros = diff_micros / count
    if step_months > 0:
        step_days += (step_months - math.floor(step_months)) * _DAYS_PER_MONTH
    if step_days > 0:
        step_micros += (step_days - math.floor(step_days)) * _MICROS_PER_DAY
    months, days, micros = int(step_months), int(step_days), int(step_micros)
    months, days, micros = _make_interval_nice(months, days, micros)
    val = _make_timestamp_nice(mx, months, days, micros)
    if months <= 0 and days <= 0 and micros <= 0:
        months = days = 0
        micros = 1
    result = []
    while val >= mn and len(result) < count:
        result.append(val)
        val = _sub_interval(val, months, days, micros)
    return result


def equi_width_bins(mn, mx, count, nice: bool):
    """Boundary list for [mn, mx] over `count` approximate bins.

    mn/mx: both int → BIGINT path; any float → DOUBLE path;
    datetime.datetime/date → TIMESTAMP path (dates are returned as dates).
    Raises ValueError on the reference's error conditions (message
    substrings match binning.cpp's InvalidInputException texts).
    """
    if count is None or mn is None or mx is None or nice is None:
        raise ValueError("equi_width_bins: arguments cannot be NULL")
    count = int(count)
    if isinstance(mn, float) or isinstance(mx, float):
        mn, mx = float(mn), float(mx)
        if not (math.isfinite(mn) and math.isfinite(mx)):
            raise ValueError(
                "equi_width_bins does not support infinite or nan as min/max value"
            )
    dateish = isinstance(mn, (datetime.date, datetime.datetime))
    as_date = dateish and not isinstance(mn, datetime.datetime) and not isinstance(
        mx, datetime.datetime
    )
    if dateish:
        if not isinstance(mn, datetime.datetime):
            mn = datetime.datetime(mn.year, mn.month, mn.day)
        if not isinstance(mx, datetime.datetime):
            mx = datetime.datetime(mx.year, mx.month, mx.day)
    if mx < mn:
        raise ValueError(
            "Invalid input for bin function - max value is smaller than min value"
        )
    if count <= 0:
        raise ValueError("Invalid input for bin function - there must be > 0 bins")
    if count > MAX_BIN_COUNT:
        raise ValueError(
            f"Invalid input for bin function - max bin count of {MAX_BIN_COUNT} exceeded"
        )
    if mx == mn:
        vals = [mx]
    else:
        if dateish:
            vals = _bins_ts(mn, mx, count, nice)
        elif isinstance(mn, float):
            vals = _bins_dbl(mn, mx, count, nice)
        else:
            vals = _bins_int(mn, mx, count, nice)
        if vals and vals[0] < mx:
            vals[0] = mx
        vals.reverse()
    if as_date:
        vals = [v.date() if isinstance(v, datetime.datetime) else v for v in vals]
    return vals
