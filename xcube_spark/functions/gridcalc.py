"""Fixed-Earth-grid resolution calculator — the ``xcube grid`` CLI
(reference ``xcube/cli/grid.py``), restated.

Pure driver-side arithmetic (no Spark): given a target resolution, it
enumerates the exact rational resolutions ``coverage / height`` whose
integer ``height`` factors as ``height_0 * 2^level`` — i.e. grids
that carry a whole power-of-two pyramid with a base tile of at most
``max_tile`` rows, which is exactly the constraint the levels writer
(operators/levels.py) and the tiling scheme need to nest without
resampling."""

from __future__ import annotations

import math
from dataclasses import dataclass
from fractions import Fraction

#: 2 * pi * WGS84 semi-major axis
EARTH_EQUATORIAL_PERIMETER = 2.0 * math.pi * 6_378_137.0


def meters_to_degrees(res_m: float) -> float:
    return 360.0 * res_m / EARTH_EQUATORIAL_PERIMETER


def degrees_to_meters(res_deg: float) -> float:
    return res_deg / 360.0 * EARTH_EQUATORIAL_PERIMETER


def factor_out_two(n: int) -> tuple[int, int]:
    """n -> (odd_factor, exponent) with n == odd_factor * 2**exponent."""
    if n < 0:
        raise ValueError("n must not be negative")
    if n == 0:
        return 0, 0
    e = (n & -n).bit_length() - 1
    return n >> e, e


@dataclass(frozen=True)
class GridResolution:
    """One candidate grid: exact resolution ``res = coverage/height``
    with ``height = height_0 * 2**level``."""

    delta_pct: float      # deviation from the target, percent
    res: Fraction         # exact resolution in degrees
    height: int           # grid rows over the coverage
    height_0: int         # base (level-0) tile rows
    level: int            # pyramid levels carried

    @property
    def res_deg(self) -> float:
        return float(self.res)

    @property
    def res_m(self) -> float:
        return degrees_to_meters(float(self.res))

    def row(self) -> tuple:
        return (round(self.delta_pct, 3), self.res.numerator,
                self.res.denominator, self.res_deg,
                round(self.res_m, 2), self.height, self.height_0,
                self.level)


RES_HEADER = ("R_D (%)", "R_NOM", "R_DEN", "R (deg)", "R (m)", "H",
              "H0", "L")


def find_close_resolutions(
    target_res: float,
    delta_res: float,
    coverage: Fraction | int = Fraction(180),
    max_tile: int = 2500,
    min_level: int = 0,
    int_inv_res: bool = False,
) -> list[GridResolution]:
    """All exact grid resolutions within ``delta_res`` of
    ``target_res`` (degrees), sorted by absolute deviation."""
    if target_res <= 0.0:
        raise ValueError("target_res must be positive")
    if not 0.0 <= delta_res < target_res:
        raise ValueError("delta_res must be in [0, target_res)")
    coverage = Fraction(coverage)
    h_min = math.floor(coverage / (target_res + delta_res))
    h_max = math.ceil(coverage / (target_res - delta_res))
    out = []
    for height in range(max(h_min, 1), h_max + 1):
        res = coverage / height
        if int_inv_res and res.numerator != 1:
            continue
        delta = float(res) - target_res
        if abs(delta) > delta_res:
            continue
        height_0, level = factor_out_two(height)
        if height_0 > max_tile or level < min_level:
            continue
        out.append(GridResolution(
            delta_pct=100.0 * delta / target_res, res=res,
            height=height, height_0=height_0, level=level))
    return sorted(out, key=lambda g: abs(g.delta_pct))


LEVELS_HEADER = ("L", "H", "R", "R (deg)", "R (m)")


def get_levels(height: int, coverage: Fraction | int = Fraction(180),
               min_levels: int | None = None) -> list[tuple]:
    """The power-of-two level ladder of a grid with ``height`` rows:
    rows ``(level, height, exact res, res deg, res m)``."""
    coverage = Fraction(coverage)
    height_0, level = factor_out_two(height)
    res_0 = coverage / height_0
    rows = []
    for i in range(max(level, min_levels or level) + 1):
        h_i = height_0 << i
        r_i = res_0 / (1 << i)
        rows.append((i, h_i, r_i, float(r_i),
                     round(degrees_to_meters(float(r_i)), 2)))
    return rows


def get_adjusted_box(x1: float, y1: float, x2: float, y2: float,
                     res: float) -> tuple[float, float, float, float]:
    """Snap a bounding box outward onto the ``res`` grid (the smallest
    grid-aligned box containing the input)."""
    ax1 = res * math.floor(x1 / res)
    ay1 = res * math.floor(y1 / res)
    ax2 = res * math.ceil(x2 / res)
    ay2 = res * math.ceil(y2 / res)
    if ax2 - res >= x2:
        ax2 -= res
    if ay2 - res >= y2:
        ay2 -= res
    return ax1, ay1, ax2, ay2


def parse_res(s: str) -> float:
    """'0.05' (degrees) or '300m' (meters) -> degrees."""
    s = s.strip()
    if s.endswith("m"):
        return meters_to_degrees(float(s[:-1]))
    return float(s)


def parse_delta(s: str, target_deg: float) -> float:
    """'2.5%' (of target), '0.001' (degrees) or '10m' -> degrees."""
    s = s.strip()
    if s.endswith("%"):
        return float(s[:-1]) / 100.0 * target_deg
    return parse_res(s)
