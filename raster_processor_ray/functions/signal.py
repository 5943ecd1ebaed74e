"""Complex-signal per-batch kernels (SURVEY.md M10 analog).

The reference flattens the complex interferogram by removing the
geometric phase predicted from antenna/target positions
(``ag.flatten_interferogram`` call-site, reference raster_proc.py:339-367,
after the as-of join to the sensor trajectory). The engine keeps complex
data as two float columns (Arrow has no complex type) and provides the
same phase-rotation kernels, vectorized.
"""

from __future__ import annotations

import numpy as np

from ..geo.crs import llh_to_ecef


def geometric_phase(plus_xyz, minus_xyz, target_lat, target_lon, target_h,
                    wavelength: float = 0.008385803):
    """Predicted interferometric phase from the two antenna positions and
    the target location: ``2*pi/lambda * (r_minus - r_plus)`` (KaRIn-like
    wavelength default)."""
    tx, ty, tz = llh_to_ecef(target_lat, target_lon, target_h)
    px, py, pz = plus_xyz
    mx, my, mz = minus_xyz
    r_plus = np.sqrt((tx - px) ** 2 + (ty - py) ** 2 + (tz - pz) ** 2)
    r_minus = np.sqrt((tx - mx) ** 2 + (ty - my) ** 2 + (tz - mz) ** 2)
    return 2.0 * np.pi / wavelength * (r_minus - r_plus)


def flatten_complex(re: np.ndarray, im: np.ndarray, phase: np.ndarray):
    """Rotate a complex signal by ``-phase``: removes the predicted
    geometric fringe, leaving the residual phase (the 'flattened'
    interferogram). Returns (re_flat, im_flat)."""
    c, s = np.cos(phase), np.sin(phase)
    return re * c + im * s, im * c - re * s


def coherence(re: np.ndarray, im: np.ndarray, power_a: np.ndarray,
              power_b: np.ndarray) -> np.ndarray:
    """Interferometric coherence magnitude |ifgram| / sqrt(Pa*Pb)."""
    mag = np.sqrt(re ** 2 + im ** 2)
    with np.errstate(divide="ignore", invalid="ignore"):
        denom = np.sqrt(power_a * power_b)
        return np.where(denom > 0, mag / denom, 0.0)
