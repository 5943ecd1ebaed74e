"""Exact ellipsoidal geodesic distance — vectorized Vincenty inverse.

The engine's kNN stage selects candidates with spherical dot products
(cheap) and refines the survivors with the exact WGS84 geodesic distance
(this module) — the same two-phase shape the reference uses for
height-constrained geolocation (coarse raster lookup then iterative
Taylor refinement, reference geoloc_raster.py:90-194).

Vincenty (1975) inverse formula, iterated to 1e-12 rad; nearly-antipodal
pairs that fail to converge fall back to the spherical great-circle
distance (documented limitation of Vincenty; fine for nearest-neighbor
refinement where antipodal candidates are never nearest).
"""

from __future__ import annotations

import numpy as np

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
WGS84_B = WGS84_A * (1.0 - WGS84_F)


def vincenty_m(lat1_deg, lon1_deg, lat2_deg, lon2_deg, *, max_iter: int = 20,
               tol: float = 1e-12) -> np.ndarray:
    """Vectorized WGS84 geodesic distance in meters."""
    lat1, lon1, lat2, lon2 = (np.radians(np.asarray(a, dtype=np.float64))
                              for a in (lat1_deg, lon1_deg, lat2_deg, lon2_deg))
    u1 = np.arctan((1.0 - WGS84_F) * np.tan(lat1))
    u2 = np.arctan((1.0 - WGS84_F) * np.tan(lat2))
    ll = lon2 - lon1
    sin_u1, cos_u1 = np.sin(u1), np.cos(u1)
    sin_u2, cos_u2 = np.sin(u2), np.cos(u2)

    lam = ll.copy()
    converged = np.zeros(lam.shape, dtype=bool)
    sin_sigma = np.zeros_like(lam)
    cos_sigma = np.ones_like(lam)
    sigma = np.zeros_like(lam)
    cos_sq_alpha = np.ones_like(lam)
    cos_2sm = np.zeros_like(lam)

    for _ in range(max_iter):
        sin_lam, cos_lam = np.sin(lam), np.cos(lam)
        t1 = cos_u2 * sin_lam
        t2 = cos_u1 * sin_u2 - sin_u1 * cos_u2 * cos_lam
        sin_sigma_n = np.sqrt(t1 * t1 + t2 * t2)
        cos_sigma_n = sin_u1 * sin_u2 + cos_u1 * cos_u2 * cos_lam
        sigma_n = np.arctan2(sin_sigma_n, cos_sigma_n)
        with np.errstate(divide="ignore", invalid="ignore"):
            sin_alpha = np.where(sin_sigma_n != 0,
                                 cos_u1 * cos_u2 * sin_lam / np.where(
                                     sin_sigma_n == 0, 1.0, sin_sigma_n), 0.0)
        cos_sq_alpha_n = 1.0 - sin_alpha**2
        with np.errstate(divide="ignore", invalid="ignore"):
            cos_2sm_n = np.where(cos_sq_alpha_n != 0,
                                 cos_sigma_n - 2.0 * sin_u1 * sin_u2 / np.where(
                                     cos_sq_alpha_n == 0, 1.0, cos_sq_alpha_n), 0.0)
        c = WGS84_F / 16.0 * cos_sq_alpha_n * (4.0 + WGS84_F * (4.0 - 3.0 * cos_sq_alpha_n))
        lam_new = ll + (1.0 - c) * WGS84_F * sin_alpha * (
            sigma_n + c * sin_sigma_n * (
                cos_2sm_n + c * cos_sigma_n * (-1.0 + 2.0 * cos_2sm_n**2)))
        upd = ~converged
        sin_sigma = np.where(upd, sin_sigma_n, sin_sigma)
        cos_sigma = np.where(upd, cos_sigma_n, cos_sigma)
        sigma = np.where(upd, sigma_n, sigma)
        cos_sq_alpha = np.where(upd, cos_sq_alpha_n, cos_sq_alpha)
        cos_2sm = np.where(upd, cos_2sm_n, cos_2sm)
        converged |= np.abs(lam_new - lam) < tol
        lam = np.where(upd, lam_new, lam)
        if converged.all():
            break

    u_sq = cos_sq_alpha * (WGS84_A**2 - WGS84_B**2) / WGS84_B**2
    big_a = 1.0 + u_sq / 16384.0 * (4096.0 + u_sq * (-768.0 + u_sq * (320.0 - 175.0 * u_sq)))
    big_b = u_sq / 1024.0 * (256.0 + u_sq * (-128.0 + u_sq * (74.0 - 47.0 * u_sq)))
    delta = big_b * sin_sigma * (cos_2sm + big_b / 4.0 * (
        cos_sigma * (-1.0 + 2.0 * cos_2sm**2)
        - big_b / 6.0 * cos_2sm * (-3.0 + 4.0 * sin_sigma**2) * (-3.0 + 4.0 * cos_2sm**2)))
    dist = WGS84_B * big_a * (sigma - delta)

    # antipodal fallback: spherical great-circle
    from .crs import haversine_m
    fallback = ~converged
    if fallback.any():
        sph = haversine_m(np.degrees(lat1), np.degrees(lon1),
                          np.degrees(lat2), np.degrees(lon2))
        dist = np.where(fallback, sph, dist)
    # coincident points
    return np.where(sigma == 0.0, 0.0, dist)
