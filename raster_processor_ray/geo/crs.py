"""Geodesy scalar library: ECEF conversions, bearings, exact ellipsoidal
cell areas, great-circle distance, longitude wrap helpers.

Vectorized NumPy re-implementations of the reference's raster_crs.py
function family (public formulas only):

- ``llh_to_ecef`` / ``ecef_to_llh``   (Vermeille 2002; reference raster_crs.py:239-296)
- ``bearing``                          (reference raster_crs.py:299-305)
- ``terminal_point_spherical``         (reference raster_crs.py:308-329)
- ``wgs84_cell_area``                  (reference raster_crs.py:30-46)
- ``lon_360to180`` / ``wrap_lon``      (reference raster_crs.py:189-236)
- ``haversine_m`` great-circle distance (used by the kNN stage oracle)
"""

from __future__ import annotations

import numpy as np

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
WGS84_B = WGS84_A * (1.0 - WGS84_F)
WGS84_E2 = WGS84_F * (2.0 - WGS84_F)
WGS84_E = np.sqrt(WGS84_E2)
EARTH_R = 6371008.8  # mean radius (spherical ops)


def lon_360to180(lon):
    """Normalize longitude into [-180, 180) (reference raster_crs.py:234-236)."""
    return np.mod(np.asarray(lon, dtype=np.float64) + 180.0, 360.0) - 180.0


def wrap_lon(lon, lon_min):
    """Shift longitudes into [lon_min, lon_min + 360) — the reference's
    wrapped-longitude shift for grids spanning the antimeridian
    (raster_crs.py:189-231)."""
    return lon_min + np.mod(np.asarray(lon, dtype=np.float64) - lon_min, 360.0)


def llh_to_ecef(lat_deg, lon_deg, h=0.0):
    """Geodetic (lat, lon, height) -> ECEF (x, y, z) meters."""
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    h = np.asarray(h, dtype=np.float64)
    sin_lat = np.sin(lat)
    n = WGS84_A / np.sqrt(1.0 - WGS84_E2 * sin_lat**2)
    x = (n + h) * np.cos(lat) * np.cos(lon)
    y = (n + h) * np.cos(lat) * np.sin(lon)
    z = (n * (1.0 - WGS84_E2) + h) * sin_lat
    return x, y, z


def ecef_to_llh(x, y, z):
    """ECEF -> geodetic via Vermeille (2002) closed form (reference
    raster_crs.py:252-296). Returns (lat_deg, lon_deg, height_m)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    a2 = WGS84_A**2
    e4 = WGS84_E2**2
    p = (x**2 + y**2) / a2
    q = (1.0 - WGS84_E2) * z**2 / a2
    r = (p + q - e4) / 6.0
    s = e4 * p * q / (4.0 * r**3)
    t = np.cbrt(1.0 + s + np.sqrt(np.maximum(s * (2.0 + s), 0.0)))
    u = r * (1.0 + t + 1.0 / t)
    v = np.sqrt(np.maximum(u**2 + e4 * q, 0.0))
    w = WGS84_E2 * (u + v - q) / (2.0 * v)
    k = np.sqrt(np.maximum(u + v + w**2, 0.0)) - w
    d = k * np.sqrt(x**2 + y**2) / (k + WGS84_E2)
    hypot_dz = np.sqrt(d**2 + z**2)
    lat = 2.0 * np.arctan2(z, d + hypot_dz)
    lon = np.arctan2(y, x)
    h = (k + WGS84_E2 - 1.0) / k * hypot_dz
    return np.degrees(lat), np.degrees(lon), h


def bearing(lat1_deg, lon1_deg, lat2_deg, lon2_deg):
    """Initial great-circle bearing, degrees in [0, 360) (reference
    raster_crs.py:299-305)."""
    lat1, lon1, lat2, lon2 = (np.radians(np.asarray(a, dtype=np.float64))
                              for a in (lat1_deg, lon1_deg, lat2_deg, lon2_deg))
    dlon = lon2 - lon1
    y = np.sin(dlon) * np.cos(lat2)
    x = np.cos(lat1) * np.sin(lat2) - np.sin(lat1) * np.cos(lat2) * np.cos(dlon)
    return np.mod(np.degrees(np.arctan2(y, x)), 360.0)


def terminal_point_spherical(lat_deg, lon_deg, bearing_deg, dist_m):
    """Destination point on a sphere given start, bearing, distance
    (reference raster_crs.py:308-329)."""
    lat1 = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lon1 = np.radians(np.asarray(lon_deg, dtype=np.float64))
    brg = np.radians(np.asarray(bearing_deg, dtype=np.float64))
    ang = np.asarray(dist_m, dtype=np.float64) / EARTH_R
    lat2 = np.arcsin(np.sin(lat1) * np.cos(ang) + np.cos(lat1) * np.sin(ang) * np.cos(brg))
    lon2 = lon1 + np.arctan2(np.sin(brg) * np.sin(ang) * np.cos(lat1),
                             np.cos(ang) - np.sin(lat1) * np.sin(lat2))
    return np.degrees(lat2), lon_360to180(np.degrees(lon2))


def _area_q(lat_rad):
    s = np.sin(lat_rad)
    return s / (1.0 - WGS84_E2 * s**2) + np.arctanh(WGS84_E * s) / WGS84_E


def wgs84_cell_area(lat1_deg, lat2_deg, dlon_deg):
    """Exact WGS84 ellipsoidal area (m^2) of the cell [lat1, lat2] x dlon
    (reference raster_crs.py:30-46 computes the per-pixel geodetic area
    the same way for the water-fraction denominator)."""
    lat1 = np.radians(np.asarray(lat1_deg, dtype=np.float64))
    lat2 = np.radians(np.asarray(lat2_deg, dtype=np.float64))
    dlon = np.radians(np.asarray(dlon_deg, dtype=np.float64))
    return np.abs(WGS84_B**2 * dlon / 2.0 * (_area_q(lat2) - _area_q(lat1)))


def haversine_m(lat1_deg, lon1_deg, lat2_deg, lon2_deg):
    """Great-circle distance in meters (spherical earth)."""
    lat1, lon1, lat2, lon2 = (np.radians(np.asarray(a, dtype=np.float64))
                              for a in (lat1_deg, lon1_deg, lat2_deg, lon2_deg))
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    h = np.sin(dlat / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * EARTH_R * np.arcsin(np.sqrt(np.clip(h, 0.0, 1.0)))
