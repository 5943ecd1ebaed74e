"""UTM projection in pure NumPy — Karney/Krüger transverse-Mercator series.

Replaces the reference's osr.CoordinateTransformation (reference
products.py:1124-1135) with a closed-form vectorized implementation of the
6th-order Krüger series (public formulas: Karney 2011, "Transverse Mercator
with an accuracy of a few nanometers"). Zone/band selection mirrors the
reference's raster_crs.py:59-171 semantics (zone from lon, MGRS band from
lat, Norway/Svalbard exceptions).

Because it is pure NumPy there is nothing to construct per worker — the
projection runs as a stateless ``map_batches`` task (unlike the reference's
T1 stateful transformer).
"""

from __future__ import annotations

import numpy as np

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
K0 = 0.9996
FALSE_EASTING = 500000.0
FALSE_NORTHING_SOUTH = 10000000.0

_n = WGS84_F / (2.0 - WGS84_F)
_n2, _n3, _n4, _n5, _n6 = _n**2, _n**3, _n**4, _n**5, _n**6
_A = WGS84_A / (1 + _n) * (1 + _n2 / 4 + _n4 / 64 + _n6 / 256)

_ALPHA = np.array([
    _n / 2 - 2 * _n2 / 3 + 5 * _n3 / 16 + 41 * _n4 / 180 - 127 * _n5 / 288 + 7891 * _n6 / 37800,
    13 * _n2 / 48 - 3 * _n3 / 5 + 557 * _n4 / 1440 + 281 * _n5 / 630 - 1983433 * _n6 / 1935360,
    61 * _n3 / 240 - 103 * _n4 / 140 + 15061 * _n5 / 26880 + 167603 * _n6 / 181440,
    49561 * _n4 / 161280 - 179 * _n5 / 168 + 6601661 * _n6 / 7257600,
    34729 * _n5 / 80640 - 3418889 * _n6 / 1995840,
    212378941 * _n6 / 319334400,
])
_BETA = np.array([
    _n / 2 - 2 * _n2 / 3 + 37 * _n3 / 96 - _n4 / 360 - 81 * _n5 / 512 + 96199 * _n6 / 604800,
    _n2 / 48 + _n3 / 15 - 437 * _n4 / 1440 + 46 * _n5 / 105 - 1118711 * _n6 / 3870720,
    17 * _n3 / 480 - 37 * _n4 / 840 - 209 * _n5 / 4480 + 5569 * _n6 / 90720,
    4397 * _n4 / 161280 - 11 * _n5 / 504 - 830251 * _n6 / 7257600,
    4583 * _n5 / 161280 - 108847 * _n6 / 3991680,
    20648693 * _n6 / 638668800,
])
_2SQRTN_1PN = 2.0 * np.sqrt(_n) / (1.0 + _n)

MGRS_BANDS = "CDEFGHJKLMNPQRSTUVWX"


def band_is_south(band: str) -> bool:
    """Hemisphere from the MGRS band letter: C..M southern, N..X northern
    (reference ``hemisphere_from_mgrs_band``, raster_crs.py:112-116 —
    applied to the band AFTER any ``mgrs_band_adjust`` shift, matching
    ``utm_crs_from_point``, raster_crs.py:160-171)."""
    return band < "N"


def utm_zone(lat_deg, lon_deg) -> np.ndarray:
    """UTM zone number with the standard Norway (32V) and Svalbard
    exceptions (semantics of reference raster_crs.py:59-135)."""
    lat = np.asarray(lat_deg, dtype=np.float64)
    lon = np.mod(np.asarray(lon_deg, dtype=np.float64) + 180.0, 360.0) - 180.0
    zone = (np.floor((lon + 180.0) / 6.0).astype(np.int64) % 60) + 1
    # Norway: band V (56..64N), 3E..12E -> zone 32
    norway = (lat >= 56.0) & (lat < 64.0) & (lon >= 3.0) & (lon < 12.0)
    zone = np.where(norway, 32, zone)
    # Svalbard: band X (72..84N)
    sval = (lat >= 72.0) & (lat < 84.0)
    zone = np.where(sval & (lon >= 0.0) & (lon < 9.0), 31, zone)
    zone = np.where(sval & (lon >= 9.0) & (lon < 21.0), 33, zone)
    zone = np.where(sval & (lon >= 21.0) & (lon < 33.0), 35, zone)
    zone = np.where(sval & (lon >= 33.0) & (lon < 42.0), 37, zone)
    return zone


def mgrs_band(lat_deg) -> np.ndarray:
    """MGRS latitude band letter index 0..19 (C..X, 8-degree bands,
    X extended to 84N) — reference raster_crs.py:137-171 semantics.
    Returns int index into MGRS_BANDS; out-of-range lat is clipped."""
    lat = np.clip(np.asarray(lat_deg, dtype=np.float64), -80.0, 84.0 - 1e-9)
    return np.clip(((lat + 80.0) // 8.0).astype(np.int64), 0, 19)


def utm_epsg(zone: np.ndarray, lat_deg) -> np.ndarray:
    """EPSG code: 326xx north / 327xx south (reference raster_crs.py:150-171)."""
    north = np.asarray(lat_deg, dtype=np.float64) >= 0
    return np.where(north, 32600, 32700) + np.asarray(zone, dtype=np.int64)


def latlon_to_utm(lat_deg, lon_deg, zone=None, south=None):
    """Forward transverse-Mercator: (lat, lon) -> (easting, northing, zone).

    Vectorized Krüger series; |error| vs a reference implementation is
    sub-mm within a zone. ``zone`` may be given to force a neighbor zone
    (the reference's zone-adjust knobs, raster_crs.py:97-135).

    ``south`` selects the CRS hemisphere (EPSG 326xx north / 327xx south
    — reference ``hemisphere_from_mgrs_band``, raster_crs.py:112-116):
    ``south=True`` applies the 10,000,000 m false northing to EVERY
    point, ``south=False`` to none — the correct per-scene convention (a
    scene straddling the equator must use ONE hemisphere or its northing
    field is discontinuous). ``south=None`` keeps the legacy per-point
    rule (false northing iff the point's own latitude < 0), which is
    right only for point-local features, never for a shared grid."""
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lon = np.asarray(lon_deg, dtype=np.float64)
    if zone is None:
        zone = utm_zone(lat_deg, lon_deg)
    zone = np.asarray(zone, dtype=np.int64)
    lon0 = (zone.astype(np.float64) - 1.0) * 6.0 - 180.0 + 3.0
    dlon = np.radians(np.mod(lon - lon0 + 180.0, 360.0) - 180.0)

    sphi = np.sin(lat)
    t = np.sinh(np.arctanh(sphi) - _2SQRTN_1PN * np.arctanh(_2SQRTN_1PN * sphi))
    xi_p = np.arctan2(t, np.cos(dlon))
    eta_p = np.arcsinh(np.sin(dlon) / np.sqrt(t * t + np.cos(dlon) ** 2))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for k in range(6):
        j = 2.0 * (k + 1)
        xi += _ALPHA[k] * np.sin(j * xi_p) * np.cosh(j * eta_p)
        eta += _ALPHA[k] * np.cos(j * xi_p) * np.sinh(j * eta_p)
    easting = FALSE_EASTING + K0 * _A * eta
    northing = K0 * _A * xi
    if south is None:
        # legacy: hemisphere from the INPUT latitude per point, matching
        # the `northern = lat >= 0` caller convention exactly (deciding
        # from sign(northing) disagrees at the equator for -0.0 /
        # subnormal latitudes)
        south = np.asarray(lat_deg, dtype=np.float64) < 0
    northing = np.where(south, northing + FALSE_NORTHING_SOUTH, northing)
    return easting, northing, zone


def utm_to_latlon(easting, northing, zone, northern=True):
    """Inverse transverse-Mercator: (E, N, zone) -> (lat, lon) degrees."""
    easting = np.asarray(easting, dtype=np.float64)
    northing = np.asarray(northing, dtype=np.float64)
    zone = np.asarray(zone, dtype=np.int64)
    northern = np.broadcast_to(np.asarray(northern, dtype=bool), easting.shape)
    n_adj = np.where(northern, northing, northing - FALSE_NORTHING_SOUTH)
    xi = n_adj / (K0 * _A)
    eta = (easting - FALSE_EASTING) / (K0 * _A)
    xi_p = xi.copy()
    eta_p = eta.copy()
    for k in range(6):
        j = 2.0 * (k + 1)
        xi_p -= _BETA[k] * np.sin(j * xi) * np.cosh(j * eta)
        eta_p -= _BETA[k] * np.cos(j * xi) * np.sinh(j * eta)
    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))
    # Newton iteration on tau (conformal -> geodetic latitude), Karney eq. 19-21
    tau_p = np.tan(chi)
    tau = tau_p.copy()
    for _ in range(7):
        sigma = np.sinh(_2SQRTN_1PN * np.arctanh(_2SQRTN_1PN * tau / np.sqrt(1 + tau**2)))
        tau_i = tau * np.sqrt(1 + sigma**2) - sigma * np.sqrt(1 + tau**2)
        dtau = (tau_p - tau_i) * (1 + (1 - _2SQRTN_1PN**2 / 2) * tau**2) / (
            (1 - _2SQRTN_1PN**2 / 2) * np.sqrt((1 + tau_i**2) * (1 + tau**2))
        )
        tau = tau + dtau
    lat = np.degrees(np.arctan(tau))
    lon0 = (zone.astype(np.float64) - 1.0) * 6.0 - 180.0 + 3.0
    dlon = np.degrees(np.arctan2(np.sinh(eta_p), np.cos(xi_p)))
    lon = np.mod(lon0 + dlon + 180.0, 360.0) - 180.0
    return lat, lon
