"""Map projections in vectorized numpy (no PROJ available).

Implements from the published Snyder "Map Projections — A Working
Manual" (USGS PP 1395) series: Transverse Mercator forward/inverse
(covers the UTM CRSs used by the reference fixtures, e.g. EPSG:26711
= UTM 11N / NAD27 / Clarke 1866 — byte.tif's CRS) and Spherical
(Web) Mercator EPSG:3857.

Semantic role = OGRCoordinateTransformation point transform
(/root/reference/ogr/ogrct.cpp): plain vectorized coordinate math.
Known accepted deviation: no NAD27->WGS84 datum shift (PROJ uses
NADCON grids; ~tens of meters). Tile KEYS at the fixture zooms are
unaffected (tile z11 is ~19.5 km) — FIXTURES.md F3 treats the tile-key
set as the hard gate.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import numpy as np


@dataclass(frozen=True)
class Ellipsoid:
    a: float
    b: float

    @property
    def e2(self) -> float:
        return 1.0 - (self.b / self.a) ** 2

    @property
    def ep2(self) -> float:
        return self.e2 / (1.0 - self.e2)


CLARKE_1866 = Ellipsoid(a=6378206.4, b=6356583.8)
WGS84 = Ellipsoid(a=6378137.0, b=6378137.0 * (1 - 1 / 298.257223563))
GRS80 = Ellipsoid(a=6378137.0, b=6378137.0 * (1 - 1 / 298.257222101))


@lru_cache(maxsize=32)
def _kruger_consts(a: float, b: float) -> tuple:
    """Krüger n-series constants to n^6 for the exact transverse
    Mercator (Karney 2011 "Transverse Mercator with an accuracy of a
    few nanometers", eqs 35-36; the same series PROJ's tmerc
    (Poder/Engsager, proj/src/projections/tmerc.cpp) evaluates): the
    rectifying radius A and the forward (alpha) / inverse (beta)
    coefficient tuples."""
    f = (a - b) / a
    n = f / (2 - f)
    A = a / (1 + n) * (1 + n**2 / 4 + n**4 / 64 + n**6 / 256)
    alpha = (
        n / 2 - 2 * n**2 / 3 + 5 * n**3 / 16 + 41 * n**4 / 180
        - 127 * n**5 / 288 + 7891 * n**6 / 37800,
        13 * n**2 / 48 - 3 * n**3 / 5 + 557 * n**4 / 1440
        + 281 * n**5 / 630 - 1983433 * n**6 / 1935360,
        61 * n**3 / 240 - 103 * n**4 / 140 + 15061 * n**5 / 26880
        + 167603 * n**6 / 181440,
        49561 * n**4 / 161280 - 179 * n**5 / 168 + 6601661 * n**6 / 7257600,
        34729 * n**5 / 80640 - 3418889 * n**6 / 1995840,
        212378941 * n**6 / 319334400,
    )
    beta = (
        n / 2 - 2 * n**2 / 3 + 37 * n**3 / 96 - n**4 / 360
        - 81 * n**5 / 512 + 96199 * n**6 / 604800,
        n**2 / 48 + n**3 / 15 - 437 * n**4 / 1440 + 46 * n**5 / 105
        - 1118711 * n**6 / 3870720,
        17 * n**3 / 480 - 37 * n**4 / 840 - 209 * n**5 / 4480
        + 5569 * n**6 / 90720,
        4397 * n**4 / 161280 - 11 * n**5 / 504 - 830251 * n**6 / 7257600,
        4583 * n**5 / 161280 - 108847 * n**6 / 3991680,
        20648693 * n**6 / 638668800,
    )
    return A, alpha, beta


@dataclass(frozen=True)
class TransverseMercator:
    """Exact (nanometer-class) transverse Mercator via the Krüger
    n^6 series — Karney 2011, the algorithm PROJ's default tmerc
    path implements (Poder/Engsager); replaced the earlier Snyder
    8-9..8-13 truncated series whose ~0.05 mm northing error was
    enough to flip isolated nearest-neighbor picks against the
    reference's tile oracles."""

    ellipsoid: Ellipsoid
    lon0_deg: float
    k0: float = 0.9996
    false_easting: float = 500_000.0
    false_northing: float = 0.0

    def forward(self, lon_deg, lat_deg):
        """(lon, lat) degrees -> (easting, northing)."""
        ell = self.ellipsoid
        A, alpha, _ = _kruger_consts(ell.a, ell.b)
        e = np.sqrt(ell.e2)
        lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
        lon = np.radians(np.asarray(lon_deg, dtype=np.float64) - self.lon0_deg)
        s = np.sin(lat)
        # conformal latitude via its tangent (Karney eq 7)
        t = np.sinh(np.arctanh(s) - e * np.arctanh(e * s))
        cos_lon = np.cos(lon)
        xip = np.arctan2(t, cos_lon)
        etap = np.arcsinh(np.sin(lon) / np.sqrt(t * t + cos_lon * cos_lon))
        xi = xip.copy()
        eta = etap.copy()
        for j, aj in enumerate(alpha, start=1):
            xi = xi + aj * np.sin(2 * j * xip) * np.cosh(2 * j * etap)
            eta = eta + aj * np.cos(2 * j * xip) * np.sinh(2 * j * etap)
        x = self.false_easting + self.k0 * A * eta
        y = self.false_northing + self.k0 * A * xi
        return x, y

    def inverse(self, x, y):
        """(easting, northing) -> (lon, lat) degrees."""
        ell = self.ellipsoid
        A, _, beta = _kruger_consts(ell.a, ell.b)
        e = np.sqrt(ell.e2)
        e2 = ell.e2
        xi = (np.asarray(y, dtype=np.float64) - self.false_northing) / (self.k0 * A)
        eta = (np.asarray(x, dtype=np.float64) - self.false_easting) / (self.k0 * A)
        xip = xi.copy()
        etap = eta.copy()
        for j, bj in enumerate(beta, start=1):
            xip = xip - bj * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
            etap = etap - bj * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
        cos_xip = np.cos(xip)
        t = np.sin(xip) / np.sqrt(np.sinh(etap) ** 2 + cos_xip * cos_xip)
        lon = np.arctan2(np.sinh(etap), cos_xip)
        # invert the conformal-latitude tangent by Newton (quadratic
        # convergence; 5 rounds reach machine precision from atan(t))
        phi = np.arctan(t)
        for _ in range(6):
            s = np.sin(phi)
            tau = np.sinh(np.arctanh(s) - e * np.arctanh(e * s))
            phi = phi + (t - tau) * (1 - e2 * s * s) * np.cos(phi) / (
                (1 - e2) * np.sqrt(1 + tau * tau)
            )
        return np.degrees(lon) + self.lon0_deg, np.degrees(phi)


@dataclass(frozen=True)
class LambertConformalConic:
    """Lambert Conformal Conic, 2 standard parallels, ellipsoidal
    (Snyder PP 1395 eqs 15-1..15-11 forward, 15-9 + 7-9 inverse)."""

    ellipsoid: Ellipsoid
    lat1_deg: float
    lat2_deg: float
    lat0_deg: float
    lon0_deg: float
    false_easting: float = 0.0
    false_northing: float = 0.0

    def _m(self, lat):
        e2 = self.ellipsoid.e2
        s = np.sin(lat)
        return np.cos(lat) / np.sqrt(1 - e2 * s * s)

    def _t(self, lat):
        e = np.sqrt(self.ellipsoid.e2)
        s = np.sin(lat)
        return np.tan(np.pi / 4 - lat / 2) / np.power((1 - e * s) / (1 + e * s), e / 2)

    def _consts(self):
        lat1 = np.radians(self.lat1_deg)
        lat2 = np.radians(self.lat2_deg)
        lat0 = np.radians(self.lat0_deg)
        m1, m2 = self._m(lat1), self._m(lat2)
        t0, t1, t2 = self._t(lat0), self._t(lat1), self._t(lat2)
        if abs(self.lat1_deg - self.lat2_deg) < 1e-12:
            n = np.sin(lat1)
        else:
            n = (np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2))
        Fc = m1 / (n * np.power(t1, n))
        rho0 = self.ellipsoid.a * Fc * np.power(t0, n)
        return n, Fc, rho0

    def forward(self, lon_deg, lat_deg):
        lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
        lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
        n, Fc, rho0 = self._consts()
        rho = self.ellipsoid.a * Fc * np.power(self._t(lat), n)
        theta = n * (lon - np.radians(self.lon0_deg))
        x = rho * np.sin(theta) + self.false_easting
        y = rho0 - rho * np.cos(theta) + self.false_northing
        return x, y

    def inverse(self, x, y):
        x = np.asarray(x, dtype=np.float64) - self.false_easting
        y = np.asarray(y, dtype=np.float64) - self.false_northing
        n, Fc, rho0 = self._consts()
        e = np.sqrt(self.ellipsoid.e2)
        rho = np.sign(n) * np.sqrt(x * x + (rho0 - y) ** 2)
        theta = np.arctan2(np.sign(n) * x, np.sign(n) * (rho0 - y))
        t = np.power(rho / (self.ellipsoid.a * Fc), 1.0 / n)
        lat = np.pi / 2 - 2 * np.arctan(t)
        for _ in range(8):  # Snyder eq 7-9 fixed point (converges fast)
            s = np.sin(lat)
            lat = np.pi / 2 - 2 * np.arctan(
                t * np.power((1 - e * s) / (1 + e * s), e / 2)
            )
        lon = theta / n + np.radians(self.lon0_deg)
        return np.degrees(lon), np.degrees(lat)


@dataclass(frozen=True)
class AlbersEqualArea:
    """Albers Equal-Area Conic, 2 standard parallels, ellipsoidal
    (Snyder PP 1395 eqs 14-1..14-12 forward, 14-19..14-21 + 3-16
    inverse)."""

    ellipsoid: Ellipsoid
    lat1_deg: float
    lat2_deg: float
    lat0_deg: float
    lon0_deg: float
    false_easting: float = 0.0
    false_northing: float = 0.0

    def _m(self, lat):
        e2 = self.ellipsoid.e2
        s = np.sin(lat)
        return np.cos(lat) / np.sqrt(1 - e2 * s * s)

    def _q(self, lat):
        e2 = self.ellipsoid.e2
        e = np.sqrt(e2)
        s = np.sin(lat)
        return (1 - e2) * (
            s / (1 - e2 * s * s) - (1 / (2 * e)) * np.log((1 - e * s) / (1 + e * s))
        )

    def _consts(self):
        lat1 = np.radians(self.lat1_deg)
        lat2 = np.radians(self.lat2_deg)
        lat0 = np.radians(self.lat0_deg)
        m1, m2 = self._m(lat1), self._m(lat2)
        q0, q1, q2 = self._q(lat0), self._q(lat1), self._q(lat2)
        if abs(self.lat1_deg - self.lat2_deg) < 1e-12:
            n = np.sin(lat1)
        else:
            n = (m1 * m1 - m2 * m2) / (q2 - q1)
        C = m1 * m1 + n * q1
        rho0 = self.ellipsoid.a * np.sqrt(C - n * q0) / n
        return n, C, rho0

    def forward(self, lon_deg, lat_deg):
        lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
        lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
        n, C, rho0 = self._consts()
        rho = self.ellipsoid.a * np.sqrt(C - n * self._q(lat)) / n
        theta = n * (lon - np.radians(self.lon0_deg))
        x = rho * np.sin(theta) + self.false_easting
        y = rho0 - rho * np.cos(theta) + self.false_northing
        return x, y

    def inverse(self, x, y):
        x = np.asarray(x, dtype=np.float64) - self.false_easting
        y = np.asarray(y, dtype=np.float64) - self.false_northing
        n, C, rho0 = self._consts()
        e2 = self.ellipsoid.e2
        e = np.sqrt(e2)
        rho = np.sqrt(x * x + (rho0 - y) ** 2)
        theta = np.arctan2(np.sign(n) * x, np.sign(n) * (rho0 - y))
        q = (C - (rho * n / self.ellipsoid.a) ** 2) / n
        lat = np.arcsin(np.clip(q / 2, -1, 1))
        for _ in range(10):  # Snyder eq 3-16 Newton-ish fixed point
            s = np.sin(lat)
            lat = lat + ((1 - e2 * s * s) ** 2 / (2 * np.cos(lat))) * (
                q / (1 - e2)
                - s / (1 - e2 * s * s)
                + (1 / (2 * e)) * np.log((1 - e * s) / (1 + e * s))
            )
        lon = theta / n + np.radians(self.lon0_deg)
        return np.degrees(lon), np.degrees(lat)


@dataclass(frozen=True)
class PolarStereographic:
    """Polar Stereographic variant B (standard parallel), ellipsoidal
    (Snyder PP 1395 eqs 21-33..21-34 forward; 7-9 inverse iteration).
    north = True for the north-pole aspect (EPSG:3413-style),
    False for the south (EPSG:3031)."""

    ellipsoid: Ellipsoid
    lat_ts_deg: float
    lon0_deg: float
    north: bool = True
    false_easting: float = 0.0
    false_northing: float = 0.0

    def _t(self, lat):
        e = np.sqrt(self.ellipsoid.e2)
        s = np.sin(lat)
        return np.tan(np.pi / 4 - lat / 2) / np.power((1 - e * s) / (1 + e * s), e / 2)

    def _consts(self):
        latc = np.radians(abs(self.lat_ts_deg))
        e2 = self.ellipsoid.e2
        mc = np.cos(latc) / np.sqrt(1 - e2 * np.sin(latc) ** 2)
        tc = self._t(latc)
        return mc, tc

    def forward(self, lon_deg, lat_deg):
        sign = 1.0 if self.north else -1.0
        lon = sign * np.radians(np.asarray(lon_deg, dtype=np.float64))
        lat = sign * np.radians(np.asarray(lat_deg, dtype=np.float64))
        lon0 = sign * np.radians(self.lon0_deg)
        mc, tc = self._consts()
        rho = self.ellipsoid.a * mc * self._t(lat) / tc
        x = rho * np.sin(lon - lon0)
        y = -rho * np.cos(lon - lon0)
        return sign * x + self.false_easting, sign * y + self.false_northing

    def inverse(self, x, y):
        sign = 1.0 if self.north else -1.0
        x = sign * (np.asarray(x, dtype=np.float64) - self.false_easting)
        y = sign * (np.asarray(y, dtype=np.float64) - self.false_northing)
        mc, tc = self._consts()
        e = np.sqrt(self.ellipsoid.e2)
        rho = np.sqrt(x * x + y * y)
        t = rho * tc / (self.ellipsoid.a * mc)
        lat = np.pi / 2 - 2 * np.arctan(t)
        for _ in range(8):  # Snyder eq 7-9
            s = np.sin(lat)
            lat = np.pi / 2 - 2 * np.arctan(t * np.power((1 - e * s) / (1 + e * s), e / 2))
        lon = sign * np.radians(self.lon0_deg) + np.arctan2(x, -y)
        lon_deg = np.degrees(sign * lon)
        lon_deg = ((lon_deg + 180.0) % 360.0) - 180.0  # normalize
        return lon_deg, np.degrees(sign * lat)


@dataclass(frozen=True)
class LambertAzimuthalEqualArea:
    """Oblique Lambert Azimuthal Equal-Area, ellipsoidal (Snyder
    PP 1395 eqs 24-19..24-21 forward, 24-16..24-18 + 3-16 inverse;
    EPSG:3035 Europe)."""

    ellipsoid: Ellipsoid
    lat0_deg: float
    lon0_deg: float
    false_easting: float = 0.0
    false_northing: float = 0.0

    def _q(self, lat):
        e2 = self.ellipsoid.e2
        e = np.sqrt(e2)
        s = np.sin(lat)
        return (1 - e2) * (
            s / (1 - e2 * s * s) - (1 / (2 * e)) * np.log((1 - e * s) / (1 + e * s))
        )

    def _consts(self):
        lat0 = np.radians(self.lat0_deg)
        e2 = self.ellipsoid.e2
        qp = self._q(np.float64(np.pi / 2))
        q1 = self._q(lat0)
        beta1 = np.arcsin(np.clip(q1 / qp, -1, 1))
        rq = self.ellipsoid.a * np.sqrt(qp / 2)
        m1 = np.cos(lat0) / np.sqrt(1 - e2 * np.sin(lat0) ** 2)
        d = self.ellipsoid.a * m1 / (rq * np.cos(beta1))
        return qp, beta1, rq, d

    def forward(self, lon_deg, lat_deg):
        lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
        lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
        qp, b1, rq, d = self._consts()
        beta = np.arcsin(np.clip(self._q(lat) / qp, -1, 1))
        dl = lon - np.radians(self.lon0_deg)
        b = rq * np.sqrt(
            2.0 / (1 + np.sin(b1) * np.sin(beta) + np.cos(b1) * np.cos(beta) * np.cos(dl))
        )
        x = b * d * np.cos(beta) * np.sin(dl)
        y = (b / d) * (np.cos(b1) * np.sin(beta) - np.sin(b1) * np.cos(beta) * np.cos(dl))
        return x + self.false_easting, y + self.false_northing

    def inverse(self, x, y):
        x = np.asarray(x, dtype=np.float64) - self.false_easting
        y = np.asarray(y, dtype=np.float64) - self.false_northing
        qp, b1, rq, d = self._consts()
        e2 = self.ellipsoid.e2
        e = np.sqrt(e2)
        rho = np.sqrt((x / d) ** 2 + (d * y) ** 2)
        ce = 2 * np.arcsin(np.clip(rho / (2 * rq), -1, 1))
        with np.errstate(invalid="ignore", divide="ignore"):
            q = qp * (
                np.cos(ce) * np.sin(b1)
                + np.where(rho == 0, 0.0, d * y * np.sin(ce) * np.cos(b1) / np.where(rho == 0, 1, rho))
            )
        lat = np.arcsin(np.clip(q / 2, -1, 1))
        for _ in range(10):  # Snyder eq 3-16
            s = np.sin(lat)
            lat = lat + ((1 - e2 * s * s) ** 2 / (2 * np.cos(lat))) * (
                q / (1 - e2)
                - s / (1 - e2 * s * s)
                + (1 / (2 * e)) * np.log((1 - e * s) / (1 + e * s))
            )
        lon = np.radians(self.lon0_deg) + np.arctan2(
            x * np.sin(ce), d * rho * np.cos(b1) * np.cos(ce) - d * d * y * np.sin(b1) * np.sin(ce)
        )
        lat = np.where(rho == 0, np.radians(self.lat0_deg), lat)
        lon = np.where(rho == 0, np.radians(self.lon0_deg), lon)
        return np.degrees(lon), np.degrees(lat)


@dataclass(frozen=True)
class Sinusoidal:
    """Spherical sinusoidal (Snyder eqs 30-1, 30-2) on the authalic
    radius — the MODIS grid convention (R = 6371007.181)."""

    radius: float = 6371007.181
    lon0_deg: float = 0.0
    false_easting: float = 0.0
    false_northing: float = 0.0

    def forward(self, lon_deg, lat_deg):
        lon = np.radians(np.asarray(lon_deg, dtype=np.float64) - self.lon0_deg)
        lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
        return (
            self.radius * lon * np.cos(lat) + self.false_easting,
            self.radius * lat + self.false_northing,
        )

    def inverse(self, x, y):
        x = np.asarray(x, dtype=np.float64) - self.false_easting
        y = np.asarray(y, dtype=np.float64) - self.false_northing
        lat = y / self.radius
        with np.errstate(invalid="ignore", divide="ignore"):
            lon = np.where(np.cos(lat) == 0, 0.0, x / (self.radius * np.cos(lat)))
        return np.degrees(lon) + self.lon0_deg, np.degrees(lat)


def utm(zone: int, ellipsoid: Ellipsoid = WGS84) -> TransverseMercator:
    return TransverseMercator(ellipsoid=ellipsoid, lon0_deg=zone * 6 - 183)


# EPSG:5070 = NAD83 / Conus Albers
EPSG_5070 = AlbersEqualArea(
    ellipsoid=GRS80, lat1_deg=29.5, lat2_deg=45.5, lat0_deg=23.0, lon0_deg=-96.0
)
# EPSG:2154 = RGF93 / Lambert-93
EPSG_2154 = LambertConformalConic(
    ellipsoid=GRS80, lat1_deg=44.0, lat2_deg=49.0, lat0_deg=46.5, lon0_deg=3.0,
    false_easting=700_000.0, false_northing=6_600_000.0,
)


# EPSG:26711 = NAD27 / UTM zone 11N (byte.tif's CRS)
EPSG_26711 = utm(11, CLARKE_1866)
# EPSG:32611 = WGS84 / UTM zone 11N
EPSG_32611 = utm(11, WGS84)
# EPSG:3031 = WGS84 / Antarctic Polar Stereographic
EPSG_3031 = PolarStereographic(ellipsoid=WGS84, lat_ts_deg=-71.0, lon0_deg=0.0, north=False)
# EPSG:3413 = WGS84 / NSIDC Sea Ice Polar Stereographic North
EPSG_3413 = PolarStereographic(ellipsoid=WGS84, lat_ts_deg=70.0, lon0_deg=-45.0, north=True)
# EPSG:3035 = ETRS89-extended / LAEA Europe
EPSG_3035 = LambertAzimuthalEqualArea(
    ellipsoid=GRS80, lat0_deg=52.0, lon0_deg=10.0,
    false_easting=4_321_000.0, false_northing=3_210_000.0,
)
# MODIS sinusoidal grid (SR-ORG:6974 style)
MODIS_SINUSOIDAL = Sinusoidal()

WEB_MERCATOR_RADIUS = 6378137.0
WEB_MERCATOR_EXTENT = 20037508.342789244  # pi * R


def lonlat_to_webmercator(lon_deg, lat_deg):
    lon = np.asarray(lon_deg, dtype=np.float64)
    lat = np.asarray(lat_deg, dtype=np.float64)
    x = WEB_MERCATOR_RADIUS * np.radians(lon)
    y = WEB_MERCATOR_RADIUS * np.log(np.tan(np.pi / 4 + np.radians(lat) / 2))
    return x, y


def webmercator_to_lonlat(x, y):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / WEB_MERCATOR_RADIUS)
    lat = np.degrees(2 * np.arctan(np.exp(y / WEB_MERCATOR_RADIUS)) - np.pi / 2)
    return lon, lat


class Pipeline:
    """Composed transform, the GDALGenImgProjTransform analog
    (alg/gdaltransformer.cpp:1392): src CRS -> lon/lat ->
    [optional datum grid shift] -> dst CRS. `shift` is a
    geom.gridshift.GridShift applied in lon/lat space — the PROJ
    +nadgrids= hgridshift step position in the chain."""

    def __init__(self, src=None, dst=None, shift=None) -> None:
        self.src = src  # None = lon/lat
        self.dst = dst
        self.shift = shift

    def forward(self, x, y):
        if self.src is not None:
            x, y = self.src.inverse(x, y)  # to lon/lat
        if self.shift is not None:
            x, y = self.shift.forward(x, y)
        if self.dst is None:
            return x, y
        if self.dst == "webmercator":
            return lonlat_to_webmercator(x, y)
        if hasattr(self.dst, "forward"):  # TM / LCC / Albers projection
            return self.dst.forward(x, y)
        raise ValueError(f"unknown dst {self.dst}")

    def inverse(self, x, y):
        if self.dst is not None:
            if self.dst == "webmercator":
                x, y = webmercator_to_lonlat(x, y)
            elif hasattr(self.dst, "inverse"):
                x, y = self.dst.inverse(x, y)
            else:
                raise ValueError(f"unknown dst {self.dst}")
        if self.shift is not None:
            x, y = self.shift.inverse(x, y)
        if self.src is None:
            return x, y
        return self.src.forward(x, y)
