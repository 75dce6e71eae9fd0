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


@dataclass(frozen=True)
class TransverseMercator:
    """Snyder eqs 8-9..8-13 (forward), 8-57..8-62 (inverse)."""

    ellipsoid: Ellipsoid
    lon0_deg: float
    k0: float = 0.9996
    false_easting: float = 500_000.0
    false_northing: float = 0.0

    def _m(self, lat: np.ndarray) -> np.ndarray:
        e2 = self.ellipsoid.e2
        a = self.ellipsoid.a
        e4, e6 = e2 * e2, e2 * e2 * e2
        return a * (
            (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * lat
            - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * np.sin(2 * lat)
            + (15 * e4 / 256 + 45 * e6 / 1024) * np.sin(4 * lat)
            - (35 * e6 / 3072) * np.sin(6 * lat)
        )

    def forward(self, lon_deg, lat_deg):
        """(lon, lat) degrees -> (easting, northing)."""
        e2 = self.ellipsoid.e2
        ep2 = self.ellipsoid.ep2
        a, k0 = self.ellipsoid.a, self.k0
        lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
        dlon = np.radians(np.asarray(lon_deg, dtype=np.float64) - self.lon0_deg)
        sin_lat, cos_lat, tan_lat = np.sin(lat), np.cos(lat), np.tan(lat)
        N = a / np.sqrt(1 - e2 * sin_lat**2)
        T = tan_lat**2
        C = ep2 * cos_lat**2
        A = dlon * cos_lat
        M = self._m(lat)
        M0 = self._m(np.float64(0.0))
        x = k0 * N * (
            A
            + (1 - T + C) * A**3 / 6
            + (5 - 18 * T + T**2 + 72 * C - 58 * ep2) * A**5 / 120
        ) + self.false_easting
        y = k0 * (
            M
            - M0
            + N
            * tan_lat
            * (
                A**2 / 2
                + (5 - T + 9 * C + 4 * C**2) * A**4 / 24
                + (61 - 58 * T + T**2 + 600 * C - 330 * ep2) * A**6 / 720
            )
        ) + self.false_northing
        return x, y

    def inverse(self, x, y):
        """(easting, northing) -> (lon, lat) degrees."""
        e2 = self.ellipsoid.e2
        ep2 = self.ellipsoid.ep2
        a, k0 = self.ellipsoid.a, self.k0
        x = np.asarray(x, dtype=np.float64) - self.false_easting
        y = np.asarray(y, dtype=np.float64) - self.false_northing
        e1 = (1 - np.sqrt(1 - e2)) / (1 + np.sqrt(1 - e2))
        M = self._m(np.float64(0.0)) + y / k0
        mu = M / (a * (1 - e2 / 4 - 3 * e2**2 / 64 - 5 * e2**3 / 256))
        lat1 = (
            mu
            + (3 * e1 / 2 - 27 * e1**3 / 32) * np.sin(2 * mu)
            + (21 * e1**2 / 16 - 55 * e1**4 / 32) * np.sin(4 * mu)
            + (151 * e1**3 / 96) * np.sin(6 * mu)
            + (1097 * e1**4 / 512) * np.sin(8 * mu)
        )
        sin1, cos1, tan1 = np.sin(lat1), np.cos(lat1), np.tan(lat1)
        C1 = ep2 * cos1**2
        T1 = tan1**2
        N1 = a / np.sqrt(1 - e2 * sin1**2)
        R1 = a * (1 - e2) / (1 - e2 * sin1**2) ** 1.5
        D = x / (N1 * k0)
        lat = lat1 - (N1 * tan1 / R1) * (
            D**2 / 2
            - (5 + 3 * T1 + 10 * C1 - 4 * C1**2 - 9 * ep2) * D**4 / 24
            + (61 + 90 * T1 + 298 * C1 + 45 * T1**2 - 252 * ep2 - 3 * C1**2) * D**6 / 720
        )
        lon = (
            D
            - (1 + 2 * T1 + C1) * D**3 / 6
            + (5 - 2 * C1 + 28 * T1 - 3 * C1**2 + 8 * ep2 + 24 * T1**2) * D**5 / 120
        ) / cos1
        return np.degrees(lon) + self.lon0_deg, np.degrees(lat)


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
