"""Horizontal datum grid shifts (NTv2 semantics, vectorized numpy).

Semantic role = PROJ's hgridshift step as driven by the reference's
OGRCoordinateTransformation (/root/reference/ogr/ogrct.cpp — PROJ
pipelines with +nadgrids=): a lattice of (shift_lat, shift_lon)
values in ARC-SECONDS over a geographic window, bilinearly
interpolated at each point; NTv2 stores longitude shifts POSITIVE
WEST, so the forward application is lat' = lat + dlat/3600 and
lon' = lon - dlon/3600.

The reference treats grids as data (PROJ ships .tif/.gsb files);
this module implements the full transform machinery and takes the
lattice as numpy arrays — load them from any tabular source (a
parquet of grid nodes distributes fine; a broadcast of the arrays is
a few MB for national grids). Multi-resolution NTv2 parent/child
grids are modeled as an ordered list: the LAST grid containing a
point wins (densest subgrid, the NTv2 lookup rule).

Inverse = PROJ's fixed-point iteration (hgridshift inverse): start
at the target, apply the forward shift of the current guess, correct
by the residual; converges in 2-4 rounds for real grids (shifts are
tiny and smooth).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass(frozen=True)
class ShiftGrid:
    """One shift lattice: node (i, j) sits at
    (lat_min + i*dlat, lon_min + j*dlon); values in arc-seconds.
    shift_lon is positive WEST (the NTv2 file convention)."""

    lat_min: float
    lon_min: float
    dlat: float
    dlon: float
    shift_lat: np.ndarray  # (nrows, ncols) arc-seconds
    shift_lon: np.ndarray  # (nrows, ncols) arc-seconds, west-positive

    @property
    def lat_max(self) -> float:
        return self.lat_min + (self.shift_lat.shape[0] - 1) * self.dlat

    @property
    def lon_max(self) -> float:
        return self.lon_min + (self.shift_lat.shape[1] - 1) * self.dlon

    def contains(self, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
        return (
            (lat >= self.lat_min)
            & (lat <= self.lat_max)
            & (lon >= self.lon_min)
            & (lon <= self.lon_max)
        )

    def interpolate(self, lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Bilinear shift (arc-seconds) at each point; caller has
        already masked to contains()."""
        fi = (lat - self.lat_min) / self.dlat
        fj = (lon - self.lon_min) / self.dlon
        nrows, ncols = self.shift_lat.shape
        i0 = np.clip(np.floor(fi).astype(np.int64), 0, nrows - 2)
        j0 = np.clip(np.floor(fj).astype(np.int64), 0, ncols - 2)
        ti = fi - i0
        tj = fj - j0

        def bil(a: np.ndarray) -> np.ndarray:
            return (
                a[i0, j0] * (1 - ti) * (1 - tj)
                + a[i0, j0 + 1] * (1 - ti) * tj
                + a[i0 + 1, j0] * ti * (1 - tj)
                + a[i0 + 1, j0 + 1] * ti * tj
            )

        return bil(self.shift_lat), bil(self.shift_lon)


@dataclass(frozen=True)
class GridShift:
    """Ordered grid set (parents first, denser subgrids after — the
    last containing grid wins). Points outside every grid pass
    through unshifted (PROJ's out-of-grid behavior for optional
    grids). Pickles cleanly into a Spark broadcast."""

    grids: list[ShiftGrid] = field(default_factory=list)

    def _shift_at(self, lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        dlat = np.zeros_like(lat, dtype=np.float64)
        dlon = np.zeros_like(lon, dtype=np.float64)
        for g in self.grids:  # later (denser) grids overwrite
            m = g.contains(lon, lat)
            if m.any():
                sa, so = g.interpolate(lon[m], lat[m])
                dlat[m] = sa
                dlon[m] = so
        return dlat, dlon

    def forward(self, lon, lat) -> tuple[np.ndarray, np.ndarray]:
        """Source datum -> target datum (NTv2 application rule:
        west-positive lon shift is SUBTRACTED)."""
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        sa, so = self._shift_at(lon, lat)
        return lon - so / 3600.0, lat + sa / 3600.0

    def inverse(self, lon, lat, max_iter: int = 10, tol: float = 1e-12) -> tuple[np.ndarray, np.ndarray]:
        """Target datum -> source datum by fixed-point iteration: the
        shift is looked up at the current source-estimate (PROJ
        hgridshift inverse loop)."""
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        glon, glat = lon.copy(), lat.copy()
        for _ in range(max_iter):
            flon, flat = self.forward(glon, glat)
            elon, elat = flon - lon, flat - lat
            glon = glon - elon
            glat = glat - elat
            if max(np.max(np.abs(elon), initial=0.0), np.max(np.abs(elat), initial=0.0)) < tol:
                break
        return glon, glat


def synthetic_grid(
    lat_min: float,
    lon_min: float,
    dlat: float,
    dlon: float,
    nrows: int,
    ncols: int,
    lat_fn,
    lon_fn,
) -> ShiftGrid:
    """Build a ShiftGrid by sampling analytic arc-second shift fields
    (test/fixture helper — real deployments load the lattice from a
    parquet of NTv2 nodes)."""
    lats = lat_min + dlat * np.arange(nrows)
    lons = lon_min + dlon * np.arange(ncols)
    glon, glat = np.meshgrid(lons, lats)
    return ShiftGrid(
        lat_min=lat_min,
        lon_min=lon_min,
        dlat=dlat,
        dlon=dlon,
        shift_lat=np.asarray(lat_fn(glon, glat), dtype=np.float64),
        shift_lon=np.asarray(lon_fn(glon, glat), dtype=np.float64),
    )
