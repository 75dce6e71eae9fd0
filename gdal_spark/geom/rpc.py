"""RPC (rational polynomial coefficient) transformer.

Reference: GDALCreateRPCTransformer / GDALRPCTransform
(/root/reference/alg/gdal_rpc.cpp):
  - forward (lon, lat, height) -> (pixel, line): normalize each input
    by its OFF/SCALE, evaluate the 20-term cubic polynomial in the
    exact RPCComputeTerms order (gdal_rpc.cpp:290-330), take
    NUM/DEN per axis, then result * SCALE + OFF + 0.5 (RPCs use the
    pixel-center = 0,0 convention; GDAL's top-left corner convention
    adds the 0.5 — :462-466)
  - inverse (pixel, line) -> (lon, lat): initial guess from a linear
    approximation fitted at the offset point (:1084,1144), then
    Newton-style iteration applying that linear map to the back-
    projection pixel error until max(|dx|,|dy|) < pix_err_threshold
    (:1288) or max_iterations (10 without a DEM, :1190)

DEM-driven height lookup, oscillation damping and the boost factor
(all tied to psTransform->poDS) are out of scope — heights are a
constant (the reference's no-DEM path with RPC_HEIGHT).

Exposes the Pipeline interface for the warp path like GCPPipeline:
source "world" == source pixel (identity geotransform on the source
RasterSpec), forward = src pixel -> geo is NOT defined for RPC (the
sensor model is geo -> image); RPCPipeline.inverse(dst world) is the
warp direction and RPCPipeline.forward uses the iterative inverse.
"""

from __future__ import annotations

import numpy as np

_RPC_KEYS = (
    "LINE_OFF", "SAMP_OFF", "LAT_OFF", "LONG_OFF", "HEIGHT_OFF",
    "LINE_SCALE", "SAMP_SCALE", "LAT_SCALE", "LONG_SCALE", "HEIGHT_SCALE",
)


def _terms(L: np.ndarray, P: np.ndarray, H: np.ndarray) -> np.ndarray:
    """(N, 20) cubic terms, RPCComputeTerms order (L=lon, P=lat, H=h,
    all normalized)."""
    return np.stack(
        [
            np.ones_like(L), L, P, H,
            L * P, L * H, P * H, L * L, P * P, H * H,
            L * P * H, L * L * L, L * P * P, L * H * H, L * L * P,
            P * P * P, P * H * H, L * L * H, P * P * H, H * H * H,
        ],
        axis=-1,
    )


class RPCTransformer:
    """rpc: dict with the ten offset/scale keys plus LINE_NUM_COEFF,
    LINE_DEN_COEFF, SAMP_NUM_COEFF, SAMP_DEN_COEFF (20 floats each)."""

    def __init__(self, rpc: dict, height: float = 0.0, pix_err_threshold: float = 0.1,
                 max_iterations: int = 10):
        for k in _RPC_KEYS:
            setattr(self, k.lower(), float(rpc[k]))
        self.line_num = np.asarray(rpc["LINE_NUM_COEFF"], dtype=np.float64)
        self.line_den = np.asarray(rpc["LINE_DEN_COEFF"], dtype=np.float64)
        self.samp_num = np.asarray(rpc["SAMP_NUM_COEFF"], dtype=np.float64)
        self.samp_den = np.asarray(rpc["SAMP_DEN_COEFF"], dtype=np.float64)
        for c in (self.line_num, self.line_den, self.samp_num, self.samp_den):
            if c.shape != (20,):
                raise ValueError("RPC coefficient arrays must have 20 entries")
        self.height = float(height)
        self.pix_err_threshold = float(pix_err_threshold)
        self.max_iterations = int(max_iterations)
        self._inv_gt = self._fit_linear_inverse()

    def forward(self, lon, lat, height=None):
        """(lon, lat[, height]) -> (pixel, line)."""
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        h = np.full_like(lon, self.height) if height is None else np.asarray(height, dtype=np.float64)
        diff_long = lon - self.long_off
        diff_long = np.where(diff_long < -270, diff_long + 360, diff_long)
        diff_long = np.where(diff_long > 270, diff_long - 360, diff_long)
        L = diff_long / self.long_scale
        P = (lat - self.lat_off) / self.lat_scale
        H = (h - self.height_off) / self.height_scale
        t = _terms(L, P, H)
        x = (t @ self.samp_num) / (t @ self.samp_den)
        y = (t @ self.line_num) / (t @ self.line_den)
        return (
            x * self.samp_scale + self.samp_off + 0.5,
            y * self.line_scale + self.line_off + 0.5,
        )

    def _fit_linear_inverse(self):
        """Affine (pixel, line) -> (lon, lat) fitted at the offset
        point (the reference's adfPLToLatLongGeoTransform role)."""
        lons = np.array([self.long_off, self.long_off + self.long_scale * 0.1, self.long_off])
        lats = np.array([self.lat_off, self.lat_off, self.lat_off + self.lat_scale * 0.1])
        px, py = self.forward(lons, lats)
        a = np.column_stack([np.ones(3), px, py])
        cx = np.linalg.solve(a, lons)
        cy = np.linalg.solve(a, lats)
        return cx, cy  # lon = cx @ (1, pixel, line); lat likewise

    def inverse(self, pixel, line):
        """(pixel, line) -> (lon, lat), iterative (no-DEM path)."""
        pixel = np.asarray(pixel, dtype=np.float64)
        line = np.asarray(line, dtype=np.float64)
        cx, cy = self._inv_gt
        lon = cx[0] + cx[1] * pixel + cx[2] * line
        lat = cy[0] + cy[1] * pixel + cy[2] * line
        for _ in range(self.max_iterations):
            bx, by = self.forward(lon, lat)
            dx = bx - pixel
            dy = by - line
            if float(np.max(np.maximum(np.abs(dx), np.abs(dy)), initial=0.0)) < self.pix_err_threshold:
                break
            lon = lon - (dx * cx[1] + dy * cx[2])
            lat = lat - (dx * cy[1] + dy * cy[2])
        return lon, lat


class RPCPipeline:
    """Warp-path adapter: source 'world' == source pixel (identity
    geotransform). inverse(dst world) = geo -> src pixel via the RPC
    forward model (the warp direction); forward(src pixel) = iterative
    geo recovery, optionally chained through a geo<->projection step."""

    def __init__(self, rpc: dict, height: float = 0.0, geo_pipeline=None, **kw):
        self.rpc = RPCTransformer(rpc, height=height, **kw)
        self.geo = geo_pipeline

    def forward(self, px, py):
        lon, lat = self.rpc.inverse(px, py)
        return self.geo.forward(lon, lat) if self.geo is not None else (lon, lat)

    def inverse(self, X, Y):
        if self.geo is not None:
            X, Y = self.geo.inverse(X, Y)
        return self.rpc.forward(X, Y)
