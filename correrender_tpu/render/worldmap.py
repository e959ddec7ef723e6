"""World-map ground-plane renderer for geo-referenced (lat/lon) data.

Reference: src/Renderers/WorldMapRenderer.* — draws an earth-surface
plane under lat/lon volumes, texturing it with a Natural-Earth raster
(downloaded at runtime, WorldMapRenderer.cpp:57-91) or a rasterized
shapefile (src/Renderers/Raster/ShapefileRasterizer.*).

This environment has no network egress, so the texture sources are:
a user-supplied equirectangular image, a user-supplied ESRI shapefile
(decoded natively by :func:`rasterize_shapefile` — polygon scanline
fill, the ShapefileRasterizer role), or a procedural graticule.
"""

from __future__ import annotations

import struct

import jax.numpy as jnp
import numpy as np


def graticule_texture(
    width: int = 1024,
    height: int = 512,
    spacing_deg: float = 15.0,
    ocean=(0.16, 0.29, 0.42),
    line=(0.8, 0.85, 0.9),
) -> np.ndarray:
    """Procedural lat/lon grid texture (equirectangular)."""
    lon = np.linspace(-180, 180, width)
    lat = np.linspace(90, -90, height)
    glon, glat = np.meshgrid(lon, lat)
    dist_lon = np.abs((glon + 180) % spacing_deg - 0)  # distance to line
    dist_lon = np.minimum(dist_lon, spacing_deg - dist_lon)
    dist_lat = np.abs((glat + 90) % spacing_deg)
    dist_lat = np.minimum(dist_lat, spacing_deg - dist_lat)
    px_deg = 360.0 / width
    on_line = (dist_lon < px_deg) | (dist_lat < 2 * px_deg * 0.5)
    tex = np.empty((height, width, 3), np.float32)
    tex[:] = ocean
    tex[on_line] = line
    return tex


def read_shapefile_polygons(path: str):
    """Minimal ESRI shapefile (.shp) polygon reader.

    Supports shape type 5 (Polygon); returns a list of (N, 2) lon/lat
    rings. Native decoder — no pyshp/GDAL in this image.
    """
    with open(path, "rb") as f:
        header = f.read(100)
        if struct.unpack(">i", header[:4])[0] != 9994:
            raise ValueError(f"{path}: not a shapefile")
        shape_type = struct.unpack("<i", header[32:36])[0]
        if shape_type not in (5, 15, 25):
            raise ValueError(
                f"{path}: unsupported shape type {shape_type} "
                "(polygons only)"
            )
        rings = []
        while True:
            rec_header = f.read(8)
            if len(rec_header) < 8:
                break
            (content_len,) = struct.unpack(">i", rec_header[4:8])
            content = f.read(content_len * 2)
            (stype,) = struct.unpack("<i", content[:4])
            if stype == 0:  # null shape
                continue
            num_parts, num_points = struct.unpack("<2i", content[36:44])
            parts = struct.unpack(
                f"<{num_parts}i", content[44 : 44 + 4 * num_parts]
            )
            pts_off = 44 + 4 * num_parts
            pts = np.frombuffer(
                content[pts_off : pts_off + 16 * num_points], "<f8"
            ).reshape(num_points, 2)
            bounds = list(parts) + [num_points]
            for i in range(num_parts):
                rings.append(pts[bounds[i] : bounds[i + 1]].copy())
        return rings


def rasterize_shapefile(
    path: str,
    width: int = 1024,
    height: int = 512,
    land=(0.35, 0.42, 0.3),
    ocean=(0.16, 0.29, 0.42),
) -> np.ndarray:
    """Scanline-rasterize shapefile polygons into an equirectangular
    texture (ShapefileRasterizer role, even-odd fill)."""
    rings = read_shapefile_polygons(path)
    mask = np.zeros((height, width), bool)
    lat_of_row = np.linspace(90, -90, height)
    for row in range(height):
        lat = lat_of_row[row]
        crossings = []
        for ring in rings:
            x = ring[:, 0]
            y = ring[:, 1]
            x1 = np.roll(x, -1)
            y1 = np.roll(y, -1)
            hit = ((y <= lat) & (y1 > lat)) | ((y1 <= lat) & (y > lat))
            if hit.any():
                t = (lat - y[hit]) / (y1[hit] - y[hit])
                crossings.extend(x[hit] + t * (x1[hit] - x[hit]))
        if not crossings:
            continue
        cols = np.sort(
            ((np.asarray(crossings) + 180.0) / 360.0 * width)
        ).astype(int)
        for a, b in zip(cols[::2], cols[1::2]):
            mask[row, max(a, 0) : min(b, width)] = True
    tex = np.empty((height, width, 3), np.float32)
    tex[:] = ocean
    tex[mask] = land
    return tex


def load_raster_texture(
    path: str,
    lat_range=(-90.0, 90.0),
    lon_range=(-180.0, 180.0),
    source_lat=(-90.0, 90.0),
    source_lon=(-180.0, 180.0),
    max_size: int = 4096,
) -> np.ndarray:
    """Load a local equirectangular raster (PNG/JPEG/(Geo)TIFF) as the
    ground-plane texture — the reference's Natural-Earth raster
    underlay (WorldMapRenderer.cpp:57-91) without its runtime download
    (zero egress here): point it at a local copy of e.g.
    ``NE1_50M_SR_W.tif``.

    Args:
      lat_range/lon_range: the dataset footprint to crop to.
      source_lat/source_lon: the geographic extent the image covers
        (full globe for the Natural-Earth rasters; override for
        regional tiles or use a world file's values).
      max_size: longest output edge (downsampled above it).

    Returns: (H, W, 3) float32 in [0, 1].
    """
    from PIL import Image

    Image.MAX_IMAGE_PIXELS = None  # NE rasters exceed the default
    img = Image.open(path)
    img = img.convert("RGB")
    w, h = img.size

    def frac(value, lo, hi):
        return (value - lo) / (hi - lo)

    # Crop the requested footprint out of the source extent (rows run
    # north → south).
    x0 = int(np.clip(frac(lon_range[0], *source_lon), 0, 1) * w)
    x1 = int(np.ceil(np.clip(frac(lon_range[1], *source_lon), 0, 1) * w))
    y0 = int((1 - np.clip(frac(lat_range[1], *source_lat), 0, 1)) * h)
    y1 = int(np.ceil(
        (1 - np.clip(frac(lat_range[0], *source_lat), 0, 1)) * h
    ))
    x1 = max(x1, x0 + 1)
    y1 = max(y1, y0 + 1)
    img = img.crop((x0, y0, x1, y1))
    cw, ch = img.size
    if max(cw, ch) > max_size:
        scale = max_size / max(cw, ch)
        img = img.resize(
            (max(int(cw * scale), 1), max(int(ch * scale), 1)),
            Image.BILINEAR,
        )
    return np.asarray(img, np.float32) / 255.0


def world_map_render(
    camera,
    lat_range=(-90.0, 90.0),
    lon_range=(-180.0, 180.0),
    texture: np.ndarray | None = None,
    plane_height: float = -0.26,
    image_size=(512, 512),
    box=None,
    base_image=None,
) -> jnp.ndarray:
    """Render the textured ground plane under the volume box.

    The plane spans the volume's (x, y) footprint (lon → x, lat → y as
    in the reference's lat/lon mapping); texture coords come from the
    dataset's lat/lon extents.
    """
    if texture is None:
        texture = graticule_texture()
    tex = jnp.asarray(texture, jnp.float32)
    th, tw = tex.shape[:2]
    if box is None:
        box = (np.array([-0.25, -0.25, -0.25], np.float32),
               np.array([0.25, 0.25, 0.25], np.float32))
    box_min, box_max = np.asarray(box[0]), np.asarray(box[1])

    width, height = image_size
    origin, directions = camera.rays(width, height)
    d_y = directions[..., 1]
    t = (plane_height - origin[1]) / jnp.where(
        jnp.abs(d_y) < 1e-9, 1e-9, d_y
    )
    p = origin + directions * t[..., None]
    u = (p[..., 0] - box_min[0]) / (box_max[0] - box_min[0])
    v = (p[..., 2] - box_min[2]) / (box_max[2] - box_min[2])
    in_plane = (t > 0) & (u >= 0) & (u <= 1) & (v >= 0) & (v <= 1)
    col = jnp.clip((u * (tw - 1)).astype(jnp.int32), 0, tw - 1)
    row = jnp.clip(((1 - v) * (th - 1)).astype(jnp.int32), 0, th - 1)
    rgb = tex[row, col]
    mask = in_plane.astype(jnp.float32)[..., None]
    if base_image is None:
        base_image = jnp.zeros((height, width, 4), jnp.float32)
    # Plane renders behind existing content (it is the backdrop).
    # Straight-alpha under-compositing — every producer/compositor in
    # this package uses straight rgba (adding un-weighted base rgb
    # treated it as premultiplied and over-brightened translucent
    # pixels, round-3 review).
    base_a = base_image[..., 3:4]
    out_rgb = base_image[..., :3] * base_a + (1 - base_a) * mask * rgb
    out_a = jnp.maximum(base_a[..., 0], mask[..., 0])
    out_rgb = out_rgb / jnp.maximum(out_a[..., None], 1e-9)
    return jnp.concatenate([out_rgb, out_a[..., None]], axis=-1)
