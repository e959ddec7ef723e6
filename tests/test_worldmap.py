"""World-map renderer: graticule, shapefile rasterizer, ground plane."""

import struct

import numpy as np
import pytest

from correrender_tpu.render import Camera
from correrender_tpu.render.worldmap import (
    graticule_texture,
    read_shapefile_polygons,
    rasterize_shapefile,
    world_map_render,
)


class TestGraticule:
    def test_texture_has_lines(self):
        tex = graticule_texture(256, 128)
        assert tex.shape == (128, 256, 3)
        # Lines are brighter than ocean.
        assert tex.max() > 0.7
        assert (tex[..., 0] > 0.5).mean() < 0.5


def _write_square_shapefile(path):
    """Minimal .shp with one square polygon covering lon/lat ±45."""
    ring = [(-45, -45), (-45, 45), (45, 45), (45, -45), (-45, -45)]
    content = struct.pack("<i", 5)  # polygon
    content += struct.pack("<4d", -45, -45, 45, 45)  # bbox
    content += struct.pack("<2i", 1, len(ring))  # parts, points
    content += struct.pack("<i", 0)  # part offset
    for x, y in ring:
        content += struct.pack("<2d", x, y)
    record = struct.pack(">2i", 1, len(content) // 2) + content
    header = struct.pack(">i", 9994) + b"\0" * 20
    header += struct.pack(">i", (100 + len(record)) // 2)
    header += struct.pack("<2i", 1000, 5)
    header += struct.pack("<8d", -45, -45, 45, 45, 0, 0, 0, 0)
    with open(path, "wb") as f:
        f.write(header + record)


class TestShapefile:
    def test_read_and_rasterize(self, tmp_path):
        shp = str(tmp_path / "square.shp")
        _write_square_shapefile(shp)
        rings = read_shapefile_polygons(shp)
        assert len(rings) == 1 and len(rings[0]) == 5
        tex = rasterize_shapefile(shp, width=128, height=64)
        # Center (0,0 lon/lat) is land, poles are ocean.
        assert tex[32, 64, 1] == pytest.approx(0.42, abs=0.01)
        assert tex[2, 64, 2] == pytest.approx(0.42, abs=0.01)

    def test_bad_magic_rejected(self, tmp_path):
        p = tmp_path / "x.shp"
        p.write_bytes(b"\0" * 100)
        with pytest.raises(ValueError):
            read_shapefile_polygons(str(p))


class TestWorldMapRender:
    def test_plane_visible_below(self):
        cam = Camera(position=(0.0, 0.5, 0.9))
        img = np.asarray(
            world_map_render(cam, image_size=(64, 64))
        )
        assert img.shape == (64, 64, 4)
        # Lower half of the image shows the plane.
        assert img[48:, :, 3].max() == 1.0
        assert np.isfinite(img).all()

    def test_composites_behind_base(self):
        import jax.numpy as jnp

        cam = Camera(position=(0.0, 0.5, 0.9))
        base = jnp.zeros((32, 32, 4)).at[10:20, 10:20].set(
            jnp.asarray([1.0, 0.0, 0.0, 1.0])
        )
        img = np.asarray(
            world_map_render(cam, image_size=(32, 32), base_image=base)
        )
        # The red square stays untouched (plane renders behind).
        np.testing.assert_allclose(img[15, 15], [1, 0, 0, 1], atol=1e-5)


class TestRasterUnderlay:
    def _make_raster(self, tmp_path):
        from PIL import Image

        # Equirectangular test image: northern hemisphere green,
        # southern blue, with a red band at the prime meridian.
        arr = np.zeros((64, 128, 3), np.uint8)
        arr[:32] = (0, 160, 0)
        arr[32:] = (0, 0, 160)
        arr[:, 66:70] = (200, 0, 0)  # strictly east of the meridian
        p = str(tmp_path / "world.png")
        Image.fromarray(arr).save(p)
        return p

    def test_full_globe_load(self, tmp_path):
        from correrender_tpu.render.worldmap import load_raster_texture

        tex = load_raster_texture(self._make_raster(tmp_path))
        assert tex.shape == (64, 128, 3)
        assert tex.dtype == np.float32
        # north green, south blue
        assert tex[10, 20, 1] > 0.5 and tex[50, 20, 2] > 0.5

    def test_footprint_crop(self, tmp_path):
        from correrender_tpu.render.worldmap import load_raster_texture

        tex = load_raster_texture(
            self._make_raster(tmp_path),
            lat_range=(0.0, 90.0), lon_range=(-180.0, 0.0),
        )
        # NW quadrant: all green, no blue, no red meridian band.
        assert tex[..., 1].mean() > 0.4
        assert tex[..., 2].max() < 0.1
        assert tex[..., 0].max() < 0.1

    def test_scene_accepts_raster(self, tmp_path):
        from correrender_tpu.app.state import Scene
        from correrender_tpu.core import GridMetadata, VolumeData

        vol = np.random.default_rng(0).random((8, 16, 16)).astype(
            np.float32
        )
        vd = VolumeData(GridMetadata(xs=16, ys=16, zs=8, es=1))
        vd.add_field("f", lambda t, e: vol)
        scene = Scene(vd, views=[Camera(position=(0.0, 0.5, 0.9))])
        scene.add_renderer("world_map",
                           raster=self._make_raster(tmp_path))
        img = np.asarray(scene.render_view(0, image_size=(48, 48)))
        assert img.shape == (48, 48, 4)
        assert np.isfinite(img).all()
