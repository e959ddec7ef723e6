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
