"""Headless scenes and JSON app-state files.

State-file schema mirrors the reference (src/MainAppState.cpp:106-423):

```json
{
  "version": 1,
  "dataset": {"filename": ..., or "catalog": ..., "name": ...},
  "views": [{"camera": {"position": [..], "look_at": [..], "fovy": ..}}],
  "calculators": [{"type": "<CALCULATOR_TYPE_IDS>", ...settings}],
  "renderers": [{"type": "<RENDERING_MODE_NAMES_ID>", "view": 0,
                 ...settings}]
}
```

Calculator type ids come from calculators/base.py; renderer ids from
the reference's RENDERING_MODE_NAMES_ID (RenderingModes.hpp:62-73).
"""

from __future__ import annotations

import json
from collections import OrderedDict
from typing import Optional

import numpy as np
import jax.numpy as jnp

from correrender_tpu.calculators.base import calculator_from_settings
from correrender_tpu.render import Camera, TransferFunction
from correrender_tpu.render.dvr import dvr_render
from correrender_tpu.render.dvr_fast import dvr_shearwarp
from correrender_tpu.render.iso import iso_render
from correrender_tpu.render.slice_renderer import slice_render_3d
from correrender_tpu.render.outline import outline_render

#: Reference RenderingModes.hpp:62-73.
RENDERING_MODE_IDS = [
    "dvr",
    "iso_ray",
    "iso_raster",
    "domain_outline",
    "slice",
    "world_map",
    "diagram",
    "scatter_plot",
    "correlation_matrix",
    "time_series_correlation",
    "distribution_similarity",
]


def _camera_from_json(node: dict) -> Camera:
    kwargs = {}
    if "position" in node:
        kwargs["position"] = tuple(node["position"])
    if "look_at" in node:
        kwargs["look_at_point"] = tuple(node["look_at"])
    if "up" in node:
        kwargs["up"] = tuple(node["up"])
    if "fovy" in node:
        kwargs["fovy"] = float(node["fovy"])
    return Camera(**kwargs)


def _camera_to_json(cam: Camera) -> dict:
    return {
        "position": list(cam.position),
        "look_at": list(cam.look_at_point),
        "up": list(cam.up),
        "fovy": cam.fovy,
    }


class Scene:
    """A VolumeData + calculators + renderer configs + per-view cameras."""

    def __init__(self, volume_data, views=None):
        self.volume_data = volume_data
        self.views = views or [Camera()]
        self.renderers: list[dict] = []
        self.transfer_functions: dict[str, TransferFunction] = {}
        self.dataset_info: Optional[dict] = None
        self.current_time = 0
        self.current_member = 0
        # Abstract multi-view layout: rows of view indices (the
        # reference persists its ImGui dock layout the same role,
        # MainAppState.cpp:131). Default: one row of all views.
        self.dock_layout: list[list[int]] = [
            list(range(len(self.views)))
        ]
        # Named camera bookmarks (the reference's camera checkpoints,
        # sgl checkpointWindow — MainApp.cpp:2045): name → Camera.
        self.camera_checkpoints: dict[str, Camera] = {}
        # Resident shear-warp slice layouts: (field, t, e, tf, camera
        # axis key, restriction) → prepare_shearwarp result. Keeps the
        # classify + layout cost per change, not per frame — a bounded
        # LRU, because a single entry thrashed on every frame of any
        # scene with two fast renderers or two views (round-3 review).
        self._prepared_cache: OrderedDict = OrderedDict()
        # Rasterized diagram overlays: (node signature, target px,
        # time, member) → RGBA array. Recomputing a chart per frame
        # would dominate flythrough rendering.
        self._overlay_cache: OrderedDict = OrderedDict()

    # -- construction ------------------------------------------------------

    def add_calculator(self, calculator):
        self.volume_data.add_calculator(calculator)
        return calculator.output_name

    def add_renderer(self, type_id: str, view: int = 0, **settings):
        if type_id not in RENDERING_MODE_IDS:
            raise ValueError(
                f"unknown renderer type {type_id!r}; known: "
                f"{RENDERING_MODE_IDS}"
            )
        self.renderers.append({"type": type_id, "view": view, **settings})

    def save_camera_checkpoint(self, name: str, view: int = 0):
        """Bookmark the view's current camera under ``name``."""
        self.camera_checkpoints[name] = self.views[view]

    def restore_camera_checkpoint(self, name: str, view: int = 0):
        """Restore a bookmarked camera into ``view``."""
        if name not in self.camera_checkpoints:
            raise KeyError(
                f"no camera checkpoint {name!r}; saved: "
                f"{sorted(self.camera_checkpoints)}"
            )
        self.views[view] = self.camera_checkpoints[name]

    def tf_for(self, field_name: str) -> TransferFunction:
        if field_name not in self.transfer_functions:
            from correrender_tpu.render.tf import default_opacity_points

            lo, hi = self.volume_data.get_min_max(
                field_name, self.current_time, self.current_member
            )
            self.transfer_functions[field_name] = (
                TransferFunction.from_colormap(
                    "coolwarm", domain=(lo, hi),
                    opacity_points=default_opacity_points(lo, hi),
                )
            )
        return self.transfer_functions[field_name]

    _PREPARED_CACHE_CAP = 8

    def _prep_cache_get(self, key):
        prep = self._prepared_cache.get(key)
        if prep is not None:
            self._prepared_cache.move_to_end(key)
        return prep

    def _prep_cache_put(self, key, prep):
        self._prepared_cache[key] = prep
        self._prepared_cache.move_to_end(key)
        while len(self._prepared_cache) > self._PREPARED_CACHE_CAP:
            self._prepared_cache.popitem(last=False)

    def _exact_prepared(self, vol, field, restricted=None):
        """Resident Pallas-marcher layouts for the exact renderers
        (render/raymarch_exact.py::ExactPrepared), LRU'd alongside the
        shear-warp prepared layouts."""
        from correrender_tpu.render.raymarch_exact import ExactPrepared

        key = ("exact_march", field, self.current_time,
               self.current_member,
               self.volume_data.dirty_epoch(field), restricted)
        prep = self._prep_cache_get(key)
        if prep is None:
            prep = ExactPrepared(vol)
            self._prep_cache_put(key, prep)
        return prep

    # -- rendering ---------------------------------------------------------

    def _active_render_restriction(self, box):
        """(center, radius, metric) of the LAST calculator with an
        active render restriction, else None. Mirrors the reference's
        global ``VolumeData::setRenderRestriction`` state — the last
        calculator to set it wins (VolumeData.hpp:424-430), so the
        registration-order iteration runs reversed."""
        for calc in reversed(self.volume_data.calculators.values()):
            if getattr(calc, "use_render_restriction", False):
                from correrender_tpu.render.restriction import (
                    restriction_center,
                )

                center = restriction_center(
                    calc.reference_point,
                    self.volume_data.grid.shape_zyx, box,
                )
                return (
                    center,
                    float(calc.render_restriction_radius),
                    str(calc.render_restriction_metric),
                )
        return None

    @staticmethod
    def _restrict_iso_volume(vol, box, restriction):
        """NaN-fill voxels outside the restriction ball: both iso
        marchers treat NaN samples as no-crossing, so surfaces simply
        stop at the ball like the reference's per-sample gate."""
        if restriction is None:
            return vol
        from correrender_tpu.render.restriction import restriction_mask

        center, radius, metric = restriction
        mask = restriction_mask(vol.shape, box, center, radius, metric)
        return jnp.where(mask > 0, vol, jnp.nan)

    def render_view(self, view: int = 0, image_size=(512, 512),
                    fast_dvr: bool = True, show_reference_points=False,
                    show_legend: bool = False,
                    show_diagram_overlays: bool = True):
        """Composite all renderers attached to a view with a SHARED
        per-view depth buffer (reference SceneData.hpp): opaque
        renderers (isosurface, slice, outline) z-merge by per-pixel
        eye distance, then translucent DVR marches clip against that
        depth — so an opaque surface inside a cloud occludes correctly
        regardless of renderer registration order."""
        cam = self.views[view]
        vd = self.volume_data
        box = vd.grid.render_box()
        restriction = self._active_render_restriction(box)
        image = None        # world-map underlay accumulates here first
        opaque = []         # [(rgba, depth)] — z-merged below
        dvr_jobs = []       # deferred: they need the merged depth
        for r in self.renderers:
            if r["view"] != view or r.get("hidden"):
                continue
            field = r.get("field", vd.field_names[0])
            if r["type"] == "dvr":
                dvr_jobs.append(r)
            elif r["type"] == "iso_ray":
                raw_vol = vd.get_field(field, self.current_time,
                                       self.current_member)
                vol = self._restrict_iso_volume(raw_vol, box, restriction)
                iso_model_matrix = getattr(vd, "model_matrix", None)
                iso_closed = bool(r.get("closed_surface", False))
                from correrender_tpu.render.dvr_fast import (
                    shearwarp_viable,
                )

                if (fast_dvr and iso_model_matrix is None
                        and not iso_closed
                        # quality: "exact" forces the exact marcher
                        # (the shear-warp ray set is homography-
                        # interpolated — on high-frequency surfaces
                        # its SSIM vs exact tops out ~0.95-0.97; see
                        # docs/ROUND4.md).
                        and r.get("quality") != "exact"
                        # An explicitly chosen intersection solver
                        # (imported reference states) runs the exact
                        # ray-caster that implements it.
                        and r.get("intersection_mode",
                                  "bisection") == "bisection"
                        # Eye-inside cameras: iso_shearwarp would
                        # discard the prepared layout and fall back
                        # anyway — don't pay the ~9-pass gradient
                        # build or burn an LRU slot on a dead entry
                        # (the DVR path gates identically).
                        and shearwarp_viable(cam, box)):
                    from correrender_tpu.render.dvr_fast import (
                        shearwarp_camera_key,
                    )
                    from correrender_tpu.render.iso_fast import (
                        iso_shearwarp,
                        prepare_iso_shearwarp,
                    )

                    rest_sig = (
                        None if restriction is None else (
                            tuple(float(c) for c in restriction[0]),
                            restriction[1], restriction[2],
                        )
                    )
                    # Default 2× axial supersampling: exact trilinear
                    # sub-slabs close most of the fast-vs-exact gap
                    # (0.934 → 0.949 SSIM on the bench sponge scene)
                    # at ~2× scan cost, paid once in the prepared
                    # layout.
                    ss = int(r.get("axial_supersample", 2))
                    pkey = ("iso", field, self.current_time,
                            self.current_member, vd.dirty_epoch(field),
                            shearwarp_camera_key(cam), rest_sig, ss)
                    prep = self._prep_cache_get(pkey)
                    if prep is None:
                        prep = prepare_iso_shearwarp(
                            vol, cam, box=box, axial_supersample=ss)
                        self._prep_cache_put(pkey, prep)
                    img, depth = iso_shearwarp(
                        vol, cam, r.get("iso_value", 0.5),
                        surface_color=r.get("color",
                                            (0.9, 0.4, 0.2, 1.0)),
                        image_size=image_size, box=box,
                        background=(0, 0, 0, 0), prepared=prep,
                        axial_supersample=ss,
                        return_depth=True,
                    )
                else:
                    from correrender_tpu.render.raymarch_exact import (
                        iso_render_exact,
                    )

                    rest_sig = (
                        None if restriction is None else (
                            tuple(float(c) for c in restriction[0]),
                            restriction[1], restriction[2],
                        )
                    )
                    img, depth = iso_render_exact(
                        vol, cam, r.get("iso_value", 0.5),
                        surface_color=r.get("color",
                                            (0.9, 0.4, 0.2, 1.0)),
                        image_size=image_size, box=box,
                        background=(0, 0, 0, 0),
                        model_matrix=iso_model_matrix,
                        closed_surface=iso_closed,
                        intersection_mode=r.get("intersection_mode",
                                                "bisection"),
                        return_depth=True,
                        prepared=self._exact_prepared(
                            vol, field, restricted=rest_sig),
                    )
                opaque.append((img, depth))
            elif r["type"] == "slice":
                vol = vd.get_field(field, self.current_time,
                                   self.current_member)
                # Oblique planes carry the reference's settings keys
                # (SliceRenderer.cpp:360-368): normal_x/y/z +
                # plane_dist, plus lighting_factor / nan_handling /
                # fix_on_ground. Axis-aligned "axis"+"position" stays
                # the compact form.
                normal = r.get("normal")
                if normal is None and "normal_x" in r:
                    normal = (r["normal_x"], r.get("normal_y", 0.0),
                              r.get("normal_z", 0.0))
                img, depth = slice_render_3d(
                    vol, cam, self.tf_for(field),
                    axis=r.get("axis", "z"),
                    position=r.get("position", 0.5),
                    normal=normal,
                    plane_dist=r.get("plane_dist"),
                    lighting_factor=r.get("lighting_factor", 0.0),
                    nan_handling=r.get("nan_handling", "ignore"),
                    fix_on_ground=bool(r.get("fix_on_ground", False)),
                    image_size=image_size, box=box,
                    background=(0, 0, 0, 0),
                    return_depth=True,
                )
                opaque.append((img, depth))
            elif r["type"] == "domain_outline":
                img, depth = outline_render(
                    cam, box, image_size=image_size,
                    color=r.get("color", (1, 1, 1, 1)),
                    return_depth=True,
                )
                opaque.append((img, depth))
            elif r["type"] == "world_map":
                from correrender_tpu.render.worldmap import (
                    graticule_texture,
                    load_raster_texture,
                    rasterize_shapefile,
                    world_map_render,
                )

                if r.get("raster"):
                    # Local Natural-Earth-style raster underlay
                    # (WorldMapRenderer.cpp:57-91, sans download).
                    texture = load_raster_texture(
                        r["raster"],
                        lat_range=tuple(r.get("lat_range", (-90, 90))),
                        lon_range=tuple(r.get("lon_range", (-180, 180))),
                    )
                elif r.get("shapefile"):
                    texture = rasterize_shapefile(r["shapefile"])
                else:
                    texture = graticule_texture()
                # Ground plane below the data: farthest layer, plain
                # underlay (no depth participation needed).
                image = world_map_render(
                    cam,
                    texture=texture,
                    plane_height=r.get("plane_height",
                                       float(box[0][1]) - 0.01),
                    image_size=image_size,
                    box=box,
                    base_image=image,
                )
            elif r["type"] == "iso_raster":
                # Mesh-based: extract + export path; for view output use
                # the raycaster (identical appearance headlessly).
                vol = vd.get_field(field, self.current_time,
                                   self.current_member)
                vol = self._restrict_iso_volume(vol, box, restriction)
                img, depth = iso_render(
                    vol, cam, r.get("iso_value", 0.5),
                    image_size=image_size, box=box,
                    background=(0, 0, 0, 0),
                    # Same surface as iso_ray: a dataset model matrix
                    # must not render axis-aligned in one mode and
                    # transformed in the other (round-3 review).
                    model_matrix=getattr(vd, "model_matrix", None),
                    return_depth=True,
                )
                opaque.append((img, depth))
            # diagram/scatter/matrix/... render via their own SVG
            # paths (see diagrams/) and composite into the frame as
            # rasterized overlays after the 3D pass (below).

        merged, scene_depth = _depth_merge(opaque)
        if merged is not None:
            image = _composite(image, merged)

        for r in dvr_jobs:
            field = r.get("field", vd.field_names[0])
            vol = vd.get_field(field, self.current_time,
                               self.current_member)
            tf = self.tf_for(field)
            kwargs = dict(
                image_size=image_size, box=box,
                attenuation=r.get("attenuation", 100.0),
                background=(0, 0, 0, 0),
            )
            # Reference DvrRenderer step_size (voxel-relative, default
            # 0.1) — honored by the exact marcher; the shear-warp fast
            # path has its own slice-per-voxel structure.
            step_size = float(r.get("step_size", 0.1))
            model_matrix = getattr(vd, "model_matrix", None)
            nan_mode = r.get("nan_mode", "ignore")
            # Opaque geometry present → the march clips against the
            # shared depth buffer; both paths support it (the
            # shear-warp compositor via per-pixel stop-slice indices).
            from correrender_tpu.render.dvr_fast import (
                shearwarp_viable,
            )

            # Eye-inside frames take the exact marcher HERE (not via
            # the in-function fallback) so an active render
            # restriction rides dvr_render's restriction argument —
            # the fallback cannot carry the restriction-classified
            # volume.
            use_fast = (fast_dvr and model_matrix is None
                        and nan_mode == "ignore"
                        # Non-default step sizes need the exact
                        # marcher; the shear-warp path composites one
                        # slice per voxel plane by construction.
                        and step_size == 0.1
                        # quality: "exact" forces the per-pixel
                        # marcher (Pallas plane-order kernel since
                        # round 5 — ~0.2-0.4 s at 1080p, not ~40 s).
                        and r.get("quality") != "exact"
                        and shearwarp_viable(cam, box))
            if use_fast:
                from correrender_tpu.render.dvr_fast import (
                    prepare_shearwarp,
                    shearwarp_camera_key,
                )

                rest_sig = (
                    None if restriction is None else (
                        tuple(float(c) for c in restriction[0]),
                        restriction[1], restriction[2],
                    )
                )
                # dirty_epoch is a monotonic per-field version
                # bumped by mark_dirty; tf.uid a monotonic TF
                # instance id — both sound invalidation tokens
                # (id() of an evicted array can be reused).
                vol_part = (field, self.current_time,
                            self.current_member,
                            vd.dirty_epoch(field))
                pkey = (vol_part, tf.uid,
                        shearwarp_camera_key(cam), rest_sig)
                prep = self._prep_cache_get(pkey)
                if prep is None:
                    # A TF-only change can reuse the resident
                    # scalar layout: pass the newest same-volume
                    # entry as prior (prepare_shearwarp revalidates
                    # its axis key).
                    prior = None
                    if rest_sig is None:
                        for old_key, old_prep in reversed(
                                list(self._prepared_cache.items())):
                            if (old_key[0] == vol_part
                                    and old_key[3] is None):
                                prior = old_prep
                                break
                    classified = None
                    if restriction is not None:
                        # Voxel-granular restriction: mask the
                        # classified volume (render/restriction.py).
                        from correrender_tpu.render.classify import (
                            classify_volume,
                        )
                        from correrender_tpu.render.restriction import (
                            apply_restriction_rgba,
                            restriction_mask,
                        )

                        center, radius, metric = restriction
                        classified = apply_restriction_rgba(
                            classify_volume(
                                vol, tf.lut,
                                jnp.asarray(tf.domain, jnp.float32),
                            ),
                            restriction_mask(
                                vol.shape, box, center, radius,
                                metric,
                            ),
                        )
                    prep = prepare_shearwarp(
                        vol, tf, cam, classified=classified,
                        prior=prior,
                    )
                    self._prep_cache_put(pkey, prep)
                img = dvr_shearwarp(vol, cam, tf, prepared=prep,
                                    depth_limit=scene_depth, **kwargs)
            else:
                from correrender_tpu.render.raymarch_exact import (
                    dvr_render_exact,
                )

                img = dvr_render_exact(
                    vol, cam, tf,
                    restriction=restriction,
                    model_matrix=model_matrix,
                    nan_mode=nan_mode,
                    voxel_step=step_size,
                    depth_limit=scene_depth,
                    prepared=self._exact_prepared(
                        vol, field, restricted=None),
                    **kwargs)
            image = _composite(image, img)
        if image is None:
            image = jnp.zeros(image_size[::-1] + (4,), jnp.float32)
        # Reference-point markers of correlation calculators (the
        # reference's renderViewCalculator aux pass, VolumeData.cpp:1948).
        if show_reference_points:
            from correrender_tpu.render.picking import (
                render_reference_point_marker,
            )

            for calc in vd.calculators.values():
                point = getattr(calc, "reference_point", None)
                if point is not None:
                    image = render_reference_point_marker(
                        cam, point, vd.grid.shape_zyx, box,
                        image_size=image_size, base_image=image,
                    )
        if show_legend:
            # One legend for the view's primary scalar field — the
            # reference shows sgl's color-legend widget per TF.
            from correrender_tpu.render.legend import color_legend_overlay

            for r in self.renderers:
                if (r["view"] != view or r.get("hidden")
                        or r["type"] not in ("dvr", "slice", "iso_ray")):
                    continue
                field = r.get("field", vd.field_names[0])
                image = jnp.asarray(color_legend_overlay(
                    np.asarray(image), self.tf_for(field)
                ))
                break
        if show_diagram_overlays:
            image = self._composite_diagram_overlays(
                image, view, image_size)
        return image

    def _composite_diagram_overlays(self, image, view, image_size):
        """Composite the view's diagram-family nodes over the frame.

        The reference's diagram subsystem IS an overlay renderer —
        charts draw into the 3D view and appear in screenshots/videos
        (DiagramRenderer.hpp:62-100). Each node's SVG is rasterized
        (diagrams/raster.py) at ``overlay_frac`` of the frame's short
        side and source-over composited at ``overlay_anchor``
        (default bottom-right). Set ``overlay: false`` on a node to
        keep it out of frames (it stays renderable standalone).
        Failures (e.g. a time-series node without a source) drop the
        overlay with a warning instead of breaking the frame.
        """
        nodes = [r for r in self.renderers
                 if r["view"] == view and not r.get("hidden")
                 and r["type"] in self.DIAGRAM_TYPES
                 and r.get("overlay", True)]
        if not nodes:
            return image
        from correrender_tpu.diagrams.raster import (
            composite_overlay,
            rasterize_svg,
        )

        img_np = np.asarray(image)
        w, h = image_size
        anchors = ("bottom_right", "bottom_left", "top_right",
                   "top_left")
        for i, node in enumerate(nodes):
            frac = float(node.get("overlay_frac", 0.42))
            target = max(64, int(min(w, h) * frac))
            field = node.get("field",
                             self.volume_data.field_names[0])
            key = (repr(sorted(node.items(), key=lambda kv: kv[0])),
                   target, self.current_time, self.current_member,
                   self.volume_data.dirty_epoch(field))
            overlay = self._overlay_cache.get(key)
            if overlay is None:
                # Small overlays render from a smaller SVG canvas so
                # labels keep a readable size relative to the chart
                # (a 700 px layout shrunk to 90 px makes 12 px text
                # ~1.5 px); clamp to the diagram layouts' sane range.
                svg_size = int(min(700, max(256, target * 2)))
                try:
                    svg = self.render_diagram(node, size=svg_size)
                except Exception as exc:
                    import logging

                    logging.getLogger(__name__).warning(
                        "diagram overlay %s skipped: %s",
                        node["type"], exc)
                    self._overlay_cache[key] = False
                    continue
                overlay = rasterize_svg(svg, scale=target / svg_size)
                self._overlay_cache[key] = overlay
                while len(self._overlay_cache) > 16:
                    self._overlay_cache.popitem(last=False)
            elif overlay is False:
                continue
            img_np = composite_overlay(
                img_np, overlay,
                anchor=node.get("overlay_anchor",
                                anchors[i % len(anchors)]),
                opacity=float(node.get("overlay_opacity", 1.0)),
            )
        return jnp.asarray(img_np)

    def render_dock(self, image_size=(1024, 768), fast_dvr: bool = True):
        """Composite every view into one canvas per the dock layout.

        ``dock_layout`` is a list of rows of view indices (persisted
        in state files); each row shares the canvas height equally and
        splits its width across its views — the headless analogue of
        the reference's docked DataView grid (src/Widgets/DataView /
        ViewManager).
        """
        width, height = image_size
        layout = self.dock_layout or [[i] for i in range(len(self.views))]
        rows = len(layout)
        canvas = np.zeros((height, width, 4), np.float32)
        row_h = height // rows
        for r, row in enumerate(layout):
            if not row:
                continue
            col_w = width // len(row)
            for c, view_idx in enumerate(row):
                img = np.asarray(self.render_view(
                    int(view_idx), image_size=(col_w, row_h),
                    fast_dvr=fast_dvr,
                ))
                y0, x0 = r * row_h, c * col_w
                canvas[y0:y0 + row_h, x0:x0 + col_w] = img
        return jnp.asarray(canvas)

    # -- diagram-family renderers -------------------------------------------

    DIAGRAM_TYPES = ("diagram", "scatter_plot", "correlation_matrix",
                     "time_series_correlation", "distribution_similarity")

    def render_diagram(self, node: dict, size: int = 700) -> str:
        """Render one diagram-family renderer node to SVG text.

        The reference draws these as view overlays (DiagramRenderer and
        friends); headlessly each node renders to its own vector
        graphic, honoring the node's settings — including everything a
        reference state file carries through ``load_state`` (measure,
        per-axis downscaling, sampling method, chord filters, ...).
        """
        vd = self.volume_data
        kind = node["type"]
        field = node.get("field", vd.field_names[0])
        time = self.current_time
        member = self.current_member
        if kind == "diagram":
            from correrender_tpu.diagrams.heb import HEBChart

            factor = node.get("downsample_xyz",
                              node.get("downsample", 4))
            measure_kw = {}
            if "mi_bins" in node:
                measure_kw["num_bins"] = int(node["mi_bins"])
            if "kmi_neighbors" in node:
                measure_kw["k"] = int(node["kmi_neighbors"])
            if "absolute" in node:
                measure_kw["absolute"] = bool(node["absolute"])
            chart = HEBChart(
                np.asarray(vd.get_member_stack(field, time)),
                downsample_factor=factor,
                measure=node.get("measure", "pearson"),
                sampling_method=node.get("sampling_method", "mean"),
                num_samples=int(node.get("num_samples", 64)),
                max_chords=int(node.get("max_chords", 100)),
                octree_mode=node.get("octree_method", "topdown"),
                correlation_range=node.get("correlation_range"),
                cell_distance_range=node.get("cell_distance_range"),
                color_map=node.get("color_map", "coolwarm"),
                color_map_variance=node.get("color_map_variance",
                                            "viridis"),
                bayesian_screening=bool(
                    node.get("bayesian_screening", True)),
                **measure_kw,
            )
            chart.compute_correlations()
            if node.get("diagram_type") == "matrix":
                # The DiagramRenderer's alternative display mode
                # (CorrelationDefines.hpp:107-109).
                return chart.render_matrix_svg(size=size)
            return chart.render_svg(
                size=size,
                beta=float(node.get("beta", 0.75)),
                curve_thickness=float(node.get("curve_thickness", 1.0)),
                opacity_by_value=bool(node.get("opacity_by_value",
                                               True)),
                curve_opacity=float(
                    node.get("curve_opacity_context", 0.8)),
                outer_ring_size_pct=float(
                    node.get("outer_ring_size_pct", 0.06)),
            )
        if kind == "scatter_plot":
            from correrender_tpu.diagrams.scatter import (
                render_scatter_svg,
            )

            field_b = node.get("field_b", field)
            a = np.asarray(vd.get_field(field, time, member))
            b = np.asarray(vd.get_field(field_b, time, member))
            return render_scatter_svg(
                a, b, labels=(field, field_b), size=size,
                point_radius=float(node.get("point_size", 2.0)),
                point_color=node.get("point_color"),
            )
        if kind == "correlation_matrix":
            from correrender_tpu.diagrams.matrix import (
                field_correlation_matrix,
                render_matrix_svg,
            )

            m, names = field_correlation_matrix(
                vd, vd.field_names,
                measure=node.get("correlation_measure_type",
                                 node.get("measure", "pearson")),
            )
            return render_matrix_svg(
                m, labels=names, size=size,
                colormap=node.get("color_map", "coolwarm"))
        if kind == "distribution_similarity":
            from correrender_tpu.diagrams.distribution_similarity import (
                distribution_similarity,
            )
            from correrender_tpu.diagrams.scatter import (
                render_scatter_svg,
            )

            emb, labels, _ = distribution_similarity(
                np.asarray(vd.get_member_stack(field, time)),
                mode=node.get("mode", "cell_member_values"),
                max_points=int(node.get("max_points", 400)),
                perplexity=float(node.get("perplexity", 30.0)),
                num_iters=int(node.get("tsne_num_iters", 500)),
                seed=int(node.get("tsne_seed", 0)),
                eps=(float(node["dbscan_eps"])
                     if node.get("dbscan_eps") else None),
                min_samples=int(node.get("dbscan_min_pts", 8)),
            )
            return render_scatter_svg(
                emb[:, 0], emb[:, 1], labels=("t-SNE 1", "t-SNE 2"),
                colors=labels, size=size,
            )
        if kind == "time_series_correlation":
            from correrender_tpu.diagrams.timeseries import (
                load_time_series,
                render_heatmap_svg,
                time_series_correlation,
            )

            measure = node.get("measure", "pearson")
            window = node.get("window")
            if node.get("path"):
                series = load_time_series(node["path"])
            else:
                # Region-mean series over the dataset's time axis (the
                # viewer dock's multi-timestep mode).
                g = vd.grid
                if g.ts < 2:
                    raise ValueError(
                        "time_series_correlation needs a time-series "
                        "file ('path') or a multi-timestep dataset")
                from correrender_tpu.diagrams.octree import (
                    downsample_fields,
                )

                fvol = np.stack(
                    [np.asarray(vd.get_field(field, t, member))
                     for t in range(g.ts)], axis=-1)
                f = max(min(g.xs, g.ys) // 4, 1)
                series = downsample_fields(fvol, f).reshape(-1, g.ts)
                series = series[np.isfinite(series).all(axis=1)]
            m = time_series_correlation(
                series, measure,
                window=int(window) if window else None)
            return render_heatmap_svg(
                m, size=size,
                colormap=node.get("color_map", "coolwarm"))
        raise ValueError(f"not a diagram-family renderer: {kind!r}")

    # -- persistence --------------------------------------------------------

    def save_state(self, path: str, dataset: Optional[dict] = None,
                   reference_format: bool = False):
        """Persist the scene as JSON.

        With ``reference_format=True`` the document uses the reference
        app's schema (MainAppState.cpp:106-205 — sgl cameras,
        ``{type, state}`` SettingsMap nodes, TF-widget XML), so the
        file loads in the reference app directly.
        """
        if reference_format:
            from correrender_tpu.app.state_ref import (
                reference_state_from_scene,
            )

            doc = reference_state_from_scene(self, dataset=dataset)
            with open(path, "w") as f:
                json.dump(doc, f, indent=4)
            return
        doc = {
            "version": 1,
            "dataset": dataset or self.dataset_info or {},
            "views": [{"camera": _camera_to_json(c)} for c in self.views],
            "calculators": [
                {
                    "type": c.type_id,
                    **(
                        {"continuous_recompute": True}
                        if getattr(c, "continuous_recompute", False)
                        else {}
                    ),
                    **_jsonable(c.get_settings()),
                }
                for c in self.volume_data.calculators.values()
            ],
            "renderers": _jsonable(self.renderers),
            "transfer_functions": {
                name: tf.to_dict()
                for name, tf in self.transfer_functions.items()
            },
            "current_time": self.current_time,
            "current_member": self.current_member,
            # Multi-view layout (the reference persists its ImGui dock
            # layout, MainAppState.cpp:131; headless scenes keep an
            # abstract grid: rows of view indices).
            "dock_layout": self.dock_layout,
            # Named camera bookmarks (reference checkpointWindow).
            "camera_checkpoints": {
                name: _camera_to_json(cam)
                for name, cam in self.camera_checkpoints.items()
            },
        }
        with open(path, "w") as f:
            json.dump(doc, f, indent=2)

    @classmethod
    def load_state(cls, path: str, volume_data=None,
                   catalog: Optional[str] = None):
        """Load a scene state file — this framework's schema or a
        state file saved by the reference app (auto-detected and
        converted via app/state_ref.py; ``catalog`` resolves the
        reference's dataset-by-name reference when no ``volume_data``
        is passed)."""
        with open(path) as f:
            doc = json.load(f)

        from correrender_tpu.app.state_ref import (
            convert_reference_state,
            is_reference_state,
        )

        if is_reference_state(doc):
            if volume_data is None:
                vol = doc.get("volume_data", {}) or {}
                if "filename" in vol:
                    from correrender_tpu.io import load_volume

                    volume_data = load_volume(vol["filename"])
                elif "name" in vol and catalog:
                    from correrender_tpu.io import load_catalog
                    from correrender_tpu.io.catalog import open_dataset

                    entries = load_catalog(catalog)
                    match = [e for e in entries if e.name == vol["name"]]
                    if not match:
                        raise ValueError(
                            f"dataset {vol['name']!r} not in catalog "
                            f"{catalog!r}"
                        )
                    volume_data = open_dataset(match[0])
                else:
                    raise ValueError(
                        "reference state file names its dataset by "
                        "catalog entry; pass volume_data= or catalog="
                    )
            doc, warnings = convert_reference_state(
                doc, volume_data.field_names)
            for message in warnings:
                import logging

                logging.getLogger(__name__).warning(
                    "state import: %s", message)
        if volume_data is None:
            ds = doc.get("dataset", {})
            if "catalog" in ds:
                from correrender_tpu.io import load_catalog
                from correrender_tpu.io.catalog import open_dataset

                entries = load_catalog(ds["catalog"])
                match = [e for e in entries if e.name == ds.get("name")]
                volume_data = open_dataset(
                    match[0] if match else entries[0]
                )
            elif "filename" in ds:
                from correrender_tpu.io import load_volume

                volume_data = load_volume(ds["filename"])
            else:
                raise ValueError(
                    "state file has no dataset and none was provided"
                )
        views = [
            _camera_from_json(v.get("camera", {}))
            for v in doc.get("views", [{}])
        ]
        scene = cls(volume_data, views)
        scene.dataset_info = doc.get("dataset")
        scene.current_time = doc.get("current_time", 0)
        scene.current_member = doc.get("current_member", 0)
        for node in doc.get("calculators", []):
            node = dict(node)
            type_id = node.pop("type")
            ref_extra = node.pop("_ref_extra", None)
            calc = calculator_from_settings(type_id, node)
            if ref_extra:
                # Reference-only settings (GPU plumbing, picking GUI
                # state) kept for lossless reference-format re-export.
                calc._ref_extra = ref_extra
            scene.add_calculator(calc)
        for node in doc.get("renderers", []):
            node = dict(node)
            scene.add_renderer(node.pop("type"), **node)
        for name, tf_state in doc.get("transfer_functions", {}).items():
            scene.transfer_functions[name] = TransferFunction.from_dict(
                tf_state
            )
        if "dock_layout" in doc:
            scene.dock_layout = [
                [int(i) for i in row] for row in doc["dock_layout"]
            ]
        if "window_size" in doc:
            # Reference window size → default render size for headless
            # drivers that don't pass one (cli state without --size).
            scene.window_size = tuple(
                int(v) for v in doc["window_size"])
        for name, node in doc.get("camera_checkpoints", {}).items():
            scene.camera_checkpoints[name] = _camera_from_json(node)
        return scene


def _composite(base, over):
    """Straight-alpha OVER of a new layer on top of the base image."""
    if base is None:
        return over
    a = over[..., 3:4]
    rgb = over[..., :3] * a + base[..., :3] * (1 - a)
    alpha = a[..., 0] + base[..., 3] * (1 - a[..., 0])
    return jnp.concatenate([rgb, alpha[..., None]], axis=-1)


def _depth_merge(layers):
    """Z-merge ``[(rgba, depth)]`` opaque layers per pixel.

    Layers are per-pixel depth-SORTED, then folded front-to-back with
    OVER — registration-order invariant for any number of overlapping
    layers (a pairwise fold is not: merging the nearest and farthest
    of three layers first composites the true middle layer behind the
    pair, because the pair carries only its min depth). Depth is +inf
    where a layer is empty; the shared-depth analogue of the
    reference's z-buffered geometry passes (SceneData.hpp). Returns
    (rgba | None, depth | None).
    """
    if not layers:
        return None, None
    if len(layers) == 1:
        return layers[0]
    rgba = jnp.stack([im for im, _ in layers])      # (N, H, W, 4)
    depth = jnp.stack([d for _, d in layers])       # (N, H, W)
    order = jnp.argsort(depth, axis=0)              # N is tiny
    rgba = jnp.take_along_axis(rgba, order[..., None], axis=0)
    # Fold back-to-front in PREMULTIPLIED space — the associative OVER
    # (straight-alpha folds drop the back layer's alpha, which breaks
    # order invariance wherever same-depth layers tie, e.g. two empty
    # +inf pixels under a translucent fringe).
    a = rgba[-1][..., 3:4]
    rgbp = rgba[-1][..., :3] * a
    alpha = a[..., 0]
    for i in range(rgba.shape[0] - 2, -1, -1):      # toward the camera
        top = rgba[i]
        ta = top[..., 3:4]
        rgbp = top[..., :3] * ta + rgbp * (1 - ta)
        alpha = ta[..., 0] + alpha * (1 - ta[..., 0])
    rgb = rgbp / jnp.maximum(alpha[..., None], 1e-9)  # back to straight
    return (
        jnp.concatenate([rgb, alpha[..., None]], axis=-1),
        jnp.min(depth, axis=0),
    )


def _jsonable(obj):
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    return obj
