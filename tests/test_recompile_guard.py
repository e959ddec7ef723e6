"""Recompile guards for the interactive hot loops.

Re-jitting per frame was the recurring round-2/3 performance bug
(growing GP buffers, per-epoch jitted steps, per-call sharded
closures): everything still *works*, but every interactive step pays
a fresh XLA compile, which on the tunneled TPU turns a 30 ms frame
into a multi-second stall. These tests pin the jit-cache sizes of the
fused-frame cores across the interactions an interactive session
performs every frame — dragging the reference point, orbiting the
camera, re-rendering after a no-op — so a regression shows up as a
failing count, not as a mysteriously slow viewer.
"""

import numpy as np
import jax.numpy as jnp

from correrender_tpu.render.camera import Camera
from correrender_tpu.render.tf import TransferFunction
from correrender_tpu.utils import fixtures


def _stack(members=8):
    data = fixtures.synth_box_ensemble(xs=16, ys=16, zs=8,
                                       members=members)
    return jnp.asarray(np.moveaxis(data, 0, -1))


def _tf():
    return TransferFunction.from_colormap("coolwarm", domain=(-1.0, 1.0))


class TestFusedPipelineCache:
    def test_ref_point_drag_hits_cache(self):
        # render_correlation's jitted core takes the reference point as
        # a traced int32[3]: dragging it must re-run ONE compiled
        # program, never retrace (the north-star fused path).
        from correrender_tpu.render import pipeline

        stack = _stack()
        cam = Camera(position=(0.0, 0.2, 0.8))
        tf = _tf()
        for p in ((4, 4, 4), (5, 4, 4), (10, 12, 6)):
            pipeline.render_correlation(
                stack, jnp.asarray(p, jnp.int32), cam, tf,
                image_size=(32, 24),
            )
        assert pipeline._fused._cache_size() == 1

    def test_camera_orbit_hits_cache(self):
        # Orbiting within an octant changes only array inputs (rays /
        # homography coefficients); the shear-warp cores must not
        # retrace per frame.
        from correrender_tpu.render import dvr_fast, pipeline

        stack = _stack()
        tf = _tf()
        cams = [
            Camera(position=(0.01 * i, 0.2 + 0.005 * i, 0.8))
            for i in range(3)
        ]
        pipeline.render_correlation_fast(
            stack, (4, 4, 4), cams[0], tf, image_size=(32, 24))
        size0 = dvr_fast._warp_matmul._cache_size()
        for cam in cams[1:]:
            pipeline.render_correlation_fast(
                stack, (4, 4, 4), cam, tf, image_size=(32, 24))
        assert dvr_fast._warp_matmul._cache_size() == size0

        # A full orbit crosses Catmull–Smith variant boundaries — a
        # bounded handful of legitimate retraces (one per axis/flip
        # variant), NOT one per frame.
        import math

        for i in range(12):
            a = 2 * math.pi * i / 12
            cam = Camera(position=(0.8 * math.sin(a), 0.2,
                                   0.8 * math.cos(a)))
            pipeline.render_correlation_fast(
                stack, (4, 4, 4), cam, tf, image_size=(32, 24))
        assert dvr_fast._warp_matmul._cache_size() <= size0 + 8

    def test_sharded_pearson_program_reuse(self):
        # The sharded correlators jit one program per (mesh, statics);
        # repeat calls (interactive point drags on a sharded volume)
        # must reuse it — the round-2 bug was a fresh closure per call
        # (12.3 s → 33 ms once fixed).
        import jax

        from correrender_tpu.parallel import pearson_sharded
        from correrender_tpu.parallel.mesh import make_mesh

        if len(jax.devices()) < 4:
            import pytest

            pytest.skip("needs a multi-device mesh")
        mesh = make_mesh(space=2, members=2)
        stack = jnp.asarray(np.asarray(_stack(members=8), np.float32))
        fn = pearson_sharded._pearson_sharded_fn
        fn.cache_clear()
        for p in ((4, 4, 4), (5, 5, 5), (6, 4, 2)):
            pearson_sharded.correlate_member_sharded(
                stack, stack[p[2], p[1], p[0]], mesh, "pearson")
        assert fn.cache_info().currsize == 1
        assert fn.cache_info().hits == 2

    def test_repeat_correlate_jit_single_entry(self):
        # ops.registry.correlate_jit keys its program cache on
        # normalized kwargs: equal-value calls (0-d arrays vs floats)
        # must share one compiled program.
        from correrender_tpu.ops import registry

        stack = _stack()
        series = stack.reshape(-1, stack.shape[-1])[:64]
        ref = series[0]
        registry._correlate_program.cache_clear()
        registry.correlate_jit(ref, series, "mi_binned", num_bins=16)
        registry.correlate_jit(ref, series, "mi_binned",
                               num_bins=jnp.asarray(16))
        info = registry._correlate_program.cache_info()
        assert info.currsize == 1 and info.hits == 1
