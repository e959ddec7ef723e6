"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from correrender_tpu import ops
from correrender_tpu.parallel import (
    make_mesh,
    shard_member_stack,
    pearson_member_sharded,
)
from correrender_tpu.parallel.pearson_sharded import correlate_member_sharded
from correrender_tpu.utils import fixtures


@pytest.fixture(scope="module")
def stack_and_ref():
    data = fixtures.synth_box_ensemble(xs=16, ys=8, zs=8, members=64)
    stack = jnp.asarray(np.moveaxis(data, 0, -1))  # (8, 8, 16, 64)
    ref = stack[4, 4, 4]
    return stack, ref


def test_mesh_construction():
    mesh = make_mesh(space=2, members=4)
    assert mesh.shape == {"space": 2, "members": 4}


def test_mesh_bad_factorization():
    with pytest.raises(ValueError):
        make_mesh(space=3, members=3)


@pytest.mark.parametrize("space,members", [(8, 1), (2, 4), (1, 8)])
def test_pearson_sharded_matches_dense(stack_and_ref, space, members):
    stack, ref = stack_and_ref
    mesh = make_mesh(space=space, members=members)
    sharded = shard_member_stack(stack, mesh)
    got = np.asarray(pearson_member_sharded(sharded, ref, mesh))
    want = np.asarray(ops.pearson(ref, stack))
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize(
    "measure", ["spearman", "kendall", "mi_kraskov", "mi_binned"]
)
def test_allgather_measures_match_dense(stack_and_ref, measure):
    stack, ref = stack_and_ref
    mesh = make_mesh(space=2, members=4)
    sharded = shard_member_stack(stack, mesh)
    got = np.asarray(
        correlate_member_sharded(sharded, ref, mesh, measure)
    )
    # Oracle = the dense CALCULATOR path: for binned MI it normalizes
    # by global min/max (reference semantics) — the sharded path must
    # match it, not per-shard bounds (round-3 review finding: Z-seam
    # divergence when each shard normalized by its local slab).
    from correrender_tpu.calculators.correlation import correlate_field

    want = np.asarray(correlate_field(stack, ref, measure))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_sharded_output_layout(stack_and_ref):
    stack, ref = stack_and_ref
    mesh = make_mesh(space=8, members=1)
    sharded = shard_member_stack(stack, mesh)
    out = pearson_member_sharded(sharded, ref, mesh)
    # Output stays sharded over space (no implicit gather).
    assert len(out.sharding.device_set) == 8


def test_mesh_members_exceed_devices_raises():
    # space auto-derives as n // members = 0 — must raise, not build
    # an empty 0 x members mesh (round-3 review).
    with pytest.raises(ValueError, match="devices"):
        make_mesh(members=16)


def test_sharded_pearson_honors_absolute(stack_and_ref):
    # The psum fast path returned signed r even with absolute=True,
    # diverging from the dense calculator (round-3 review).
    stack, ref = stack_and_ref
    mesh = make_mesh(space=2, members=4)
    sharded = shard_member_stack(stack, mesh)
    got = np.asarray(correlate_member_sharded(
        sharded, ref, mesh, "pearson", absolute=True))
    from correrender_tpu.calculators.correlation import correlate_field

    want = np.asarray(correlate_field(stack, ref, "pearson",
                                      absolute=True))
    np.testing.assert_allclose(got, want, atol=2e-5)
    assert (got >= 0).all()


def test_sharded_binned_mi_no_recompile_per_dataset(stack_and_ref):
    # mi_bounds ride the program as TRACED arrays: host floats keyed
    # the jit cache and forced a sync + full recompile per dataset
    # (round-3 review).
    from correrender_tpu.parallel import pearson_sharded as ps

    stack, ref = stack_and_ref
    mesh = make_mesh(space=2, members=4)
    sharded = shard_member_stack(stack, mesh)
    correlate_member_sharded(sharded, ref, mesh, "mi_binned")
    misses0 = ps._gather_sharded_fn.cache_info().misses
    # A different dataset (different min/max) must hit the same
    # compiled program.
    correlate_member_sharded(sharded * 3.0 + 1.0, ref * 2.0 - 0.5,
                             mesh, "mi_binned")
    assert ps._gather_sharded_fn.cache_info().misses == misses0


def test_sharded_binned_mi_flat_bounds_form(stack_and_ref):
    # The dense path accepts BOTH mi_bounds forms — flat (min, max)
    # for both axes and ((rmin,rmax), (qmin,qmax)); the sharded
    # wrapper crashed unpacking the flat form (round-3 review).
    from correrender_tpu.calculators.correlation import correlate_field

    stack, ref = stack_and_ref
    mesh = make_mesh(space=2, members=4)
    sharded = shard_member_stack(stack, mesh)
    lo = float(min(stack.min(), ref.min()))
    hi = float(max(stack.max(), ref.max()))
    got = np.asarray(correlate_member_sharded(
        sharded, ref, mesh, "mi_binned", mi_bounds=(lo, hi)
    ))
    want = np.asarray(correlate_field(
        stack, ref, "mi_binned", mi_bounds=(lo, hi)
    ))
    np.testing.assert_allclose(got, want, atol=1e-4)
