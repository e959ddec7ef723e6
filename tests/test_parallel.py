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
