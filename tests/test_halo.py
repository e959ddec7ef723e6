"""Halo-exchange tests on the virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from correrender_tpu.parallel.mesh import make_mesh
from correrender_tpu.parallel.halo import (
    exchange_halo_z,
    gaussian_blur_3d_sharded,
)
from correrender_tpu.calculators.noise import gaussian_blur_3d


def test_exchange_halo_matches_global():
    mesh = make_mesh(space=4, members=1)
    vol = jnp.asarray(
        np.random.default_rng(0).normal(size=(16, 4, 4)).astype(np.float32)
    )
    halo = 2

    from jax import shard_map

    fn = shard_map(
        lambda b: exchange_halo_z(b, halo),
        mesh=mesh,
        in_specs=P("space", None, None),
        out_specs=P("space", None, None),
        check_vma=False,
    )
    sharded = jax.device_put(vol, NamedSharding(mesh, P("space", None, None)))
    out = np.asarray(fn(sharded))  # (16 + 4*2*halo interleaved) per shard
    out = out.reshape(4, 4 + 2 * halo, 4, 4)
    ref = np.asarray(vol)
    for shard in range(4):
        z0 = shard * 4
        # Interior halo planes come from the neighbours.
        lo = ref[max(z0 - halo, 0) : z0] if shard > 0 else np.repeat(
            ref[:1], halo, axis=0
        )
        hi = (
            ref[z0 + 4 : z0 + 4 + halo]
            if shard < 3
            else np.repeat(ref[-1:], halo, axis=0)
        )
        want = np.concatenate([lo, ref[z0 : z0 + 4], hi], axis=0)
        np.testing.assert_allclose(out[shard], want)


def test_sharded_blur_matches_dense():
    mesh = make_mesh(space=4, members=1)
    vol = jnp.asarray(
        np.random.default_rng(1).normal(size=(32, 8, 8)).astype(np.float32)
    )
    sharded = jax.device_put(vol, NamedSharding(mesh, P("space", None, None)))
    got = np.asarray(gaussian_blur_3d_sharded(sharded, 1.5, mesh))
    want = np.asarray(gaussian_blur_3d(vol, 1.5))
    np.testing.assert_allclose(got, want, atol=2e-5)
