"""Multi-chip stress tier (VERDICT r2 #8).

Runs the LITERAL sharded programs — `config5_sharded_batch_render`,
`correlate_member_sharded` for rank/KSG — at the largest grid the
8-device virtual CPU mesh comfortably holds, and asserts per-device
memory stays proportional to 1/n_devices via the compiled programs'
`memory_analysis()` (the invariant the docs/SCALING.md 64-chip v5p
budget relies on). Hardware-scale runs are impossible on this rig;
this is the strongest available evidence that the sharding divides
both work and memory.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from correrender_tpu.parallel.mesh import make_mesh, shard_member_stack
from correrender_tpu.parallel.pearson_sharded import (
    correlate_member_sharded,
    pearson_member_sharded,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual mesh"
)

# Largest grid that keeps the CPU-suite runtime sane while still being
# far beyond unit-test toy shapes: 128×128×64×32 f32 = 134 MB stack.
GRID = (64, 128, 128)  # (zs, ys, xs)
MEMBERS = 32


def _stack():
    return jax.random.normal(
        jax.random.key(0), GRID + (MEMBERS,), jnp.float32
    )


def _per_device_bytes(compiled):
    """Per-device temp+output footprint from XLA's memory analysis."""
    m = compiled.memory_analysis()
    if m is None:  # backend without analysis support
        return None
    return (getattr(m, "temp_size_in_bytes", 0)
            + getattr(m, "output_size_in_bytes", 0))


class TestShardedPearsonStress:
    def test_memory_divides_across_devices(self):
        mesh = make_mesh(space=2, members=4)
        stack = shard_member_stack(_stack(), mesh)
        ref = jax.random.normal(jax.random.key(1), (MEMBERS,))
        ref = jax.device_put(
            ref, NamedSharding(mesh, P("members"))
        )

        out = pearson_member_sharded(stack, ref, mesh)
        assert np.isfinite(np.asarray(out)).mean() > 0.99

        # The stack itself must be split 8 ways: each addressable
        # shard holds total/8 elements.
        total = int(np.prod(GRID)) * MEMBERS * 4
        shard_bytes = stack.addressable_shards[0].data.nbytes
        assert shard_bytes == total // 8

    def test_compiled_temps_stay_proportional(self):
        mesh = make_mesh(space=2, members=4)
        stack = shard_member_stack(_stack(), mesh)
        ref = jax.device_put(
            jax.random.normal(jax.random.key(1), (MEMBERS,)),
            NamedSharding(mesh, P("members")),
        )
        from correrender_tpu.parallel.pearson_sharded import (
            _pearson_sharded_fn,
        )

        fn = _pearson_sharded_fn(mesh, MEMBERS)
        compiled = fn.lower(stack, ref).compile()
        per_dev = _per_device_bytes(compiled)
        if per_dev is None:
            pytest.skip("backend lacks memory_analysis")
        field_bytes = int(np.prod(GRID)) * 4
        stack_bytes = int(np.prod(GRID)) * MEMBERS * 4
        # Per-device temps must be a fraction of the full stack —
        # sharding that silently replicated would show ~stack_bytes.
        assert per_dev < stack_bytes / 2, (
            f"per-device {per_dev} vs full stack {stack_bytes}"
        )
        assert per_dev < 6 * field_bytes  # moments + output headroom


class TestRankKsgSharded:
    @pytest.mark.parametrize("measure", ["spearman", "mi_kraskov"])
    def test_large_grid_matches_dense(self, measure):
        # Smaller spatial grid for the O(n log n)/O(n²) measures, but
        # the same member-sharded all_gather path as production.
        grid = (16, 32, 32)
        mesh = make_mesh(space=2, members=4)
        stack = jax.random.normal(
            jax.random.key(2), grid + (MEMBERS,), jnp.float32
        )
        sharded = shard_member_stack(stack, mesh)
        ref = jax.random.normal(jax.random.key(3), (MEMBERS,))
        ref_sh = jax.device_put(
            ref, NamedSharding(mesh, P("members"))
        )
        got = np.asarray(
            correlate_member_sharded(sharded, ref_sh, mesh, measure)
        )
        from correrender_tpu.calculators.correlation import (
            correlate_field,
        )

        want = np.asarray(correlate_field(stack, ref, measure))
        np.testing.assert_allclose(got, want, atol=5e-4)


class TestConfig5Stress:
    def test_literal_config5_at_stress_grid(self):
        from correrender_tpu.app import baseline_configs as bc

        row = bc.config5_sharded_batch_render(
            grid=(128, 128, 64), members=MEMBERS
        )
        assert row["devices"] >= 8
        assert row["grid"] == [128, 128, 64]
        assert np.isfinite(row["sharded_pearson_ms"])
        assert np.isfinite(row["batch_render_total_ms"])
