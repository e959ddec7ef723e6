"""KL-divergence calculator: per-voxel D_KL(member distribution ‖ N(0,1)).

Reference: src/Calculators/DKLCalculator.* — binned or
Kozachenko-Leonenko entropy-kNN estimator (DKLCalculator.hpp:96).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from correrender_tpu.calculators.base import Calculator, register_calculator_type
from correrender_tpu.ops.dkl import dkl_binned, dkl_knn


@register_calculator_type("dkl_calculator")
class DKLCalculator(Calculator):
    def __init__(
        self,
        field_name: str | None = None,
        estimator: str = "binned",  # "binned" | "knn"
        num_bins: int = 80,
        k: int = 3,
        output_name=None,
    ):
        super().__init__(output_name)
        if estimator not in ("binned", "knn"):
            raise ValueError(f"unknown estimator {estimator!r}")
        self.field_name = field_name
        self.estimator = estimator
        self.num_bins = num_bins
        self.k = k

    def default_output_name(self):
        return f"KL-Divergence ({self.field_name})"

    def compute(self, time, member):
        stack = self.volume_data.get_member_stack(
            self.field_name or self.volume_data.field_names[0], time
        ).astype(jnp.float32)  # bf16-staged storage: reduce in f32
        spatial = stack.shape[:-1]
        n = stack.shape[-1]
        zs, ys, xs = spatial
        # Flatten in Z-slabs: an eager full (Z,Y,X,n) → (V,n) reshape
        # RETILES the whole stack on TPU (input + output live — the
        # 250³×100 OOM class correlate_field's slab path fixed), and
        # a full-series jnp.pad copies it once more.
        slab_planes = max(int((256 << 20) // (4 * n * ys * xs)), 1)
        outs = []
        for z0 in range(0, zs, slab_planes):
            series = stack[z0 : z0 + slab_planes].reshape(-1, n)
            if self.estimator == "binned":
                outs.append(dkl_binned(series, num_bins=self.num_bins))
            else:
                # kNN estimator is O(n²)/voxel — chunk voxels; pad
                # only the slab remainder.
                chunk = max((64 << 20) // (4 * n * n), 1)
                v = series.shape[0]
                nchunks = -(-v // chunk)
                padded = nchunks * chunk
                sp = jnp.pad(series, ((0, padded - v), (0, 0))).reshape(
                    nchunks, chunk, n
                )
                out = jax.lax.map(lambda s: dkl_knn(s, k=self.k), sp)
                outs.append(out.reshape(padded)[:v])
        return jnp.concatenate(outs).reshape(spatial)

    @classmethod
    def settings_to_kwargs(cls, s):
        # Reference state-file keys -> __init__ kwargs.
        out = {"field_name": s.get("scalar_field_name")}
        if "estimator" in s:
            out["estimator"] = s["estimator"]
        if "mi_bins" in s:
            out["num_bins"] = int(s["mi_bins"])
        if "knn_neighbors" in s:
            out["k"] = int(s["knn_neighbors"])
        return out

    def get_settings(self):
        return {
            "scalar_field_name": self.field_name,
            "estimator": self.estimator,
            "mi_bins": self.num_bins,
            "knn_neighbors": self.k,
        }
