"""Neural correlation calculator — the unified replacement for the
reference's PyTorch / tiny-cuda-nn / QuickMLP / VMLP backends.

Reference roles covered (SURVEY.md §2.4): DeepLearningCorrelationCalculator
GUI/model logic, GPU batch assembly (CombineCorrelationMembers.glsl —
not needed: the query grid is generated in-graph), NaN stencil (valid
voxels masked), Vulkan↔CUDA interop (moot: one address space).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from correrender_tpu.calculators.base import Calculator, register_calculator_type
from correrender_tpu.models.mine import CorrelationSRN, train_srn


@register_calculator_type("correlation_vmlp")
class NeuralCorrelationCalculator(Calculator):
    """SRN-backed correlation field: train once on a computed field (or
    load pretrained params), then answer reference-point moves with a
    single MLP forward pass over the voxel grid."""

    def __init__(
        self,
        field_name: str | None = None,
        measure: str = "pearson",
        reference_point=(0, 0, 0),
        model: CorrelationSRN | None = None,
        params=None,
        train_steps: int = 300,
        weights_path: str | None = None,
        output_name=None,
    ):
        super().__init__(output_name)
        self.field_name = field_name
        self.measure = measure
        self.reference_point = tuple(int(c) for c in reference_point)
        self.model = model or CorrelationSRN.create()
        self.params = params
        self.train_steps = train_steps
        self.weights_path = weights_path
        self._stencil = None  # lazy NaN stencil (valid-voxel mask)
        self._field_program = None  # jitted whole-field apply
        #: (field_name, time) the current params were auto-fit on —
        #: a field/time switch must retrain, not silently answer for
        #: the old data. None for preset/imported weights (explicit
        #: user choice; kept across switches like the reference's
        #: fixed published networks).
        self._fit_key = None
        if weights_path is not None:
            self.load_weights(weights_path)

    def default_output_name(self):
        return f"Neural Correlation ({self.field_name})"

    # -- settings round-trip (SettingsMap analogue; state files
    # -- persist the model source so reload reconstructs the same
    # -- calculator — the reference stores the TorchScript path the
    # -- same way, DeepLearningCorrelationCalculator settings) --------

    @classmethod
    def settings_to_kwargs(cls, s: dict) -> dict:
        kwargs = {}
        if "scalar_field_name" in s:
            kwargs["field_name"] = s["scalar_field_name"]
        if "correlation_measure_type" in s:
            kwargs["measure"] = s["correlation_measure_type"]
        if "reference_point_x" in s:
            kwargs["reference_point"] = (
                int(s.get("reference_point_x", 0)),
                int(s.get("reference_point_y", 0)),
                int(s.get("reference_point_z", 0)),
            )
        if "model_preset_path" in s and s["model_preset_path"]:
            kwargs["weights_path"] = s["model_preset_path"]
        if "train_steps" in s:
            kwargs["train_steps"] = int(s["train_steps"])
        return kwargs

    def get_settings(self) -> dict:
        return {
            "scalar_field_name": self.field_name,
            "correlation_measure_type": self.measure,
            "reference_point_x": self.reference_point[0],
            "reference_point_y": self.reference_point[1],
            "reference_point_z": self.reference_point[2],
            "model_preset_path": self.weights_path or "",
            "train_steps": self.train_steps,
        }

    # -- pretrained weights (reference loads TorchScript modules,
    # -- PyTorchCorrelationCalculator.cpp:261; here: .npz presets
    # -- carrying the model hyperparameters alongside the pytree) ------

    def save_weights(self, path: str) -> None:
        """Persist trained params + model config as one .npz preset."""
        if self.params is None:
            raise ValueError("no trained parameters to save")
        from correrender_tpu.models.checkpoint import save_params

        save_params(path, {
            "config": self.model.config_array(),
            "params": self.params,
        })

    def load_weights(self, path: str) -> None:
        """Load an .npz preset (rebuilds the model from its embedded
        config) or a published PyTorch/TorchScript archive
        (``.pt``/``.pth`` — mapped torch-free via
        models/torch_import.py; reference
        PyTorchCorrelationCalculator.cpp:261)."""
        self._field_program = None  # model is changing
        self._fit_key = None  # preset weights: explicit user choice
        if path.endswith((".pt", ".pth", ".ts")):
            from correrender_tpu.models.torch_import import (
                srn_from_torch_archive,
            )

            self.model, self.params = srn_from_torch_archive(path)
            return

        with np.load(path) as data:
            cfg = data["config"]
        self.model = CorrelationSRN.from_config_array(cfg)
        from correrender_tpu.models.checkpoint import load_params

        template = {
            "config": cfg,
            "params": self.model.init(jax.random.key(0)),
        }
        self.params = load_params(path, template)["params"]

    # -- NaN stencil (DeepLearningCorrelationCalculator.hpp:101-104):
    # -- voxels whose member series contains NaN are excluded from
    # -- training and rendered as NaN at inference ---------------------

    def _nan_stencil(self, stack, time: int):
        """(Z, Y, X) bool — True where the full series is finite.
        Cached per (field, timestep): time-varying NaN patterns (GRIB
        bitmaps) and field switches (the viewer writes field_name
        directly) must not leak a stale mask."""
        key = (self.field_name, time)
        if self._stencil is None or self._stencil[0] != key:
            self._stencil = (
                key, jnp.all(jnp.isfinite(stack), axis=-1)
            )
        return self._stencil[1]

    def _grid_positions(self):
        g = self.volume_data.grid
        z, y, x = jnp.meshgrid(
            (jnp.arange(g.zs) + 0.5) / g.zs,
            (jnp.arange(g.ys) + 0.5) / g.ys,
            (jnp.arange(g.xs) + 0.5) / g.xs,
            indexing="ij",
        )
        return jnp.stack([x, y, z], axis=-1)  # (Z, Y, X, 3) xyz order

    def fit(self, time: int = 0, num_reference_points: int = 32, seed=0):
        """Supervised fit against the classical estimator on sampled
        reference points (the SSDBM-2024 style training loop)."""
        from correrender_tpu.calculators.correlation import correlate_field

        vd = self.volume_data
        g = vd.grid
        stack = vd.get_member_stack(
            self.field_name or vd.field_names[0], time
        )
        rng = np.random.default_rng(seed)
        pos = self._grid_positions().reshape(-1, 3)
        stencil = np.asarray(self._nan_stencil(stack, time)).reshape(-1)
        valid_flat = np.nonzero(stencil)[0]
        if valid_flat.size == 0:
            raise ValueError(
                "every voxel series contains NaN members — nothing to "
                "train the neural correlation surrogate on"
            )
        pos_ref_list, pos_query_list, target_list = [], [], []
        for _ in range(num_reference_points):
            # Reference points are drawn from the valid-voxel stencil
            # only (NaN series would poison the target field).
            flat_idx = int(valid_flat[rng.integers(0, valid_flat.size)])
            rz, rem = divmod(flat_idx, g.ys * g.xs)
            ry, rx = divmod(rem, g.xs)
            field = correlate_field(
                stack, stack[rz, ry, rx], self.measure
            ).reshape(-1)
            ref_pos = jnp.asarray(
                [(rx + 0.5) / g.xs, (ry + 0.5) / g.ys, (rz + 0.5) / g.zs]
            )
            ok = jnp.isfinite(field) & jnp.asarray(stencil)
            pos_ref_list.append(
                jnp.broadcast_to(ref_pos, pos.shape)[ok]
            )
            pos_query_list.append(pos[ok])
            target_list.append(field[ok])
        self.params, loss = train_srn(
            self.model,
            jnp.concatenate(pos_ref_list),
            jnp.concatenate(pos_query_list),
            jnp.concatenate(target_list),
            steps=self.train_steps,
        )
        self._fit_key = (self.field_name, time)
        return loss

    def compute(self, time: int, member: int):
        # Retrain when the auto-fit params no longer describe the
        # selected data (field switch via the viewer, time scrub) —
        # params loaded from presets/torch archives (_fit_key None
        # after load) are the user's explicit choice and are kept.
        if self.params is None or (
            self._fit_key is not None
            and self._fit_key != (self.field_name, time)
        ):
            self.fit(time)
        vd = self.volume_data
        g = vd.grid
        x, y, z = self.reference_point
        ref_pos = jnp.asarray(
            [(x + 0.5) / g.xs, (y + 0.5) / g.ys, (z + 0.5) / g.zs]
        )
        pos = self._grid_positions()
        # One jitted program per model instance: the eager apply costs
        # one dispatch per op — the hash-grid encoder alone is ~30 ops
        # per level — which made a reference-point move seconds instead
        # of milliseconds on the tunneled chip.
        if self._field_program is None:
            model = self.model
            self._field_program = jax.jit(
                lambda p, r, q: model.apply(
                    p, jnp.broadcast_to(r, q.shape), q
                )
            )
        out = self._field_program(self.params, ref_pos, pos)
        # NaN-stencil the output like the reference masks invalid
        # voxels (DeepLearningCorrelationCalculator.hpp:101-104).
        stack = vd.get_member_stack(
            self.field_name or vd.field_names[0], time
        )
        stencil = self._nan_stencil(stack, time)
        return jnp.where(stencil, out, jnp.nan)

    def set_reference_point(self, x, y, z):
        self.reference_point = (x, y, z)
        if self.volume_data is not None:
            self.volume_data.mark_dirty(self.output_name)
