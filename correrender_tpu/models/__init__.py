"""Neural networks (reference: src/Calculators/VMLP/ and the
PyTorch / tiny-cuda-nn / QuickMLP calculator backends, collapsed into
one JAX implementation — SURVEY.md §2.10 item 7).

* encodings: Identity / Frequency / multiresolution HashGrid
  (instant-NGP-style, PRIME hashing + DENSE mode, nearest/linear) /
  Dictionary (reference src/Calculators/VMLP/Encoding.hpp:46-232);
* MLP with activations {none, relu, snake, snake_alt}
  (Network.hpp:49-53) — matmuls land on the MXU, replacing the
  cooperative-matrix fused path (NetworkFused.glsl);
* symmetrizers {add, add_diff, mul} (src/Calculators/SymmetrizerType.hpp);
* network types MINE / SRN_MINE / SRN (CorrelationDefines.hpp:81-99)
  with trainers.
"""

from correrender_tpu.models.encodings import (
    IdentityEncoding,
    FrequencyEncoding,
    HashGridEncoding,
    DictionaryEncoding,
    CompositeEncoding,
)
from correrender_tpu.models.vmlp import MLP, ACTIVATIONS
from correrender_tpu.models.symmetrizer import symmetrize, SYMMETRIZERS
from correrender_tpu.models.mine import (
    CorrelationSRN,
    train_srn,
    MineEstimator,
    train_mine,
)

__all__ = [
    "IdentityEncoding",
    "FrequencyEncoding",
    "HashGridEncoding",
    "DictionaryEncoding",
    "CompositeEncoding",
    "MLP",
    "ACTIVATIONS",
    "symmetrize",
    "SYMMETRIZERS",
    "CorrelationSRN",
    "train_srn",
    "MineEstimator",
    "train_mine",
]
