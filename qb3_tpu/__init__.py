"""qb3_tpu — a TPU-native QB3 raster codec engine (JAX / Pallas / pjit).

Bit-exact QB3 v2 streams (see /root/reference doc/QB3.md), produced and
consumed by data-parallel kernels instead of the reference's serial loop.
"""

import jax as _jax

# The codec operates on 8..64-bit integers; 64-bit lane support is required.
_jax.config.update("jax_enable_x64", True)

from .constants import B, B2, HILBERT, ZCURVE, DType, Error, Mode  # noqa: E402,F401
from .api import Decoder, Encoder, decode, encode, max_encoded_size  # noqa: E402,F401

__version__ = "0.1.0"
