"""qb3_tpu — a TPU-native QB3 raster codec engine (JAX / Pallas / pjit).

Bit-exact QB3 v2 streams (see /root/reference doc/QB3.md), produced and
consumed by data-parallel kernels instead of the reference's serial loop.
"""

import os as _os

import jax as _jax

# The codec operates on 8..64-bit integers; 64-bit lane support is required.
_jax.config.update("jax_enable_x64", True)

# Kernel graphs are large and this environment's TPU compiles remotely;
# persist compiled executables across processes.
_cache_dir = _os.environ.get(
    "QB3_TPU_CACHE", _os.path.join(_os.path.dirname(__file__), "..", ".jax_cache"))
try:
    _jax.config.update("jax_compilation_cache_dir", _os.path.abspath(_cache_dir))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # older jax without the knobs
    pass

from .constants import B, B2, HILBERT, ZCURVE, DType, Error, Mode  # noqa: E402,F401
from .errors import (QB3DataError, QB3Error, QB3HeaderError,  # noqa: E402,F401
                     QB3ShapeError)
from .api import Decoder, Encoder, decode, encode, max_encoded_size  # noqa: E402,F401
from .strip import StripDecoder, StripEncoder  # noqa: E402,F401

__version__ = "0.2.0"
