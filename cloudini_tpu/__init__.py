"""cloudini_tpu — a TPU-native point-cloud compression framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
facontidavide/cloudini: two-stage lossless/lossy compression of
PointCloud2-style point clouds (per-field predictive coding + LZ4/ZSTD),
engineered for TPU hardware — columnar chunk-parallel kernels, SPMD scaling
over device meshes, and a host runtime for streams/bags.
"""

import os as _os


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache: per-schema codec programs compile in
    12-60 s (remote compile) — and the big fused stage-1+stage-2 programs in
    minutes on a 1-core host — so streaming tools and the bench harness would
    pay that per process. Measured: a 15.7 s compile replays from cache in
    0.6 s. The default cache lives IN THE REPO (committed), so a fresh
    checkout's first bench run replays every program warm. Opt out with
    CLOUDINI_TPU_NO_COMPILE_CACHE=1; an explicit jax cache dir wins."""
    if _os.environ.get("CLOUDINI_TPU_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir:
            return
        cache = _os.environ.get(
            "CLOUDINI_TPU_COMPILE_CACHE",
            _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
                          ".jax_cache"),
        )
        _os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # cache is an optimization; never block import


_enable_compile_cache()

from .core.header import decode_header, encode_header, encoding_info_from_yaml, encoding_info_to_yaml
from .core.plan import build_plan
from .core.types import (
    CompressionOption,
    EncodingInfo,
    EncodingOptions,
    FieldType,
    PointField,
    POINTS_PER_CHUNK,
)
from .codec.pipeline import (
    PointcloudDecoder,
    PointcloudEncoder,
    max_compressed_size,
    max_serialized_point_size,
)

__version__ = "0.1.0"

__all__ = [
    "CompressionOption",
    "EncodingInfo",
    "EncodingOptions",
    "FieldType",
    "PointField",
    "PointcloudDecoder",
    "PointcloudEncoder",
    "POINTS_PER_CHUNK",
    "build_plan",
    "decode_header",
    "encode_header",
    "encoding_info_from_yaml",
    "encoding_info_to_yaml",
    "max_compressed_size",
    "max_serialized_point_size",
]
