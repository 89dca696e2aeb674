"""Device (JAX/XLA/Pallas) kernels for the codec hot path.

64-bit integer lanes are required for exact varint/delta semantics on the
FLOAT64/INT64 paths; TPU emulates i64 on the VPU, and JAX needs the x64 flag to
stop silently truncating. The flag is process-global: set it here, before any
tracing. The XYZ/XYZI hot path is pure int32 and unaffected.
"""

import jax

jax.config.update("jax_enable_x64", True)
