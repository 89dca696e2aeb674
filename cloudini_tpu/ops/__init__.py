"""Device (JAX/XLA/Pallas) kernels for the codec hot path.

Everything here is pure 32-bit vector arithmetic: 64-bit wire lanes (INT64
fields, scalar-float quantized values) use explicit (lo, hi) uint32 pairs
(ops/u64.py) instead of JAX's global x64 mode — TPU has no 64-bit integer
datapath, and enabling x64 widens every index computation in the program
(measured: ~3 orders of magnitude slowdown on the XYZI hot path).
"""
