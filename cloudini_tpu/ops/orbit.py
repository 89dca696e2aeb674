"""Scatter-free orbit marking for strictly-forward successor functions.

Shared by the Gorilla window-reset chain (ops/gorilla.py) and the LZ4 greedy
parse (ops/lz4.py): both need the set of positions visited when repeatedly
applying a jump function J (J[i] > i) from a start position — the parallel
form of a sequential cursor walk.

Binary lifting: jump tables F_k = J^(2**k) are built with gathers only, then
every position i runs the greedy don't-overshoot descent from ``start``;
monotonicity makes the descent land on the largest orbit element <= i, so
membership is pos == i. Two TPU hazards shape the implementation (measured,
see .claude/skills/verify/SKILL.md): a scatter-based set-image doubling
serializes when many positions jump to the same target, and chained
gather rounds must be fenced with optimization_barrier or XLA's cross-round
fusion is pathological.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mark_orbit(next_pos: jnp.ndarray, start: jnp.ndarray, n: int) -> jnp.ndarray:
    """next_pos: (C, N) strictly-forward successors in [1, N] (N = fixpoint);
    start: (C,) int32 first orbit position (N when the orbit is empty).
    Returns bool (C, N): membership of each position in the orbit of start.
    Table count is derived from N — an orbit can take up to N steps, so
    sum(2^k, k < levels) = 2^levels - 1 >= N jumps must be reachable."""
    c = next_pos.shape[0]
    levels = max(1, int(n).bit_length())
    batch = jnp.arange(c, dtype=jnp.int32)[:, None]
    f = jnp.concatenate([next_pos, jnp.full((c, 1), n, jnp.int32)], axis=-1)
    tables = [f]
    for _ in range(levels - 1):
        f = f[batch, f]
        f = jax.lax.optimization_barrier(f)
        tables.append(f)
    idx = jnp.arange(n, dtype=jnp.int32)
    pos = jnp.broadcast_to(start[:, None], (c, n)).astype(jnp.int32)
    for k in range(levels - 1, -1, -1):
        cand = tables[k][batch, jnp.minimum(pos, n)]
        pos = jnp.where(cand <= idx, cand, pos)
        pos = jax.lax.optimization_barrier(pos)
    return pos == idx
