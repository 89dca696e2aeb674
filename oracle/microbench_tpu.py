"""Op-level TPU microbenchmarks for the codec hot path (dev tool, not a test).

Times each phase of encode/decode separately to locate where XLA's lowering
burns time, and A/Bs alternative pack/unpack formulations (scatter vs sort vs
gather) on the actual chip.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

C, N = 16, 32 * 1024
L = 4  # lanes (XYZI)


def timeit(fn, *args, iters=10, name=""):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt*1e3:9.3f} ms")
    return out


def main():
    rng = np.random.default_rng(0)
    pts = np.cumsum(rng.normal(0, 0.05, (C, N, L)), axis=1).astype(np.float32)
    rows = np.ascontiguousarray(pts).view(np.uint8).reshape(C, N, 16)
    d_rows = jax.device_put(rows)

    # ---- phase 1: extract + quantize + delta + zigzag + lengths
    @jax.jit
    def phase1(rows):
        outs = []
        for lane in range(L):
            b = rows[..., lane * 4 : lane * 4 + 4]
            u = (b[..., 0].astype(jnp.uint32) | (b[..., 1].astype(jnp.uint32) << 8)
                 | (b[..., 2].astype(jnp.uint32) << 16) | (b[..., 3].astype(jnp.uint32) << 24))
            x = jax.lax.bitcast_convert_type(u, jnp.float32)
            r = jnp.rint(x * 1000.0)
            ok = jnp.isfinite(r) & (r >= np.float32(-2**31)) & (r < np.float32(2**31))
            q = jnp.where(ok, jnp.where(ok, r, 0).astype(jnp.int32), np.int32(-2**31))
            prev = jnp.roll(q, 1, axis=-1).at[..., 0].set(0)
            nan = jnp.isnan(x)
            prev = jnp.where(jnp.roll(nan, 1, axis=-1).at[..., 0].set(False), 0, prev)
            d = q - prev
            u32 = (d.astype(jnp.uint32) << 1) ^ (d >> 31).astype(jnp.uint32)
            bi = u32 + 1
            ln = jnp.ones(d.shape, jnp.int32)
            for k in range(1, 5):
                ln += (bi >= jnp.uint32(1 << (7 * k))).astype(jnp.int32)
            outs.append((bi, ln))
        return outs

    streams = timeit(phase1, d_rows, name="phase1 quantize+delta+lengths")

    # ---- phase 2: byte matrices
    @jax.jit
    def phase2(rows):
        outs = phase1(rows)
        mats = []
        for bi, ln in outs:
            ks = np.arange(5, dtype=np.uint32)
            groups = (bi[..., None] >> (7 * ks)) & jnp.uint32(0x7F)
            cont = ks.astype(np.int32) < (ln[..., None] - 1)
            mats.append(((groups | jnp.where(cont, 0x80, 0)).astype(jnp.uint8), ln))
        return mats

    timeit(phase2, d_rows, name="phase2 +byte matrices")

    # ---- phase 3a: full with scatter pack
    MAXB = N * 5 * L

    @jax.jit
    def pack_scatter(rows):
        mats = phase2(rows)
        lengths = jnp.stack([ln for _, ln in mats], axis=-1)
        psize = lengths.sum(axis=-1)
        poff = jnp.cumsum(psize, axis=-1) - psize
        intra = jnp.cumsum(lengths, axis=-1) - lengths
        out = jnp.zeros((C, MAXB), jnp.uint8)
        for s, (mat, ln) in enumerate(mats):
            ks = np.arange(5)
            pos = poff[..., None] + intra[..., s : s + 1] + ks
            pos = jnp.where(ks < ln[..., None], pos, MAXB)
            out = out.at[jnp.arange(C)[:, None], pos.reshape(C, -1)].set(
                mat.reshape(C, -1), mode="drop")
        return out, psize.sum(-1)

    timeit(pack_scatter, d_rows, name="phase3a full encode scatter pack")

    # ---- phase 3b: sort-based pack (single fused key sort)
    @jax.jit
    def pack_sort(rows):
        mats = phase2(rows)
        lengths = jnp.stack([ln for _, ln in mats], axis=-1)
        psize = lengths.sum(axis=-1)
        poff = jnp.cumsum(psize, axis=-1) - psize
        intra = jnp.cumsum(lengths, axis=-1) - lengths
        keys, vals = [], []
        for s, (mat, ln) in enumerate(mats):
            ks = np.arange(5)
            pos = poff[..., None] + intra[..., s : s + 1] + ks
            pos = jnp.where(ks < ln[..., None], pos, jnp.int32(2**30))
            keys.append(pos.reshape(C, -1))
            vals.append(mat.reshape(C, -1))
        key = jnp.concatenate(keys, axis=-1)
        val = jnp.concatenate(vals, axis=-1)
        skey, sval = jax.lax.sort_key_val(key, val, dimension=-1)
        return sval[:, :MAXB], psize.sum(-1)

    timeit(pack_sort, d_rows, name="phase3b full encode sort pack")

    # ---- decode phases
    payloads, sizes = jax.block_until_ready(jax.jit(pack_scatter)(d_rows))
    B = payloads.shape[1]
    K = N * L

    @jax.jit
    def dec_csum(payloads, sizes):
        in_range = jnp.arange(B)[None, :] < sizes[:, None]
        term = ((payloads & 0x80) == 0) & in_range
        return jnp.cumsum(term.astype(jnp.int32), axis=-1)

    csum = timeit(dec_csum, payloads, sizes, name="dec phase1 terminator cumsum")

    @jax.jit
    def dec_searchsorted(csum):
        targets = jnp.arange(1, K + 1, dtype=jnp.int32)
        return jax.vmap(lambda c: jnp.searchsorted(c, targets, side="left"))(csum)

    ends = timeit(dec_searchsorted, csum, name="dec phase2 searchsorted ends")

    # alternative: ends via scatter ("counting" trick): for each byte position
    # that is a terminator, write its index at slot csum-1
    @jax.jit
    def dec_ends_scatter(payloads, sizes):
        in_range = jnp.arange(B)[None, :] < sizes[:, None]
        term = ((payloads & 0x80) == 0) & in_range
        csum = jnp.cumsum(term.astype(jnp.int32), axis=-1)
        slot = jnp.where(term, csum - 1, K)
        idx = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32), (C, B))
        ends = jnp.zeros((C, K), jnp.int32)
        ends = ends.at[jnp.arange(C)[:, None], slot].set(idx, mode="drop")
        return ends

    timeit(dec_ends_scatter, payloads, sizes, name="dec phase2b ends via scatter")

    # gather values (10-byte worst in u32 x 5)
    @jax.jit
    def dec_gather(payloads, ends):
        starts = jnp.roll(ends, 1, axis=-1).at[:, 0].set(-1) + 1
        tok_len = ends - starts + 1
        u = jnp.zeros((C, K), jnp.uint32)
        ridx = jnp.arange(C)[:, None]
        for k in range(5):
            idx = jnp.clip(starts + k, 0, B - 1)
            byte = payloads[ridx, idx].astype(jnp.uint32)
            u = u | jnp.where(k < tok_len, (byte & jnp.uint32(0x7F)) << jnp.uint32(7 * k), 0)
        return u

    timeit(dec_gather, payloads, ends, name="dec phase3 byte gathers+assemble")

    # undelta + store
    @jax.jit
    def dec_store(u):
        nan = u == 0
        uu = u - jnp.where(nan, 0, 1).astype(jnp.uint32)
        sv = ((uu >> 1) ^ (-(uu & 1).astype(jnp.int32)).astype(jnp.uint32)).astype(jnp.int32)
        sv = jnp.where(nan, 0, sv).reshape(C, N, L)
        out = jnp.zeros((C, N, 16), jnp.uint8)
        for lane in range(L):
            q = jnp.cumsum(sv[..., lane], axis=-1)
            f = q.astype(jnp.float32) * np.float32(0.001)
            bits = jax.lax.bitcast_convert_type(f, jnp.uint32)
            for k in range(4):
                out = out.at[..., lane * 4 + k].set(((bits >> (8 * k)) & 0xFF).astype(jnp.uint8))
        return out

    u = jax.block_until_ready(jax.jit(dec_gather)(payloads, ends))
    timeit(dec_store, u, name="dec phase4 undelta+store")


if __name__ == "__main__":
    main()
