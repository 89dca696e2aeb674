#!/usr/bin/env python3
"""r3 bisect: WHICH scan shapes dispatch per-step on the axon runtime?

r2 measured the Gorilla encode scan at ~4.5 ms/step wall (per-step
dispatch), yet an honest carry-only lax.scan probe runs device-resident
(scripts/pallas_loop_probe.py: 0.2 us/step at n=4096). This probe sweeps
the feature cross product at n=4096 steps, all honestly chained (inputs
folded from previous outputs so the axon memoizer can't hit):

  c_only      carry (C,) i32, no xs, no ys
  c_big       carry (8, 4096) f32, no xs, no ys
  xs          carry (C,) i32, xs (n, C), no ys
  ys          carry (C,) i32, no xs, ys (C,) per step
  xs_ys       carry (C,) i32, xs (n, C), ys (C,)        <- _scan_unrolled shape
  unroll8     the exact ops/fsm._scan_unrolled(u=8) over (n*8, C) xs
  pallas_win  the window-resets chain as ONE pallas kernel (in-kernel fori)

Run on the real chip: python scripts/scan_residency_probe.py [n]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 8
N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096


def step_fn(carry, xi):
    ld, tr = xi >> 8, xi & 0xFF
    reset = (ld < (carry >> 8)) | (tr < (carry & 0xFF))
    new = (jnp.minimum(ld, 31) << 8) | tr
    return jnp.where(reset, new, carry)


def c_only(x):
    def body(c, _):
        return step_fn(c, c ^ 12345), None

    c, _ = lax.scan(body, x[0], None, length=N)
    return c


def c_big(xbig):
    def body(c, _):
        return c * np.float32(1.000003) + np.float32(1.0), None

    c, _ = lax.scan(body, xbig, None, length=N)
    return c


def with_xs(x):
    def body(c, xi):
        return step_fn(c, xi), None

    c, _ = lax.scan(body, x[0], x[1])
    return c


def with_ys(x):
    def body(c, _):
        c2 = step_fn(c, c ^ 12345)
        return c2, c

    _, ys = lax.scan(body, x[0], None, length=N)
    return ys


def xs_ys(x):
    def body(c, xi):
        return step_fn(c, xi), c

    _, ys = lax.scan(body, x[0], x[1])
    return ys


def unroll8(x):
    sys.path.insert(0, ".")
    from cloudini_tpu.ops.fsm import _scan_unrolled

    init, xs8 = x[0], x[2]
    _f, before = _scan_unrolled(step_fn, init, (xs8,), 8)
    return before


def pallas_win(x):
    init, xs8 = x[0], x[2]  # xs8: (N*8, C)
    n_total = xs8.shape[0]

    def kernel(init_ref, xs_ref, out_ref):
        def body(i, c):
            xi = xs_ref[i, :]
            out_ref[i, :] = c
            return step_fn(c, xi)

        lax.fori_loop(0, n_total, body, init_ref[:])

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_total, C), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(init, xs_ref_arr(xs8))


def xs_ref_arr(x):
    return x


def main():
    print(f"device: {jax.devices()[0]}, n={N}")
    rng = np.random.default_rng(0)
    init0 = jnp.asarray(rng.integers(0, 1 << 14, (C,), dtype=np.int32))
    xs0 = jnp.asarray(rng.integers(0, 1 << 14, (N, C), dtype=np.int32))
    xs8_0 = jnp.asarray(rng.integers(0, 1 << 14, (N * 8, C), dtype=np.int32))
    xbig0 = jnp.asarray(rng.normal(size=(8, 4096)).astype(np.float32))

    cases = [
        ("c_only", c_only, "small"),
        ("c_big", c_big, "big"),
        ("xs", with_xs, "small"),
        ("ys", with_ys, "small"),
        ("xs_ys", xs_ys, "small"),
        ("unroll8", unroll8, "small"),
        ("pallas_win", pallas_win, "small"),
    ]
    for name, fn, kind in cases:
        f = jax.jit(fn)
        arg = xbig0 if kind == "big" else (init0, xs0, xs8_0)
        try:
            y = jax.block_until_ready(f(arg))
        except Exception as e:  # noqa: BLE001
            print(f"{name:11s}: FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)
            continue
        iters = 6
        salt = jnp.asarray(np.int32(1))
        a = arg
        per = []
        for k in range(iters):
            # fold output entropy into next inputs: contents never repeat
            h = (jnp.ravel(y)[:1].astype(jnp.int32) & 0x7FFF) + salt * (k + 1)
            if kind == "big":
                a = a * np.float32(0.5) + h[0].astype(jnp.float32) * np.float32(1e-3)
            else:
                a = (a[0] ^ h[0], a[1] ^ h[0], a[2] ^ h[0])
            t0 = time.perf_counter()
            y = jax.block_until_ready(f(a))
            per.append((time.perf_counter() - t0) * 1e3)
        steps = N * 8 if name in ("unroll8", "pallas_win") else N
        print(
            f"{name:11s}: " + " ".join(f"{p:9.2f}" for p in per) + " ms"
            f"  (last/steps {per[-1]/steps*1e3:8.2f} us)",
            flush=True,
        )


if __name__ == "__main__":
    main()
