#!/usr/bin/env python
"""Probe: does an int4 weight stream beat int8 at decode shapes on this chip?

The decode step at the bench shapes (large-v3, B=8, K=5 -> 40 rows) is
HBM-stream-bound (~2.5 GB/step at ~380 GB/s measured — see
profile_bandwidth.py / the parked-megakernel note).  Weights are ~0.73 GB
of that; cross-K/V 0.98 GB.  If XLA stores jnp.int4 packed (2/byte) and
fuses the upcast into the dot's operand read, an int4 weight path would
cut ~0.45 ms/step and an int4 cross-KV path ~1.2 ms/step.

Measures, per variant, the time for a chain of N sequential dense layers
(y = dot(q(x), W_c) feeding the next) at rows=40:
  - s8 weights, s8 activations (the production int8_dense math)
  - int4 weights upcast to s8 in-program, s8 activations
  - int4 weights via direct dot_general (if the backend allows)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from faster_whisper_tpu.utils import ensure_tpu_accelerator_type

ensure_tpu_accelerator_type()

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def bench(fn, *args, reps=20):
    fn(*args)  # compile
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    print(f"# devices: {jax.devices()}", file=sys.stderr)
    rows, d, layers = 40, 1280, 64  # 64 chained (1280x1280) dots ~ 105 MB s8
    rng = np.random.default_rng(0)
    w8 = jnp.asarray(rng.integers(-127, 128, (layers, d, d), dtype=np.int8))
    w4_vals = jnp.asarray(
        rng.integers(-8, 8, (layers, d, d), dtype=np.int8)
    )
    scale = jnp.asarray(rng.random((layers, d), np.float32) * 0.01)
    x0 = jnp.asarray(rng.random((rows, d), np.float32), jnp.bfloat16)

    def qact(x):
        m = jnp.max(jnp.abs(x).astype(jnp.float32), axis=-1, keepdims=True)
        s = m / 127.0
        xq = jnp.round(x.astype(jnp.float32) / s).astype(jnp.int8)
        return xq, s

    # S4 arrays cannot cross the dispatch boundary on the axon runtime
    # (RecursionError in jit canonicalization) — so the int4 variants
    # convert ONCE inside the program behind an optimization_barrier: the
    # packed S4 tensor is a materialized HBM temp and the scan reads it.
    def chain(prep, upcast):
        def f(x, w_all, scale):
            w_all = jax.lax.optimization_barrier(prep(w_all))

            def body(x, ws):
                w, sc = ws
                xq, s = qact(x)
                acc = jax.lax.dot_general(
                    xq, upcast(w),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                y = acc.astype(jnp.float32) * s * sc[None, :]
                return y.astype(jnp.bfloat16), None

            x, _ = jax.lax.scan(body, x, (w_all, scale))
            return x

        return jax.jit(f)

    ident = lambda w: w  # noqa: E731
    t8 = bench(chain(ident, ident), x0, w8, scale)
    bytes8 = layers * d * d
    print(f"s8    : {t8*1e3:7.3f} ms  ({bytes8/t8/1e9:.0f} GB/s weight stream)")

    for name, prep, upcast in [
        ("s4->s8", lambda w: w.astype(jnp.int4), lambda w: w.astype(jnp.int8)),
        ("s4 dot", lambda w: w.astype(jnp.int4), ident),
    ]:
        try:
            t4 = bench(chain(prep, upcast), x0, w4_vals, scale)
            print(
                f"{name}: {t4*1e3:7.3f} ms  ({bytes8/2/t4/1e9:.0f} GB/s if "
                f"packed)  speedup vs s8: {t8/t4:.2f}x"
            )
        except Exception as e:
            print(f"{name} failed: {type(e).__name__}: {e}"[:300])


if __name__ == "__main__":
    main()
