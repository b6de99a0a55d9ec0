"""Round-5 probe 4: compile AND runtime of packed-payload sort variants.

Probe 3 showed variadic-sort compile time scales ~10 s per payload
operand on the remote compiler.  Candidates to cut operand count:

  A) baseline: sort key + 13 f32 payloads (the current integrator)
  B) pack f32 pairs as complex64: key + iota + 6 c64 + 1 f32
  C) pack f32 pairs as int64 (bitcast): key + iota + 6 i64 + 1 f32
  D) sort (key, iota) only + packed (14, R) gather-apply

Each variant runs inside scan(3) + checkpoint (mirroring the bounce
loop), compiled fresh (no persistent cache), then timed on device.

Usage: python tpu_compile_probe2.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

R = 1920 * 1080
N_F32 = 13


def measure(name, fn, *args, runs=3):
    t0 = time.time()
    compiled = jax.jit(fn).lower(*args).compile()
    t_compile = time.time() - t0
    out = compiled(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(runs):
        t0 = time.time()
        jax.block_until_ready(compiled(*args))
        ts.append(time.time() - t0)
    dt = sorted(ts)[runs // 2] / 3.0  # per scan iteration
    print(f"{name:44s} compile {t_compile:7.1f}s   run {dt*1e3:7.1f} ms/iter",
          file=sys.stderr)


key0 = jnp.zeros((R,), jnp.float32)
planes = tuple(jnp.full((R,), float(i), jnp.float32) for i in range(N_F32))


def mk(body):
    body = jax.checkpoint(body, prevent_cse=False)

    def fn(k, *ps):
        out, _ = lax.scan(body, (k,) + ps, None, length=3)
        return sum(jnp.sum(p) for p in out)

    return fn


def body_flat(carry, _):
    k = carry[0].astype(jnp.int32)
    out = lax.sort((k,) + carry[1:], num_keys=1)
    return (out[0].astype(jnp.float32) * 0.5,) + tuple(
        p + 1.0 for p in out[1:]
    ), None


def body_c64(carry, _):
    k = carry[0].astype(jnp.int32)
    ps = carry[1:]
    packed = tuple(
        lax.complex(ps[2 * i], ps[2 * i + 1]) for i in range(N_F32 // 2)
    )
    tail = ps[-1:] if N_F32 % 2 else ()
    iota = lax.iota(jnp.int32, R)
    out = lax.sort((k, iota) + packed + tail, num_keys=1)
    sorted_c = out[2 : 2 + len(packed)]
    unpacked = []
    for c in sorted_c:
        unpacked += [jnp.real(c), jnp.imag(c)]
    unpacked += list(out[2 + len(packed) :])
    return (out[0].astype(jnp.float32) * 0.5,) + tuple(
        p + 1.0 for p in unpacked
    ), None


def body_i64(carry, _):
    k = carry[0].astype(jnp.int32)
    ps = carry[1:]
    packed = tuple(
        lax.bitcast_convert_type(
            jnp.stack([ps[2 * i], ps[2 * i + 1]], axis=-1), jnp.int64
        )
        for i in range(N_F32 // 2)
    )
    tail = ps[-1:] if N_F32 % 2 else ()
    iota = lax.iota(jnp.int32, R)
    out = lax.sort((k, iota) + packed + tail, num_keys=1)
    unpacked = []
    for c in out[2 : 2 + len(packed)]:
        both = lax.bitcast_convert_type(c, jnp.float32)
        unpacked += [both[..., 0], both[..., 1]]
    unpacked += list(out[2 + len(packed) :])
    return (out[0].astype(jnp.float32) * 0.5,) + tuple(
        p + 1.0 for p in unpacked
    ), None


def body_take(carry, _):
    k = carry[0].astype(jnp.int32)
    _, order = lax.sort((k, lax.iota(jnp.int32, R)), num_keys=1)
    packed = jnp.stack(carry[1:], axis=0)
    packed = jnp.take(packed, order, axis=1)
    return (carry[0] * 0.5,) + tuple(
        packed[i] + 1.0 for i in range(N_F32)
    ), None


measure("A: sort 13 f32 payloads", mk(body_flat), key0, *planes)
measure("B: sort 6 c64 + 1 f32 (complex pack)", mk(body_c64), key0, *planes)
measure("C: sort 6 i64 + 1 f32 (bitcast pack)", mk(body_i64), key0, *planes)
measure("D: sort(key,iota) + (13,R) take", mk(body_take), key0, *planes)
