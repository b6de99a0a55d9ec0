"""Round-5 probe 3: where does the sorted-pass compile time go?

The multi-operand lax.sort (19 operands) inside the remat'd bounce scan
took the fwd bench compile from 17.6 s to 268 s.  This probe compiles toy
scan graphs that isolate the candidates:

  - variadic sort with N payload operands (N = 2, 7, 15, 19)
  - sort (key, iota) + packed (16, R) gather-apply
  - the same under jax.checkpoint and under value_and_grad

Usage: python tpu_compile_probe.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# NO persistent cache: we want true compile times.
R = 1920 * 1080


def compile_time(name, fn, *args):
    t0 = time.time()
    lowered = jax.jit(fn).lower(*args)
    t_lower = time.time() - t0
    t0 = time.time()
    lowered.compile()
    t_compile = time.time() - t0
    print(f"{name:52s} lower {t_lower:6.1f}s  compile {t_compile:7.1f}s",
          file=sys.stderr)


key0 = jnp.zeros((R,), jnp.int32)
planes16 = tuple(jnp.zeros((R,), jnp.float32) for _ in range(16))


def scan_sort(n_payload, ckpt=False):
    def body(carry, _):
        k = carry[0].astype(jnp.int32)
        out = lax.sort((k,) + carry[1:], num_keys=1)
        new = (out[0].astype(jnp.float32) * 0.5,) + tuple(
            p + 1.0 for p in out[1:]
        )
        return new, None

    if ckpt:
        body = jax.checkpoint(body, prevent_cse=False)

    def fn(*planes):
        init = (planes[0],) + planes[1 : n_payload + 1]
        out, _ = lax.scan(body, init, None, length=3)
        return sum(jnp.sum(p) for p in out)

    return fn


def scan_take(ckpt=False):
    def body(carry, _):
        k = carry[0].astype(jnp.int32)
        _, order = lax.sort(
            (k, lax.iota(jnp.int32, R)), num_keys=1
        )
        packed = jnp.stack(carry, axis=0)
        packed = jnp.take(packed, order, axis=1)
        new = tuple(packed[i] + 1.0 for i in range(len(carry)))
        return new, None

    if ckpt:
        body = jax.checkpoint(body, prevent_cse=False)

    def fn(*planes):
        out, _ = lax.scan(body, planes, None, length=3)
        return sum(jnp.sum(p) for p in out)

    return fn


for n in (2, 7, 15, 19):
    compile_time(
        f"scan(3) of sort with {n} payloads",
        scan_sort(n), *planes16[: n + 1]
    )
compile_time("scan(3) of sort+iota + packed take (16 planes)",
             scan_take(), *planes16)
compile_time("scan(3) sort 19 payloads + checkpoint",
             scan_sort(19, ckpt=True), *planes16[:17] + planes16[:3])
compile_time("scan(3) sort+take + checkpoint",
             scan_take(ckpt=True), *planes16)
compile_time(
    "grad of scan(3) sort 15 payloads + checkpoint",
    jax.grad(scan_sort(15, ckpt=True)), *planes16
)
compile_time(
    "grad of scan(3) sort+take + checkpoint",
    jax.grad(scan_take(ckpt=True)), *planes16
)
