"""Round-5 probe 2: device-time pricing of permutation primitives.

The tunneled-TPU dispatch overhead (~1-3 s) makes host-side timing of
fast ops useless (tpu_sort_probe.py section 1 printed negative times).
This probe times each primitive inside a ``lax.fori_loop`` with a data
dependence, so one dispatch measures k device iterations.

Prices the candidate bounce-reorder bursts:
  A) argsort + gather-apply packed (P, R) take        (round-4 plan)
  B) counting-sort ranks (cumsum) + scatter-apply     (no argsort at all)
and the primitives they decompose into.

Usage: python tpu_perm_probe2.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/heatray_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

R = 1920 * 1080
L = 1024
Rr = R // L

key = jax.random.key(0)
perm_idx = jax.random.permutation(key, R).astype(jnp.int32)
ki = jax.random.randint(key, (R,), 0, 1 << 21, dtype=jnp.int32)
flat = jax.random.normal(key, (R,), jnp.float32)
oct3 = jax.random.randint(key, (R,), 0, 8, dtype=jnp.int32)
act = jax.random.uniform(key, (R,)) < 0.6
jax.block_until_ready((perm_idx, ki, flat, oct3, act))


def device_time(name, make_body, x0, k=16):
    """Median of 3 timings of k fori_loop iterations on device."""
    f = jax.jit(lambda x: lax.fori_loop(0, k, make_body, x))
    out = f(x0)
    jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(f(x0))
        ts.append((time.time() - t0) / k)
    dt = sorted(ts)[1]
    print(f"{name:48s} {dt*1e3:9.2f} ms", file=sys.stderr)
    return dt


print("== gathers (per-apply) ==", file=sys.stderr)
device_time("take flat (R,)", lambda i, x: jnp.take(x, perm_idx) + 0.0, flat)
for p in (8, 13, 16):
    x0 = jnp.tile(flat, (p, 1))
    device_time(
        f"take packed ({p},R) axis=1",
        lambda i, x: jnp.take(x, perm_idx, axis=1) + 0.0,
        x0,
    )

print("== scatters (per-apply) ==", file=sys.stderr)
device_time(
    "scatter flat .at[perm].set",
    lambda i, x: jnp.zeros((R,), jnp.float32).at[perm_idx].set(x) + 0.0,
    flat,
)
device_time(
    "scatter flat unique_indices",
    lambda i, x: x.at[perm_idx].set(x, unique_indices=True) + 0.0,
    flat,
)
for p in (8, 13, 16):
    x0 = jnp.tile(flat, (p, 1))
    device_time(
        f"scatter packed ({p},R) .at[:,perm].set",
        lambda i, x: jnp.zeros_like(x).at[:, perm_idx].set(x),
        x0,
    )
    device_time(
        f"scatter packed ({p},R) unique",
        lambda i, x: x.at[:, perm_idx].set(x, unique_indices=True),
        x0,
    )

print("== sort machinery ==", file=sys.stderr)
device_time(
    "argsort (R,) i32",
    lambda i, x: x + jnp.argsort(x),
    ki,
)
device_time(
    "lax.sort (key, iota) pairs",
    lambda i, x: x
    + lax.sort((x, jnp.arange(R, dtype=jnp.int32)), num_keys=1)[1],
    ki,
)


def rank9(active, octant):
    k9 = jnp.where(active, octant, 8).reshape(Rr, L)
    onehot = k9[None, :, :] == jnp.arange(9, dtype=jnp.int32)[:, None, None]
    oh = onehot.astype(jnp.int32)
    within = jnp.cumsum(oh, axis=2)
    row_tot = within[:, :, -1]
    row_off = jnp.cumsum(row_tot, axis=1) - row_tot
    bucket_tot = row_off[:, -1] + row_tot[:, -1]
    bucket_off = jnp.cumsum(bucket_tot) - bucket_tot
    pos_b = bucket_off[:, None, None] + row_off[:, :, None] + within - 1
    return jnp.sum(jnp.where(onehot, pos_b, 0), axis=0).reshape(-1)


device_time(
    "counting-sort ranks 9-bucket (cumsum)",
    lambda i, x: x + rank9(act, oct3 + 0 * x[0]),
    ki,
)

print("== full bursts (key -> reorder 16-plane carry) ==", file=sys.stderr)
x16 = jnp.tile(flat, (16, 1))


def burst_argsort_take(i, x):
    k = ki + i  # pretend key depends on state
    order = jnp.argsort(k)
    return jnp.take(x, order, axis=1)


device_time("A: argsort + (16,R) take", burst_argsort_take, x16)


def burst_rank_scatter(i, x):
    pos = rank9(act, oct3 + i * 0)
    return jnp.zeros_like(x).at[:, pos].set(x, unique_indices=True)


device_time("B: rank9 cumsum + (16,R) scatter", burst_rank_scatter, x16)


def burst_sortpairs_take(i, x):
    _, order = lax.sort((ki + i, jnp.arange(R, dtype=jnp.int32)), num_keys=1)
    return jnp.take(x, order, axis=1)


device_time("A': lax.sort pairs + (16,R) take", burst_sortpairs_take, x16)


# sort the carry planes THEMSELVES through lax.sort as extra operands:
# one fused sort moves key + 16 payload planes with no gather at all.
def burst_multisort(i, x):
    ops = (ki + i,) + tuple(x[j] for j in range(16))
    out = lax.sort(ops, num_keys=1)
    return jnp.stack(out[1:], axis=0)


device_time("C: lax.sort key + 16 payload operands", burst_multisort, x16)
