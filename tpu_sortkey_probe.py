"""Round-5b probe: sort-KEY design vs traversal redundancy.

Real (slot-bug-fixed) visit stats show sorted bounce tiles still visit
17-19 leaf chunks each with ~10% lane overlap at rt=512 — the current
octant-major key clusters direction globally, so a tile's 512 rays span a
wide origin footprint (and vice versa at later Morton bits).  This probe
scores alternative coherence keys on the REAL d2/d3/d4 wavefronts by
total leaf/node work (the direct proxy for kernel time):

  oct+m6   : current key (3b octant major + 6b/axis Morton)
  m3|oct|m3: Morton-high outside, octant between, Morton-low inside
  m4|d6    : 4b/axis Morton cells, then 6b direction (octant + 1b
             secondary axis split each) inside a cell
  m6|oct   : full Morton major, octant minor
  m6       : pure origin Morton (no direction)

Usage: python tpu_sortkey_probe.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/heatray_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from heatray_tpu.camera import orbit_camera
from heatray_tpu.options import RenderOptions
from heatray_tpu.render.integrator import (
    _part1by2,
    generate_primary_rays,
    make_context,
)
from heatray_tpu.scene.builtin import cornell_box
from heatray_tpu.vec import Vec3

W, H, DEPTH = 1920, 1080, 4
R = W * H

options = RenderOptions(width=W, height=H, max_render_passes=8, max_ray_depth=DEPTH)
scene = cornell_box(light="both", with_spheres=True)
camera = orbit_camera(W, H, distance=6.2, focal_length_mm=35.0)
ctx = make_context(options, scene)
pack = ctx.accel_pack
eps = options.ray_epsilon

src = open("tpu_sorted_visit_probe.py").read()
cut = src.index('print(f"chunks=')
ns = {"__name__": "_svp_lib", "__file__": "tpu_sorted_visit_probe.py"}
exec(compile(src[:cut], "tpu_sorted_visit_probe.py", "exec"), ns)
one_bounce, visit_stats = ns["one_bounce"], ns["visit_stats"]

seed_w = jnp.zeros((12, 8), jnp.float32)
seed_anchor = jnp.zeros((3,), jnp.float32)
lo = jnp.min(pack.accel.tri_min, axis=1)
hi = jnp.max(pack.accel.tri_max, axis=1)


def _cell(org, bits):
    """Per-axis integer cell coords at ``bits`` resolution in [lo, hi]."""
    n = (1 << bits) - 1
    out = []
    for c, l, h in ((org.x, lo[0], hi[0]), (org.y, lo[1], hi[1]),
                    (org.z, lo[2], hi[2])):
        u = jnp.clip((c - l) / jnp.maximum(h - l, 1e-8), 0.0, 1.0)
        out.append(jnp.clip((u * (n + 1)).astype(jnp.int32), 0, n))
    return out


def _morton(org, bits):
    x, y, z = _cell(org, bits)
    if bits <= 6:
        return (
            (_part1by2(x) << 2) | (_part1by2(y) << 1) | _part1by2(z)
        )
    raise ValueError(bits)


def _octant(d):
    return (
        ((d.x < 0).astype(jnp.int32) << 2)
        | ((d.y < 0).astype(jnp.int32) << 1)
        | (d.z < 0).astype(jnp.int32)
    )


def _dir6(d):
    """6-bit direction bin: octant + per-axis |major| split."""
    oct_ = _octant(d)
    ax, ay, az = jnp.abs(d.x), jnp.abs(d.y), jnp.abs(d.z)
    major = jnp.where(
        (ax >= ay) & (ax >= az), 0, jnp.where(ay >= az, 1, 2)
    )
    # secondary: is the second-largest component > 0.5x the major?
    mx = jnp.maximum(ax, jnp.maximum(ay, az))
    mid = ax + ay + az - mx - jnp.minimum(ax, jnp.minimum(ay, az))
    steep = (mid > 0.5 * mx).astype(jnp.int32)
    return (oct_ << 3) | (major << 1) | steep


def make_keys(org, d, active):
    m6 = _morton(org, 6)  # 18 bits
    oct_ = _octant(d)
    d6 = _dir6(d)
    m4 = m6 >> 6  # top 12 bits = 4b/axis cells
    keys = {
        "oct+m6": (oct_ << 18) | m6,
        "m3|oct|m3": ((m6 >> 9) << 15) | (oct_ << 9) | (m6 & 0x1FF),
        "m4|d6": (m4 << 6) | d6,
        "m4|d6|m2": (((m4 << 6) | d6) << 6) | (m6 & 0x3F),
        "m6|oct": (m6 << 3) | oct_,
        "m6": m6,
    }
    # inactive lanes last, always
    out = {}
    for k, v in keys.items():
        out[k] = jnp.where(active, v, jnp.int32(2**30))
    return out


org, dirn, seq_id, seq_off = jax.jit(
    lambda: generate_primary_rays(camera, ctx.tables, options, 2)
)()
weight = Vec3.ones((R,))
env_on_miss = jnp.ones((R,), bool)
active = jnp.ones((R,), bool)

cur_o, cur_d = org, dirn
for depth in range(2, DEPTH + 1):
    cur_o, cur_d, weight, env_on_miss, active = one_bounce(
        cur_o, cur_d, weight, env_on_miss, active, jnp.int32(depth - 1), 2,
        seq_id, seq_off,
    )
    keys = make_keys(cur_o, cur_d, active)
    act_np = None
    for kname, key in keys.items():
        out = jax.lax.sort(
            (key, cur_o.x, cur_o.y, cur_o.z, cur_d.x, cur_d.y, cur_d.z,
             active.astype(jnp.int32)),
            num_keys=1,
        )
        s_o = Vec3(out[1], out[2], out[3])
        s_d = Vec3(out[4], out[5], out[6])
        s_act = np.asarray(out[7] > 0)
        rt = 512
        nodes, leaves, frac, impr = map(
            np.asarray,
            visit_stats(pack.wide, s_o, s_d, seed_w, seed_anchor,
                        ray_tile=rt, seed_k=0),
        )
        live = s_act[: nodes.shape[0] * rt].reshape(-1, rt).any(axis=1)
        print(
            f"depth {depth} key={kname:10s}: "
            f"leaves/live={leaves[live].mean():5.1f} "
            f"nodes/live={nodes[live].mean():5.1f} "
            f"overlap={frac.sum()/max(leaves.sum(),1):.3f} "
            f"leafwork={rt*leaves[live].sum()/1e6:5.1f}M "
            f"nodework={rt*nodes[live].sum()/1e6:5.1f}M",
            file=sys.stderr, flush=True,
        )
