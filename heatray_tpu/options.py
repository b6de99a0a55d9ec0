"""Render configuration.

Two tiers, mirroring the reference's split between compile-time shader
variants and per-frame uniforms (``PassGenerator.h:49-150``,
``globalData.rlsl``):

- ``RenderOptions``: static, hashable config — participates in jit
  specialization (the moral equivalent of the reference's ``#define``
  shader-variant system).
- ``FrameGlobals``: traced per-pass values (sample index, firefly clamp).
"""

from __future__ import annotations

import dataclasses
import enum

import jax.numpy as jnp
from flax import struct


class AOV(enum.Enum):
    """Debug visualization modes (``PassGenerator.h:123-141``)."""

    NONE = "none"
    GEOMETRIC_NORMALS = "geometric_normals"
    UVS = "uvs"
    TANGENTS = "tangents"
    BITANGENTS = "bitangents"
    # Raw normal-map texel (``physicallyBased.rlsl:175-176``); black where
    # the material has no normal map.
    NORMALMAP = "normalmap"
    FINAL_NORMALS = "final_normals"
    BASE_COLOR = "base_color"
    EMISSIVE = "emissive"
    ROUGHNESS = "roughness"
    METALLIC = "metallic"
    CLEARCOAT = "clearcoat"
    CLEARCOAT_ROUGHNESS = "clearcoat_roughness"
    # Raw clearcoat-normal-map texel (``physicallyBased.rlsl:198-199``).
    CLEARCOAT_NORMALMAP = "clearcoat_normalmap"
    SHADER = "shader"
    NANS = "nans"
    INFS = "infs"


@dataclasses.dataclass(frozen=True)
class RenderOptions:
    """Static render configuration (hashable; jit recompiles on change,
    replacing the reference's resetRenderingState + shader rebuild)."""

    width: int = 512
    height: int = 512
    # Full-image height when this options object describes ONE shard of a
    # row-partitioned image (shard_map over pixel rows): the camera mapping
    # and per-pixel angular sizes use the full image; ``height`` is the
    # shard's local row count.  None = height (unsharded).
    image_height: int | None = None
    max_render_passes: int = 32  # ``PassGenerator.h:62``
    max_ray_depth: int = 10  # ``PassGenerator.h:63``
    # Interactive 3x3 block mode (``PassGenerator.h:50-59``,
    # ``perspective.rlsl:42-57``): each pass traces only the pixels at the
    # current block coordinate (1/9 of the image; the rest are parked and
    # culled), cycling through the block before advancing the sample index —
    # the reference's trick for interactive feedback.
    interactive_block: bool = False
    sample_mode: str = "sobol"  # ``RenderOptions::SampleMode``
    bokeh_shape: str = "circular"  # ``RenderOptions::BokehShape``
    aov: AOV = AOV.NONE
    # Russian roulette activates above this ray depth
    # (``physicallyBased.rlsl:279``).
    rr_start_depth: int = 3
    # Ray-march epsilon for spawning secondary rays off surfaces.
    ray_epsilon: float = 1e-4
    # Intersector tiling: bounds the live (ray x triangle) intermediates.
    # (16384 x 512 x 3 floats ~= 100 MB per operand on TPU.)
    tri_chunk: int = 512
    ray_block: int = 16384
    # Intersection backend: "auto" (wide-BVH traversal kernels on TPU —
    # HBM-streaming variant past the VMEM budget — XLA elsewhere), "wide"
    # (arity-8 BVH), "stream" (arity-8 BVH, HBM-resident leaves), "bvh"
    # (binary skip-pointer), "pallas" (flat-chunk kernels), or "xla".
    intersect_backend: str = "auto"
    # Pallas kernel tiling (rays per grid step, triangles per chunk).
    pallas_ray_tile: int = 1024
    pallas_tri_chunk: int = 512
    # Triangles per BVH leaf (one fixed-size chunk per leaf; the Pallas
    # traversal hit-tests a whole leaf against a ray tile at once).
    bvh_leaf_size: int = 64
    # Leaf intersection math for the wide-BVH backend: "mxu" (K=4 MXU
    # contraction — pipelines across the traversal loop's predicated leaf
    # visits, the measured overall winner) or "vpu" (transposed broadcast
    # VPU ops — 2.5-4x faster per pair in isolation but loses its edge to
    # predication stalls inside traversal; kept for sweeps).
    wide_leaf_math: str = "mxu"
    # MXU schedule for the wide-backend pair test: "bf16x3" (3 bf16 passes;
    # safe as default because chunk re-centering keeps its ~2^-22 relative
    # error proportional to LOCAL geometry — see _pair_hits) or "highest"
    # (6 passes, full f32).
    wide_precision: str = "bf16x3"
    # Triangles per wide-BVH (arity-8) leaf: smaller leaves cull finer —
    # the 8-wide slab test amortizes the extra nodes.  ("vpu" leaf math
    # rounds this up to a multiple of 128: lane-tile alignment.)
    wide_leaf_size: int = 32
    # Rays per grid step for the wide-BVH kernels: smaller tiles share
    # traversal decisions across fewer rays (tighter culling), larger tiles
    # amortize the per-visit fixed cost.  The fused single-pass MXU
    # schedule moved the optimum from 256 to 512 on the real bounce
    # wavefront sweep (tpu_bounce_sweep.py).
    wide_ray_tile: int = 512
    # Triangles per leaf for the HBM-streaming backend ("stream", selected
    # automatically past the VMEM budget): bigger leaves amortize the
    # per-leaf DMA (128 tris = 6 KB per transfer).
    stream_leaf_size: int = 128
    # Rays per grid step for the HBM-streaming kernels: smaller tiles than
    # the VMEM backend win here because each avoided leaf visit also avoids
    # a DMA (tpu_stream_probe.py: rt=256 beats 512 by ~8% over the real
    # per-depth wavefronts of the 300k-tri bench scene).
    stream_ray_tile: int = 256
    # Leaf pair-test math for the streaming kernels: "mxu" (K=4 bf16x3
    # contraction) or "vpu" (transposed exact-f32 broadcast ops; needs
    # stream_leaf_size % 128 == 0).
    stream_leaf_math: str = "mxu"
    # Reorder the bounce wavefront each depth by (direction octant, origin
    # Morton): traversal tiles stay coherent and dead lanes cluster into
    # tiles that exit at the root (the wavefront-compaction analog).
    # "auto" = on for the TPU Pallas backends, off elsewhere (the result is
    # bit-identical either way — sorting is an exact permutation — but the
    # argsort is pure overhead for the XLA/CPU path).
    sort_bounces: bool | str = "auto"
    # HOW the bounce reorder is applied: "multisort" (one multi-operand
    # lax.sort moves every carry plane with the key — fastest per pass,
    # ~30 ms/bounce at 2M rays, but variadic-sort COMPILE time scales
    # with payload bytes: ~4 min for the full pass graph), "take" (sort
    # (key, iota) + packed gathers — ~52 ms/bounce but compiles in
    # seconds), or "auto" (multisort: per-pass speed wins for sustained
    # renders; the persistent compilation cache amortizes the compile).
    sort_impl: str = "auto"
    # Segment-gate the sorted bounce wavefront: the per-bounce sort puts
    # active lanes in a contiguous prefix (inactive keys sort last), so the
    # bounce body (traversal + row gather + shade + occlusion) runs on
    # fixed row segments of the wavefront, each under a lax.cond that
    # skips segments holding no fresh active lane.  Per-bounce cost becomes
    # proportional to the LIVE fraction instead of the full width — exact,
    # because skipped lanes are inactive and their carry passes through
    # unchanged (measured: the 300k-tri bench scene is 21% live at depth 2
    # and ~0% at 3-4, yet paid full-width shade every depth).  "auto" = on
    # whenever the bounce sort is on (gating requires the sorted prefix).
    gate_bounces: bool | str = "auto"
    # Number of wavefront segments for gating (granularity of the skip:
    # cost quantizes to ceil(live / (R/segments)) segments).
    gate_segments: int = 8
    # Multiscatter energy-compensation term: "fit" (gather-free Chebyshev
    # surface of the directional albedo, accurate to within the reference
    # LUT's own 4096-sample MC noise — saves 2 per-lane LUT gathers per
    # bounce, ~7.5 ms each at 2M lanes) or "lut" (the corner-packed
    # bilinear table, bit-matching the reference's MultiScatterUtil
    # pipeline).
    ms_impl: str = "fit"
    # Rematerialize each bounce in the backward pass (jax.checkpoint): the
    # QMC draws and shade intermediates are cheap to recompute and their
    # per-depth residuals otherwise OOM a 16 GB chip at 1080p.
    remat_bounces: bool = True
    # Unroll the bounce loop instead of lax.scan (bounce counts are small
    # and static; unrolling lets XLA specialize each depth).
    unroll_bounces: bool = False
    # Trilinear mip sampling with ray-cone LOD (the reference's default
    # RL_LINEAR_MIPMAP_LINEAR samplers, ``Texture.h:51,86``); off = bilinear
    # level-0 only.
    use_mipmaps: bool = True
    # Pass debugging (``PassGenerator.h:145-149``): freeze rendering to the
    # single pass at ``debug_pass_index`` to inspect one sample's
    # contribution in isolation.
    debug_pass_rendering: bool = False
    debug_pass_index: int = 0

    def __post_init__(self):
        assert self.max_ray_depth >= 1
        assert self.max_render_passes >= 1


@struct.dataclass
class FrameGlobals:
    """Traced per-pass state (the analog of the ``Globals`` uniform block)."""

    sample_index: jnp.ndarray  # () i32, 0 .. max_render_passes-1
    max_channel_value: jnp.ndarray  # () f32 firefly clamp (``accumulator.rlsl:24``)
    # Global row index of this shard's row 0 (0 unless rendering one shard
    # of a row-partitioned image inside shard_map).
    row_offset: jnp.ndarray = None  # () i32

    @classmethod
    def create(cls, sample_index: int = 0, max_channel_value: float = 3.14159265,
               row_offset=0):
        # Default clamp is pi (``PassGenerator.h:64``).
        return cls(
            sample_index=jnp.int32(sample_index),
            max_channel_value=jnp.float32(max_channel_value),
            row_offset=jnp.int32(row_offset),
        )
