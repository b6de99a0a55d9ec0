"""Device-side QMC sample tables and lookup.

The reference uploads its random sequences as uniform blocks once per render
configuration (``Source/HeatrayRenderer/PassGenerator.cpp:603-684``) and every
shader indexes them with wraparound (``Resources/shaders/sequence.rlsl``).
We mirror that: a ``(num_sequences, length, 2)`` main table, an identical
aperture table, plus per-pixel sequence ids and index offsets
(``PassGenerator.cpp:150-159``, ``perspective.rlsl:62-67``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct

from . import bokeh as bokeh_mod
from . import qmc

# ``PassGenerator.h:193``
NUM_RANDOM_SEQUENCES = 16


@struct.dataclass
class SampleTables:
    """All sampling data needed by one render configuration (a pytree).

    Tables are stored planar (one flat array per 2D-sample component) so
    lookups gather flat (R,) arrays — no (R, 2) trailing axis (see
    ``heatray_tpu.vec``).  Row-major layout: entry ``seq * L + index``.
    """

    seq_u: jnp.ndarray  # (S * L,) f32 — main QMC table, component 0
    seq_v: jnp.ndarray  # (S * L,) f32 — main QMC table, component 1
    aperture_u: jnp.ndarray  # (S * L,) f32 — bokeh samples in [0,1]
    aperture_v: jnp.ndarray  # (S * L,) f32
    pixel_sequence_id: jnp.ndarray  # (H, W) i32 — per-pixel sequence select
    pixel_sequence_offset: jnp.ndarray  # (H, W) i32 — per-pixel index offset
    num_sequences: int = struct.field(pytree_node=False, default=NUM_RANDOM_SEQUENCES)
    sequence_length: int = struct.field(pytree_node=False, default=0)


def glsl_random(st: np.ndarray) -> np.ndarray:
    """The classic GLSL one-liner hash used by ``utility.rlsl:15-18``.

    ``fract(sin(dot(st, (12.9898, 78.233))) * 43758.5453123)`` in float32.
    """
    st = np.asarray(st, dtype=np.float32)
    d = (st[..., 0] * np.float32(12.9898) + st[..., 1] * np.float32(78.233)).astype(
        np.float32
    )
    v = (np.sin(d, dtype=np.float32) * np.float32(43758.5453123)).astype(np.float32)
    return (v - np.floor(v)).astype(np.float32)


def build_tables(
    width: int,
    height: int,
    max_passes: int,
    sample_mode: str = "sobol",
    bokeh_shape: str = "circular",
) -> SampleTables:
    """Generate all host-side tables for a render configuration.

    Mirrors ``PassGenerator::generateRandomSequences`` (main + aperture
    tables) and ``PassGenerator::generateSequenceOffsets`` +
    ``perspective.rlsl:62-65`` (per-pixel sequence id / offset).
    """
    gen = qmc.GENERATORS[sample_mode]
    seqs = np.stack(
        [gen(max_passes, i) for i in range(NUM_RANDOM_SEQUENCES)], axis=0
    )
    bok = bokeh_mod.BOKEH_SHAPES[bokeh_shape]
    aperture = np.stack(
        [bok(max_passes, i) for i in range(NUM_RANDOM_SEQUENCES)], axis=0
    )

    # Per-pixel sequence id: floor(glsl_random(frameCoord / frameSize) * S)
    # with frameCoord the pixel center (``perspective.rlsl:62``).  Row 0 is the
    # bottom of the image (OpenRL convention).
    ys, xs = np.meshgrid(
        np.arange(height, dtype=np.float32), np.arange(width, dtype=np.float32),
        indexing="ij",
    )
    st = np.stack(
        [(xs + 0.5) / np.float32(width), (ys + 0.5) / np.float32(height)], axis=-1
    )
    seq_id = np.floor(glsl_random(st) * np.float32(NUM_RANDOM_SEQUENCES)).astype(
        np.int32
    )
    seq_id = np.minimum(seq_id, NUM_RANDOM_SEQUENCES - 1)

    # Per-pixel sequence index offset: Sobol sequence 0 over all pixels, then
    # floor(x * maxSampleIndex) (``PassGenerator.cpp:150-159``,
    # ``perspective.rlsl:64-65``).  The reference indexes this buffer with
    # ``y * frameHeight + x`` (a quirk — height, not width); we use the
    # standard row-major y * width + x layout.
    offsets = qmc.sobol(width * height, 0)[:, 0].reshape(height, width)
    seq_offset = np.floor(offsets * np.float32(max_passes)).astype(np.int32)
    seq_offset = np.minimum(seq_offset, max_passes - 1)

    seqs = seqs.reshape(-1, 2)
    aperture = aperture.reshape(-1, 2)
    return SampleTables(
        seq_u=jnp.asarray(np.ascontiguousarray(seqs[:, 0])),
        seq_v=jnp.asarray(np.ascontiguousarray(seqs[:, 1])),
        aperture_u=jnp.asarray(np.ascontiguousarray(aperture[:, 0])),
        aperture_v=jnp.asarray(np.ascontiguousarray(aperture[:, 1])),
        pixel_sequence_id=jnp.asarray(seq_id),
        pixel_sequence_offset=jnp.asarray(seq_offset),
        num_sequences=NUM_RANDOM_SEQUENCES,
        sequence_length=max_passes,
    )


def get_sequence_value(tables: SampleTables, sequence_index, sample_index):
    """Wrapped 2D sample lookup, ``Resources/shaders/sequence.rlsl:18-28``.

    ``sequence_index`` and ``sample_index`` are int32 arrays of any (matching)
    shape; returns float32 arrays ``(u, v)`` of that shape.
    """
    s = tables.num_sequences
    length = tables.sequence_length
    seq = jnp.remainder(sequence_index, s)
    idx = jnp.remainder(sample_index, length)
    entry = seq * length + idx
    return (jnp.take(tables.seq_u, entry, mode="clip"),
            jnp.take(tables.seq_v, entry, mode="clip"))


def get_aperture_sample(tables: SampleTables, sequence_id, sample_index):
    """Aperture table lookup, ``perspective.rlsl:78``.

    The reference indexes ``samples[sequenceID * sequenceLength + sampleIndex]``
    without wrapping; we wrap the sample index defensively (identical for
    sample_index < length).  Returns ``(u, v)`` float32 arrays.

    ``sample_index`` is a per-pass scalar, so only ``num_sequences`` distinct
    entries are ever read per pass: fetch those (a 16-element gather) and
    one-hot select per pixel instead of issuing a wavefront-sized gather
    (TPU gathers pay per fetch — ~19 ms per 2M-ray take at 1080p, vs ~30
    VPU ops here).  Bit-identical to the direct lookup.
    """
    length = tables.sequence_length
    idx = jnp.remainder(sample_index, length)
    if jnp.ndim(idx) == 0:
        s = tables.num_sequences
        entries = jnp.arange(s, dtype=jnp.int32) * length + idx
        u_s = jnp.take(tables.aperture_u, entries, mode="clip")
        v_s = jnp.take(tables.aperture_v, entries, mode="clip")
        u = jnp.zeros(jnp.shape(sequence_id), jnp.float32)
        v = jnp.zeros(jnp.shape(sequence_id), jnp.float32)
        for k in range(s):
            sel = sequence_id == k
            u = jnp.where(sel, u_s[k], u)
            v = jnp.where(sel, v_s[k], v)
        return u, v
    entry = sequence_id * length + idx
    return (jnp.take(tables.aperture_u, entry, mode="clip"),
            jnp.take(tables.aperture_v, entry, mode="clip"))
