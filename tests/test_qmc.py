"""Tests for the QMC sampling module.

Golden uint32 values are computed by hand-evaluating the reference's scramble
chain (``Source/Utility/Random.h``); distribution tests check uniformity and
low discrepancy of each sequence family.
"""

import numpy as np
import pytest

from heatray_tpu.sampling import bits, bokeh, qmc


class TestBits:
    def test_reverse_bits(self):
        assert bits.reverse_bits(np.uint32(1)) == np.uint32(0x80000000)
        assert bits.reverse_bits(np.uint32(0x80000000)) == np.uint32(1)
        assert bits.reverse_bits(np.uint32(0xFFFFFFFF)) == np.uint32(0xFFFFFFFF)
        x = np.arange(1000, dtype=np.uint32) * np.uint32(2654435761)
        assert np.array_equal(bits.reverse_bits(bits.reverse_bits(x)), x)

    def test_burley_hash_golden(self):
        # Reference chain evaluated manually: x=1
        # 1^(1>>16)=1; *0x85ebca6b = 0x85ebca6b; ^ (>>13) = 0x85ebca6b ^ 0x42f5e
        x = np.uint32(1)
        h = bits.burley_hash(x)
        # recompute independently with python ints
        y = 1
        y ^= y >> 16
        y = (y * 0x85EBCA6B) & 0xFFFFFFFF
        y ^= y >> 13
        y = (y * 0xC2B2AE35) & 0xFFFFFFFF
        y ^= y >> 16
        assert int(h) == y

    def test_laine_karras_matches_scalar(self):
        xs = np.array([0, 1, 2, 12345, 0xFFFFFFFF], dtype=np.uint32)
        seed = np.uint32(0xDEADBEEF)
        out = bits.laine_karras_permutation(xs, seed)
        for x, o in zip(xs, out):
            y = (int(x) + 0xDEADBEEF) & 0xFFFFFFFF
            for c in (0x6C50B47C, 0xB82F1E52, 0xC7AFE638, 0x8D22F6E6):
                y ^= (y * c) & 0xFFFFFFFF
                y &= 0xFFFFFFFF
            assert int(o) == y

    def test_float_roundtrip(self):
        u = np.array([0, 1, 1 << 16, 0x80000000, 0xFFFFFF00], dtype=np.uint32)
        f = bits.to_normalized_float(u)
        assert f.dtype == np.float32
        assert np.all(f >= 0) and np.all(f <= 1)
        # to_uint32 is the (approximate) inverse up to f32 mantissa precision
        back = bits.to_uint32(f)
        assert np.all(np.abs(back.astype(np.int64) - u.astype(np.int64)) <= 256)

    def test_nested_uniform_scramble_is_owen(self):
        # An Owen scramble preserves elementary intervals: the top k bits of
        # the output depend only on the top k bits of the input.
        seed = np.uint32(12345)
        a = np.uint32(0b1010 << 28 | 0x0000FFFF)
        b = np.uint32(0b1010 << 28 | 0x00001234)
        sa = bits.nested_uniform_scramble(a, seed)
        sb = bits.nested_uniform_scramble(b, seed)
        assert int(sa) >> 28 == int(sb) >> 28

    def test_fnv1a(self):
        # FNV-1a of empty input is the offset basis.
        assert bits.fnv1a_bytes(b"") == 0xCBF29CE484222325
        # Well-known FNV-1a 64 test vector: "a" -> 0xaf63dc4c8601ec8c
        assert bits.fnv1a_bytes(b"a") == 0xAF63DC4C8601EC8C


class TestSequences:
    @pytest.mark.parametrize("name", ["sobol", "halton", "hammersley", "random"])
    def test_range_and_shape(self, name):
        s = qmc.GENERATORS[name](256, 3)
        assert s.shape == (256, 2)
        assert s.dtype == np.float32
        assert np.all(s >= 0.0) and np.all(s <= 1.0)

    @pytest.mark.parametrize("name", ["sobol", "halton", "hammersley"])
    def test_uniform_mean(self, name):
        s = qmc.GENERATORS[name](4096, 0)
        assert np.allclose(s.mean(axis=0), 0.5, atol=0.02)

    def test_sobol_low_discrepancy(self):
        # Star discrepancy proxy: count points in dyadic boxes.
        n = 1024
        s = qmc.sobol(n, 0)
        for k in [4, 16]:
            counts, _, _ = np.histogram2d(
                s[:, 0], s[:, 1], bins=k, range=[[0, 1], [0, 1]]
            )
            expected = n / (k * k)
            # Owen-scrambled Sobol should be close to perfectly stratified.
            assert np.abs(counts - expected).max() <= max(4, 0.5 * expected)

    def test_sequences_differ_by_index(self):
        a = qmc.sobol(128, 0)
        b = qmc.sobol(128, 1)
        assert not np.allclose(a, b)

    def test_deterministic(self):
        assert np.array_equal(qmc.sobol(64, 5), qmc.sobol(64, 5))
        assert np.array_equal(qmc.halton(64, 5), qmc.halton(64, 5))

    def test_halton_bases_table(self):
        assert qmc.HALTON_BASES.shape == (16, 2)
        assert tuple(qmc.HALTON_BASES[0]) == (2, 3)

    def test_blue_noise_spacing(self):
        pts = qmc.blue_noise(64, 0)
        assert pts.shape == (64, 2)
        d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
        np.fill_diagonal(d, np.inf)
        # Best-candidate points should be much better separated than i.i.d.
        # uniform (expected nearest-neighbor distance ~ 0.5/sqrt(64) ~ 0.0625).
        assert d.min() > 0.02


class TestBokeh:
    def test_radial_sobol_in_disk(self):
        s = bokeh.radial_sobol(512, 0)
        xy = s * 2.0 - 1.0
        r = np.linalg.norm(xy, axis=-1)
        assert np.all(r <= 1.0 + 1e-5)
        assert np.allclose(xy.mean(axis=0), 0.0, atol=0.06)

    @pytest.mark.parametrize("edges", [5, 6, 8])
    def test_polygon_inside(self, edges):
        s = bokeh.random_polygonal(edges, 512, 1)
        xy = s * 2.0 - 1.0
        # All points within the circumscribed unit circle, and mean near 0.
        assert np.all(np.linalg.norm(xy, axis=-1) <= 1.0 + 1e-5)
        assert np.allclose(xy.mean(axis=0), 0.0, atol=0.08)
        # Some points beyond the inscribed circle (i.e. actually polygonal,
        # not a disk of the inscribed radius).
        apothem = np.cos(np.pi / edges)
        assert (np.linalg.norm(xy, axis=-1) > apothem).any()


class TestTables:
    def test_build_and_lookup(self):
        import jax.numpy as jnp

        from heatray_tpu.sampling import build_tables, get_sequence_value

        t = build_tables(8, 8, max_passes=32)
        assert t.seq_u.shape == (16 * 32,)
        assert t.aperture_u.shape == (16 * 32,)
        assert t.pixel_sequence_id.shape == (8, 8)
        assert int(t.pixel_sequence_id.max()) < 16
        assert int(t.pixel_sequence_offset.max()) < 32

        # Wraparound lookup matches direct indexing.
        u, v = get_sequence_value(t, jnp.array([17]), jnp.array([33]))
        entry = (17 % 16) * 32 + (33 % 32)
        assert np.allclose(np.asarray(u[0]), np.asarray(t.seq_u[entry]))
        assert np.allclose(np.asarray(v[0]), np.asarray(t.seq_v[entry]))

    def test_glsl_random_range(self):
        from heatray_tpu.sampling import glsl_random

        st = np.random.rand(100, 2).astype(np.float32)
        r = glsl_random(st)
        assert np.all(r >= 0) and np.all(r < 1.0)
