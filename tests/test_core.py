"""Unit tests for core primitives vs the reference spec (SURVEY.md §4.2)."""

import numpy as np
import pytest

from approx_counter_tpu.core.codec import (
    decode_kmer,
    decode_kmers,
    encode_kmer,
    join_code,
    seq_to_codes,
    split_code,
)
from approx_counter_tpu.core.complexity import (
    adjust_threshold,
    complexity_score,
    complexity_score_np,
)
from approx_counter_tpu.core.ordering import sort_by_compare_count
from approx_counter_tpu.oracle import oracle_complexity, oracle_sort_compare_count


class TestCodec:
    def test_high_bits_first(self):
        # dna2int packs first base in high bits (approx_counter.cpp:55-62):
        # "AC" -> 0b0001 = 1; "CA" -> 0b0100 = 4.
        assert encode_kmer("AC") == 1
        assert encode_kmer("CA") == 4
        assert encode_kmer("TTTT") == 0xFF
        assert encode_kmer("ACGT") == 0b00011011

    def test_roundtrip(self, rng):
        for k in [2, 5, 16, 17, 31, 32]:
            for _ in range(20):
                codes = rng.integers(0, 4, k).astype(np.uint8)
                s = "".join("ACGT"[c] for c in codes)
                v = encode_kmer(s)
                assert decode_kmer(v, k) == s
        assert decode_kmers(np.array([1, 4], dtype=np.uint64), 2) == ["AC", "CA"]

    def test_seq_to_codes(self):
        np.testing.assert_array_equal(
            seq_to_codes("ACGTNacgtnX"), [0, 1, 2, 3, 4, 0, 1, 2, 3, 4, 4]
        )

    def test_split_join(self, rng):
        v = rng.integers(0, 2**63, 100, dtype=np.uint64)
        hi, lo = split_code(v)
        np.testing.assert_array_equal(join_code(hi, lo), v)

    @pytest.mark.parametrize("m", [1, 7, 8, 101, 104])
    def test_pack_windows_roundtrip(self, m, rng):
        """2-bit-packed H2D planes: pack/unpack is the identity on all
        symbols (bases, N, pad) at aligned and ragged widths."""
        import jax.numpy as jnp

        from approx_counter_tpu.core.codec import (
            pack_windows_host,
            unpack_windows_jnp,
        )

        w = rng.integers(0, 6, (5, m)).astype(np.uint8)
        planes, mm = pack_windows_host(w)
        assert mm == m
        assert planes.shape[1] * 8 == 3 * (-(-m // 8) * 8)
        out = np.asarray(unpack_windows_jnp(jnp.asarray(planes), m))
        np.testing.assert_array_equal(out, w)
        # non-contiguous input (sliced batch) must pack identically
        wx = np.ascontiguousarray(
            rng.integers(0, 6, (5, m + 3)).astype(np.uint8)
        )[:, 1 : m + 1]
        planes2, _ = pack_windows_host(wx)
        out2 = np.asarray(unpack_windows_jnp(jnp.asarray(planes2), m))
        np.testing.assert_array_equal(out2, wx)

    @pytest.mark.parametrize("m,ncols_off", [(8, 0), (101, 1), (104, 0),
                                             (26, 1)])
    def test_pack_windows_sparse_roundtrip(self, m, ncols_off, rng):
        """Sparse-N format: 2-bit plane + scatter list + derivable pad
        reconstructs the sampler-contract batch exactly (N positions,
        trailing start-pad column, invalid pad rows, ragged widths)."""
        import jax.numpy as jnp

        from approx_counter_tpu.core.codec import (
            BASE_N,
            BASE_PAD,
            pack_windows_sparse,
            unpack_windows_sparse_jnp,
        )

        n, n_valid = 12, 9
        ncols = m - ncols_off
        w = np.full((n, m), BASE_PAD, np.uint8)
        w[:n_valid, :ncols] = rng.integers(0, 4, (n_valid, ncols))
        # sprinkle Ns in the valid region (incl. edges)
        w[0, 0] = BASE_N
        w[n_valid - 1, ncols - 1] = BASE_N
        if ncols > 2:
            w[2, ncols // 2] = BASE_N
        lo, n_idx, got_ncols, mm = pack_windows_sparse(w, n_valid)
        assert (got_ncols, mm) == (ncols, m)
        out = np.asarray(
            unpack_windows_sparse_jnp(
                jnp.asarray(lo), jnp.asarray(n_idx), np.int32(n_valid),
                np.int32(got_ncols), m,
            )
        )
        np.testing.assert_array_equal(out, w)

    def test_pack_windows_sparse_overflow_and_clean(self, rng):
        """> ncap Ns -> None (dense fallback); N-free batch -> empty list."""
        from approx_counter_tpu.core.codec import (
            BASE_N,
            pack_windows_sparse,
        )

        w = rng.integers(0, 4, (8, 64)).astype(np.uint8)
        lo, n_idx, ncols, m = pack_windows_sparse(w, 8)
        assert (n_idx == np.iinfo(np.int32).max).all() and ncols == 64
        w[:4, :] = BASE_N  # 256 Ns > ncap=16
        assert pack_windows_sparse(w, 8, ncap=16) is None

    def test_pack_windows_sparse_native_matches_numpy(self, rng,
                                                      monkeypatch):
        """The C++ fused pack+N-scan and the numpy SWAR path must produce
        identical planes and scatter lists (incl. overflow/contract
        fallbacks)."""
        import approx_counter_tpu.io.native as native_mod
        from approx_counter_tpu.core.codec import (
            BASE_N,
            pack_windows_sparse,
        )

        pytest.importorskip("ctypes")
        try:
            native_mod._load()
        except ImportError:
            pytest.skip("native lib not built")

        n, m, n_valid = 16, 101, 13
        w = np.full((n, m), 5, np.uint8)
        w[:n_valid, : m - 1] = rng.integers(0, 4, (n_valid, m - 1))
        for _ in range(7):
            w[rng.integers(0, n_valid), rng.integers(0, m - 1)] = BASE_N
        got_native = pack_windows_sparse(w, n_valid)

        def _no_native(*a, **k):
            raise ImportError

        monkeypatch.setattr(native_mod, "pack_windows_sparse_native",
                            _no_native)
        got_numpy = pack_windows_sparse(w, n_valid)
        assert got_native is not None and got_numpy is not None
        for a, b in zip(got_native, got_numpy):
            np.testing.assert_array_equal(a, b)
        # overflow fallback agrees too
        w[:n_valid, :8] = BASE_N
        monkeypatch.undo()
        assert pack_windows_sparse(w, n_valid, ncap=16) is None

    def test_pack_windows_sparse_interior_pad_falls_back(self, rng):
        """Pad INSIDE the valid region violates the sampler contract the
        sparse format relies on -> None (dense fallback), never silent
        corruption."""
        from approx_counter_tpu.core.codec import (
            BASE_PAD,
            pack_windows_sparse,
        )

        w = rng.integers(0, 4, (6, 32)).astype(np.uint8)
        w[3, 10] = BASE_PAD
        assert pack_windows_sparse(w, 6) is None

    @pytest.mark.parametrize("junk", [8, 9, 255])
    def test_pack_windows_sparse_junk_symbol_falls_back(self, rng, junk,
                                                        monkeypatch):
        """An out-of-contract symbol >= 8 (bit 2 clear!) inside the valid
        region must fall back to the dense format on BOTH the native and
        numpy paths -- the native SWAR N-scan mask must cover all high
        bits, not just bit 2 (advisor finding, round 3)."""
        import approx_counter_tpu.io.native as native_mod
        from approx_counter_tpu.core.codec import pack_windows_sparse

        w = rng.integers(0, 4, (6, 32)).astype(np.uint8)
        w[2, 17] = junk
        assert pack_windows_sparse(w, 6) is None  # native when built

        def _no_native(*a, **k):
            raise ImportError

        monkeypatch.setattr(native_mod, "pack_windows_sparse_native",
                            _no_native)
        assert pack_windows_sparse(w, 6) is None  # numpy fallback


class TestIsDna:
    def test_pure_and_tainted(self):
        """is_DNA twin (approx_counter.cpp:313-321): ordinal >= 4 fails."""
        from approx_counter_tpu.core.codec import is_dna

        assert is_dna("ACGT") and is_dna("acgt") and is_dna(b"GGCC")
        assert not is_dna("ACGNT")
        assert not is_dna("ACG-")
        assert is_dna("")  # vacuously pure, like the reference's loop


class TestComplexity:
    def test_adjust_threshold(self):
        # approx_counter.cpp:183-186: c * ((k_new-1)/(k_old-1))^2
        assert adjust_threshold(1.0, 16, 16) == pytest.approx(1.0)
        assert adjust_threshold(1.0, 16, 31) == pytest.approx(
            float(np.float32((30 * 30) / (15 * 15)))
        )

    def test_homopolymer_is_high(self):
        # AAAA...A (k=16): 15 identical dimers -> s = 15*14/(2*14) = 7.5
        code = encode_kmer("A" * 16)
        s = complexity_score_np(np.array([code], np.uint64), 16)[0]
        assert s == pytest.approx(7.5)

    @pytest.mark.parametrize("k", [3, 4, 15, 16, 17, 31, 32])
    def test_matches_oracle(self, k, rng):
        codes = rng.integers(0, 2**63, 64, dtype=np.uint64) & (
            np.uint64((1 << (2 * k)) - 1)
        )
        want = np.array([oracle_complexity(int(c), k) for c in codes], np.float32)
        got_np = complexity_score_np(codes, k)
        np.testing.assert_array_equal(got_np, want)
        hi, lo = split_code(codes)
        got_jax = np.asarray(complexity_score(hi, lo, k))
        np.testing.assert_array_equal(got_jax, want)

    def test_k2_nan(self):
        s = complexity_score_np(np.array([0], np.uint64), 2)
        assert np.isnan(s[0])
        # haveLowComplexity: NaN >= t is False -> never rejected.
        assert not (s[0] >= np.float32(1.0))


class TestOrdering:
    @pytest.mark.parametrize("k", [2, 3, 16, 32])
    def test_matches_oracle(self, k, rng):
        n = 200
        codes = (
            rng.integers(0, 2**63, n, dtype=np.uint64)
            & np.uint64((1 << (2 * k)) - 1)
        )
        codes = np.unique(codes)
        counts = rng.integers(1, 6, len(codes)).astype(np.uint32)  # many ties
        want = oracle_sort_compare_count(
            dict(zip(codes.tolist(), counts.tolist())), k
        )
        hi, lo = split_code(codes)
        s_hi, s_lo, s_cnt = sort_by_compare_count(hi, lo, counts, k)
        got_codes = join_code(np.asarray(s_hi), np.asarray(s_lo))
        got = list(zip(got_codes.tolist(), np.asarray(s_cnt).tolist()))
        assert got == want


class TestTransposedUnpack:
    @pytest.mark.parametrize("m", [101, 32, 7])
    def test_sparse_t_matches_sparse_transpose(self, m, rng):
        """unpack_windows_sparse_t_jnp == unpack_windows_sparse_jnp.T --
        the round-4 fused-pass layout (no [n, m] materialization)."""
        import jax

        from approx_counter_tpu.core.codec import (
            BASE_N,
            pack_windows_sparse,
            unpack_windows_sparse_jnp,
            unpack_windows_sparse_t_jnp,
        )

        n, n_valid = 24, 19
        w = np.full((n, m), 5, np.uint8)
        ncols = m - 1 if m > 8 else m
        w[:n_valid, :ncols] = rng.integers(0, 4, (n_valid, ncols))
        for _ in range(5):
            w[rng.integers(0, n_valid), rng.integers(0, ncols)] = BASE_N
        sp = pack_windows_sparse(w, n_valid)
        assert sp is not None
        lo, n_idx, got_ncols, mm = sp
        args = (lo, n_idx, np.int32(n_valid), np.int32(got_ncols))
        flat = np.asarray(jax.jit(
            lambda *a: unpack_windows_sparse_jnp(*a, m=mm))(*args))
        trans = np.asarray(jax.jit(
            lambda *a: unpack_windows_sparse_t_jnp(*a, m=mm))(*args))
        np.testing.assert_array_equal(trans, flat.T)
        np.testing.assert_array_equal(flat, w)
