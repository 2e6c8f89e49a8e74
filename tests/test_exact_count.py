"""Differential tests: exact_count_select vs the NumPy oracle (SURVEY §4.2)."""

import numpy as np
import pytest

from approx_counter_tpu.core.codec import BASE_PAD, encode_kmer, join_code
from approx_counter_tpu.core.complexity import lc_sum_threshold
from approx_counter_tpu.count.exact import exact_count_select
from approx_counter_tpu.oracle import (
    oracle_count_kmers,
    oracle_get_most_frequent,
    oracle_get_solid_kmers,
)


def _run(windows, n_valid, k, lc_thr, forbidden, limit, solid_km, cap=64):
    fhi = (forbidden >> np.uint64(32)).astype(np.uint32)
    flo = (forbidden & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    out = exact_count_select(
        windows,
        np.int32(n_valid),
        k,
        np.int32(lc_sum_threshold(lc_thr, k)),
        fhi,
        flo,
        np.int32(limit),
        np.int32(solid_km),
        cap=cap,
        n_forbidden=len(forbidden),
        use_solid=solid_km > 0,
    )
    n = int(out["n_keep"])
    codes = join_code(np.asarray(out["sel_hi"]), np.asarray(out["sel_lo"]))[:n]
    counts = np.asarray(out["sel_count"])[:n]
    assert bool(np.all(np.asarray(out["sel_valid"])[:n]))
    return codes, counts, out


@pytest.mark.parametrize("k", [2, 3, 16, 17, 32])
def test_top_mode_matches_oracle(k, rng):
    n, m = 12, 40
    windows = rng.integers(0, 4, (n, m)).astype(np.uint8)
    # sprinkle Ns and duplicate rows for count ties
    windows[rng.random((n, m)) < 0.05] = 4
    windows[5] = windows[2]
    windows[7] = windows[2]
    lc_thr = 1.0 * ((k - 1) ** 2 / 15.0**2)
    want_counter, want_had_n = oracle_count_kmers(
        list(windows), k, lc_thr, set()
    )
    want = oracle_get_most_frequent(want_counter, 20, k)

    # pad rows like the sampler does
    padded = np.concatenate(
        [windows, np.full((4, m), BASE_PAD, np.uint8)], axis=0
    )
    codes, counts, out = _run(
        padded, n, k, lc_thr, np.empty(0, np.uint64), 20, 0
    )
    assert int(out["had_n"]) == want_had_n
    assert list(zip(codes.tolist(), counts.tolist())) == want


def test_forbidden_and_solid(rng):
    k, n, m = 4, 10, 30
    windows = rng.integers(0, 4, (n, m)).astype(np.uint8)
    # forbid the overall most frequent kmer
    counter, _ = oracle_count_kmers(list(windows), k, 100.0, set())
    top = oracle_get_most_frequent(counter, 1, k)[0][0]
    forbidden = {int(top), encode_kmer("ACGT")}
    want_counter, _ = oracle_count_kmers(list(windows), k, 100.0, forbidden)
    want_solid = oracle_get_solid_kmers(want_counter, 3, k)

    codes, counts, out = _run(
        windows, n, k, 100.0, np.array(sorted(forbidden), np.uint64), 5, 3
    )
    assert list(zip(codes.tolist(), counts.tolist())) == want_solid
    assert int(top) not in codes.tolist()


def test_all_a_run_vs_invalid_coalescing(rng):
    """Invalid positions sort as code 0 (all-A) and are corrected out of
    the first run -- real poly-A counts must survive exactly, next to Ns,
    pad rows and pad columns."""
    k, n, m = 4, 8, 24
    windows = rng.integers(0, 4, (n, m)).astype(np.uint8)
    windows[0, :10] = 0          # a genuine poly-A stretch: 7 AAAA k-mers
    windows[1, 3] = 4            # Ns make invalid positions
    windows[2, :] = 4
    windows[3, -5:] = BASE_PAD   # pad columns = the window ends 5 bases early
    lc = 1000.0                  # keep poly-A past the LC filter
    oracle_rows = list(windows[:3]) + [windows[3, :-5]] + list(windows[4:])
    want_counter, want_had_n = oracle_count_kmers(oracle_rows, k, lc, set())
    want = oracle_get_most_frequent(want_counter, 30, k)
    padded = np.concatenate(
        [windows, np.full((2, m), BASE_PAD, np.uint8)], axis=0
    )
    codes, counts, out = _run(
        padded, n, k, lc, np.empty(0, np.uint64), 30, 0, cap=128
    )
    assert int(out["had_n"]) == want_had_n
    assert list(zip(codes.tolist(), counts.tolist())) == want
    assert encode_kmer("AAAA") in codes.tolist()


def test_all_invalid_batch():
    """Every position invalid: the code-0 run must vanish entirely."""
    k = 4
    windows = np.full((6, 20), 4, np.uint8)  # all N
    codes, counts, out = _run(
        windows, 6, k, 1000.0, np.empty(0, np.uint64), 10, 0
    )
    assert int(out["n_unique"]) == 0
    assert len(codes) == 0


def test_limit_truncation(rng):
    k, n, m = 6, 8, 30
    windows = rng.integers(0, 4, (n, m)).astype(np.uint8)
    counter, _ = oracle_count_kmers(list(windows), k, 100.0, set())
    want = oracle_get_most_frequent(counter, 7, k)
    codes, counts, _ = _run(
        windows, n, k, 100.0, np.empty(0, np.uint64), 7, 0
    )
    assert len(codes) == 7
    assert list(zip(codes.tolist(), counts.tolist())) == want


def test_boundary_tie_class_straddles_cap(rng):
    """The top-k ranking path's hard case: a huge count-1 tie class (same
    count, many sharing dimer sums) straddling the cap boundary -- byte
    parity demands exactly the code-desc winners of the class, the case a
    naive single top_k cannot get right."""
    k, n, m = 8, 48, 60
    # mostly-unique random windows: thousands of count-1 k-mers
    windows = rng.integers(0, 4, (n, m)).astype(np.uint8)
    # a few forced repeats so some counts > 1 exist above the class
    windows[1] = windows[0]
    windows[2] = windows[0]
    cap = 32
    counter, _ = oracle_count_kmers(list(windows), k, 100.0, set())
    want = oracle_get_most_frequent(counter, cap, k)
    codes, counts, out = _run(
        windows, n, k, 100.0, np.empty(0, np.uint64), cap, 0, cap=cap
    )
    # P = 48*53 = 2544 > 2*cap -> the _topk_rank path is active
    assert list(zip(codes.tolist(), counts.tolist())) == want


def test_topk_rank_all_a_boundary(rng):
    """Code 0 (all-A) inside the boundary class: the documented corner
    where the class's minimum code is a winner only when the whole class
    fits -- must still match the oracle byte-for-byte."""
    k = 4
    # build windows from a small alphabet region so the distinct k-mer set
    # is tiny and includes AAAA; every k-mer lands at count >= 1
    n, m = 20, 40
    windows = rng.integers(0, 2, (n, m)).astype(np.uint8)  # A/C only
    windows[0, :10] = 0  # a run of As
    for cap in (8, 16):
        counter, _ = oracle_count_kmers(list(windows), k, 1000.0, set())
        want = oracle_get_most_frequent(counter, cap, k)
        codes, counts, _ = _run(
            windows, n, k, 1000.0, np.empty(0, np.uint64), cap, 0, cap=cap
        )
        assert list(zip(codes.tolist(), counts.tolist())) == want


def test_hierarchical_topk_path_matches_oracle(rng):
    """Exercise the 2-level _topk_global path (P % 64 == 0 and
    P // 64 >= cap -- small tests fall back to flat top_k) with a huge
    count-1 boundary tie class: byte parity vs the oracle."""
    from approx_counter_tpu.count.exact import _topk_global

    k, n, m, cap = 8, 256, 45, 32
    p = m - k + 1  # 38; P = 256*38 = 9728 = 64*152 >= 64*cap
    windows = rng.integers(0, 4, (n, m)).astype(np.uint8)
    windows[1] = windows[0]  # some counts > 1
    P = n * p
    assert P % 64 == 0 and P // 64 >= cap
    counter, _ = oracle_count_kmers(list(windows), k, 100.0, set())
    want = oracle_get_most_frequent(counter, cap, k)
    codes, counts, _ = _run(
        windows, n, k, 100.0, np.empty(0, np.uint64), cap, 0, cap=cap
    )
    assert list(zip(codes.tolist(), counts.tolist())) == want

    # _topk_global returns exactly the flat top_k VALUES (tie membership
    # may differ; values must not)
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(
        rng.integers(-50, 50, 64 * 40).astype(np.int32)  # dense ties
    )
    v_h, i_h = _topk_global(x, 37)
    v_f, _ = jax.lax.top_k(x, 37)
    np.testing.assert_array_equal(np.asarray(v_h), np.asarray(v_f))
    np.testing.assert_array_equal(np.asarray(x)[np.asarray(i_h)],
                                  np.asarray(v_h))


class TestTransposedExact:
    @pytest.mark.parametrize("k", [6, 16, 20])
    def test_transposed_layout_matches(self, k, rng):
        """exact_count_select_rows(transposed=True) on the [m, n] layout
        must reproduce the [n, m] result exactly (round-4 fused pass)."""
        from approx_counter_tpu.core.complexity import lc_sum_threshold
        from approx_counter_tpu.count.exact import exact_count_select_rows

        n, m = 48, 40
        w = rng.integers(0, 4, (n, m)).astype(np.uint8)
        w[3, 5] = 4  # an N
        w[:, m - 1] = 5  # trailing pad column (start-batch shape)
        row_mask = np.ones(n, bool)
        row_mask[-6:] = False
        thr = np.int32(lc_sum_threshold(1.0, k))
        fhi = np.zeros(0, np.uint32)
        flo = np.zeros(0, np.uint32)
        kw = dict(cap=64, n_forbidden=0, use_solid=False)
        a = exact_count_select_rows(
            w, row_mask, k, thr, fhi, flo, np.int32(20), np.int32(0), **kw)
        b = exact_count_select_rows(
            np.ascontiguousarray(w.T), row_mask, k, thr, fhi, flo,
            np.int32(20), np.int32(0), transposed=True, **kw)
        for key in ("sel_hi", "sel_lo", "sel_count", "sel_valid",
                    "n_unique", "n_pass", "n_keep", "had_n"):
            np.testing.assert_array_equal(
                np.asarray(a[key]), np.asarray(b[key]), err_msg=key)


def test_topk_rank_rowsort_matches_full_sort(rng):
    """The round-5 fused selection (_topk_rank_rowsort: one batched
    composite row sort) must return exactly the full-sort prefix on
    random, tie-heavy, and all-count-0 inputs -- same contract as
    _topk_rank."""
    for P in (4096, 4095):  # 4095: odd P -> the R=1 full-sort fallback
        _rowsort_fixtures(rng, P, cap=64)


def _rowsort_fixtures(rng, P, cap):
    import jax
    import jax.numpy as jnp

    from approx_counter_tpu.count.exact import (
        _topk_rank,
        _topk_rank_rowsort,
    )

    fixtures = []
    key1 = rng.integers(0, 1 << 31, P).astype(np.uint32)
    s_lo = rng.integers(0, 1 << 32, P, dtype=np.uint64).astype(np.uint32)
    fixtures.append((key1, s_lo))                       # random
    key1_t = np.full(P, 7, np.uint32)                   # one giant tie class
    fixtures.append((key1_t, s_lo))
    key1_b = key1.copy()
    key1_b[: P // 2] = 5                                # class straddles cap
    fixtures.append((key1_b, s_lo))
    key1_0 = np.full(P, 0xFFFFFFF0, np.uint32)          # all count-0-like
    fixtures.append((key1_0, s_lo))
    dup_lo = s_lo.copy()
    dup_lo[::3] = dup_lo[0]                             # duplicate codes
    fixtures.append((key1_t, dup_lo))

    for key1_f, lo_f in fixtures:
        k1 = jnp.asarray(key1_f)
        lo = jnp.asarray(lo_f)
        w1, w4 = jax.lax.sort([k1, ~lo], num_keys=2)    # exact reference
        g1, g4 = _topk_rank_rowsort(k1, lo, cap)
        np.testing.assert_array_equal(np.asarray(g1), np.asarray(w1)[:cap])
        np.testing.assert_array_equal(np.asarray(g4), np.asarray(w4)[:cap])
        h1, h4 = _topk_rank(k1, lo, cap)
        np.testing.assert_array_equal(np.asarray(h1), np.asarray(w1)[:cap])
        np.testing.assert_array_equal(np.asarray(h4), np.asarray(w4)[:cap])
