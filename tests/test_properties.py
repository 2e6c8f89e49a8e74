"""Property tests (SURVEY.md §4.5): invariants that must hold for any input.

  * approx count(kmer) in [0, (maxerr+1) * n_valid_windows]
  * a candidate with a nonzero exact count scores the full (maxerr+1)
    contribution from every window containing it, so approx >= maxerr+1
  * forbidden and low-complexity k-mers never appear in either export
"""

import numpy as np
import pytest

from approx_counter_tpu.core.codec import (
    codes_to_seq,
    encode_kmer,
    seq_to_codes,
    split_code,
)
from approx_counter_tpu.core.complexity import adjust_threshold
from approx_counter_tpu.oracle import oracle_complexity
from approx_counter_tpu.kernels.bpm import approx_counts_jnp, build_peq
from approx_counter_tpu.params import Params
from approx_counter_tpu.pipeline import run_pipeline


def _rand_reads(rng, n, lo, hi):
    return [
        "".join("ACGT"[c] for c in rng.integers(0, 4, int(rng.integers(lo, hi))))
        for _ in range(n)
    ]


@pytest.mark.parametrize("k,maxerr", [(5, 1), (9, 2), (16, 2), (16, 3)])
def test_approx_count_bounds(k, maxerr, rng):
    C, W, m = 16, 64, 40
    codes = rng.integers(0, 1 << (2 * k), C, dtype=np.uint64)
    hi, lo = split_code(codes)
    peq = build_peq(hi, lo, k)
    wins = rng.integers(0, 6, (W, m)).astype(np.uint8)  # incl. N and pad
    valid = np.ones(W, bool)
    valid[-9:] = False
    n_valid = int(valid.sum())
    counts = np.asarray(
        approx_counts_jnp(peq, wins.T.copy(), valid, k, maxerr=maxerr)
    )
    assert (counts >= 0).all()
    assert (counts <= (maxerr + 1) * n_valid).all()


def _write_fasta(path, seqs):
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">r{i}\n{s}\n")


def test_pipeline_exact_implies_approx_floor(tmp_path, rng):
    """Every exported exact candidate occurs in >= 1 window, so its approx
    count is at least maxerr+1 (d_min == 0 there)."""
    sl, k = 30, 8
    seqs = _rand_reads(rng, 60, 2 * sl, 2 * sl + 40)
    fa = tmp_path / "r.fasta"
    _write_fasta(str(fa), seqs)
    out = tmp_path / "o.txt"
    ex = tmp_path / "e.txt"
    prm = Params(
        input_file=str(fa), output=str(out), exact_out=str(ex),
        sn=100, sl=sl, k=k, limit=50, seed=7, v=0,
    )
    assert run_pipeline(prm) == 0
    for end in ("start", "end"):
        exact = dict(
            line.split("\t")
            for line in open(f"{ex}_0.{end}").read().splitlines()
        )
        approx = dict(
            line.split("\t")
            for line in open(f"{out}_0.{end}").read().splitlines()
        )
        assert exact, "no exact candidates exported"
        for km, cnt in exact.items():
            if int(cnt) > 0 and km in approx:
                assert int(approx[km]) >= 3, (km, cnt, approx[km])


def test_pipeline_filters_exclude_forbidden_and_lc(tmp_path, rng):
    sl, k = 30, 8
    seqs = _rand_reads(rng, 60, 2 * sl, 2 * sl + 40)
    # make a couple of k-mers certain to appear, then forbid them
    seqs = [("ACGTACGT" + s) for s in seqs]
    fa = tmp_path / "r.fasta"
    _write_fasta(str(fa), seqs)
    fk = tmp_path / "fk.txt"
    forbidden = ["ACGTACGT", "CGTACGTA"]
    fk.write_text("".join(f"{s}\n" for s in forbidden))
    out = tmp_path / "o.txt"
    ex = tmp_path / "e.txt"
    lc = 1.0
    prm = Params(
        input_file=str(fa), output=str(out), exact_out=str(ex),
        sn=100, sl=sl, k=k, limit=100, seed=7, v=0,
        forbid_kmer=str(fk), param_lc=lc,
    )
    assert run_pipeline(prm) == 0
    thr = adjust_threshold(lc, 16, k)
    for path in (f"{ex}_0.start", f"{ex}_0.end", f"{out}_0.start",
                 f"{out}_0.end"):
        kmers = [ln.split("\t")[0] for ln in open(path).read().splitlines()]
        assert kmers, path
        for km in kmers:
            assert km not in forbidden, (path, km)
            code = encode_kmer(seq_to_codes(km))
            assert oracle_complexity(int(code), k) < thr, (path, km)
            assert codes_to_seq(seq_to_codes(km)) == km  # round-trip sanity
