"""Edge-case and quirk tests for the pipeline."""

import os

import numpy as np
import pytest

from approx_counter_tpu.core.codec import codes_to_seq
from approx_counter_tpu.params import Params
from approx_counter_tpu.pipeline import Engine, run_pipeline


def _fasta(path, seqs):
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">r{i}\n{s}\n")


def test_k_equals_sl(tmp_path, rng):
    # k == sl is allowed (validation is k > sl); every window yields
    # exactly one k-mer (start) and two (end, sl+1 window).
    k = sl = 8
    seqs = [codes_to_seq(rng.integers(0, 4, 2 * sl)) for _ in range(6)]
    fa = tmp_path / "x.fasta"
    _fasta(fa, seqs)
    prm = Params(input_file=str(fa), output=str(tmp_path / "o.txt"),
                 k=k, sl=sl, sn=10, limit=5, v=0, seed=0)
    assert run_pipeline(prm) == 0
    start = (tmp_path / "o.txt_0.start").read_text().splitlines()
    assert 1 <= len(start) <= 5


def test_reads_exactly_2sl_eligible(tmp_path, rng):
    sl = 10
    seqs = [codes_to_seq(rng.integers(0, 4, 2 * sl))]  # exactly 2*sl: eligible
    fa = tmp_path / "x.fasta"
    _fasta(fa, seqs)
    prm = Params(input_file=str(fa), output=str(tmp_path / "o.txt"),
                 k=4, sl=sl, sn=5, limit=5, v=0, seed=0)
    assert run_pipeline(prm) == 0
    assert os.path.exists(str(tmp_path / "o.txt_0.start"))


def test_all_reads_ineligible(tmp_path, rng):
    sl = 20
    seqs = [codes_to_seq(rng.integers(0, 4, 2 * sl - 1)) for _ in range(4)]
    fa = tmp_path / "x.fasta"
    _fasta(fa, seqs)
    prm = Params(input_file=str(fa), output=str(tmp_path / "o.txt"),
                 k=4, sl=sl, sn=10, limit=5, v=0, seed=0)
    assert run_pipeline(prm) == 0
    # zero windows -> empty exports
    assert (tmp_path / "o.txt_0.start").read_text() == ""


def test_compat_quirks_skip_end_bug(tmp_path, rng):
    # With --compat-quirks and muted verbosity, -se still runs a second
    # pass -- but the faithful bug (approx_counter.cpp:943-953) runs it
    # with bottom == false: it RE-SAMPLES THE START and exports those
    # counts under `.end`.  At identity sampling (sn > n_reads) the start
    # re-sample is the same read set, so `.end` must byte-equal `.start`.
    sl = 8
    seqs = [codes_to_seq(rng.integers(0, 4, 3 * sl)) for _ in range(5)]
    fa = tmp_path / "x.fasta"
    _fasta(fa, seqs)
    for quirks, expect_end in ((False, False), (True, True)):
        out = tmp_path / f"o{int(quirks)}.txt"
        prm = Params(input_file=str(fa), output=str(out), k=4, sl=sl,
                     sn=10, limit=5, v=0, seed=0, skip_end=True,
                     compat_quirks=quirks)
        assert run_pipeline(prm) == 0
        assert os.path.exists(f"{out}_0.end") == expect_end
    start = (tmp_path / "o1.txt_0.start").read_text()
    end = (tmp_path / "o1.txt_0.end").read_text()
    assert end == start
    # ... and it must NOT be a genuine end pass: suffix windows are sl+1
    # bases with different content, which differs on this fixture
    prm = Params(input_file=str(fa), output=str(tmp_path / "g.txt"),
                 k=4, sl=sl, sn=10, limit=5, v=0, seed=0)
    assert run_pipeline(prm) == 0
    genuine_end = (tmp_path / "g.txt_0.end").read_text()
    assert genuine_end != end


def test_compat_quirks_stream_end_is_start(tmp_path, rng):
    """--stream + --compat-quirks: the second reservoir samples starts
    (io/stream.py end_is_start); byte-equal at identity sampling."""
    sl = 8
    seqs = [codes_to_seq(rng.integers(0, 4, 3 * sl)) for _ in range(6)]
    fa = tmp_path / "x.fasta"
    _fasta(fa, seqs)
    prm = Params(input_file=str(fa), output=str(tmp_path / "o.txt"),
                 k=4, sl=sl, sn=10, limit=5, v=0, seed=0, skip_end=True,
                 compat_quirks=True, stream=True)
    assert run_pipeline(prm) == 0
    assert ((tmp_path / "o.txt_0.end").read_text()
            == (tmp_path / "o.txt_0.start").read_text())


def test_compat_quirks_end_is_resampled_start(tmp_path, rng):
    """Sub-identity sampling: the quirk `.end` equals the counts of a
    SECOND seeded start draw (the continued rng stream), not the first
    start sample and not an end sample (approx_counter.cpp:943-953)."""
    from approx_counter_tpu.io.export import export_counter
    from approx_counter_tpu.io.fastx import read_fastx
    from approx_counter_tpu.sample.sampler import sample_windows

    sl, k, sn, seed = 10, 5, 4, 7
    seqs = [codes_to_seq(rng.integers(0, 4, 3 * sl)) for _ in range(12)]
    fa = tmp_path / "x.fasta"
    _fasta(fa, seqs)
    prm = Params(input_file=str(fa), output=str(tmp_path / "o.txt"),
                 k=k, sl=sl, sn=sn, limit=8, v=0, seed=seed,
                 skip_end=True, compat_quirks=True)
    assert run_pipeline(prm) == 0

    # replicate the driver's rng consumption: first start draw, then the
    # quirk pass's SECOND start draw
    reads = read_fastx(str(fa))
    rng2 = np.random.default_rng(seed)
    sample_windows(reads, sn, sl, end=False, rng=rng2, pad_to=256)
    batch2 = sample_windows(reads, sn, sl, end=False, rng=rng2, pad_to=256)
    eng = Engine(prm)
    (_, _), (a_codes, a_counts), _ = eng.count_one_end(
        batch2.windows, batch2.n_valid
    )
    want = tmp_path / "want.txt"
    assert export_counter(a_codes, a_counts, k, str(want))
    assert ((tmp_path / "o.txt_0.end").read_text()
            == want.read_text())


def test_solid_mode_cap_regrowth(tmp_path, rng):
    # solid_km=1 keeps every unique k-mer: forces n_keep past the initial
    # cap so the Engine re-traces with a bigger one.
    sl, k = 40, 10
    seqs = [codes_to_seq(rng.integers(0, 4, 2 * sl)) for _ in range(40)]
    fa = tmp_path / "x.fasta"
    _fasta(fa, seqs)
    prm = Params(input_file=str(fa), output=str(tmp_path / "o.txt"),
                 exact_out=str(tmp_path / "e.txt"),
                 k=k, sl=sl, sn=100, limit=2000, solid_km=1, v=0, seed=0)
    assert run_pipeline(prm) == 0
    n_exact = len((tmp_path / "e.txt_0.start").read_text().splitlines())
    assert n_exact > 512  # exceeded the initial cap
    # counts in the exact export are all >= solid_km and sorted desc
    counts = [int(l.split("\t")[1]) for l in
              (tmp_path / "e.txt_0.start").read_text().splitlines()]
    assert min(counts) >= 1
    assert counts == sorted(counts, reverse=True)


def test_sn_clamp_persists_across_runs(tmp_path, rng, capsys):
    sl = 8
    seqs = [codes_to_seq(rng.integers(0, 4, 3 * sl)) for _ in range(3)]
    fa = tmp_path / "x.fasta"
    _fasta(fa, seqs)
    prm = Params(input_file=str(fa), output=str(tmp_path / "o.txt"),
                 k=4, sl=sl, sn=10, limit=5, v=0, seed=0, nb_of_runs=2)
    assert run_pipeline(prm) == 0
    err = capsys.readouterr().err
    # warning printed once (first run mutates sn), not twice
    assert err.count("Sequence set too small") == 1


def test_empty_fasta(tmp_path):
    fa = tmp_path / "e.fasta"
    fa.write_bytes(b"")
    prm = Params(input_file=str(fa), output=str(tmp_path / "o.txt"),
                 k=4, sl=8, sn=5, limit=5, v=0, seed=0)
    assert run_pipeline(prm) == 0
    assert (tmp_path / "o.txt_0.start").read_text() == ""
