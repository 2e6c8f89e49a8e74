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
    # With --compat-quirks and muted verbosity, -se still processes the end
    # (reference bug, approx_counter.cpp:943-948).
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
