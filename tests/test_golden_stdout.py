"""Golden stdout/stderr transcription tests.

The expected line sequences below are HAND-DERIVED from the reference
driver (/root/reference/approx_counter.cpp:793-955), its sampler
(:415-476), its counter (:487-519) and its hot engine (:536-549) -- NOT
captured from this repo.  They end the repo-vs-repo-only stdout testing
that let transcription gaps survive (round-4 verdict: the three
errorCount stage lines and the sampler's v>=2 short-read warning were
silently absent for four rounds).

Fixture chosen so every number is hand-checkable:
  * k = sl = 16, lc = 100 (no LC rejection), limit = 500, sn = 10
  * reads r0..r2: "ACGTACGT"*4 (32 bases, eligible: len >= 2*sl)
      - start window = first 16 bases -> exactly ONE distinct 16-mer
      - end window   = seq[15:32] (17 bases, the sl+1 off-by-one)
        -> 16-mers at offsets 0 and 1 -> TWO distinct
  * r3: "ACGT" (4 < sl: walked but never sampled; at v>=2 it emits the
    per-read short-read warning, approx_counter.cpp:449-457)
  * r4: "ACGTACGT"*2+"ACGT" (20 bases: sl <= 20 < 2*sl -- ineligible,
    and NOT short enough to warn)
  * sn=10 > 5 reads -> the clamp-by-mutation stderr warning pair (:844-848)
"""

import re

import numpy as np
import pytest

from approx_counter_tpu.params import Params
from approx_counter_tpu.pipeline import run_pipeline

TS = re.compile(r"^\[[0-9.e+-]+ ms\]\t")


def strip_ts(text: str) -> list[str]:
    """Drop the ``[<ms> ms]\\t`` prefix (timestamps vary); keep nesting
    tabs and non-timestamped lines verbatim."""
    return [TS.sub("", ln) for ln in text.splitlines()]


@pytest.fixture()
def fixture_fasta(tmp_path):
    reads = ["ACGTACGT" * 4, "ACGTACGT" * 4, "ACGTACGT" * 4,
             "ACGT", "ACGTACGT" * 2 + "ACGT"]
    fa = tmp_path / "g.fasta"
    with open(fa, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">r{i}\n{r}\n")
    return str(fa)


def _params(fixture_fasta, tmp_path, **kw):
    base = dict(input_file=fixture_fasta, output=str(tmp_path / "o.txt"),
                exact_out=str(tmp_path / "e.txt"), k=16, sl=16, sn=10,
                limit=500, param_lc=100.0, seed=3)
    base.update(kw)
    return Params(**base)


# Reference v=1 stdout, one run, both ends, -e set.  Sources:
#   param echo        approx_counter.cpp:793-808
#   parse/count lines :817-830
#   per-end block     :858-934 (main) + :436-474 (sampleSequences)
#   errorCount lines  :536-549
ECHO = [
    "Kmer size:             16",
    "Sampled sequences:     10",
    "Sampling length        16",
    "LC filter threshold:   100",
    "Adjusted LC threshold: 100",
    "Nb thread:             4",
    "Number of kept kmer:   500",
]


def _end_block(which: str, n_unique: int) -> list[str]:
    sampling_line = ("Sampling the ends of reads" if which == "end"
                     else "Sampling the start of reads")
    return [
        f"Working on sequence {which}.",
        "\tSampling",
        f"\t{sampling_line}",
        "\tSampled 3 sequences",
        "\tExact k-mer count",
        f"\tNumber of kmer found: {n_unique}",
        "\tKeeping most frequent k-mer",
        f"\tNumber of kmer kept:  {n_unique}",
        "\tExporting exact kmer count",
        "\tApproximate k-mer count",
        "\tPreparing index",
        "\tCreating index",
        "\tStarting approximate counting",
        "\tExporting approximate count",
        "\tDone",
    ]


GOLDEN_V1 = (
    ECHO
    + ["Number of runs:        1", "Verbosity level:       1"]
    + ["Parsing FASTA file", "Number of sequences found: 5."]
    + _end_block("start", 1)
    + _end_block("end", 2)
)

GOLDEN_STDERR_V1 = [
    "/!\\ WARNING: Sequence set too small for the requested sample size",
    "/!\\ WARNING: The whole set will be used.",
]

SHORT_READ_WARNING = (
    "/!\\ WARNING: Cut size is longer that current read! (read id: 3)."
)


def test_golden_v1(fixture_fasta, tmp_path, capsys):
    assert run_pipeline(_params(fixture_fasta, tmp_path, v=1)) == 0
    cap = capsys.readouterr()
    assert strip_ts(cap.out) == GOLDEN_V1
    assert cap.err.splitlines() == GOLDEN_STDERR_V1


def test_golden_v2(fixture_fasta, tmp_path, capsys):
    """v=2 = the v=1 sequence + the documented [stats] extension line per
    pass (COMPAT.md extensions) + the per-read short-read warning on
    stderr (approx_counter.cpp:449-457; read 3 is walked by both
    sampling passes since sn exceeds the eligible count)."""
    assert run_pipeline(_params(fixture_fasta, tmp_path, v=2)) == 0
    cap = capsys.readouterr()
    lines = strip_ts(cap.out)
    stats = [ln for ln in lines if "[stats]" in ln]
    golden = [ln.replace("Verbosity level:       1",
                         "Verbosity level:       2") for ln in GOLDEN_V1]
    assert [ln for ln in lines if "[stats]" not in ln] == golden
    assert len(stats) == 2  # one per pass, the documented v>=2 extension
    assert cap.err.splitlines() == (
        GOLDEN_STDERR_V1 + [SHORT_READ_WARNING, SHORT_READ_WARNING]
    )


def test_golden_multirun_muted(fixture_fasta, tmp_path, capsys):
    """-mr 2 with v=1 mutes mr_v (approx_counter.cpp:771-775): only the
    v>0 skeleton prints; 'A total of...' and 'Starting run number N' are
    plain cout lines without the [ms] stamp (:814, :839-841)."""
    assert run_pipeline(_params(fixture_fasta, tmp_path, v=1,
                                nb_of_runs=2)) == 0
    cap = capsys.readouterr()
    assert strip_ts(cap.out) == (
        ECHO
        + ["Number of runs:        2", "Verbosity level:       1",
           "", "A total of 2 runs will be performed.",
           "Parsing FASTA file", "Number of sequences found: 5.",
           "Starting run number 1",
           "Working on sequence start.", "Working on sequence end.",
           "Starting run number 2",
           "Working on sequence start.", "Working on sequence end."]
    )


def test_golden_forbidden_line(fixture_fasta, tmp_path, capsys):
    """-fk prints 'Parsing the fobidden kmer list' (typo preserved,
    :767) UNCONDITIONALLY (not v-gated) before the parameter echo."""
    fk = tmp_path / "fk.txt"
    fk.write_text("ACGTACGTACGTACGT\n")
    assert run_pipeline(_params(fixture_fasta, tmp_path, v=1,
                                forbid_kmer=str(fk))) == 0
    lines = strip_ts(capsys.readouterr().out)
    assert lines[0] == "Parsing the fobidden kmer list"
    assert lines[1:][: len(ECHO)] == ECHO
    # v=0: the line still prints (reference behavior)
    assert run_pipeline(_params(fixture_fasta, tmp_path, v=0,
                                forbid_kmer=str(fk),
                                output=str(tmp_path / "o2.txt"))) == 0
    lines = strip_ts(capsys.readouterr().out)
    assert lines == ["Parsing the fobidden kmer list"]


def test_golden_skip_end(fixture_fasta, tmp_path, capsys):
    """-se with live verbosity: start block, then the 'Skipping end
    adapter ressearch' line (typo preserved, :945-947) at tab 0, no end
    pass."""
    assert run_pipeline(_params(fixture_fasta, tmp_path, v=1,
                                skip_end=True)) == 0
    cap = capsys.readouterr()
    assert strip_ts(cap.out) == (
        ECHO
        + ["Number of runs:        1", "Verbosity level:       1"]
        + ["Parsing FASTA file", "Number of sequences found: 5."]
        + _end_block("start", 1)
        + ["Skipping end adapter ressearch"]
    )
