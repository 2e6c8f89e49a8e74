"""Device window pool (round 5): byte parity vs the host-gather path.

The pool ships every eligible read's two cut windows once and gathers
each pass's batch on device from the chosen-id vector
(pipeline.Engine.build_pool / start_pass_pool).  Outputs must be
byte-identical to the per-pass host-gather path in every mode.
"""

import numpy as np
import pytest

from approx_counter_tpu.core.codec import codes_to_seq
from approx_counter_tpu.params import Params
from approx_counter_tpu.pipeline import run_pipeline


def _fasta(path, seqs):
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">r{i}\n{s}\n")


def _run_both(tmp_path, rng, name, **kw):
    """Run with pool forced on and off; compare every export byte."""
    sl = kw.pop("sl")
    n_reads = kw.pop("n_reads", 18)
    with_n = kw.pop("with_n", False)
    seqs = []
    for i in range(n_reads):
        codes = rng.integers(0, 4, int(rng.integers(2 * sl, 4 * sl)))
        s = codes_to_seq(codes)
        if with_n and i % 3 == 0:
            s = s[:sl // 2] + "N" + s[sl // 2 + 1:]
        seqs.append(s)
    seqs.append(codes_to_seq(rng.integers(0, 4, sl)))  # ineligible
    fa = tmp_path / f"{name}.fasta"
    _fasta(fa, seqs)
    outs = {}
    for mode in ("on", "off"):
        out = tmp_path / f"{name}_{mode}.txt"
        ex = tmp_path / f"{name}_{mode}_e.txt"
        prm = Params(input_file=str(fa), output=str(out),
                     exact_out=str(ex), sl=sl, v=0, device_pool=mode, **kw)
        assert run_pipeline(prm) == 0
        # contents keyed by (run/end suffix, approx-vs-exact file)
        outs[mode] = {
            p.name.split(".txt_")[1] + ("_e" if "_e." in p.name else ""):
                p.read_bytes()
            for p in tmp_path.glob(f"{name}_{mode}*.txt_*")
        }
    assert outs["on"].keys() == outs["off"].keys()
    assert len(outs["on"]) > 0
    for suffix in outs["on"]:
        assert outs["on"][suffix] == outs["off"][suffix], (name, suffix)


def test_pool_multirun_parity(tmp_path, rng):
    _run_both(tmp_path, rng, "mr", sl=10, k=6, sn=8, limit=12, seed=3,
              nb_of_runs=2)


def test_pool_identity_sampling_parity(tmp_path, rng):
    _run_both(tmp_path, rng, "ident", sl=10, k=6, sn=100, limit=12, seed=3)


def test_pool_k17_two_word_codes(tmp_path, rng):
    _run_both(tmp_path, rng, "k17", sl=20, k=17, sn=10, limit=9, seed=5,
              nb_of_runs=2)


def test_pool_with_n_symbols(tmp_path, rng):
    _run_both(tmp_path, rng, "withn", sl=12, k=5, sn=9, limit=10, seed=7,
              with_n=True, nb_of_runs=2)


def test_pool_solid_mode(tmp_path, rng):
    _run_both(tmp_path, rng, "solid", sl=10, k=4, sn=20, limit=10, seed=2,
              solid_km=1, nb_of_runs=2)


def test_pool_compat_quirks_end_is_start(tmp_path, rng):
    _run_both(tmp_path, rng, "quirk", sl=10, k=6, sn=8, limit=10, seed=4,
              skip_end=True, compat_quirks=True)


def test_pool_auto_triggers_on_multirun(tmp_path, rng, monkeypatch):
    """auto mode builds the pool for identity-sampling multi-run (pool
    bytes < per-pass planes) and skips it for a single skip_end pass."""
    import approx_counter_tpu.pipeline as pl

    built = []
    orig = pl.Engine.build_pool

    def spy(self, reads, sl, ends=("start", "end")):
        r = orig(self, reads, sl, ends=ends)
        built.append(r)
        return r

    monkeypatch.setattr(pl.Engine, "build_pool", spy)
    seqs = [codes_to_seq(rng.integers(0, 4, 40)) for _ in range(15)]
    fa = tmp_path / "a.fasta"
    _fasta(fa, seqs)
    prm = Params(input_file=str(fa), output=str(tmp_path / "o.txt"),
                 sl=10, k=6, sn=100, limit=5, v=0, seed=1, nb_of_runs=2)
    assert run_pipeline(prm) == 0
    assert built == [True]
    built.clear()
    prm = Params(input_file=str(fa), output=str(tmp_path / "o2.txt"),
                 sl=10, k=6, sn=100, limit=5, v=0, seed=1, skip_end=True)
    assert run_pipeline(prm) == 0
    assert built == []


def test_pool_solid_cap_regrowth(tmp_path, rng):
    """solid_km=1 keeps every unique k-mer: n_keep exceeds the initial
    cap, forcing _PendingPass.finish to redispatch the POOL executable at
    a regrown cap -- must still byte-match the host-gather path."""
    _run_both(tmp_path, rng, "regrow", sl=40, k=10, sn=60, limit=5000,
              seed=2, solid_km=1, nb_of_runs=2, n_reads=50)


def test_pool_sn_zero(tmp_path, rng):
    """sn=0 samples nothing; pool-mode exports must be empty like the
    host path's."""
    _run_both(tmp_path, rng, "zero", sl=10, k=4, sn=0, limit=5, seed=1,
              nb_of_runs=2)


def test_pool_skip_end_builds_start_plane_only(tmp_path, rng, monkeypatch):
    """-se (and the quirk, whose end pass re-samples the start) never
    reads the end plane: auto mode must not ship it."""
    import approx_counter_tpu.pipeline as pl

    built_ends = []
    orig = pl.Engine.build_pool

    def spy(self, reads, sl, ends=("start", "end")):
        built_ends.append(ends)
        return orig(self, reads, sl, ends=ends)

    monkeypatch.setattr(pl.Engine, "build_pool", spy)
    seqs = [codes_to_seq(rng.integers(0, 4, 40)) for _ in range(12)]
    fa = tmp_path / "a.fasta"
    _fasta(fa, seqs)
    base = dict(input_file=str(fa), sl=10, k=6, sn=100, limit=5, v=0,
                seed=1, nb_of_runs=2)
    prm = Params(output=str(tmp_path / "s.txt"), skip_end=True,
                 device_pool="on", **base)
    assert run_pipeline(prm) == 0
    prm = Params(output=str(tmp_path / "q.txt"), skip_end=True,
                 compat_quirks=True, device_pool="on", **base)
    assert run_pipeline(prm) == 0
    prm = Params(output=str(tmp_path / "b.txt"), device_pool="on", **base)
    assert run_pipeline(prm) == 0
    assert built_ends == [("start",), ("start",), ("start", "end")]
    # and the quirk's .end (a start re-sample) still byte-equals .start
    assert ((tmp_path / "q.txt_0.end").read_text()
            == (tmp_path / "q.txt_0.start").read_text())


def test_pool_large_E_int32_index_path(tmp_path, rng):
    """Pools with E >= 2^16 rows use the int32 index variant (uint16
    cannot address them); byte parity must hold there too."""
    sl, k, n_reads = 4, 3, 70000
    codes = rng.integers(0, 4, (n_reads, 2 * sl))
    lines = []
    lut = np.array(list("ACGT"))
    for i in range(n_reads):
        lines.append(f">r{i}\n{''.join(lut[codes[i]])}\n")
    fa = tmp_path / "big.fasta"
    fa.write_text("".join(lines))
    outs = {}
    for mode in ("on", "off"):
        out = tmp_path / f"big_{mode}.txt"
        prm = Params(input_file=str(fa), output=str(out), sl=sl, k=k,
                     sn=300, limit=12, v=0, seed=9, nb_of_runs=2,
                     device_pool=mode)
        assert run_pipeline(prm) == 0
        outs[mode] = {p.name.split(".txt_")[1]: p.read_bytes()
                      for p in tmp_path.glob(f"big_{mode}.txt_*")}
    assert outs["on"] == outs["off"] and len(outs["on"]) == 4
