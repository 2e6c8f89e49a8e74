"""Randomized end-to-end fuzz sweep: N random configurations through the
full CLI pipeline (CPU), byte-compared against the pure-Python oracle of
the reference semantics.  Broader than the CI tests' fixed lattice --
run-once robustness evidence recorded in BASELINE.md.

Identity sampling (sn >= reads, equal-eligibility) makes outputs
deterministic, so parity is byte-exact (SURVEY.md §4.1).

Usage: python native/fuzz_sweep.py [n_configs] > /tmp/fuzz.log 2>&1
"""
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from approx_counter_tpu.core.codec import (  # noqa: E402
    _CHAR_TO_CODE,
    codes_to_seq,
    decode_kmers,
)
from approx_counter_tpu.core.complexity import adjust_threshold  # noqa: E402
from approx_counter_tpu.oracle import (  # noqa: E402
    oracle_count_kmers,
    oracle_error_count,
    oracle_get_most_frequent,
    oracle_get_solid_kmers,
    oracle_sort_compare_count,
)
from approx_counter_tpu.params import Params  # noqa: E402
from approx_counter_tpu.pipeline import run_pipeline  # noqa: E402


def fmt(sel, k):
    return "".join(
        f"{decode_kmers(np.array([c], np.uint64), k)[0]}\t{n}\n"
        for c, n in sel
    )


def oracle_outputs(reads, k, sl, param_lc, limit, solid_km, end, forbidden,
                   maxerr):
    lc = adjust_threshold(param_lc, 16, k)
    if end:
        windows = [
            np.frombuffer(r[len(r) - 1 - sl:].encode(), np.uint8)
            for r in reads
        ]
    else:
        windows = [np.frombuffer(r[:sl].encode(), np.uint8) for r in reads]
    windows = [_CHAR_TO_CODE[w] for w in windows]
    counter, _ = oracle_count_kmers(windows, k, lc, set(forbidden))
    if solid_km:
        sel = oracle_get_solid_kmers(counter, solid_km, k)
        sel = oracle_sort_compare_count(dict(sel), k)  # COMPAT #5 order
    else:
        sel = oracle_get_most_frequent(counter, limit, k)
    approx = oracle_error_count(windows, [c for c, _ in sel], k,
                                maxerr=maxerr)
    ranked = oracle_sort_compare_count(approx, k)[:limit]
    return fmt(sel, k), fmt(ranked, k)


def one_config(rng, tmp, idx):
    k = int(rng.integers(2, 33))
    sl = int(rng.integers(k, min(4 * k + 8, 48) + 1))
    n_reads = int(rng.integers(4, 28))
    limit = int(rng.integers(1, 40))
    solid_km = int(rng.choice([0, 0, 0, 1, 2]))
    maxerr = int(rng.choice([0, 1, 2, 3]))
    param_lc = float(rng.choice([0.5, 1.0, 2.0, 100.0]))
    n_rate = float(rng.choice([0.0, 0.0, 0.02, 0.1]))

    reads = []
    for i in range(n_reads):
        ln = int(rng.integers(2 * sl, 2 * sl + 30))
        syms = rng.integers(0, 4, ln)
        if n_rate:
            mask = rng.random(ln) < n_rate
            syms = np.where(mask, 4, syms)
        reads.append(codes_to_seq(syms.astype(np.uint8)))

    # forbidden list: a few k-mers actually present in read starts
    forbidden = []
    if rng.random() < 0.3 and sl >= k:
        for r in reads[:2]:
            km = r[:k]
            if all(c in "ACGT" for c in km):
                code = 0
                for c in km:
                    code = (code << 2) | "ACGT".index(c)
                forbidden.append(code)

    fa = os.path.join(tmp, f"f{idx}.fasta")
    with open(fa, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">r{i}\n{r}\n")
    fk = None
    if forbidden:
        fk = os.path.join(tmp, f"fk{idx}.txt")
        with open(fk, "w") as f:
            for c in forbidden:
                f.write(decode_kmers(np.array([c], np.uint64), k)[0] + "\n")

    out = os.path.join(tmp, f"o{idx}.txt")
    ex = os.path.join(tmp, f"e{idx}.txt")
    prm = Params(
        input_file=fa, output=out, exact_out=ex, k=k, sl=sl,
        sn=n_reads + 3, limit=limit, solid_km=solid_km,
        param_lc=param_lc, v=0, seed=int(rng.integers(0, 1 << 30)),
        max_error=maxerr,
    )
    if fk:
        prm.forbid_kmer = fk
    rc = run_pipeline(prm)
    assert rc == 0, (idx, rc)
    for end in (False, True):
        sfx = "_0.end" if end else "_0.start"
        want_e, want_a = oracle_outputs(
            reads, k, sl, param_lc, limit, solid_km, end, forbidden, maxerr
        )
        got_e = open(ex + sfx).read()
        got_a = open(out + sfx).read()
        cfg = dict(k=k, sl=sl, n=n_reads, lim=limit, sk=solid_km,
                   me=maxerr, lc=param_lc, nr=n_rate, fk=len(forbidden),
                   end=end)
        assert got_e == want_e, ("exact mismatch", cfg)
        assert got_a == want_a, ("approx mismatch", cfg)
    return dict(k=k, sl=sl, n=n_reads, lim=limit, sk=solid_km, me=maxerr)


def one_mode_config(rng, tmp, idx):
    """Driver-mode coverage: --stream / -mr / --from-exact / skip_end /
    compat-quirks combinations must all agree with the plain run (same
    seed, identity sampling) or with the oracle."""
    k = int(rng.integers(4, 17))
    sl = int(rng.integers(k, 2 * k + 10))
    n_reads = int(rng.integers(6, 20))
    limit = int(rng.integers(2, 25))
    seed = int(rng.integers(0, 1 << 30))
    reads = [
        codes_to_seq(rng.integers(0, 4, int(rng.integers(2 * sl,
                                                         2 * sl + 20)))
                     .astype(np.uint8))
        for _ in range(n_reads)
    ]
    fa = os.path.join(tmp, f"m{idx}.fasta")
    with open(fa, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">r{i}\n{r}\n")
    base = dict(input_file=fa, k=k, sl=sl, sn=n_reads + 3, limit=limit,
                v=0, seed=seed)

    out0 = os.path.join(tmp, f"mo{idx}.txt")
    ex0 = os.path.join(tmp, f"me{idx}.txt")
    assert run_pipeline(Params(output=out0, exact_out=ex0, **base)) == 0

    # --stream must be byte-identical at identity sampling
    out1 = os.path.join(tmp, f"ms{idx}.txt")
    assert run_pipeline(Params(output=out1, stream=True, **base)) == 0
    for end in ("start", "end"):
        assert (open(out1 + f"_0.{end}").read()
                == open(out0 + f"_0.{end}").read()), ("stream", end)

    # -mr 2: run 1 equals the single run at identity sampling (the
    # sampled set is the whole eligible set every run)
    out2 = os.path.join(tmp, f"mm{idx}.txt")
    prm2 = Params(output=out2, device_pool="off", **base)  # plane path
    #             (the pool-on run below byte-compares against this)
    prm2.nb_of_runs = 2
    assert run_pipeline(prm2) == 0
    for run in (0, 1):
        assert (open(out2 + f"_{run}.start").read()
                == open(out0 + "_0.start").read()), ("mr", run)

    # --from-exact resume reproduces the approx ranking
    out3 = os.path.join(tmp, f"mf{idx}.txt")
    prm3 = Params(output=out3, from_exact=ex0 + "_0.start", **base)
    assert run_pipeline(prm3) == 0
    assert (open(out3 + "_0.start").read()
            == open(out0 + "_0.start").read()), "from-exact"

    # skip_end: no .end file; with compat-quirks + v0 the bug runs it
    out4 = os.path.join(tmp, f"mk{idx}.txt")
    prm4 = Params(output=out4, skip_end=True, **base)
    assert run_pipeline(prm4) == 0
    assert not os.path.exists(out4 + "_0.end")
    # device pool forced on: every export byte-equal to the plane path
    out6 = os.path.join(tmp, f"mp{idx}.txt")
    prm6 = Params(output=out6, device_pool="on", **base)
    prm6.nb_of_runs = 2
    assert run_pipeline(prm6) == 0
    for run in (0, 1):
        for end in ("start", "end"):
            assert (open(out6 + f"_{run}.{end}").read()
                    == open(out2 + f"_{run}.{end}").read()), ("pool", run,
                                                              end)

    out5 = os.path.join(tmp, f"mq{idx}.txt")
    prm5 = Params(output=out5, skip_end=True, compat_quirks=True, **base)
    assert run_pipeline(prm5) == 0
    # the faithful bug re-samples the START for the second pass
    # (approx_counter.cpp:943-953); at identity sampling (sn > n_reads)
    # that start re-sample is the same set, so .end byte-equals .start
    assert (open(out5 + "_0.end").read()
            == open(out5 + "_0.start").read()), "quirk end==start"
    assert (open(out5 + "_0.start").read()
            == open(out0 + "_0.start").read()), "quirk start"
    return dict(k=k, sl=sl, n=n_reads, lim=limit)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    n_modes = int(sys.argv[2]) if len(sys.argv) > 2 else max(2, n // 6)
    rng = np.random.default_rng(20260821)
    with tempfile.TemporaryDirectory() as tmp:
        for i in range(n):
            cfg = one_config(rng, tmp, i)
            print(f"[fuzz] config {i + 1}/{n} OK: {cfg}", flush=True)
        for i in range(n_modes):
            cfg = one_mode_config(rng, tmp, 1000 + i)
            print(f"[fuzz] mode config {i + 1}/{n_modes} OK: {cfg}",
                  flush=True)
    print(f"[fuzz] ALL {n} CONFIGS + {n_modes} MODE CONFIGS BYTE-EXACT")


if __name__ == "__main__":
    main()
