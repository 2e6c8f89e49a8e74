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


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    rng = np.random.default_rng(20260821)
    with tempfile.TemporaryDirectory() as tmp:
        for i in range(n):
            cfg = one_config(rng, tmp, i)
            print(f"[fuzz] config {i + 1}/{n} OK: {cfg}", flush=True)
    print(f"[fuzz] ALL {n} CONFIGS BYTE-EXACT vs oracle")


if __name__ == "__main__":
    main()
