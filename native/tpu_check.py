"""Real-chip differential gate: every Pallas kernel family vs the jnp
Myers scan (independent algorithm) on the same device.

Interpret-mode tests cannot catch Mosaic lowering regressions, and bench
noise can hide them; this is the repeatable hardware check (``make
tpu-check``).  One process = one chip claim; all configs batched.  Exit
status is nonzero on any mismatch; the log is also written to
``native/tpu_check_last.txt`` so a green run is recorded in the repo.

Families x envelope:
  * production dispatch (candidate-bit-sliced level-NFA), all k, unroll 8/16
  * unpacked Myers pallas
  * SWAR packed Myers (pack 2 for k<=16, 4 for k<=8)
  * packed level-NFA (same packs)
over k in {2, 8, 16, 31, 32} x maxerr in {0, 1, 2, 3}, windows with N +
pad symbols and masked rows.

Usage: python native/tpu_check.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import log, setup_cache  # noqa: E402

import jax  # noqa: E402

setup_cache()

from approx_counter_tpu.kernels.bpm import (  # noqa: E402
    approx_counts,
    approx_counts_jnp,
    approx_counts_pallas,
    approx_counts_pallas_packed,
    approx_counts_pallas_sliced,
    build_peq,
)

assert jax.default_backend() not in ("cpu",), "needs the TPU"

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "tpu_check_last.txt")
lines = []


def record(msg):
    log(msg)
    lines.append(msg)


rng = np.random.default_rng(99)
C, W, m = 64, 512, 40
fails = 0
for k in (2, 8, 16, 31, 32):
    for maxerr in (0, 1, 2, 3):
        codes = rng.integers(0, 1 << min(2 * k, 63), C, dtype=np.uint64)
        hi = (codes >> np.uint64(32)).astype(np.uint32)
        lo = (codes & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        peq = build_peq(hi, lo, k)
        wins = rng.integers(0, 6, (m, W)).astype(np.uint8)  # incl. N + pad
        valid = np.ones(W, bool)
        valid[-17:] = False
        want = np.asarray(
            approx_counts_jnp(peq, wins, valid, k, maxerr=maxerr)
        )

        runs = [
            ("dispatch", lambda: approx_counts(
                peq, wins, valid, k, maxerr=maxerr, use_pallas=True)),
            ("sliced-u16", lambda: approx_counts_pallas_sliced(
                peq, wins, valid, k, ctw=8, wt=W, maxerr=maxerr,
                unroll=16)),
            ("sliced-pro", lambda: approx_counts_pallas_sliced(
                peq, wins, valid, k, ctw=8, wt=W, maxerr=maxerr,
                prologue=True)),
            ("myers", lambda: approx_counts_pallas(
                peq, wins, valid, k, ct=32, wt=W, maxerr=maxerr)),
        ]
        for pack in (2, 4):
            if k <= 32 // pack:
                runs.append((f"myers-p{pack}", lambda pack=pack:
                             approx_counts_pallas_packed(
                                 peq, wins, valid, k, ct=32, wt=W,
                                 maxerr=maxerr, pack=pack, algo="myers")))
                runs.append((f"nfa-p{pack}", lambda pack=pack:
                             approx_counts_pallas_packed(
                                 peq, wins, valid, k, ct=32, wt=W,
                                 maxerr=maxerr, pack=pack, algo="nfa")))
        for name, fn in runs:
            got = np.asarray(fn())
            ok = (want == got).all()
            fails += 0 if ok else 1
            record(f"k={k:2d} maxerr={maxerr} {name:10s}: "
                   + ("OK" if ok else f"FAIL {want[:5]} vs {got[:5]}"))

# Exact stage on hardware vs the numpy oracle: the CompareCount ranking
# rides TPU TopK lowerings (hierarchical _topk_global) that CPU tests
# never exercise.  P = 256*38 = 9728 with cap=32 activates the R=256
# two-level path.
from approx_counter_tpu.core.codec import join_code  # noqa: E402
from approx_counter_tpu.core.complexity import (  # noqa: E402
    lc_sum_threshold,
)
from approx_counter_tpu.count.exact import exact_count_select  # noqa: E402
from approx_counter_tpu.oracle import (  # noqa: E402
    oracle_count_kmers,
    oracle_get_most_frequent,
)

ke, ne, me, cape = 8, 256, 45, 32
wins_e = rng.integers(0, 4, (ne, me)).astype(np.uint8)
wins_e[1] = wins_e[0]  # counts > 1 above the count-1 tie class
out_e = exact_count_select(
    wins_e, np.int32(ne), ke, np.int32(lc_sum_threshold(100.0, ke)),
    np.zeros(0, np.uint32), np.zeros(0, np.uint32), np.int32(cape),
    np.int32(0), cap=cape, n_forbidden=0, use_solid=False,
)
got_e = list(zip(
    join_code(np.asarray(out_e["sel_hi"]),
              np.asarray(out_e["sel_lo"]))[:cape].tolist(),
    np.asarray(out_e["sel_count"])[:cape].tolist(),
))
counter_e, _ = oracle_count_kmers(list(wins_e), ke, 100.0, set())
want_e = oracle_get_most_frequent(counter_e, cape, ke)
ok = got_e == want_e
fails += 0 if ok else 1
record("exact stage (hier top-k rank) vs oracle: "
       + ("OK" if ok else "FAIL"))

# Window-transfer roundtrips on hardware: the sparse-N scatter
# (unpack_windows_sparse_jnp) and the dense two-plane unpack lower through
# Mosaic/XLA-TPU paths the CPU tests never touch.
from functools import partial  # noqa: E402

from approx_counter_tpu.core.codec import (  # noqa: E402
    BASE_N,
    BASE_PAD,
    pack_windows_host,
    pack_windows_sparse,
    unpack_windows_jnp,
    unpack_windows_sparse_jnp,
)

n_r, m_r, nv, ncols = 256, 101, 250, 100
wb = np.full((n_r, m_r), BASE_PAD, np.uint8)
wb[:nv, :ncols] = rng.integers(0, 4, (nv, ncols))
for _ in range(57):  # real N scatter indices, incl. duplicates-free edges
    wb[rng.integers(0, nv), rng.integers(0, ncols)] = BASE_N
wb[0, 0] = BASE_N
wb[nv - 1, ncols - 1] = BASE_N

sp = pack_windows_sparse(wb, nv)
assert sp is not None
lo_p, n_idx, got_ncols, _ = sp
got = np.asarray(
    jax.jit(partial(unpack_windows_sparse_jnp, m=m_r))(
        lo_p, n_idx, np.int32(nv), np.int32(got_ncols)
    )
)
ok = (got == wb).all()
fails += 0 if ok else 1
record("sparse-N window unpack roundtrip: " + ("OK" if ok else "FAIL"))

planes, _ = pack_windows_host(wb)
got = np.asarray(jax.jit(partial(unpack_windows_jnp, m=m_r))(planes))
ok = (got == wb).all()
fails += 0 if ok else 1
record("dense window unpack roundtrip:    " + ("OK" if ok else "FAIL"))

from approx_counter_tpu.core.codec import (  # noqa: E402
    unpack_windows_sparse_t_jnp,
)

got = np.asarray(
    jax.jit(partial(unpack_windows_sparse_t_jnp, m=m_r))(
        lo_p, n_idx, np.int32(nv), np.int32(got_ncols)
    )
)
ok = (got == wb.T).all()
fails += 0 if ok else 1
record("transposed sparse unpack roundtrip: " + ("OK" if ok else "FAIL"))

# ---------------------------------------------------------------------------
# Fused production pass on hardware: the ONE jit program the CLI actually
# dispatches (Engine._fused_fn: sparse unpack + exact + BPM + re-rank,
# pipeline.py) on an adversarial batch -- Ns, pad rows, duplicate-window
# count classes, boundary ties -- byte-compared against the oracle
# pipeline.  Covers the composition (and the packed single-fetch output),
# which the per-kernel differentials above cannot.
# Ref behavior preserved: approx_counter.cpp:835-955.
# ---------------------------------------------------------------------------
from approx_counter_tpu.core.complexity import adjust_threshold  # noqa: E402
from approx_counter_tpu.oracle import (  # noqa: E402
    oracle_error_count,
    oracle_sort_compare_count,
)
from approx_counter_tpu.params import Params  # noqa: E402
from approx_counter_tpu.pipeline import Engine  # noqa: E402

# two configs: k <= 16 (single-word codes) and k > 16 (two-word codes --
# exercises the packed output's sel_hi/approx_hi blocks on hardware)
for kf, slf, nf, nvf, limitf in ((8, 24, 128, 121, 37),
                                 (17, 20, 64, 59, 21)):
    wf = np.full((nf, slf + 1), BASE_PAD, np.uint8)
    wf[:nvf, :slf] = rng.integers(0, 4, (nvf, slf))
    wf[2] = wf[1]           # count-2 class
    wf[3] = wf[1]           # count-3 class member
    for _ in range(23):     # Ns inside the valid region (had_n + masking)
        wf[rng.integers(0, nvf), rng.integers(0, slf)] = BASE_N

    prmf = Params(input_file="<mem>", output="/tmp/x", k=kf, sl=slf,
                  limit=limitf, param_lc=1.0)
    lcf = adjust_threshold(1.0, 16, kf)
    windows_list = [wf[i, :slf] for i in range(nvf)]
    counter_f, had_n_f = oracle_count_kmers(windows_list, kf, lcf, set())
    sel_f = oracle_get_most_frequent(counter_f, limitf, kf)
    approx_f = oracle_error_count(windows_list, [c for c, _ in sel_f], kf)
    ranked_f = oracle_sort_compare_count(approx_f, kf)[:limitf]

    engf = Engine(prmf, use_pallas=True)
    for tag, tr, po in (("prod transposed+packed", True, True),
                        ("fallback dict layout  ", False, False)):
        engf.transposed, engf.packed_out = tr, po
        (ec, ecnt), (ac, acnt), stats = engf.start_pass(wf, nvf).finish()
        ok = (
            list(zip(ec.tolist(), ecnt.tolist())) == sel_f
            and list(zip(ac.tolist(), acnt.tolist())) == ranked_f
            and stats["had_n"] == had_n_f
        )
        fails += 0 if ok else 1
        record(f"fused pass k={kf:2d} [{tag}] vs oracle: "
               + ("OK" if ok else "FAIL"))

# ---------------------------------------------------------------------------
# Pool-path fused pass on hardware (round 5): Engine.build_pool ships the
# eligible reads' windows once; the fmt='pool' executable gathers each
# pass's batch on device from the chosen-id vector.  Byte-compared
# against the oracle on the same sample, both ends (start sl-prefix, end
# sl+1-suffix).  Ref workload: approx_counter.cpp:835-955.
# ---------------------------------------------------------------------------
from approx_counter_tpu.io.fastx import Reads as _Reads  # noqa: E402

kp, slp, n_readsp, snp, limitp = 8, 24, 60, 41, 37
lensp = rng.integers(2 * slp, 3 * slp, n_readsp)
bufp = rng.integers(0, 4, int(lensp.sum())).astype(np.uint8)
offp = np.zeros(n_readsp + 1, np.int64)
offp[1:] = np.cumsum(lensp)
for _ in range(15):
    bufp[rng.integers(0, len(bufp))] = BASE_N
readsp = _Reads(buf=bufp, offsets=offp)
prmp = Params(input_file="<mem>", output="/tmp/x", k=kp, sl=slp,
              limit=limitp, param_lc=1.0)
engp = Engine(prmp, use_pallas=True)
assert engp.build_pool(readsp, slp)
chosenp = rng.permutation(n_readsp)[:snp]
for endp in (False, True):
    (ec, ecnt), (ac, acnt), stats = engp.start_pass_pool(
        chosenp, snp, end=endp
    ).finish()
    wl = []
    for rid in chosenp:
        s = bufp[offp[rid]: offp[rid + 1]]
        wl.append(s[len(s) - 1 - slp:] if endp else s[:slp])
    lcp = adjust_threshold(1.0, 16, kp)
    cntp, had_p = oracle_count_kmers(wl, kp, lcp, set())
    selp = oracle_get_most_frequent(cntp, limitp, kp)
    rankp = oracle_sort_compare_count(
        oracle_error_count(wl, [c for c, _ in selp], kp), kp
    )[:limitp]
    ok = (
        list(zip(ec.tolist(), ecnt.tolist())) == selp
        and list(zip(ac.tolist(), acnt.tolist())) == rankp
        and stats["had_n"] == had_p
    )
    fails += 0 if ok else 1
    record(f"pool-path fused pass end={int(endp)} vs oracle: "
           + ("OK" if ok else "FAIL"))

# ---------------------------------------------------------------------------
# Mesh full step on hardware: the multihost drivers' jitted program
# (dist.mesh.make_full_step -- exact via auto-SPMD + BPM via shard_map +
# psum) on a 1-device mesh of the real chip, against the same oracle.
# CPU tests cover 1/2/4/8 virtual devices; this pins the Mosaic/XLA-TPU
# lowering of the shard_map'd production kernel.
# ---------------------------------------------------------------------------
import jax.numpy as jnp  # noqa: E402

from approx_counter_tpu.core.complexity import (  # noqa: E402
    lc_sum_threshold as _lcsum,
)
from approx_counter_tpu.dist.mesh import data_mesh, make_full_step  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as Pspec  # noqa: E402

kf, slf, nvf, limitf = 8, 24, 121, 37
mesh = data_mesh(jax.devices()[:1])
Wm = 512  # rows padded to the mesh/kernel tile
wfm = np.full((Wm, slf + 1), BASE_PAD, np.uint8)
wfm[:nvf, :slf] = rng.integers(0, 4, (nvf, slf))
wfm[2] = wfm[1]
wfm[3] = wfm[1]
for _ in range(23):
    wfm[rng.integers(0, nvf), rng.integers(0, slf)] = BASE_N
valid_m = np.zeros(Wm, bool)
valid_m[:nvf] = True
step = make_full_step(mesh, kf, cap=512, wt=Wm)
out_m = step(
    jax.device_put(jnp.asarray(wfm), NamedSharding(mesh, Pspec("data", None))),
    jax.device_put(jnp.asarray(valid_m), NamedSharding(mesh, Pspec("data"))),
    jnp.int32(_lcsum(adjust_threshold(1.0, 16, kf), kf)),
    jnp.zeros(0, jnp.uint32), jnp.zeros(0, jnp.uint32),
    jnp.int32(limitf), jnp.int32(0),
)
exm = jax.device_get(out_m["exact"])
n_keep_m = int(exm["n_keep"])
got_sel = list(zip(
    join_code(exm["sel_hi"][:n_keep_m], exm["sel_lo"][:n_keep_m]).tolist(),
    exm["sel_count"][:n_keep_m].tolist(),
))
n_am = min(int(np.asarray(out_m["approx_valid"]).sum()), limitf)
got_rank = list(zip(
    join_code(np.asarray(out_m["approx_hi"])[:n_am],
              np.asarray(out_m["approx_lo"])[:n_am]).tolist(),
    np.asarray(out_m["approx_count"])[:n_am].tolist(),
))
# oracle fixtures from the k=8 fused-gate config (first loop iteration
# above left sel_f/ranked_f at the k=17 values -- recompute for k=8)
wl8 = [wfm[i, :slf] for i in range(nvf)]
c8, _ = oracle_count_kmers(wl8, kf, adjust_threshold(1.0, 16, kf), set())
sel8 = oracle_get_most_frequent(c8, limitf, kf)
rank8 = oracle_sort_compare_count(
    oracle_error_count(wl8, [c for c, _ in sel8], kf), kf)[:limitf]
ok = got_sel == sel8 and got_rank == rank8
fails += 0 if ok else 1
record("mesh full step (shard_map+psum) vs oracle: "
       + ("OK" if ok else "FAIL"))

verdict = "PASS" if fails == 0 else f"FAIL ({fails})"
record(f"TPU-CHECK {verdict}")
with open(OUT, "w") as f:
    f.write("\n".join(lines) + "\n")
print("TPU-CHECK " + verdict)
sys.exit(1 if fails else 0)
