"""Myers bit-parallel approximate-match kernel (the hot engine).

Replaces the reference's bidirectional FM-index + SeqAn search-scheme
``find<0,2>(..., EditDistance())`` enumeration
(/root/reference/approx_counter.cpp:531-601) with a dense, TPU-idiomatic
formulation: for every (candidate k-mer x sampled window) pair, compute the
minimum semi-global edit distance d_min of the candidate against any
substring of the window (Myers 1999 bit-parallel DP -- one uint32 word per
pair since k <= 32), then accumulate the per-window contribution

    contribution = max(0, (MAXERR+1) - d_min)

which reproduces the reference's per-error-level bit-field counting: a read
contributes one count per error level e in {0..MAXERR} at which an alignment
exists, and an alignment with exactly e ops exists iff e >= d_min (validated
against the exact-stratum DP in oracle.py; SURVEY.md §3C).

Layout (chosen for the VPU, 8x128 lanes):
  * state arrays are (Ct, Wt) uint32 -- candidates on sublanes, windows on
    lanes;
  * windows arrive transposed as [m, W] so each DP step reads one *row*
    (all windows' j-th base) -- a cheap sublane-indexed dynamic slice;
  * Peq masks live as [C, 4] uint32, one (Ct, 1) column per base, selected
    per step by comparing the broadcast window base row;
  * grid = (candidate tiles, window tiles), window-innermost so each output
    block (Ct, 1) stays resident in VMEM and accumulates across window
    tiles.

N/pad handling: window symbols >= 4 match no candidate base (Eq bit 0), so
N behaves exactly like SeqAn's Dna5 'N' vs an ACGT needle (unit mismatch
cost) and trailing padding can never lower d_min (monotonicity argument in
SURVEY.md §3C / tests).

Performance (TPU v5e, k=16, m=101, 512x40960 pairs): ~14 ms/call =
1.5 Gpairs/s = 0.15 Tcell/s.  Speed-of-light analysis: ~30 VPU ops per DP
step over (256, 512)-element tiles = 128 vregs/op; total
160 tiles x 101 steps x 30 ops x 128 vregs ~= 6e7 vreg-ops in ~1.3e7
cycles -- ~4.5 vreg-ops/cycle, i.e. at the VPU's multi-issue ceiling.
Measured variants that did NOT help: pre-converted int32 windows (-5%),
2-bit mux Eq select (noise-level), unsigned score (Mosaic lacks minui).
Further gains require fewer ops/step (e.g. 2 candidates per word needs
k <= 15 for carry guard bits -- misses the k=16 default) or pair pruning.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAXERR = 2  # reference default (approx_counter.cpp:25 -- fixed at compile
#             time there; here a static kernel parameter, 0 <= maxerr <= 3)


def build_peq(hi, lo, k: int):
    """Per-candidate Myers Peq masks, shape [C, 4] uint32.

    Bit i (LSB = first pattern base, Myers convention) of ``peq[c, b]`` is
    set iff pattern base i == b.  Pattern bases decode from the packed code
    high-bits-first (approx_counter.cpp:55-62).
    """
    hi = jnp.asarray(hi, jnp.uint32)
    lo = jnp.asarray(lo, jnp.uint32)
    bases = []
    for i in range(k):
        sh = 2 * (k - 1 - i)
        if sh >= 32:
            b = (hi >> np.uint32(sh - 32)) & np.uint32(3)
        else:
            b = (lo >> np.uint32(sh)) & np.uint32(3)
        bases.append(b)
    base = jnp.stack(bases, axis=-1)  # [C, k] uint32
    peq = []
    for c in range(4):
        bits = (base == np.uint32(c)).astype(jnp.uint32)
        mask = jnp.zeros(hi.shape, jnp.uint32)
        for i in range(k):
            mask = mask | (bits[..., i] << np.uint32(i))
        peq.append(mask)
    return jnp.stack(peq, axis=-1)  # [C, 4]


def _bpm_step(c_row, VP, VN, score, minsc, peq_cols, k: int):
    """One Myers DP step over a whole (Ct, Wt) tile.

    ``c_row``: (1, Wt) int32 window bases at text position j.
    ``peq_cols``: tuple of 4 (Ct, 1) uint32 masks.
    """
    high = np.uint32(1) << np.uint32(k - 1)
    Eq = jnp.where(
        c_row == 0,
        peq_cols[0],
        jnp.where(
            c_row == 1,
            peq_cols[1],
            jnp.where(c_row == 2, peq_cols[2],
                      jnp.where(c_row == 3, peq_cols[3], jnp.uint32(0))),
        ),
    )
    Xv = Eq | VN
    Xh = (((Eq & VP) + VP) ^ VP) | Eq
    Ph = VN | ~(Xh | VP)
    Mh = VP & Xh
    score = (
        score
        + ((Ph & high) >> np.uint32(k - 1)).astype(jnp.int32)
        - ((Mh & high) >> np.uint32(k - 1)).astype(jnp.int32)
    )
    Ph = Ph << np.uint32(1)
    Mh = Mh << np.uint32(1)
    VP = Mh | ~(Xv | Ph)
    VN = Ph & Xv
    minsc = jnp.minimum(minsc, score)
    return VP, VN, score, minsc


# ---------------------------------------------------------------------------
# Pure-jnp reference implementation (CPU tests / fallback)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("k", "maxerr"))
def approx_counts_jnp(peq, windows_t, window_valid, k: int,
                      maxerr: int = MAXERR):
    """Reference implementation: lax.scan over text positions.

    peq:          [C, 4] uint32
    windows_t:    [m, W] uint8 (transposed windows)
    window_valid: [W] bool/int
    returns       [C] int32 counts = sum_w max(0, MAXERR+1 - d_min(c, w))
    """
    C = peq.shape[0]
    W = windows_t.shape[1]
    peq_cols = tuple(peq[:, b][:, None] for b in range(4))  # (C,1) x4
    VP = jnp.full((C, W), np.uint32(0xFFFFFFFF), jnp.uint32)
    VN = jnp.zeros((C, W), jnp.uint32)
    score = jnp.full((C, W), k, jnp.int32)
    minsc = jnp.full((C, W), k, jnp.int32)

    def step(carry, c_row):
        VP, VN, score, minsc = carry
        out = _bpm_step(c_row[None, :].astype(jnp.int32), VP, VN, score, minsc,
                        peq_cols, k)
        return out, None

    (VP, VN, score, minsc), _ = jax.lax.scan(
        step, (VP, VN, score, minsc), windows_t.astype(jnp.int32)
    )
    contrib = jnp.maximum(0, (maxerr + 1) - minsc)
    contrib = contrib * window_valid.astype(jnp.int32)[None, :]
    return jnp.sum(contrib, axis=1, dtype=jnp.int32)


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------


def _bpm_kernel(peq_ref, win_ref, wvalid_ref, out_ref, *, k: int, m: int,
                maxerr: int):
    wi = pl.program_id(1)

    peq_cols = tuple(peq_ref[:, b][:, None] for b in range(4))  # (Ct,1) u32
    Ct = peq_ref.shape[0]
    Wt = win_ref.shape[1]

    VP = jnp.full((Ct, Wt), np.uint32(0xFFFFFFFF), jnp.uint32)
    VN = jnp.zeros((Ct, Wt), jnp.uint32)
    score = jnp.full((Ct, Wt), k, jnp.int32)
    minsc = jnp.full((Ct, Wt), k, jnp.int32)

    # Text loop in aligned groups of 8 rows: a bare dynamic sublane index
    # into the uint8 window buffer is rejected by Mosaic (alignment not
    # provable), and full static unrolling of ~100+ steps makes the program
    # huge and multiplies (remote) compile time.  g*8 is provably 8-aligned,
    # so load 8 rows per fori_loop iteration and unroll the 8 DP steps on
    # the loaded value.  m is padded to a multiple of 8 by the caller; pad
    # symbols never match, and trailing pad cannot lower d_min (SURVEY §3C).
    assert m % 8 == 0, m

    def group(g, carry):
        base = pl.multiple_of(g * 8, 8)
        rows = win_ref[pl.ds(base, 8), :].astype(jnp.int32)  # (8, Wt)
        for i in range(8):
            carry = _bpm_step(rows[i, :][None, :], *carry, peq_cols, k)
        return carry

    VP, VN, score, minsc = jax.lax.fori_loop(
        0, m // 8, group, (VP, VN, score, minsc)
    )
    contrib = jnp.maximum(0, (maxerr + 1) - minsc)  # (Ct, Wt) int32
    contrib = contrib * wvalid_ref[:].astype(jnp.int32)  # (1, Wt) broadcast
    partial = jnp.sum(contrib, axis=1, keepdims=True)  # (Ct, 1)

    @pl.when(wi == 0)
    def _():
        out_ref[:] = partial

    @pl.when(wi != 0)
    def _():
        out_ref[:] = out_ref[:] + partial


def _round_up(x: int, mult: int) -> int:
    return ((x + mult - 1) // mult) * mult


@functools.partial(
    jax.jit, static_argnames=("k", "ct", "wt", "interpret", "maxerr")
)
def approx_counts_pallas(
    peq, windows_t, window_valid, k: int,
    ct: int = 256, wt: int = 512, interpret: bool = False,
    maxerr: int = MAXERR,
):
    """Pallas BPM: [C,4] peq x [m,W] windows -> [C] int32 counts.

    C must be a multiple of ``ct`` and W of ``wt`` (callers pad; padded
    candidates produce garbage rows that the caller drops, padded windows
    are masked by ``window_valid``).
    """
    C = peq.shape[0]
    m, W = windows_t.shape
    assert C % ct == 0 and W % wt == 0, (C, ct, W, wt)
    if m % 8:  # pad text to the kernel's 8-row group size (symbol 5)
        windows_t = jnp.pad(windows_t, ((0, 8 - m % 8), (0, 0)),
                            constant_values=np.uint8(5))
        m = windows_t.shape[0]
    grid = (C // ct, W // wt)

    wvalid = window_valid.astype(jnp.int32).reshape(1, W)

    out = pl.pallas_call(
        functools.partial(_bpm_kernel, k=k, m=m, maxerr=maxerr),
        out_shape=jax.ShapeDtypeStruct((C, 1), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ct, 4), lambda ci, wi: (ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, wt), lambda ci, wi: (0, wi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wt), lambda ci, wi: (0, wi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ct, 1), lambda ci, wi: (ci, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=18 * C * W * m, bytes_accessed=C * 16 + m * W + 4 * C,
            transcendentals=0,
        ),
        interpret=interpret,
    )(peq.astype(jnp.uint32), windows_t, wvalid)
    return out[:, 0]


# ---------------------------------------------------------------------------
# Packed-pair Pallas kernel (k <= 16): two candidates per uint32 word
# ---------------------------------------------------------------------------
#
# For k <= 16 a candidate's Myers state needs only 16 bits, so two
# candidates ride in one uint32 (candidate 2i in bits 0..15, 2i+1 in
# 16..31).  The only carry-coupled op, (Eq & VP) + VP, becomes a SWAR
# per-field mod-2^16 addition:
#
#   sum = ((a & ~H) + (b & ~H)) ^ ((a ^ b) & H),   H = 0x80008000
#
# (low 15 bits add normally; each field's top bit is a ^ b ^ carry_in and
# the inter-field carry is discarded -- exactly mod-2^16 per field, which
# matches single-word Myers where carries beyond bit k-1 never feed back).
# Left shifts mask the bit that would leak from field A into field B.  The
# two scores share one packed int32 counter: the +-1 deltas address bits 0
# and 16 via the mask 0x00010001, and per-field borrows cannot occur
# because a Myers score is a distance and never goes negative.
# ~21 VPU ops per step per candidate vs ~30 for the unpacked kernel.


def _bpm_kernel_packed(peq_ref, win_ref, wvalid_ref, out_ref, *, k: int,
                       m: int, maxerr: int):
    wi = pl.program_id(1)

    peq_cols = tuple(peq_ref[:, b][:, None] for b in range(4))  # (Ct2,1) u32
    Ct2 = peq_ref.shape[0]
    Wt = win_ref.shape[1]

    H = np.uint32(0x80008000)
    NH = np.uint32(0x7FFF7FFF)
    LEAK = np.uint32(0xFFFEFFFE)      # clears bit 0/16 after << 1
    SBIT = np.int32(0x00010001)       # score-delta mask (bits 0 and 16)
    sh = np.uint32(k - 1)

    VP = jnp.full((Ct2, Wt), np.uint32(0xFFFFFFFF), jnp.uint32)
    VN = jnp.zeros((Ct2, Wt), jnp.uint32)
    score = jnp.full((Ct2, Wt), k * 0x00010001, jnp.int32)  # packed pair
    minA = jnp.full((Ct2, Wt), k, jnp.int32)
    minB = jnp.full((Ct2, Wt), k, jnp.int32)

    assert m % 8 == 0, m  # caller pads; see _bpm_kernel group-loading note

    def step(c_row, carry):
        VP, VN, score, minA, minB = carry
        Eq = jnp.where(
            c_row == 0, peq_cols[0],
            jnp.where(c_row == 1, peq_cols[1],
                      jnp.where(c_row == 2, peq_cols[2],
                                jnp.where(c_row == 3, peq_cols[3],
                                          jnp.uint32(0)))),
        )
        Xv = Eq | VN
        a = Eq & VP
        add = ((a & NH) + (VP & NH)) ^ ((a ^ VP) & H)
        Xh = (add ^ VP) | Eq
        Ph = VN | ~(Xh | VP)
        Mh = VP & Xh
        up = ((Ph >> sh).astype(jnp.int32)) & SBIT
        down = ((Mh >> sh).astype(jnp.int32)) & SBIT
        score = score + up - down
        sA = score & jnp.int32(0xFFFF)
        sB = score >> jnp.int32(16)
        minA = jnp.minimum(minA, sA)
        minB = jnp.minimum(minB, sB)
        Ph = (Ph << np.uint32(1)) & LEAK
        Mh = (Mh << np.uint32(1)) & LEAK
        VP = Mh | ~(Xv | Ph)
        VN = Ph & Xv
        return (VP, VN, score, minA, minB)

    def group(g, carry):
        base = pl.multiple_of(g * 8, 8)
        rows = win_ref[pl.ds(base, 8), :].astype(jnp.int32)  # (8, Wt)
        for i in range(8):
            carry = step(rows[i, :][None, :], carry)
        return carry

    VP, VN, score, minA, minB = jax.lax.fori_loop(
        0, m // 8, group, (VP, VN, score, minA, minB)
    )
    wv = wvalid_ref[:].astype(jnp.int32)  # (1, Wt)
    cA = jnp.maximum(0, (maxerr + 1) - minA) * wv
    cB = jnp.maximum(0, (maxerr + 1) - minB) * wv
    partial = jnp.concatenate(
        [jnp.sum(cA, axis=1, keepdims=True),
         jnp.sum(cB, axis=1, keepdims=True)], axis=1,
    )  # (Ct2, 2)

    @pl.when(wi == 0)
    def _():
        out_ref[:] = partial

    @pl.when(wi != 0)
    def _():
        out_ref[:] = out_ref[:] + partial


@functools.partial(
    jax.jit, static_argnames=("k", "ct", "wt", "interpret", "maxerr")
)
def approx_counts_pallas_packed(
    peq, windows_t, window_valid, k: int,
    ct: int = 256, wt: int = 512, interpret: bool = False,
    maxerr: int = MAXERR,
):
    """Packed-pair BPM for k <= 16; same contract as approx_counts_pallas.

    ``ct`` counts *candidates* (must be even); the kernel runs ct//2 packed
    words per tile.
    """
    assert k <= 16, k
    C = peq.shape[0]
    m, W = windows_t.shape
    assert C % ct == 0 and W % wt == 0 and ct % 2 == 0, (C, ct, W, wt)
    if m % 8:  # pad text to the kernel's 8-row group size (symbol 5)
        windows_t = jnp.pad(windows_t, ((0, 8 - m % 8), (0, 0)),
                            constant_values=np.uint8(5))
        m = windows_t.shape[0]
    # interleave-pack: word i = candidates (2i, 2i+1)
    peq2 = peq[0::2] | (peq[1::2] << np.uint32(16))  # [C/2, 4]
    C2, ct2 = C // 2, ct // 2
    grid = (C2 // ct2, W // wt)

    wvalid = window_valid.astype(jnp.int32).reshape(1, W)

    out = pl.pallas_call(
        functools.partial(_bpm_kernel_packed, k=k, m=m, maxerr=maxerr),
        out_shape=jax.ShapeDtypeStruct((C2, 2), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ct2, 4), lambda ci, wi: (ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, wt), lambda ci, wi: (0, wi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wt), lambda ci, wi: (0, wi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ct2, 2), lambda ci, wi: (ci, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=21 * C * W * m, bytes_accessed=C * 16 + m * W + 8 * C,
            transcendentals=0,
        ),
        interpret=interpret,
    )(peq2.astype(jnp.uint32), windows_t, wvalid)
    return out.reshape(C)  # rows (A, B) interleave back to candidate order


def approx_counts(peq, windows_t, window_valid, k: int, maxerr: int = MAXERR,
                  **kw):
    """Dispatch: packed Pallas for k <= 16 on TPU, plain Pallas for k > 16,
    jnp elsewhere (CPU tests)."""
    on_tpu = jax.default_backend() not in ("cpu",)
    if on_tpu and k <= 16:
        return approx_counts_pallas_packed(
            peq, windows_t, window_valid, k, maxerr=maxerr, **kw
        )
    if on_tpu:
        return approx_counts_pallas(
            peq, windows_t, window_valid, k, maxerr=maxerr, **kw
        )
    return approx_counts_jnp(peq, windows_t, window_valid, k, maxerr=maxerr)
