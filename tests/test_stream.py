"""Streaming reader + reservoir sampler tests, and resume-from-exact."""

import numpy as np
import pytest

from approx_counter_tpu.core.codec import codes_to_seq
from approx_counter_tpu.io.stream import stream_sample_windows
from approx_counter_tpu.params import Params
from approx_counter_tpu.pipeline import run_pipeline


def _write_fasta(path, seqs, wrap=0):
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">r{i}\n")
            if wrap:
                for j in range(0, len(s), wrap):
                    f.write(s[j : j + wrap] + "\n")
            else:
                f.write(s + "\n")


def _write_fastq(path, seqs, wrap=0):
    def _w(s):
        if not wrap or not s:
            return s
        return "\n".join(s[j : j + wrap] for j in range(0, len(s), wrap))

    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f"@r{i}\n{_w(s)}\n+\n{_w('I' * len(s))}\n")


class TestStreamSampling:
    @pytest.mark.parametrize(
        "fmt,wrap", [("fasta", 0), ("fasta", 7), ("fastq", 0), ("fastq", 7)]
    )
    def test_identity_sample_matches_all_reads(self, tmp_path, rng, fmt, wrap):
        sl = 10
        seqs = [
            codes_to_seq(rng.integers(0, 4, int(rng.integers(2 * sl, 60))))
            for _ in range(30)
        ]
        seqs.insert(3, "ACG")  # ineligible (len < 2*sl)
        p = tmp_path / f"x.{fmt}"
        if fmt == "fasta":
            _write_fasta(str(p), seqs, wrap)
        else:
            _write_fastq(str(p), seqs, wrap)
        b_start, b_end, n_reads = stream_sample_windows(
            str(p), sn=100, sl=sl, rng=np.random.default_rng(0)
        )
        assert n_reads == 31
        eligible = [s for s in seqs if len(s) >= 2 * sl]
        assert b_start.n_valid == len(eligible)
        assert b_end.n_valid == len(eligible)
        # unified sl+1 batch width; start rows carry one inert pad column,
        # end rows are sl+1 real bases (off-by-one quirk preserved)
        assert b_start.width == sl + 1
        assert b_end.width == sl + 1
        assert (b_start.windows[: b_start.n_valid, sl] >= 5).all()
        # identity sampling: the window sets must match exactly
        want_starts = sorted(s[:sl] for s in eligible)
        got_starts = sorted(
            codes_to_seq(b_start.windows[i, :sl])
            for i in range(b_start.n_valid)
        )
        assert got_starts == want_starts
        want_ends = sorted(s[len(s) - 1 - sl :] for s in eligible)
        got_ends = sorted(
            codes_to_seq(b_end.windows[i]) for i in range(b_end.n_valid)
        )
        assert got_ends == want_ends

    def test_reservoir_uniformity(self, tmp_path):
        # Sample 2 of 10 eligible reads many times; each read should be
        # picked with roughly equal frequency.
        sl = 5
        seqs = [codes_to_seq(np.full(2 * sl, i % 4, np.uint8)) for i in range(10)]
        p = tmp_path / "u.fasta"
        _write_fasta(str(p), seqs)
        counts = np.zeros(10)
        master = np.random.default_rng(7)
        for _ in range(300):
            b, _, _ = stream_sample_windows(
                str(p), sn=2, sl=sl,
                rng=np.random.default_rng(master.integers(2**31)),
            )
            for i in range(b.n_valid):
                base = b.windows[i][0]
                hits = [j for j, s in enumerate(seqs) if s[0] == "ACGT"[base]]
                counts[hits[0] % 4] += 0  # base identifies read group of 4
        # distribution check on the selected window bases instead
        sel = np.zeros(4)
        for _ in range(300):
            b, _, _ = stream_sample_windows(
                str(p), sn=2, sl=sl,
                rng=np.random.default_rng(master.integers(2**31)),
            )
            for i in range(b.n_valid):
                sel[b.windows[i][0]] += 1
        # bases 0..3 appear in the read set with ratio 3:3:2:2 (reads 0-9)
        frac = sel / sel.sum()
        want = np.array([3, 3, 2, 2]) / 10
        assert np.all(np.abs(frac - want) < 0.08), (frac, want)

    def test_empty_and_bad_format(self, tmp_path):
        p = tmp_path / "e.fasta"
        p.write_bytes(b"")
        b, _, n = stream_sample_windows(str(p), 5, 4)
        assert n == 0 and b.n_valid == 0
        p2 = tmp_path / "bad.txt"
        p2.write_bytes(b"xyz")
        with pytest.raises(ValueError):
            stream_sample_windows(str(p2), 5, 4)


class TestNativeStreamScanner:
    """The C++ chunk parser must yield the same record sequence as the
    Python line iterators, across chunk boundaries (including 1-byte
    chunks) and EOF edge cases."""

    def _native_available(self):
        try:
            from approx_counter_tpu.io.native import _load

            _load()
            return True
        except (ImportError, OSError):
            return False

    @pytest.mark.parametrize("cs", [1, 3, 17, 4096])
    def test_differential_vs_python_iterators(self, cs):
        import io as _io

        from approx_counter_tpu.io.fastx import _TRANS
        from approx_counter_tpu.io.stream import (
            _iter_fasta,
            _iter_fastq,
            _iter_native,
        )

        if not self._native_available():
            pytest.skip("native parser not built")
        cases = [
            # FASTA: wraps, lowercase, blank line, trailing no-newline
            (b">r0\nACGT\nTTNN\n>r1\nacgt\n\n>r2\nGG", False),
            # FASTQ: CRLF, '+' with tag, final record w/ truncated quality
            (b"@a\nACGT\n+\nIIII\n@b\r\nTTTT\r\n+x\r\nJJJJ\r\n"
             b"@c\nGGGG\n+\nII", True),
            # multi-line FASTQ: wrapped seq + wrapped qual, qual lines
            # starting with '@' and '+', CRLF wraps, EOF mid-accumulation
            (b"@a\nACGT\nTTGG\nA\n+\n@IIII\n+JJ\nK\n"
             b"@b x\r\nCC\r\nGG\r\n+x\r\nII\r\nII\r\n@c\nAC\nGT", True),
            # wrapped qual split so a qual line exactly fills need at a
            # chunk edge; final record closed by a bare '+' tail at EOF
            (b"@a\nACGTT\nT\n+\nIII\nIII\n@b\nGG\nCC\n+", True),
        ]
        rng = np.random.default_rng(0)
        parts = []
        for i in range(200):
            s = bytes(rng.choice(list(b"ACGTN"), int(rng.integers(1, 200))))
            parts.append(b"@r%d\n%s\n+\n%s\n" % (i, s, b"I" * len(s)))
        cases.append((b"".join(parts), True))
        for data, fq in cases:
            it = (_iter_fastq if fq else _iter_fasta)(_io.BytesIO(data), cs)
            want = [r.translate(_TRANS) for r in it]
            got = [
                r.tobytes()
                for r in _iter_native(_io.BytesIO(data), cs)
            ]
            assert got == want, (data[:40], cs)

    def test_stream_batches_identical_to_python_path(self, tmp_path, rng):
        """Same seed => the reservoir sees the identical record stream, so
        the sampled batches must match element-for-element."""
        import approx_counter_tpu.io.native as native_mod

        if not self._native_available():
            pytest.skip("native parser not built")
        sl = 10
        seqs = [
            codes_to_seq(rng.integers(0, 4, int(rng.integers(2 * sl, 80))))
            for _ in range(300)
        ]
        p = tmp_path / "x.fastq"
        _write_fastq(str(p), seqs)
        n_b = stream_sample_windows(str(p), 50, sl,
                                    rng=np.random.default_rng(3))
        orig = native_mod._load
        native_mod._load = lambda: (_ for _ in ()).throw(ImportError("off"))
        try:
            p_b = stream_sample_windows(str(p), 50, sl,
                                        rng=np.random.default_rng(3))
        finally:
            native_mod._load = orig
        for a, b in zip(n_b, p_b):
            if isinstance(a, int):
                assert a == b
            else:
                np.testing.assert_array_equal(a.windows, b.windows)
                assert a.n_valid == b.n_valid


class TestStreamPipeline:
    def test_stream_equals_inmemory_identity(self, tmp_path, rng):
        # With sn >= reads, both paths see every eligible read; counting is
        # order-independent, so outputs must be byte-identical.
        sl, k = 12, 6
        seqs = [codes_to_seq(rng.integers(0, 4, 40)) for _ in range(20)]
        fa = tmp_path / "r.fasta"
        _write_fasta(str(fa), seqs)
        outs = {}
        for mode in ("mem", "stream"):
            prm = Params(
                input_file=str(fa),
                output=str(tmp_path / f"{mode}.txt"),
                k=k, sl=sl, sn=100, limit=10, v=0, seed=1,
                stream=mode == "stream",
            )
            assert run_pipeline(prm) == 0
            outs[mode] = (
                (tmp_path / f"{mode}.txt_0.start").read_bytes(),
                (tmp_path / f"{mode}.txt_0.end").read_bytes(),
            )
        assert outs["mem"] == outs["stream"]


class TestResume:
    def test_from_exact_matches_full_run(self, tmp_path, rng):
        sl, k = 12, 6
        seqs = [codes_to_seq(rng.integers(0, 4, 40)) for _ in range(20)]
        fa = tmp_path / "r.fasta"
        _write_fasta(str(fa), seqs)
        full = Params(
            input_file=str(fa), output=str(tmp_path / "full.txt"),
            exact_out=str(tmp_path / "ex.txt"), k=k, sl=sl, sn=100,
            limit=10, v=0, seed=1,
        )
        assert run_pipeline(full) == 0
        resumed = Params(
            input_file=str(fa), output=str(tmp_path / "res.txt"),
            from_exact=str(tmp_path / "ex.txt_0.start"), k=k, sl=sl,
            sn=100, limit=10, v=0, seed=1,
        )
        assert run_pipeline(resumed) == 0
        # start end: same candidates, identity sampling -> identical approx
        assert (tmp_path / "res.txt_0.start").read_bytes() == (
            tmp_path / "full.txt_0.start"
        ).read_bytes()

    def test_from_exact_rejects_wrong_k(self, tmp_path):
        p = tmp_path / "bad.start"
        p.write_text("ACGT\t5\n")
        prm = Params(input_file="x", from_exact=str(p), k=6)
        from approx_counter_tpu.io.export import parse_exact_export

        with pytest.raises(ValueError):
            parse_exact_export(str(p), 6)
