"""IO layer tests: FASTA/FASTQ parsing (Python + native parity), config
grammar, exporter bytes, forbidden-k-mer list."""

import subprocess

import numpy as np
import pytest

from approx_counter_tpu.config.conf import parse_config
from approx_counter_tpu.core.codec import encode_kmer
from approx_counter_tpu.io.export import export_counter
from approx_counter_tpu.io.fastx import read_fastx_py
from approx_counter_tpu.io.kmer_list import parse_kmer_list


FASTA = b">r0 desc\nACGT\nacgt\n>r1\nNNTT\n>empty\n>r3\nACGTACGTXX\n"
FASTQ = b"@r0\nACGTN\n+\nIIIII\n@r1\nttgg\n+ junk\nIIII\n"
# Wrapped (multi-line) records like SeqAn readRecords accepts
# (approx_counter.cpp:824-825): seq spans lines until '+', quality consumed
# by length and may start with '@' or '+'.
FASTQ_ML = (
    b"@r0\nACG\nTN\n+\n@II\n+I\n"
    b"@r1 tag\r\ntt\r\ngg\r\n+ junk\r\nII\r\nII\r\n"
    b"@r2\nAAAA\n+\nIIII\n"
)


@pytest.fixture(scope="session")
def native_lib():
    r = subprocess.run(["make", "-s", "native/libfastx.so"], cwd="/root/repo")
    if r.returncode != 0:
        pytest.skip("native build failed")
    from approx_counter_tpu.io.native import read_fastx_native

    return read_fastx_native


class TestFastx:
    def test_fasta_py(self, tmp_path):
        p = tmp_path / "a.fasta"
        p.write_bytes(FASTA)
        r = read_fastx_py(str(p))
        assert len(r) == 4
        np.testing.assert_array_equal(r.read(0), [0, 1, 2, 3, 0, 1, 2, 3])
        np.testing.assert_array_equal(r.read(1), [4, 4, 3, 3])
        assert len(r.read(2)) == 0
        np.testing.assert_array_equal(r.read(3)[-2:], [4, 4])

    def test_fastq_py(self, tmp_path):
        p = tmp_path / "a.fastq"
        p.write_bytes(FASTQ)
        r = read_fastx_py(str(p))
        assert len(r) == 2
        np.testing.assert_array_equal(r.read(0), [0, 1, 2, 3, 4])
        np.testing.assert_array_equal(r.read(1), [3, 3, 2, 2])

    def test_fastq_multiline_py(self, tmp_path):
        p = tmp_path / "ml.fastq"
        p.write_bytes(FASTQ_ML)
        r = read_fastx_py(str(p))
        assert len(r) == 3
        np.testing.assert_array_equal(r.read(0), [0, 1, 2, 3, 4])
        np.testing.assert_array_equal(r.read(1), [3, 3, 2, 2])
        np.testing.assert_array_equal(r.read(2), [0, 0, 0, 0])

    def test_fastq_qual_length_mismatch(self, tmp_path):
        p = tmp_path / "bad.fastq"
        p.write_bytes(b"@r0\nACGT\n+\nIIIII\n@r1\nTT\n+\nII\n")
        with pytest.raises(ValueError, match="quality length mismatch"):
            read_fastx_py(str(p))

    def test_fastq_truncated_no_plus(self, tmp_path):
        p = tmp_path / "tr.fastq"
        p.write_bytes(b"@r0\nACGT\nTTTT\n")
        with pytest.raises(ValueError, match="truncated record"):
            read_fastx_py(str(p))

    def test_crlf(self, tmp_path):
        p = tmp_path / "crlf.fasta"
        p.write_bytes(b">r0\r\nACGT\r\nTT\r\n")
        r = read_fastx_py(str(p))
        np.testing.assert_array_equal(r.read(0), [0, 1, 2, 3, 3, 3])

    @pytest.mark.parametrize(
        "data,name",
        [(FASTA, "a.fasta"), (FASTQ, "a.fastq"), (FASTQ_ML, "ml.fastq")],
    )
    def test_native_matches_python(self, tmp_path, native_lib, data, name):
        p = tmp_path / name
        p.write_bytes(data)
        py = read_fastx_py(str(p))
        nat = native_lib(str(p))
        np.testing.assert_array_equal(py.buf, nat.buf)
        np.testing.assert_array_equal(py.offsets, nat.offsets)

    def test_native_random_roundtrip(self, tmp_path, native_lib, rng):
        lines = []
        for i in range(50):
            L = int(rng.integers(0, 300))
            seq = "".join("ACGTN"[c] for c in rng.integers(0, 5, L))
            # random line wrapping
            w = int(rng.integers(10, 80))
            wrapped = "\n".join(seq[j : j + w] for j in range(0, max(L, 1), w))
            lines.append(f">read{i} desc stuff\n{wrapped}\n")
        p = tmp_path / "big.fasta"
        p.write_text("".join(lines))
        py = read_fastx_py(str(p))
        nat = native_lib(str(p))
        np.testing.assert_array_equal(py.buf, nat.buf)
        np.testing.assert_array_equal(py.offsets, nat.offsets)

    def test_native_random_multiline_fastq(self, tmp_path, native_lib, rng):
        """Random wrapped FASTQ (wrapped seq + qual, '@'/'+'-leading qual
        chars): native == Python, and both equal the unwrapped parse."""
        recs = []
        flat = []
        for i in range(40):
            L = int(rng.integers(0, 200))
            seq = "".join("ACGTN"[c] for c in rng.integers(0, 5, L))
            qual = "".join(
                chr(33 + int(c)) for c in rng.integers(0, 60, L)
            )
            w = int(rng.integers(5, 50))
            sw = "\n".join(seq[j : j + w] for j in range(0, max(L, 1), w))
            qw = "\n".join(qual[j : j + w] for j in range(0, max(L, 1), w))
            recs.append(f"@read{i} x\n{sw}\n+read{i}\n{qw}\n")
            flat.append(f"@read{i} x\n{seq}\n+\n{qual}\n")
        p = tmp_path / "ml.fastq"
        p.write_text("".join(recs))
        pf = tmp_path / "flat.fastq"
        pf.write_text("".join(flat))
        py = read_fastx_py(str(p))
        nat = native_lib(str(p))
        ref = read_fastx_py(str(pf))
        for other in (nat, ref):
            np.testing.assert_array_equal(py.buf, other.buf)
            np.testing.assert_array_equal(py.offsets, other.offsets)

    def test_native_missing_file(self, native_lib):
        with pytest.raises(FileNotFoundError):
            native_lib("/nonexistent/file.fasta")

    def test_native_gather_matches_numpy(self, native_lib, rng):
        """gather_windows_native == numpy fancy-indexing gather (the
        sampler's fallback path), including the untouched pad column."""
        from approx_counter_tpu.core.codec import BASE_PAD
        from approx_counter_tpu.io.native import gather_windows_native

        buf = rng.integers(0, 5, 10_000).astype(np.uint8)
        starts = rng.integers(0, len(buf) - 64, 200).astype(np.int64)
        for ncols in (1, 7, 64):
            want = np.full((256, 65), BASE_PAD, np.uint8)
            want[:200, :ncols] = buf[starts[:, None] + np.arange(ncols)]
            got = np.full((256, 65), BASE_PAD, np.uint8)
            gather_windows_native(buf, starts, ncols, got)
            np.testing.assert_array_equal(got, want)
        out = np.full((4, 8), BASE_PAD, np.uint8)
        gather_windows_native(buf, np.empty(0, np.int64), 8, out)
        assert (out == BASE_PAD).all()


class TestConfig:
    def test_grammar(self, tmp_path):
        p = tmp_path / "c.txt"
        p.write_text("# comment\nk = 12\n sl=40 \npath=/a b/c\nnoval\n\nx=#1\n")
        cfg = parse_config(str(p))
        assert cfg["k"] == "12"
        assert cfg["sl"] == "40"
        assert cfg["path"] == "/ab/c"  # spaces stripped even inside values
        assert cfg["noval"] == ""
        assert cfg[""] == ""  # empty line -> params[""] = "" like the ref
        assert cfg["x"] == "#1"  # '#' only comments at line start
    def test_missing_file(self, capsys):
        cfg = parse_config("/nonexistent")
        assert cfg == {}
        assert "Could not open config file" in capsys.readouterr().err


class TestExport:
    def test_bytes(self, tmp_path):
        p = tmp_path / "out.txt"
        codes = np.array([encode_kmer("ACGT"), encode_kmer("TTTT")], np.uint64)
        assert export_counter(codes, np.array([5, 3]), 4, str(p))
        assert p.read_bytes() == b"ACGT\t5\nTTTT\t3\n"

    def test_open_failure(self, capsys):
        assert not export_counter(
            np.array([0], np.uint64), np.array([1]), 4, "/no/dir/out.txt"
        )
        assert "COULD NOT OPEN FILE" in capsys.readouterr().err


class TestPrintCounters:
    def test_stdout_format(self, capsys):
        """printCounters twin: ``kmer count`` space-separated to stdout
        (approx_counter.cpp:143-149; dead code there, kept for parity)."""
        from approx_counter_tpu.io.export import print_counters

        print_counters(np.array([1, 4], np.uint64), np.array([7, 2]), 2)
        assert capsys.readouterr().out == "AC 7\nCA 2\n"


class TestLog:
    def test_prefix_and_nesting(self):
        """``[<ms> ms]\\t`` prefix + one tab per level, %g ms formatting
        (approx_counter.cpp:85-94)."""
        import io
        import re

        from approx_counter_tpu.io.logging import Log

        buf = io.StringIO()
        log = Log(stream=buf)
        log("hello")
        log("nested", 2)
        lines = buf.getvalue().splitlines()
        assert re.fullmatch(r"\[[0-9.e+-]+ ms\]\thello", lines[0])
        assert re.fullmatch(r"\[[0-9.e+-]+ ms\]\t\t\tnested", lines[1])

    def test_warn_error_prefixes(self, capsys):
        from approx_counter_tpu.io.logging import error, warn

        warn("w")
        error("e")
        err = capsys.readouterr().err
        assert "/!\\ WARNING: w\n" in err and "/!\\ ERROR: e\n" in err


class TestKmerList:
    def test_parse(self, tmp_path):
        p = tmp_path / "fk.txt"
        p.write_text("ACGT\nNNNN\nacgt\nAXGT\nTT\n")
        codes = parse_kmer_list(str(p))
        # NNNN and AXGT dropped (contain N after Dna5 conversion);
        # acgt == ACGT dedups
        assert set(codes.tolist()) == {encode_kmer("ACGT"), encode_kmer("TT")}

    def test_missing_exits(self):
        with pytest.raises(SystemExit):
            parse_kmer_list("/nonexistent")


class TestGzip:
    def test_gzip_fasta_roundtrip(self, tmp_path):
        import gzip

        p = tmp_path / "a.fasta.gz"
        with gzip.open(p, "wb") as f:
            f.write(FASTA)
        from approx_counter_tpu.io.fastx import read_fastx, read_fastx_py

        plain = tmp_path / "a.fasta"
        plain.write_bytes(FASTA)
        gz = read_fastx(str(p))
        ref = read_fastx_py(str(plain))
        np.testing.assert_array_equal(gz.buf, ref.buf)
        np.testing.assert_array_equal(gz.offsets, ref.offsets)

    def test_gzip_stream(self, tmp_path):
        import gzip

        from approx_counter_tpu.io.stream import stream_sample_windows

        seqs = b">r0\n" + b"ACGT" * 10 + b"\n>r1\n" + b"TTGG" * 10 + b"\n"
        p = tmp_path / "s.fasta.gz"
        with gzip.open(p, "wb") as f:
            f.write(seqs)
        b, e, n = stream_sample_windows(str(p), 10, 5,
                                        rng=np.random.default_rng(0))
        assert n == 2 and b.n_valid == 2


class TestProfiler:
    def test_profile_flag_writes_trace(self, tmp_path):
        """--profile wraps the run in jax.profiler.trace (SURVEY §5
        tracing); the trace directory must contain profiler artifacts."""
        import os
        import subprocess
        import sys

        fa = tmp_path / "r.fasta"
        fa.write_text(">r0\n" + "ACGT" * 20 + "\n>r1\n" + "TTGA" * 20 + "\n")
        prof = tmp_path / "trace"
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        r = subprocess.run(
            [sys.executable, "-m", "approx_counter_tpu", str(fa),
             "-o", str(tmp_path / "o.txt"), "-sn", "10", "-sl", "8",
             "-k", "4", "--seed", "1", "--profile", str(prof)],
            cwd="/root/repo", env=env, capture_output=True, timeout=300,
        )
        assert r.returncode == 0, r.stderr.decode()[-1500:]
        found = []
        for root, _dirs, files in os.walk(prof):
            found += files
        assert found, "profiler trace directory is empty"
