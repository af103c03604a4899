"""Native C++ loader must agree byte-for-byte with the Python readers."""

import numpy as np
import pytest

from aligngraph2_tpu.io import SeqDatabase, write_fasta
from aligngraph2_tpu.io.fasta import write_fastq
from aligngraph2_tpu.io.native import get_lib, load_seqs_native


pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native toolchain unavailable")


def compare(path):
    native = SeqDatabase.from_file(path, use_native=True)
    python = SeqDatabase.from_file(path, use_native=False)
    assert native.names == python.names
    np.testing.assert_array_equal(native.offsets, python.offsets)
    np.testing.assert_array_equal(native.codes, python.codes)


def test_fasta_agrees(tmp_path, rng):
    from tests.synth import random_genome
    recs = [(f"seq{i} with comment".split()[0],
             random_genome(rng, int(rng.integers(10, 500))))
            for i in range(20)]
    p = str(tmp_path / "x.fa")
    write_fasta(p, recs, line_width=60)
    compare(p)


def test_fasta_name_token(tmp_path):
    p = tmp_path / "t.fa"
    p.write_text(">name extra stuff\nACGT\nacgt\n>z\nNNTT\n")
    db = SeqDatabase.from_file(str(p), use_native=True)
    assert db.names == ["name", "z"]
    assert db.get_str(0) == "ACGTACGT"
    assert db.get_str(1) == "AATT"  # N -> A
    compare(str(p))


def test_fastq_agrees(tmp_path, rng):
    from tests.synth import random_genome
    recs = [(str(i + 1), random_genome(rng, int(rng.integers(50, 300))))
            for i in range(15)]
    p = str(tmp_path / "r.fq")
    write_fastq(p, recs)
    compare(p)


def test_empty_and_missing(tmp_path):
    p = tmp_path / "empty.fa"
    p.write_text("")
    assert load_seqs_native(str(p)) is None  # falls back cleanly
    assert load_seqs_native(str(tmp_path / "missing.fa")) is None
