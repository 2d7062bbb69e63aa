import pathlib
import shutil
import subprocess

import numpy as np
import pytest

from tpumap.index import build_db
from tpumap.utils import dna

REF_TESTS = pathlib.Path("/root/reference/tests")
REFBIN = pathlib.Path("/tmp/refbin")
GMAP_BUILD = pathlib.Path("/root/reference/bin/gmap_build")


def test_build_db_basic(tmp_path):
    fa = tmp_path / "g.fa"
    fa.write_text(">chr1 test\nACGTNACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTN\n"
                  ">chr2\nTTTTGGGGCCCCAAAA\n")
    db = build_db(fa, name="g", k=5, interval=1)
    assert db.chrom_names == ["chr1", "chr2"]
    assert db.genome_length == 50 + 16
    assert db.get_seq(0, 5) == "ACGTN"
    assert db.get_seq(50, 16) == "TTTTGGGGCCCCAAAA"
    assert db.chrpos(50) == ("chr2", 0)
    assert db.chrpos(49) == ("chr1", 49)
    # k-mer index: lookup TTTTG (only at univcoord 50? no, TTTTG at 50)
    oligo = int(dna.kmer_codes(dna.encode("TTTTG")[0], 5)[0])
    s, e = db.offsets[oligo], db.offsets[oligo + 1]
    assert db.positions[s:e].tolist() == [50]
    # windows containing N are excluded
    oligo_n = int(dna.kmer_codes(dna.encode("ACGTA")[0], 5)[0])  # ACGTN -> encodes N as A
    s, e = db.offsets[oligo_n], db.offsets[oligo_n + 1]
    assert 0 not in db.positions[s:e].tolist()


def test_save_load_roundtrip(tmp_path):
    fa = tmp_path / "g.fa"
    fa.write_text(">c\n" + "ACGTTGCA" * 20 + "\n")
    db = build_db(fa, name="g", k=6, interval=3)
    db.save(str(tmp_path / "db"))
    from tpumap.index import GenomeDB
    db2 = GenomeDB.load(str(tmp_path / "db"))
    np.testing.assert_array_equal(db.positions, db2.positions)
    np.testing.assert_array_equal(db.genome_packed, db2.genome_packed)
    assert db2.chrom_names == db.chrom_names


@pytest.mark.skipif(not (REF_TESTS / "setup.genomecomp.ok").exists(),
                    reason="reference fixtures unavailable")
def test_genomecomp_parity_chr17(tmp_path):
    """Byte parity with the reference's setup1.test golden artifact."""
    db = build_db(REF_TESTS / "ss.chr17test", name="chr17test", k=12, interval=3)
    out = tmp_path / "g.genomecomp"
    db.write_genomecomp(str(out))
    golden = (REF_TESTS / "setup.genomecomp.ok").read_bytes()
    assert out.read_bytes() == golden


@pytest.mark.skipif(not (REFBIN / "gmapindex").exists() or not GMAP_BUILD.exists(),
                    reason="reference oracle binaries unavailable")
def test_kmer_index_parity_vs_reference(tmp_path):
    """Our (offsets, positions) content equals the reference ref123positions.

    Builds a real db with the reference gmap_build (k=12, interval=3) on a
    random 5 kb genome and compares the full sorted positions array and the
    per-oligo slice boundaries.
    """
    rng = np.random.default_rng(42)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 5000))
    # sprinkle Ns to exercise exclusion
    seq = seq[:100] + "N" + seq[101:2000] + "NN" + seq[2002:]
    fa = tmp_path / "g.fa"
    fa.write_text(">chr1\n" + "\n".join(seq[i:i + 60] for i in range(0, len(seq), 60)) + "\n")

    dbdir = tmp_path / "refdb"
    subprocess.run([str(GMAP_BUILD), "-B", str(REFBIN), "-D", str(dbdir),
                    "-d", "g", "-k", "12", "-q", "3", "--local=0", str(fa)],
                   check=True, capture_output=True)
    ref_positions = np.fromfile(dbdir / "g" / "g.ref123positions", dtype="<u4")

    db = build_db(fa, name="g", k=12, interval=3)
    np.testing.assert_array_equal(db.positions, ref_positions)
