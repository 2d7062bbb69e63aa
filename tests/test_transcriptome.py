"""Transcriptome-guided alignment (TGGA, the L4c engine): genes-IIT
ingestion, transcript extraction, transcript->genome coordinate mapping
(src/trpath-convert.c analog) and the TR-first alignment rung
(src/stage1hr-single.c:202-260)."""
import io

import numpy as np
import pytest

from tpumap.gsnap.transcriptome import Transcriptome, build_transcriptome
from tpumap.io.iit import build_iit, parse_map_fasta
from tpumap.utils import dna

# gene layout on a 30 kb chromosome (1-based inclusive coords)
PLUS_EXONS = [(2001, 2100), (5001, 5080), (9001, 9120)]
MINUS_EXONS = [(22000, 21901), (18000, 17921)]   # high..low per gff3_genes


def genes_fasta():
    lines = [">TRP chr1:2001..9120 gene", "GENEP NM_P"]
    lines += [f"{s} {e}" for s, e in PLUS_EXONS]
    lines += [">TRM chr1:22000..17921 gene", "GENEM NM_M"]
    lines += [f"{s} {e}" for s, e in MINUS_EXONS]
    return "\n".join(lines) + "\n"


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    from tpumap.index import build_db

    d = tmp_path_factory.mktemp("tr")
    rng = np.random.default_rng(11)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 30000))
    (d / "g.fa").write_text(">chr1\n" + seq + "\n")
    db = build_db(d / "g.fa", name="trg", k=12, interval=3)
    iit = build_iit(parse_map_fasta(io.StringIO(genes_fasta())))
    tr = build_transcriptome(db, iit, name="tr", k=10, interval=1)
    return db, tr, seq


def expected_plus_seq(seq):
    return "".join(seq[s - 1:e] for s, e in PLUS_EXONS)


def expected_minus_seq(seq):
    return "".join(dna.revcomp(seq[e - 1:s]) for s, e in MINUS_EXONS)


def test_transcript_extraction(world):
    db, tr, seq = world
    assert tr.labels == ["TRP", "TRM"]
    assert tr.genes == ["GENEP", "GENEM"]
    assert list(tr.strand) == [1, -1]
    t0 = tr.trdb.get_seq(0, int(tr.trdb.chrom_offsets[1]))
    assert t0 == expected_plus_seq(seq)
    t1 = tr.trdb.get_seq(int(tr.trdb.chrom_offsets[1]),
                         int(tr.trdb.chrom_offsets[2]
                             - tr.trdb.chrom_offsets[1]))
    assert t1 == expected_minus_seq(seq)


def test_map_to_genome_plus(world):
    db, tr, seq = world
    # span exon1/exon2 junction: transcript coords 90..130 (40 bases:
    # last 10 of exon1 + first 30 of exon2)
    segs, minus = tr.map_to_genome(0, 90, 40)
    assert not minus
    assert segs == [(2090, 0, 10), (5000, 10, 30)]


def test_map_to_genome_three_exons(world):
    db, tr, seq = world
    # all of exon2 (80) plus 5 on each side
    segs, _ = tr.map_to_genome(0, 95, 90)
    assert segs == [(2095, 0, 5), (5000, 5, 80), (9000, 85, 5)]


def test_map_to_genome_minus(world):
    db, tr, seq = world
    # minus gene: exon1 = 22000..21901 (100 bp), exon2 = 18000..17921
    # (80 bp); transcript coords 95..110 crosses the junction
    segs, minus = tr.map_to_genome(1, 95, 15)
    assert minus
    # genome order ascending; 5 bases at the junction end of exon1
    # (genome 21900..21904 0-based) and 10 at the start of exon2
    # (genome 17990..17999 0-based)
    assert segs == [(17990, 0, 10), (21900, 10, 5)]
    # query offsets are for the reverse-complemented read: the exon1 part
    # (transcript-first) lands at the END of the genome-plus read


def test_tr_rung_multiexon_alignment(world):
    from tpumap.gsnap.driver import align_records
    from tpumap.index.device import DeviceIndex
    from tpumap.io.fasta import Record

    db, tr, seq = world
    index = DeviceIndex.from_host(db)
    tr_index = DeviceIndex.from_host(tr.trdb)

    tp = expected_plus_seq(seq)
    tm = expected_minus_seq(seq)
    reads = [
        Record("rp", "", tp[60:160]),                 # spans exon1/2 junction
        Record("rp3", "", tp[85:285]),                # spans all three exons
        Record("rm", "", tm[60:160]),                 # minus gene junction
        Record("rmrc", "", dna.revcomp(tm[60:160])),  # same, reversed read
    ]
    out = align_records(db, index, reads, tr=(tr, tr_index))
    by = {r.qname: r for r in out}

    assert by["rp"].cigar == "40M2900N60M"
    assert by["rp"].pos == 2061 and by["rp"].flag == 0
    assert "XS:A:+" in by["rp"].tags
    assert "XG:Z:TRP" in by["rp"].tags

    assert by["rp3"].cigar == "15M2900N80M3920N105M"
    assert by["rp3"].pos == 2086
    assert "NM:i:0" in by["rp3"].tags

    # minus-strand gene: read in transcript orientation maps as revcomp
    assert by["rm"].flag == 16
    assert by["rm"].cigar == "60M3900N40M"
    assert "XS:A:-" in by["rm"].tags
    assert by["rmrc"].flag == 0
    assert by["rmrc"].cigar == "60M3900N40M"
    assert by["rmrc"].pos == by["rm"].pos


def test_save_load_roundtrip(world, tmp_path):
    db, tr, seq = world
    tr.save(str(tmp_path / "trdir"))
    back = Transcriptome.load(str(tmp_path / "trdir"))
    assert back.labels == tr.labels
    assert np.array_equal(back.exonbounds, tr.exonbounds)
    segs0, _ = tr.map_to_genome(0, 90, 40)
    segs1, _ = back.map_to_genome(0, 90, 40)
    assert segs0 == segs1
