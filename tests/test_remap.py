"""Transcript remap + velocity (src/transcript-remap.c,
src/transcript-velocity.c, src/exon.c analogs in tpumap/gsnap/remap.py)."""
import numpy as np
import pytest

from tpumap.gsnap.remap import (TranscriptRemapper, velocity_paired,
                                velocity_single, xx_tags)
from tpumap.gsnap.transcriptome import Transcriptome


def _tr_plus():
    """One plus-strand gene: exons [1000,1100) [2000,2080) [3000,3100)."""
    return Transcriptome(
        trdb=None, genome_name="g", labels=["TRP"], genes=["GP"],
        chrnum=np.array([0], np.int32), strand=np.array([1], np.int8),
        exon_offsets=np.array([0, 3], np.int64),
        exonbounds=np.array([100, 180, 280], np.int64),
        exonstarts=np.array([1000, 2000, 3000], np.uint64),
        exonlens=np.array([100, 80, 100], np.int64))


def _tr_minus():
    """One minus-strand gene: genomic exons [5000,5100) [6000,6050);
    transcription order starts at the highest coordinate (6049)."""
    return Transcriptome(
        trdb=None, genome_name="g", labels=["TRM"], genes=["GM"],
        chrnum=np.array([0], np.int32), strand=np.array([-1], np.int8),
        exon_offsets=np.array([0, 2], np.int64),
        exonbounds=np.array([50, 150], np.int64),
        exonstarts=np.array([6049, 5099], np.uint64),
        exonlens=np.array([50, 100], np.int64))


def _marks(hit):
    return hit.exon_string()


def test_contained_read():
    rm = TranscriptRemapper(_tr_plus())
    valid, invalid = rm.remap([(2010, 2050)])
    assert len(valid) == 1 and not invalid
    h = valid[0]
    assert _marks(h) == ".2."
    assert (h.trstart, h.trend) == (111, 150)
    assert velocity_single(h, 3) == "B"


def test_exact_junction():
    rm = TranscriptRemapper(_tr_plus())
    valid, invalid = rm.remap([(1050, 1100), (2000, 2040)])
    assert len(valid) == 1 and not invalid
    h = valid[0]
    assert _marks(h) == ".1s|s2."
    assert (h.trstart, h.trend) == (51, 140)
    assert velocity_single(h, 3) == "S"
    assert xx_tags(valid, invalid) == ["XX:Z:TRP:51..140:*:.1s|s2."]


def test_retained_intron_spanning_segment():
    rm = TranscriptRemapper(_tr_plus())
    valid, invalid = rm.remap([(1050, 2050)])
    assert not valid and len(invalid) == 1
    h = invalid[0]
    assert _marks(h) == ".1i|i2."
    assert h.intronp
    assert xx_tags(valid, invalid)[0].startswith("XY:Z:TRP:")


def test_intronic_singleton_is_unspliced():
    rm = TranscriptRemapper(_tr_plus())
    valid, invalid = rm.remap([(1150, 1190)])
    assert not valid and len(invalid) == 1
    h = invalid[0]
    assert _marks(h) == "i1i"
    assert velocity_single(h, 3) == "U"


def test_exon_intron_straddle_is_unspliced():
    rm = TranscriptRemapper(_tr_plus())
    valid, invalid = rm.remap([(1050, 1150)])
    assert not valid and len(invalid) == 1
    h = invalid[0]
    assert _marks(h) == ".1x"
    assert velocity_single(h, 3) == "U"


def test_minus_gene_exact_junction():
    rm = TranscriptRemapper(_tr_minus())
    valid, invalid = rm.remap([(5050, 5100), (6000, 6030)])
    assert len(valid) == 1 and not invalid
    h = valid[0]
    assert _marks(h) == ".1s|s2."
    assert (h.trstart, h.trend) == (21, 100)
    assert velocity_single(h, 2) == "S"


def test_no_overlap():
    rm = TranscriptRemapper(_tr_plus())
    valid, invalid = rm.remap([(9000, 9100)])
    assert not valid and not invalid
    assert xx_tags(valid, invalid) == []


def test_e2e_xx_tag_through_driver(tmp_path):
    """align_records with a transcriptome attaches XX:Z velocity tags to
    genome-path alignments (the path->transcripts flow of
    src/path-print-sam.c:1005)."""
    import io

    from tpumap.gsnap.driver import align_records
    from tpumap.gsnap.transcriptome import build_transcriptome
    from tpumap.index import build_db
    from tpumap.index.device import DeviceIndex
    from tpumap.io.fasta import Record
    from tpumap.io.iit import build_iit, parse_map_fasta

    rng = np.random.default_rng(31)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 30000))
    (tmp_path / "g.fa").write_text(">chr1\n" + seq + "\n")
    db = build_db(tmp_path / "g.fa", name="rg", k=12, interval=3)
    genes = (">TRX chr1:2001..9120 gene\nGENEX NM_X\n"
             "2001 2100\n5001 5080\n9001 9120\n")
    iit = build_iit(parse_map_fasta(io.StringIO(genes)))
    tr = build_transcriptome(db, iit, name="tr", k=10, interval=1)
    tr_index = DeviceIndex.from_host(tr.trdb)
    index = DeviceIndex.from_host(db)

    tseq = seq[2000:2100] + seq[5000:5080] + seq[9000:9120]
    reads = [Record("spliced", "", tseq[60:160]),   # exon1|exon2 junction
             Record("genomic", "", seq[12000:12100])]
    out = align_records(db, index, reads, tr=(tr, tr_index))
    by = {r.qname: r for r in out}
    xx = [t for t in by["spliced"].tags if t.startswith("XX:Z:")]
    assert xx == ["XX:Z:TRX:61..160:S:.1s|s2."]
    assert not any(t.startswith(("XX:", "XY:")) for t in by["genomic"].tags)


def test_e2e_paired_joint_velocity(tmp_path):
    """Paired ends landing in DIFFERENT exons of one transcript get the
    joint S classification even though each end alone would be B
    (Transcript_velocity_paired, src/transcript-velocity.c:364)."""
    import io

    from tpumap.gsnap.paired import align_paired_records
    from tpumap.gsnap.transcriptome import build_transcriptome
    from tpumap.index import build_db
    from tpumap.index.device import DeviceIndex
    from tpumap.io.fasta import Record
    from tpumap.io.iit import build_iit, parse_map_fasta
    from tpumap.utils import dna

    rng = np.random.default_rng(33)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 30000))
    (tmp_path / "g.fa").write_text(">chr1\n" + seq + "\n")
    db = build_db(tmp_path / "g.fa", name="pg", k=12, interval=3)
    genes = (">TRQ chr1:2001..9400 gene\nGENEQ NM_Q\n"
             "2001 2400\n9001 9400\n")
    iit = build_iit(parse_map_fasta(io.StringIO(genes)))
    tr = build_transcriptome(db, iit, name="tr", k=10, interval=1)
    index = DeviceIndex.from_host(db)

    # end1 inside exon1 (+), end2 inside exon2 (rc) — genomically ~6.7 kb
    # apart; on the TRANSCRIPT they are a normal-insert pair
    r1 = Record("q0", "", seq[2100:2200])
    r2 = Record("q0", "", dna.revcomp(seq[9100:9200]))
    out = align_paired_records(db, index, [(r1, r2)], pairmax=10000,
                               tr=(tr, None))
    s1, s2 = out[0]
    xx1 = [t for t in s1.tags if t.startswith("XX:Z:")]
    xx2 = [t for t in s2.tags if t.startswith("XX:Z:")]
    assert xx1 == ["XX:Z:TRQ:101..200:S:.1."]
    assert xx2 == ["XX:Z:TRQ:501..600:S:.2."]


def test_velocity_paired():
    rm = TranscriptRemapper(_tr_plus())
    v5, _ = rm.remap([(2010, 2050)])
    v3, _ = rm.remap([(2030, 2070)])
    # both ends in the same exon: could be either -> B
    assert velocity_paired(v5[0], v3[0], 3) == "B"
    # ends in different exons: spliced transcript
    v3b, _ = rm.remap([(3010, 3050)])
    assert velocity_paired(v5[0], v3b[0], 3) == "S"
