"""Annotation converters (gff3/gtf/psl -> splicesites/introns/genes maps,
vcf -> SNP map) vs the reference Perl tools in /tmp/refbin."""
import io
import pathlib
import subprocess
from contextlib import redirect_stdout

import pytest

from tpumap.cli import converters as cv

REFBIN = pathlib.Path("/tmp/refbin")

GFF3 = """\
##gff-version 3
chr1\ttest\tgene\t1000\t9000\t.\t+\t.\tID=g1;Name=GENE1
chr1\ttest\tmRNA\t1000\t9000\t.\t+\t.\tID=t1;Parent=g1;Name=NM_1
chr1\ttest\texon\t1000\t1100\t.\t+\t.\tParent=t1
chr1\ttest\texon\t5000\t5080\t.\t+\t.\tParent=t1
chr1\ttest\texon\t8000\t9000\t.\t+\t.\tParent=t1
chr2\ttest\tgene\t2000\t7000\t.\t-\t.\tID=g2;Name=GENE2
chr2\ttest\tmRNA\t2000\t7000\t.\t-\t.\tID=t2;Parent=g2;Name=NM_2
chr2\ttest\texon\t6500\t7000\t.\t-\t.\tParent=t2
chr2\ttest\texon\t2000\t2400\t.\t-\t.\tParent=t2
"""

GTF = """\
chr1\ttest\texon\t1000\t1100\t.\t+\t.\tgene_id "g1"; transcript_id "t1"; gene_name "GENE1";
chr1\ttest\texon\t5000\t5080\t.\t+\t.\tgene_id "g1"; transcript_id "t1"; gene_name "GENE1";
chr2\ttest\texon\t6500\t7000\t.\t-\t.\tgene_id "g2"; transcript_id "t2"; gene_name "GENE2";
chr2\ttest\texon\t2000\t2400\t.\t-\t.\tgene_id "g2"; transcript_id "t2"; gene_name "GENE2";
"""


def _run(main, text, args=()):
    import sys
    buf = io.StringIO()
    stdin = sys.stdin
    sys.stdin = io.StringIO(text)
    try:
        with redirect_stdout(buf):
            main(list(args))
    finally:
        sys.stdin = stdin
    return buf.getvalue()


def _oracle(tool, text):
    return subprocess.run([str(REFBIN / tool)], input=text,
                          capture_output=True, text=True).stdout


need_oracle = pytest.mark.skipif(not (REFBIN / "gff3_splicesites").exists(),
                                 reason="reference Perl tools unavailable")


@need_oracle
def test_gff3_splicesites_parity():
    assert _run(cv.gff3_splicesites_main, GFF3) == \
        _oracle("gff3_splicesites", GFF3)


@need_oracle
def test_gff3_introns_parity():
    assert _run(cv.gff3_introns_main, GFF3) == _oracle("gff3_introns", GFF3)


GENCODE = """\
chr1\ttest\tgene\t1000\t9000\t.\t+\t.\tID=g1;gene_id=G1.1;gene_name=GENE1;gene_type=protein_coding
chr1\ttest\ttranscript\t1000\t9000\t.\t+\t.\tID=t1;Parent=g1;transcript_id=T1.1;transcript_name=NM_1;transcript_type=protein_coding
chr1\ttest\texon\t1000\t1100\t.\t+\t.\tParent=t1
chr1\ttest\texon\t5000\t5080\t.\t+\t.\tParent=t1
chr2\ttest\tgene\t2000\t7000\t.\t-\t.\tID=g2;gene_id=G2.1;gene_name=GENE2;gene_type=protein_coding
chr2\ttest\ttranscript\t2000\t7000\t.\t-\t.\tID=t2;Parent=g2;transcript_id=T2.1;transcript_name=NM_2;transcript_type=protein_coding
chr2\ttest\texon\t6500\t7000\t.\t-\t.\tParent=t2
chr2\ttest\texon\t2000\t2400\t.\t-\t.\tParent=t2
"""


@need_oracle
def test_gff3_genes_parity():
    assert _run(cv.gff3_genes_main, GENCODE) == \
        _oracle("gff3_genes", GENCODE)


@need_oracle
def test_gtf_splicesites_parity():
    assert _run(cv.gtf_splicesites_main, GTF) == \
        _oracle("gtf_splicesites", GTF)


@need_oracle
def test_gtf_introns_parity():
    assert _run(cv.gtf_introns_main, GTF) == _oracle("gtf_introns", GTF)


def test_vcf_to_snps():
    vcf = ("##fileformat=VCFv4.2\n"
           "chr1\t150\trs1\tA\tG\t.\tPASS\t.\n"
           "chr1\t200\t.\tC\tT,G\t.\tPASS\t.\n"
           "chr1\t300\trs3\tAT\tA\t.\tPASS\t.\n")   # indel: skipped
    out = _run(cv.vcf_iit_main, vcf)
    assert out == (">rs1 chr1:150 AG\n"
                   ">chr1_200_CT chr1:200 CT\n"
                   ">chr1_200_CG chr1:200 CG\n")


def test_genes_roundtrip_into_transcriptome():
    """gff3_genes output must be consumable by build_transcriptome."""
    from tpumap.io.iit import build_iit, parse_map_fasta
    text = _run(cv.gff3_genes_main, GENCODE)
    iit = build_iit(parse_map_fasta(io.StringIO(text)))
    assert iit.labels == ["T1.1", "T2.1"]
    assert iit.annotations[0].splitlines()[0] == "GENE1 G1.1"
    assert iit.annotations[0].splitlines()[1] == "1000 1100"
    # minus-strand exons listed high..low in transcription order
    assert iit.annotations[1].splitlines()[1] == "7000 6500"
