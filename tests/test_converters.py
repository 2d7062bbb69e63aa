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


def _run_perl(script, args, stdin_text, tmp_path):
    import subprocess
    return subprocess.run(["perl", f"/tmp/refbin/{script}"] + args,
                          input=stdin_text, capture_output=True,
                          text=True, cwd=tmp_path).stdout


def _run_py(main_fn, args, stdin_text):
    import io
    import sys
    from contextlib import redirect_stdout
    buf = io.StringIO()
    old = sys.stdin
    try:
        sys.stdin = io.StringIO(stdin_text)
        with redirect_stdout(buf):
            main_fn(args)
    finally:
        sys.stdin = old
    return buf.getvalue()


DBSNP_LINES = (
    "585\tchr1\t10433\t10434\trs56289060\t0\t+\tA\tA\tA/C\tgenomic\t"
    "single\tunknown\t0\t0\tintron\texact\t1\t\t\n"
    "585\tchr1\t10543\t10544\trs530120680\t0\t-\tG\tG\tC/T\tgenomic\t"
    "single\tunknown\t0\t0\tintron\texact\t1\t\t\n"
    "585\tchr2\t20000\t20001\trs999\t0\t+\tT\tT\tG/T\tgenomic\t"
    "single\tunknown\t0\t0\tintron\texact\t3\t\t\n"
    "585\tchr1\t30000\t30001\trsbad\t0\t+\tT\tT\tG/T\tgenomic\t"
    "single\tunknown\t0\t0\tintron\texact\t1\tMultipleAlignments\t\n"
)


@need_oracle
def test_dbsnp_iit_oracle(tmp_path):
    from tpumap.cli.converters import dbsnp_iit_main
    ref = _run_perl("dbsnp_iit", [], DBSNP_LINES, tmp_path)
    mine = _run_py(dbsnp_iit_main, ["-"], DBSNP_LINES)
    assert mine == ref
    assert ">rs56289060 chr1:10434 AC +" in mine
    assert ">rs530120680 chr1:10544 AG -" in mine    # revcomp on -
    assert "rs999" not in mine                       # weight 3 > 1
    assert "rsbad" not in mine                       # exception


GVF_LINES = (
    "##gvf-version 1.07\n"
    "1\tdbSNP\tSNV\t10020\t10020\t.\t+\t.\t"
    "ID=1;Variant_seq=A;Dbxref=dbSNP_144:rs775809821;Reference_seq=G\n"
    "1\tdbSNP\tSNV\t10039\t10039\t.\t-\t.\t"
    "ID=2;Variant_seq=C;Dbxref=dbSNP_144:rs978760828;Reference_seq=A\n"
)


@need_oracle
def test_gvf_iit_oracle(tmp_path):
    from tpumap.cli.converters import gvf_iit_main
    gvf = tmp_path / "x.gvf"
    gvf.write_text(GVF_LINES)
    ref = _run_perl("gvf_iit", [str(gvf)], "", tmp_path)
    mine = _run_py(gvf_iit_main, [str(gvf)], "")
    assert mine == ref
    assert ">rs775809821 1:10020 AG +" in mine
    assert "rs978760828" not in mine                 # minus strand skipped


ENSEMBL_LINES = (
    "ENST01\tchr1:1000..1900\t.\t+\t.\t.\t2\t999,1500\t1200,1900\t.\tGENE1\n"
    "ENST02\tchr1:3000..3900\t.\t-\t.\t.\t2\t2999,3500\t3200,3900\t.\tGENE2\n"
)


@need_oracle
def test_ensembl_genes_oracle(tmp_path):
    from tpumap.cli.converters import ensembl_genes_main
    ref = _run_perl("ensembl_genes", [], ENSEMBL_LINES, tmp_path)
    mine = _run_py(ensembl_genes_main, ["-"], ENSEMBL_LINES)
    assert mine == ref
    assert ">ENST01 chr1:1000..1900" in mine
    assert ">ENST02 chr1:3900..3000" in mine


GTF_LINES = (
    'chr1\ttest\texon\t1000\t1200\t.\t+\t.\t'
    'gene_id "G1"; transcript_id "T1"; exon_number "1";\n'
    'chr1\ttest\texon\t1500\t1700\t.\t+\t.\t'
    'gene_id "G1"; transcript_id "T1"; exon_number "2";\n'
    'chr1\ttest\texon\t5000\t5100\t.\t-\t.\t'
    'gene_id "G2"; transcript_id "T2"; exon_number "1";\n'
    'chr1\ttest\texon\t4000\t4100\t.\t-\t.\t'
    'gene_id "G2"; transcript_id "T2"; exon_number "2";\n'
)


@need_oracle
def test_gtf_transcript_splicesites_oracle(tmp_path):
    from tpumap.cli.converters import gtf_transcript_splicesites_main
    ref = _run_perl("gtf_transcript_splicesites", ["-E"], GTF_LINES,
                    tmp_path)
    mine = _run_py(gtf_transcript_splicesites_main, ["-E", "-"], GTF_LINES)
    assert mine == ref
    assert "donor" in mine and "acceptor" in mine
    assert "T1:201..202 donor" in mine


def test_md_coords(tmp_path):
    from tpumap.cli.converters import md_coords_main
    md = tmp_path / "seq_contig.md"
    md.write_text("9606\tchr1\t1\t1000\t+\tCTG1\tC57BL/6J\n"
                  "9606\tchr1\t1001\t2000\t-\tCTG2\tC57BL/6J\n")
    out = tmp_path / "coords.txt"
    md_coords_main(["-c", "5,1,2,3,4", "-o", str(out), str(md)])
    lines = out.read_text().splitlines()
    assert lines[0] == "CTG1\tchr1:1..1000"
    assert lines[1] == "CTG2\tchr1:2000..1001"
