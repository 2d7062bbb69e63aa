"""GMAP cDNA->genome alignment: structure + GFF3 byte parity vs reference."""
import io
import pathlib
import re
import subprocess
from contextlib import redirect_stdout

import numpy as np
import pytest

from tpumap.gmap.engine import GmapConfig, align_cdna_both
from tpumap.utils import dna

REF_TESTS = pathlib.Path("/root/reference/tests")
REFBIN = pathlib.Path("/tmp/refbin")

need_fixtures = pytest.mark.skipif(not REF_TESTS.is_dir(),
                                   reason="reference fixtures unavailable")
need_oracle = pytest.mark.skipif(not (REFBIN / "gmap").exists(),
                                 reason="oracle gmap unavailable")


def test_three_exon_synthetic():
    rng = np.random.default_rng(3)
    g = "".join("ACGT"[i] for i in rng.integers(0, 4, 12000))
    e1, e2, e3 = g[1000:1180], g[2000:2250], g[4000:4100]
    g = (g[:1180] + "GT" + g[1182:1998] + "AG" + g[2000:2250] + "GT"
         + g[2252:3998] + "AG" + g[4000:])
    query = e1 + e2 + e3
    qc, qn = dna.encode(query)
    gc_, gn = dna.encode(g)
    res = align_cdna_both(qc, qn, gc_, gn, GmapConfig())
    spans = [(e.qstart, e.qend, e.gstart, e.gend) for e in res.exons]
    assert spans == [(0, 180, 1000, 1180), (180, 430, 2000, 2250),
                     (430, 530, 4000, 4100)]
    assert [i.canonical for i in res.introns] == ["GT-AG", "GT-AG"]
    assert res.mismatches == 0
    assert res.cdna_direction == 1


def test_minus_strand_synthetic():
    rng = np.random.default_rng(4)
    g = "".join("ACGT"[i] for i in rng.integers(0, 4, 6000))
    e1, e2 = g[1000:1200], g[3000:3220]
    g = g[:1200] + "GT" + g[1202:2998] + "AG" + g[3000:]
    query = dna.revcomp(e1 + e2)
    qc, qn = dna.encode(query)
    gc_, gn = dna.encode(g)
    res = align_cdna_both(qc, qn, gc_, gn, GmapConfig())
    assert res.strand == 1
    spans = [(e.gstart, e.gend) for e in res.exons]
    assert spans == [(1000, 1200), (3000, 3220)]


@need_fixtures
def test_her2_exon_structure_matches_golden():
    from tpumap.io.fasta import read_fasta
    her2 = next(read_fasta(REF_TESTS / "ss.her2"))
    chr17 = next(read_fasta(REF_TESTS / "ss.chr17test"))
    qc, qn = dna.encode(her2.sequence)
    gc_, gn = dna.encode(chr17.sequence)
    res = align_cdna_both(qc, qn, gc_, gn, GmapConfig())
    mine = [(e.gstart + 1, e.gend, e.qstart + 1, e.qend) for e in res.exons]
    golden = []
    for line in open(REF_TESTS / "align.test.ok"):
        m = re.match(r"\s+(\d+)-(\d+)\s+\((\d+)-(\d+)\)\s+(\d+)%", line)
        if m:
            golden.append(tuple(int(x) for x in m.groups()[:4]))
    assert len(golden) == 27
    assert mine == golden
    assert res.matches == 4624 and res.mismatches == 0


def _run_mine(fmt, gseg, queries):
    from tpumap.cli.gmap_cli import main
    buf = io.StringIO()
    with redirect_stdout(buf):
        main(["-g", str(gseg), "-f", fmt, str(queries)])
    return [l for l in buf.getvalue().splitlines()
            if not l.startswith("#") or l == "###"]


def _run_ref(fmt, gseg, queries):
    out = subprocess.run([str(REFBIN / "gmap"), "-g", str(gseg), "-f", fmt,
                          str(queries)], capture_output=True, text=True).stdout
    return [l for l in out.splitlines() if not l.startswith("#") or l == "###"]


@need_fixtures
@need_oracle
@pytest.mark.parametrize("fmt", ["3", "2"])
def test_gff3_byte_parity_her2(fmt):
    gseg = REF_TESTS / "ss.chr17test"
    queries = REF_TESTS / "ss.her2"
    assert _run_mine(fmt, gseg, queries) == _run_ref(fmt, gseg, queries)


@pytest.fixture(scope="module")
def dbmode_case(tmp_path_factory):
    """Shared db-mode setup: our db + reference db on chr17test, plus an
    rc (antisense) query and a synthetic minus-strand gene genome."""
    import subprocess as sp

    from tpumap.index import build_db
    from tpumap.io.fasta import read_fasta

    d = tmp_path_factory.mktemp("dbmode")
    her2 = next(read_fasta(REF_TESTS / "ss.her2"))
    rc = dna.revcomp(her2.sequence)
    (d / "q_rc.fa").write_text(
        ">NM_004448rc test\n"
        + "\n".join(rc[i:i + 60] for i in range(0, len(rc), 60)) + "\n")
    db = build_db(REF_TESTS / "ss.chr17test", name="chr17test", k=14,
                  interval=3)
    db.save(str(d / "db"))
    gmap_build = pathlib.Path("/root/reference/bin/gmap_build")
    if gmap_build.exists() and (REFBIN / "gmapindex").exists():
        sp.run([str(gmap_build), "-B", str(REFBIN), "-D", str(d / "refdb"),
                "-d", "chr17test", "-k", "14", "-q", "3", "--local=0",
                str(REF_TESTS / "ss.chr17test")],
               check=True, capture_output=True)
    return d


@need_fixtures
@need_oracle
@pytest.mark.parametrize("fmt", ["3", "2"])
@pytest.mark.parametrize("query", ["fwd", "rc"])
def test_gff3_db_mode_parity(dbmode_case, fmt, query):
    from tpumap.cli.gmap_cli import main as gmap_main
    d = dbmode_case
    qfile = REF_TESTS / "ss.her2" if query == "fwd" else d / "q_rc.fa"
    buf = io.StringIO()
    with redirect_stdout(buf):
        gmap_main(["-D", str(d / "db"), "-d", "chr17test", "-f", fmt,
                   str(qfile)])
    mine = [l for l in buf.getvalue().splitlines()
            if not l.startswith("#") or l == "###"]
    ref = subprocess.run([str(REFBIN / "gmap"), "-D", str(d / "refdb"),
                          "-d", "chr17test", "-f", fmt, str(qfile)],
                         capture_output=True, text=True).stdout
    refl = [l for l in ref.splitlines() if not l.startswith("#") or l == "###"]
    assert mine == refl


@need_oracle
@pytest.mark.parametrize("fmt", ["3", "2"])
def test_gff3_minus_strand_gene_parity(tmp_path, fmt):
    """Sense mRNA of a minus-strand gene (presented-strand conventions)."""
    rng = np.random.default_rng(21)
    g = "".join("ACGT"[i] for i in rng.integers(0, 4, 12000))
    g = g[:2300] + "CT" + g[2302:3998] + "AC" + g[4000:]
    mrna = dna.revcomp(g[4000:4360]) + dna.revcomp(g[2000:2300])
    (tmp_path / "g.fa").write_text(
        ">chrS\n" + "\n".join(g[i:i + 60] for i in range(0, len(g), 60)) + "\n")
    (tmp_path / "q.fa").write_text(
        ">mrna1\n" + "\n".join(mrna[i:i + 60] for i in range(0, len(mrna), 60))
        + "\n")
    mine = _run_mine(fmt, tmp_path / "g.fa", tmp_path / "q.fa")
    ref = _run_ref(fmt, tmp_path / "g.fa", tmp_path / "q.fa")
    assert mine == ref


def test_many_exon_long_query(tmp_path):
    """An 80-exon 8 kbp query must chain ALL exons with full coverage
    (the reference accepts <=100 kbp queries, src/gmap.c:113; the chain
    segment budget scales with query length)."""
    import numpy as np
    from tpumap.cli.gmap_cli import align_queries_bulk
    from tpumap.index import build_db as _build
    from tpumap.index.device import DeviceIndex
    from tpumap.utils import dna as dna_mod

    rng = np.random.default_rng(77)
    g = "".join("ACGT"[i] for i in rng.integers(0, 4, 300000))
    (tmp_path / "g.fa").write_text(">chr1\n" + g + "\n")
    db = _build(tmp_path / "g.fa", name="long", k=13, interval=3)
    index = DeviceIndex.from_host(db)
    pos, parts = 5000, []
    for _ in range(80):
        parts.append(g[pos:pos + 100])
        pos += 1100
    q = "".join(parts)
    hit = align_queries_bulk(db, index, [dna_mod.encode(q)])[0]
    assert hit is not None
    chain, _off = hit
    assert len(chain.exons) == 80
    assert chain.coverage == len(q)
    # junction-boundary ambiguity on random (noncanonical) junctions may
    # cost a few mismatches but identity must stay ~99.5%
    assert chain.mismatches <= 0.01 * len(q)


@need_oracle
def test_end_gap_indel_parity(tmp_path):
    """Indel-capable end gaps (Dynprog_end5/3_gap QUERYEND_INDELS,
    src/dynprog_end.h:26,48): a cDNA with a 1 bp indel a few bases from
    a query end must align FULL-length with the indel recovered — byte
    parity vs reference gmap -A INCLUDING the translation rows: the
    genome and cDNA frames are translated independently across the
    frameshifting indel (io/alignfmt.annotate_aa_genomic, the
    Translation_via_genomic re-expression)."""
    import subprocess
    import numpy as np
    rng = np.random.default_rng(5)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 30000))
    (tmp_path / "g.fa").write_text(">chr1\n" + "\n".join(
        seq[i:i + 60] for i in range(0, 30000, 60)) + "\n")
    q1 = seq[5000:5292] + seq[5293:5301]         # 1 bp del, 8 bp from 3'
    q2 = seq[7000:7009] + "A" + seq[7009:7300]   # 1 bp ins, 9 bp from 5'
    (tmp_path / "q.fa").write_text(f">q1\n{q1}\n>q2\n{q2}\n")
    ref = subprocess.run(
        [str(REFBIN / "gmap"), "-g", str(tmp_path / "g.fa"),
         str(tmp_path / "q.fa"), "-A"],
        capture_output=True, text=True, check=True).stdout
    import io as _io
    from contextlib import redirect_stdout
    from tpumap.cli import gmap_cli
    buf = _io.StringIO()
    with redirect_stdout(buf):
        gmap_cli.main(["-g", str(tmp_path / "g.fa"),
                       str(tmp_path / "q.fa"), "-A"])
    ours = buf.getvalue()

    assert ours.splitlines() == ref.splitlines()
