"""GMAP chimera detection (-x): two-part cDNA alignments across loci
(src/chimera.c, src/gmap.c:2435-3000)."""
import io
from contextlib import redirect_stdout

import numpy as np
import pytest

from tpumap.gmap.chimera import align_query_chimera, breakpoint, query_span
from tpumap.gmap.engine import GmapConfig
from tpumap.gmap.stage1 import Stage1Config
from tpumap.utils import dna


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    from tpumap.index import build_db
    from tpumap.index.device import DeviceIndex

    d = tmp_path_factory.mktemp("chim")
    rng = np.random.default_rng(17)
    c1 = "".join("ACGT"[i] for i in rng.integers(0, 4, 20000))
    c2 = "".join("ACGT"[i] for i in rng.integers(0, 4, 20000))
    (d / "g.fa").write_text(f">chr1\n{c1}\n>chr2\n{c2}\n")
    db = build_db(d / "g.fa", name="chim", k=12, interval=3)
    return db, DeviceIndex.from_host(db), c1, c2


def test_chimera_two_pieces(world):
    db, index, c1, c2 = world
    # part 1: spliced cDNA from chr1 (two exons); part 2: exon from chr2
    part1 = c1[3000:3100] + c1[5000:5100]
    part2 = c2[8000:8120]
    query = part1 + part2
    qcodes, qnmask = dna.encode(query)
    pieces = align_query_chimera(db, index, qcodes, qnmask, GmapConfig(),
                                 Stage1Config(), chimera_margin=30)
    assert len(pieces) == 2
    qlen = len(query)
    (chain1, off1), (chain2, off2) = pieces
    qs1, qe1 = query_span(chain1, qlen)
    qs2, qe2 = query_span(chain2, qlen)
    assert qs1 == 0 and qe1 >= 190
    assert qs2 <= 210 and qe2 == qlen
    assert db.chrnum(off1 + chain1.exons[0].gstart) == 0   # chr1
    assert db.chrnum(off2 + chain2.exons[0].gstart) == 1   # chr2
    # part 1 keeps its intron structure
    assert any(i.kind == "intron" for i in chain1.introns)
    bp = breakpoint(pieces, qlen)
    assert 190 <= bp <= 210


def test_normal_query_single_piece(world):
    db, index, c1, c2 = world
    query = c1[3000:3100] + c1[5000:5100]
    qcodes, qnmask = dna.encode(query)
    pieces = align_query_chimera(db, index, qcodes, qnmask, GmapConfig(),
                                 Stage1Config(), chimera_margin=30)
    assert len(pieces) == 1
    assert breakpoint(pieces, len(query)) is None


def test_cli_chimera_psl(world, tmp_path):
    from tpumap.cli.gmap_cli import main as gmap_main

    db, index, c1, c2 = world
    db.save(str(tmp_path / "db"))
    query = c1[3000:3100] + c1[5000:5100] + c2[8000:8120]
    (tmp_path / "q.fa").write_text(">q1\n" + query + "\n")
    buf = io.StringIO()
    with redirect_stdout(buf):
        gmap_main(["-D", str(tmp_path / "db"), "-f", "psl", "-x", "30",
                   str(tmp_path / "q.fa")])
    lines = [l for l in buf.getvalue().splitlines() if l.strip()]
    assert len(lines) == 2
    assert lines[0].split("\t")[13] == "chr1"
    assert lines[1].split("\t")[13] == "chr2"


def test_gmap_npaths(world, tmp_path):
    """gmap -n: a cDNA from a duplicated locus reports both placements."""
    import io
    from contextlib import redirect_stdout
    from tpumap.cli.gmap_cli import main as gmap_main
    from tpumap.index import build_db

    db, index, c1, c2 = world
    seq2 = c1[:15000] + c1[3000:3400] + c1[15400:]
    (tmp_path / "g.fa").write_text(">chr1\n" + seq2 + "\n")
    db2 = build_db(tmp_path / "g.fa", name="dup", k=12, interval=3)
    db2.save(str(tmp_path / "db"))
    (tmp_path / "q.fa").write_text(">q\n" + c1[3000:3400] + "\n")
    buf = io.StringIO()
    with redirect_stdout(buf):
        gmap_main(["-D", str(tmp_path / "db"), "-f", "psl", "-n", "3",
                   str(tmp_path / "q.fa")])
    lines = [l for l in buf.getvalue().splitlines() if l.strip()]
    assert len(lines) == 2
    starts = sorted(int(l.split("\t")[15]) for l in lines)
    assert starts == [3000, 15000]


def test_exonexon_breakpoint_refinement(tmp_path):
    """Chimera_find_exonexon (src/chimera.c:1092): with microhomology
    blurring the join, the breakpoint snaps to the best donor x acceptor
    MaxEnt boundary and the parts meet exactly there."""
    from tpumap.index import build_db
    from tpumap.index.device import DeviceIndex
    from tpumap.gmap.chimera import refine_breakpoint

    rng = np.random.default_rng(99)
    g1 = list("ACGT"[i] for i in rng.integers(0, 4, 20000))
    g2 = list("ACGT"[i] for i in rng.integers(0, 4, 20000))
    # chr1 locus A: exon g1[4940:5000) ending ...CAG, strong donor
    # GTAAGT after (a chimera, so the acceptor lives on ANOTHER chrom)
    g1[4997:5000] = list("CAG")
    g1[5000:5006] = list("GTAAGT")
    # chr2 locus B: exon g2[8000:8060); polypyrimidine acceptor tract
    # before, with 6 bp of microhomology on BOTH sides of the join
    g2[7974:7994] = list("T" * 20)
    g2[7994:8000] = g1[4994:5000]          # ...CAG (ends AG = acceptor)
    g2[8000:8006] = g1[5000:5006]          # GTAAGT (blurs the boundary)
    s1, s2 = "".join(g1), "".join(g2)
    (tmp_path / "g.fa").write_text(f">chr1\n{s1}\n>chr2\n{s2}\n")
    db = build_db(tmp_path / "g.fa", name="ee", k=12, interval=3)
    index = DeviceIndex.from_host(db)

    query = s1[4940:5000] + s2[8000:8060]
    qcodes, qnmask = dna.encode(query)
    pieces = align_query_chimera(db, index, qcodes, qnmask, GmapConfig(),
                                 Stage1Config(), chimera_margin=30)
    assert len(pieces) == 2
    qlen = len(query)
    (c1, o1), (c2, o2) = pieces
    qs1, qe1 = query_span(c1, qlen)
    qs2, qe2 = query_span(c2, qlen)
    # splice-aware boundary: parts meet exactly at the CAG|GTAAGT donor
    assert (qs1, qe1) == (0, 60), (qs1, qe1)
    assert (qs2, qe2) == (60, 120), (qs2, qe2)
    assert o1 + c1.exons[-1].gend == 5000
    assert o2 + c2.exons[0].gstart == 20000 + 8000
    found = refine_breakpoint(db, pieces, qlen)
    assert found is not None and found[0] == 59
    assert found[2] > 0.5 or found[3] > 0.5    # real splice signals
