"""gmap CLI alignment/runtime knobs: --nosplicing, gap classification
(--min-intronlength/--max-deletionlength), --strand, -z direction
filters, --suboptimal-score, --trim-end-exons, --cmdline/--selfalign/
--pairalign, --nofails/--failsonly/--failed-input, -c/--chrsubset."""
import io
from contextlib import redirect_stdout

import numpy as np
import pytest

from tpumap.utils import dna


def run_gmap(args, stdin_text=None):
    import sys
    from tpumap.cli.gmap_cli import main as gmap_main
    buf = io.StringIO()
    old_stdin = sys.stdin
    try:
        if stdin_text is not None:
            sys.stdin = io.StringIO(stdin_text)
        with redirect_stdout(buf):
            rc = gmap_main(args)
    finally:
        sys.stdin = old_stdin
    return rc, buf.getvalue()


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    d = tmp_path_factory.mktemp("gopts")
    rng = np.random.default_rng(41)
    g = list("".join("ACGT"[i] for i in rng.integers(0, 4, 12000)))
    # canonical intron at 3080..3280
    g[3080:3082] = "GT"
    g[3278:3280] = "AG"
    genome = "".join(g)
    (d / "g.fa").write_text(">chr1\n" + genome + "\n")
    cdna = genome[3000:3080] + genome[3280:3360]
    (d / "q.fa").write_text(f">q1\n{cdna}\n")
    from tpumap.cli.build_cli import main as build_main
    build_main(["-D", str(d), "-d", "g", "-k", "12", "-q", "3",
                str(d / "g.fa")])
    return d, genome, cdna


def test_nosplicing(world):
    d, genome, cdna = world
    _rc, out = run_gmap(["-S", "-g", str(d / "g.fa"), str(d / "q.fa")])
    assert "...200..." in out                       # intron by default
    _rc, out2 = run_gmap(["-S", "--nosplicing", "-g", str(d / "g.fa"),
                          str(d / "q.fa")])
    assert "...200..." not in out2                  # gap is a deletion now


def test_gap_classification_knobs(world):
    d, genome, cdna = world
    # raising min-intronlength above the gap turns it into a deletion
    _rc, out = run_gmap(["-S", "--min-intronlength", "300",
                         "-g", str(d / "g.fa"), str(d / "q.fa")])
    assert "...200..." not in out


def test_strand_restriction(world):
    d, genome, cdna = world
    _rc, plus = run_gmap(["-S", "--strand", "plus", "-g",
                          str(d / "g.fa"), str(d / "q.fa")])
    assert "(+ strand)" in plus
    _rc, minus = run_gmap(["-S", "--strand", "minus", "-g",
                           str(d / "g.fa"), str(d / "q.fa")])
    # forcing the wrong strand yields a much worse (or no) alignment
    assert "(+ strand)" not in minus


def test_direction_filter(world):
    d, genome, cdna = world
    # the sense-canonical intron means -z antisense_filter drops the path
    _rc, sense = run_gmap(["-S", "-z", "sense_filter", "-g",
                           str(d / "g.fa"), str(d / "q.fa")])
    assert "Path 1" in sense
    _rc, anti = run_gmap(["-S", "-z", "antisense_filter", "-g",
                          str(d / "g.fa"), str(d / "q.fa")])
    assert "Path 1" not in anti


def test_cmdline_mode(world):
    d, genome, cdna = world
    _rc, out = run_gmap(["-S", "--cmdline", genome[3000:3400], cdna])
    assert "Path 1" in out
    assert "...200..." in out


def test_selfalign_and_pairalign(world):
    d, genome, cdna = world
    _rc, out = run_gmap(["-S", "--selfalign"],
                        stdin_text=f">s\n{genome[100:400]}\n")
    assert "Percent identity: 100.0" in out
    _rc, out2 = run_gmap(
        ["-S", "--pairalign"],
        stdin_text=f">g\n{genome[3000:3400]}\n>c\n{cdna}\n")
    assert "...200..." in out2


def test_nofails_failsonly_failed_input(world, tmp_path):
    d, genome, cdna = world
    junk = tmp_path / "junk.fa"
    junk.write_text(">j\n" + "AC" * 40 + "\n")
    fi = tmp_path / "failed.fa"
    _rc, out = run_gmap(["-S", "--nofails", "--failed-input", str(fi),
                         "-g", str(d / "g.fa"), str(junk)])
    assert "Path 1" not in out
    assert fi.read_text().startswith(">j")
    _rc, out2 = run_gmap(["-S", "--failsonly", "-g", str(d / "g.fa"),
                          str(d / "q.fa")])
    assert "Path 1" not in out2


def test_chrsubset_db(world):
    d, genome, cdna = world
    _rc, ok = run_gmap(["-S", "-D", str(d / "g"), "-c", "chr1",
                        str(d / "q.fa")])
    assert "Path 1" in ok
    rc_bad, _ = run_gmap(["-S", "-D", str(d / "g"), "-c", "chrX",
                          str(d / "q.fa")])
    assert rc_bad == 2                       # unknown chromosome: error


def test_trim_end_exons():
    from tpumap.gmap.engine import Exon, ExonChain, Intron, trim_end_exons
    ch = ExonChain(
        exons=[Exon(qstart=0, qend=5, gstart=0, gend=5, matches=5,
                    mismatches=0),
               Exon(qstart=5, qend=100, gstart=1000, gend=1095,
                    matches=93, mismatches=2)],
        introns=[Intron("intron", 995, "GT-AG")])
    t = trim_end_exons(ch, 10)
    assert len(t.exons) == 1
    assert t.exons[0].qstart == 5
    assert not t.introns


def test_repetitive_region_fallback(tmp_path):
    """A query inside a tandem repeat: every oligo is overabundant, so
    the normal occupancy cap finds no anchors; the keep_overabundant
    retry still aligns it (full coverage)."""
    import numpy as np
    from tpumap.cli.gmap_cli import align_queries_bulk
    from tpumap.index import build_db
    from tpumap.index.device import DeviceIndex
    from tpumap.utils import dna as dna_mod

    rng = np.random.default_rng(71)
    unit = "".join("ACGT"[i] for i in rng.integers(0, 4, 31))
    flank1 = "".join("ACGT"[i] for i in rng.integers(0, 4, 3000))
    flank2 = "".join("ACGT"[i] for i in rng.integers(0, 4, 3000))
    genome = flank1 + unit * 200 + flank2
    gfa = tmp_path / "g.fa"
    gfa.write_text(">chr1\n" + genome + "\n")
    db = build_db(gfa, name="rep", k=12, interval=3)
    index = DeviceIndex.from_host(db)
    q = genome[3000 + 31 * 5:3000 + 31 * 5 + 250]    # pure repeat query
    enc = [dna_mod.encode(q)]
    res = align_queries_bulk(db, index, enc)
    assert res[0] is not None
    chain, _off = res[0]
    assert chain.coverage >= 0.9 * len(q)
