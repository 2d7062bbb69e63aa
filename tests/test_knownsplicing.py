"""Known splice sites (-s/--use-splicing): IIT coordinate conversion and
junction snapping (the Knownsplicing_from_splicing_iit + Splice_resolve
known-site preference, src/knownsplicing.c:892-985, src/splice.c)."""
import io
import pathlib

import numpy as np
import pytest

from tpumap.gsnap.knownsplicing import KnownSplicing
from tpumap.io.iit import build_iit, parse_map_fasta


def _genome(rng, n=20000):
    return list("ACGT"[i] for i in rng.integers(0, 4, n))


E1, E2 = 5000, 8000          # exon starts (0-based univcoords)
EXLEN = 50


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    from tpumap.index import build_db
    from tpumap.index.device import DeviceIndex

    d = tmp_path_factory.mktemp("ks")
    rng = np.random.default_rng(7)
    g = _genome(rng)
    # boundary ambiguity: the last intron base equals the last base of
    # exon 1, so the junction placements q*=49 and q*=50 cost the same
    g[E2 - 1] = g[E1 + EXLEN - 1]
    # force noncanonical dinucleotides at every boundary candidate so the
    # canonical bonus cannot break the tie
    g[E1 + EXLEN] = "A"
    g[E1 + EXLEN + 1] = "A"
    g[E2 - 3] = "T"
    g[E2 - 2] = "T"
    seq = "".join(g)
    (d / "g.fa").write_text(">chr1\n" + seq + "\n")
    db = build_db(d / "g.fa", name="ks", k=13, interval=3)
    index = DeviceIndex.from_host(db)
    read = seq[E1:E1 + EXLEN] + seq[E2:E2 + EXLEN]
    return db, index, read


def test_from_splicing_iit_site_level(world):
    db, _, _ = world
    text = (f">j1d chr1:{E1 + EXLEN}..{E1 + EXLEN + 1} donor\n"
            f">j1a chr1:{E2}..{E2 + 1} acceptor\n"
            f">r1d chr1:{300}..{299} donor\n")
    iit = build_iit(parse_map_fasta(io.StringIO(text)))
    ks = KnownSplicing.from_splicing_iit(iit, db)
    # 1-based map coords -> 0-based univcoords: donor = first intron base,
    # acceptor = first exon base after the intron
    assert list(ks.donor) == [E1 + EXLEN]
    assert list(ks.acceptor) == [E2]
    # sign<0 entry goes antisense; coordinate is the interval LOW (299)
    assert list(ks.antidonor) == [299]


def test_from_splicing_iit_intron_level(world):
    db, _, _ = world
    # gff3_introns prints introns as exon_end..next_exon_start (1-based,
    # util/gff3_introns.pl.in:402), i.e. low = last exon base, high =
    # first base of the next exon
    text = (f">i1 chr1:{E1 + EXLEN}..{E2 + 1} intron\n"
            f">i2 chr1:{900}..{700} intron\n")
    iit = build_iit(parse_map_fasta(io.StringIO(text)))
    ks = KnownSplicing.from_splicing_iit(iit, db)
    assert list(ks.donor) == [E1 + EXLEN]
    assert list(ks.acceptor) == [E2]
    assert list(ks.antiacceptor) == [700]
    assert list(ks.antidonor) == [899]


def test_known_splice_snaps_ambiguous_junction(world):
    from tpumap.gsnap.driver import align_records
    from tpumap.io.fasta import Record

    db, index, read = world
    recs = [Record("r1", "", read)]

    # without known sites the flat-cost tie resolves to the earlier
    # boundary (q*=49)
    out0 = align_records(db, index, recs, novelsplicing=True)
    assert "N" in out0[0].cigar
    assert out0[0].cigar.startswith("49M")

    ks = KnownSplicing(donor=np.asarray([E1 + EXLEN], dtype=np.uint64),
                       acceptor=np.asarray([E2], dtype=np.uint64))
    out1 = align_records(db, index, recs, known=ks)
    assert out1[0].cigar == f"50M{E2 - E1 - EXLEN}N50M"
    assert out1[0].pos == E1 + 1
    assert "XS:A:+" in out1[0].tags


def test_dump_load_roundtrip(tmp_path):
    ks = KnownSplicing(donor=np.asarray([10, 20], dtype=np.uint64),
                       antiacceptor=np.asarray([5], dtype=np.uint64))
    ks.dump(str(tmp_path / "sp"))
    back = KnownSplicing.load(str(tmp_path / "sp.npz"))
    assert list(back.donor) == [10, 20]
    assert list(back.antiacceptor) == [5]
    assert len(back.acceptor) == 0


def test_gmap_known_splicing_snaps_junction(world, tmp_path):
    """gmap -s: the known donor/acceptor pair outranks the flat-cost tie
    in stage-3 bridge placement (the splicetrie role in
    Dynprog_genome_gap, src/dynprog_genome.c:417-474)."""
    import io as _io
    from contextlib import redirect_stdout
    from tpumap.cli.gmap_cli import main as gmap_main

    db, index, read = world
    db.save(str(tmp_path / "db"))
    # cDNA = the two exons joined (same ambiguous boundary as the gsnap
    # test: q*=49/50 tie)
    (tmp_path / "q.fa").write_text(">c1\n" + read + "\n")
    (tmp_path / "sp.fa").write_text(
        f">d chr1:{E1 + EXLEN}..{E1 + EXLEN + 1} donor\n"
        f">a chr1:{E2}..{E2 + 1} acceptor\n")
    from tpumap.cli.iit_cli import store_main
    buf = _io.StringIO()
    with redirect_stdout(buf):
        store_main(["-o", str(tmp_path / "sp"), str(tmp_path / "sp.fa")])

    def run(args):
        b = _io.StringIO()
        with redirect_stdout(b):
            gmap_main(args)
        return b.getvalue()

    plain = run(["-D", str(tmp_path / "db"), "-f", "introns",
                 str(tmp_path / "q.fa")])
    known = run(["-D", str(tmp_path / "db"), "-f", "introns", "-s",
                 str(tmp_path / "sp.iit"), str(tmp_path / "q.fa")])
    # with -s the intron is exactly the known one (1-based exon_end..next_start)
    assert f"chr1:{E1 + EXLEN}..{E2 + 1}" in known, known
    assert known != plain or f"chr1:{E1 + EXLEN}..{E2 + 1}" in plain
