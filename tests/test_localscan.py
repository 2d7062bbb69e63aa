"""Localdb-equivalent salvage (ops/localscan.py + driver integration):
short splice-end fragments that the k-mer index cannot seed are located
by a window-restricted scan (src/localdb-read.c role)."""
import numpy as np
import pytest

from tpumap.io.fasta import Record
from tpumap.utils import dna

E1, E2, EXLEN = 4000, 9000, 88


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    from tpumap.index import build_db
    from tpumap.index.device import DeviceIndex

    d = tmp_path_factory.mktemp("ls")
    rng = np.random.default_rng(29)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 40000))
    (d / "g.fa").write_text(">chr1\n" + seq + "\n")
    db = build_db(d / "g.fa", name="ls", k=13, interval=3)
    return db, DeviceIndex.from_host(db), seq


def test_scan_fragment_exact(world):
    import jax.numpy as jnp
    from tpumap.ops.localscan import scan_fragment

    db, index, seq = world
    frag = seq[12345:12345 + 16]
    fc, _ = dna.encode(frag)
    pos, mm = scan_fragment(index.genome_packed,
                            jnp.asarray([12000], dtype=jnp.uint32),
                            jnp.asarray(fc[None, :]),
                            jnp.asarray([16], dtype=jnp.int32),
                            2048, 16)
    pos, mm = np.asarray(pos), np.asarray(mm)
    assert mm[0, 0] == 0
    assert int(pos[0, 0]) == 12345


def test_short_suffix_anchor_salvage(world):
    """A read with only 12 bp on the second exon (< k = 13) cannot seed
    the second diagonal; the window scan must place the junction."""
    from tpumap.gsnap.driver import align_records

    db, index, seq = world
    read = seq[E1:E1 + EXLEN] + seq[E2:E2 + 12]
    out = align_records(db, index, [Record("s", "", read)],
                        novelsplicing=True, max_intron=20000)
    rec = out[0]
    assert f"{E2 - E1 - EXLEN}N" in rec.cigar, rec
    assert rec.pos == E1 + 1
    assert "NM:i:0" in rec.tags


def test_salvage_past_32k(tmp_path):
    """A 50-kbp intron with a 12-bp distal fragment: the salvage window
    covers the reference's full 65,536-bp localdb region scale
    (src/localdb-write.c), not the 32-kbp cap round 1 shipped with."""
    from tpumap.gsnap.driver import align_records
    from tpumap.index import build_db
    from tpumap.index.device import DeviceIndex

    rng = np.random.default_rng(31)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 80000))
    e1, e2 = 4000, 54100                # intron ~50 kbp > 32768
    g = list(seq)
    g[e1 + EXLEN:e1 + EXLEN + 2] = "GT"
    g[e2 - 2:e2] = "AG"
    seq = "".join(g)
    (tmp_path / "g.fa").write_text(">chr1\n" + seq + "\n")
    db = build_db(tmp_path / "g.fa", name="ls2", k=13, interval=3)
    index = DeviceIndex.from_host(db)
    read = seq[e1:e1 + EXLEN] + seq[e2:e2 + 12]
    out = align_records(db, index, [Record("s", "", read)],
                        novelsplicing=True, max_intron=60000)
    rec = out[0]
    assert f"{e2 - e1 - EXLEN}N" in rec.cigar, rec
    assert rec.pos == e1 + 1


def test_short_prefix_anchor_salvage(world):
    from tpumap.gsnap.driver import align_records

    db, index, seq = world
    read = seq[E1 + EXLEN - 12:E1 + EXLEN] + seq[E2:E2 + EXLEN]
    out = align_records(db, index, [Record("p", "", read)],
                        novelsplicing=True, max_intron=20000)
    rec = out[0]
    assert f"{E2 - E1 - EXLEN}N" in rec.cigar, rec
    assert rec.cigar.startswith("12M")
    assert "NM:i:0" in rec.tags


def test_salvage_reverse_strand(world):
    from tpumap.gsnap.driver import align_records

    db, index, seq = world
    read = dna.revcomp(seq[E1:E1 + EXLEN] + seq[E2:E2 + 12])
    out = align_records(db, index, [Record("r", "", read)],
                        novelsplicing=True, max_intron=20000)
    rec = out[0]
    assert rec.flag & 16
    assert f"{E2 - E1 - EXLEN}N" in rec.cigar, rec
