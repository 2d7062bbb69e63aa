"""Circular chromosomes (gmap_build -c): doubled coordinate span so
origin-crossing reads align contiguously; reported positions wrap."""
import numpy as np
import pytest

from tpumap.io.fasta import Record


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    from tpumap.index import build_db
    from tpumap.index.device import DeviceIndex

    d = tmp_path_factory.mktemp("circ")
    rng = np.random.default_rng(43)
    lin = "".join("ACGT"[i] for i in rng.integers(0, 4, 12000))
    circ = "".join("ACGT"[i] for i in rng.integers(0, 4, 5000))
    (d / "g.fa").write_text(f">lin\n{lin}\n>plasmid\n{circ}\n")
    db = build_db(d / "g.fa", name="c", k=13, interval=3,
                  circular={"plasmid"})
    return db, DeviceIndex.from_host(db), lin, circ


def test_header_reports_true_length(world):
    from tpumap.io import sam

    db, _, lin, circ = world
    h = sam.header(db)
    assert f"SN:plasmid\tLN:{len(circ)}" in h
    assert f"SN:lin\tLN:{len(lin)}" in h


def test_origin_crossing_read(world):
    from tpumap.gsnap.driver import align_records

    db, index, lin, circ = world
    read = circ[-60:] + circ[:40]        # crosses the origin
    out = align_records(db, index, [Record("o", "", read)])
    rec = out[0]
    assert rec.rname == "plasmid"
    assert rec.pos == len(circ) - 60 + 1
    assert rec.cigar == "100M"
    assert "NM:i:0" in rec.tags


def test_position_wraps(world):
    from tpumap.gsnap.driver import align_records

    db, index, lin, circ = world
    # a read from the start of the plasmid may seed in the second copy;
    # the reported position must still be < true length
    read = circ[100:200]
    out = align_records(db, index, [Record("w", "", read)])
    rec = out[0]
    assert rec.rname == "plasmid" and rec.pos == 101


def test_linear_unaffected(world):
    from tpumap.gsnap.driver import align_records

    db, index, lin, circ = world
    out = align_records(db, index, [Record("l", "", lin[2000:2100])])
    assert out[0].rname == "lin" and out[0].pos == 2001
