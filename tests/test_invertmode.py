"""gmap -I/--invertmode minus-strand display (src/pair.c invertmode) +
alignment formatting knobs (--wraplength/--nolengths/--nomargin).

Mode 0 (default): original cDNA vs descending minus-strand genome —
byte-checked against the reference gmap where oracle binaries exist."""
import io
import pathlib
import subprocess
from contextlib import redirect_stdout

import numpy as np
import pytest

REFBIN = pathlib.Path("/tmp/refbin")
need_oracle = pytest.mark.skipif(not (REFBIN / "gmap").exists(),
                                 reason="reference oracle unavailable")


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    d = tmp_path_factory.mktemp("inv")
    rng = np.random.default_rng(17)
    g = list("".join("ACGT"[i] for i in rng.integers(0, 4, 6000)))
    g[2080:2082] = "GT"
    g[2278:2280] = "AG"
    genome = "".join(g)
    (d / "g.fa").write_text(">chr1\n" + genome + "\n")
    comp = str.maketrans("ACGT", "TGCA")
    cdna = genome[2000:2080] + genome[2280:2360]
    (d / "qminus.fa").write_text(f">qm\n{cdna.translate(comp)[::-1]}\n")
    return d


def run_gmap(args):
    from tpumap.cli.gmap_cli import main as gmap_main
    buf = io.StringIO()
    with redirect_stdout(buf):
        gmap_main(args)
    return buf.getvalue()


def test_minus_mode0_structure(world):
    out = run_gmap(["-A", "-g", str(world / "g.fa"),
                    str(world / "qminus.fa")])
    assert "(- strand)" in out
    # genome coordinates descend in the default minus view
    assert "2,360..2,001" in out
    assert "(-360 bp)" in out
    # exon list reversed: first line is the high-coordinate exon
    lines = out.splitlines()
    ex = [l for l in lines if l.startswith("    2")]
    assert ex[0].startswith("    2360-2281  (1-80)")
    assert ex[1].startswith("    2080-2001  (81-160)")
    assert "<-" in ex[0]
    # match row arrows flipped in the reversed stream
    assert "<<<...<<<" in out


def test_minus_mode2_is_aligned_stream(world):
    out = run_gmap(["-A", "-I", "2", "-g", str(world / "g.fa"),
                    str(world / "qminus.fa")])
    lines = out.splitlines()
    ex = [l for l in lines if l.startswith("    2")]
    assert ex[0].startswith("    2001-2080  (160-81)")
    assert ">>>...>>>" in out


@need_oracle
def test_minus_mode0_oracle_parity(world, tmp_path):
    ref = subprocess.run([str(REFBIN / "gmap"), "-g",
                          str(world / "g.fa"), "-A",
                          str(world / "qminus.fa")],
                         capture_output=True, text=True).stdout
    mine = run_gmap(["-A", "-g", str(world / "g.fa"),
                     str(world / "qminus.fa")])
    assert mine == ref


def test_wraplength_and_nomargin(world):
    out = run_gmap(["-A", "--wraplength", "60", "--nomargin", "-g",
                    str(world / "g.fa"), str(world / "qminus.fa")])
    # genome rows are raw 60-char blocks without the 15-char margin
    rows = [l for l in out.splitlines()
            if l and set(l) <= set("ACGT.")]
    assert any(len(l) == 60 for l in rows)


def test_nolengths(world):
    out = run_gmap(["-A", "--nolengths", "-g", str(world / "g.fa"),
                    str(world / "qminus.fa")])
    # the 200 intron-length label is gone from the query row of the
    # alignment body (the exon summary still shows ...200...)
    body = out.split("Alignment for path 1:")[1]
    block_rows = [l for l in body.splitlines()
                  if "<<<...<<<" in l or ">>>...>>>" in l]
    assert block_rows
    assert "   200   " not in body.split("\n\n", 2)[2]
