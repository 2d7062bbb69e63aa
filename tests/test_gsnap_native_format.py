"""GSNAP native output format (-A default; the reference's default
format, src/path-print-alignment.c) — byte-checked against the oracle
for substitution / mismatch / minus-strand / deletion / nomapping."""
import io
import pathlib
import subprocess
from contextlib import redirect_stdout

import numpy as np
import pytest

REFBIN = pathlib.Path("/tmp/refbin")
GMAP_BUILD = pathlib.Path("/root/reference/bin/gmap_build")
need_oracle = pytest.mark.skipif(
    not (REFBIN / "gsnap").exists() or not GMAP_BUILD.exists(),
    reason="reference oracle binaries unavailable")


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    d = tmp_path_factory.mktemp("native")
    rng = np.random.default_rng(53)
    genome = "".join("ACGT"[i] for i in rng.integers(0, 4, 9000))
    (d / "g.fa").write_text(">chr1\n" + genome + "\n")
    comp = str.maketrans("ACGT", "TGCA")
    s = list(genome[1000:1100])
    s[30] = {"A": "C", "C": "A", "G": "T", "T": "G"}[s[30]]
    cases = [
        ("plain", genome[2000:2100]),
        ("mm", "".join(s)),
        ("minus", genome[1000:1100].translate(comp)[::-1]),
        ("del3", genome[1000:1050] + genome[1053:1103]),
        ("nohit", "AC" * 50),
    ]
    (d / "reads.fa").write_text(
        "".join(f">{n}\n{q}\n" for n, q in cases))
    from tpumap.cli.build_cli import main as build_main
    build_main(["-D", str(d), "-d", "g", "-k", "12", "-q", "3",
                str(d / "g.fa")])
    return d


def run_native(d, extra=()):
    from tpumap.cli.gsnap_cli import main as gsnap_main
    buf = io.StringIO()
    with redirect_stdout(buf):
        gsnap_main(["-D", str(d / "g"), "-A", "default", *extra,
                    str(d / "reads.fa")])
    return buf.getvalue()


def test_native_structure(world):
    out = run_native(world)
    blocks = [b for b in out.split("\n\n") if b.strip()]
    assert len(blocks) == 5
    by_acc = {b.splitlines()[0].split("\t")[2]: b for b in blocks}
    # plain: one segment line, full span
    plain = by_acc["plain"].splitlines()
    assert plain[0].split("\t")[1] == "1"
    assert plain[1].startswith(" ")
    f = plain[1].split("\t")
    assert f[1] == "1..100"
    assert f[2] == "+chr1:2001..2100"
    assert f[3] == "start:0..end:0"
    # mismatch shown as lowercase genome base
    mm = by_acc["mm"].splitlines()[1].split("\t")[0]
    assert sum(1 for c in mm if c.islower()) == 1
    # minus: read orientation, descending coords
    mi = by_acc["minus"].splitlines()[1].split("\t")
    assert mi[2] == "-chr1:1100..1001"
    # deletion: 2 segments, deleted bases lowercased on line 1
    d3 = by_acc["del3"].splitlines()
    assert len(d3) == 3
    assert d3[1].split("\t")[3] == "start:0..del:3"
    assert d3[2].startswith(",")
    assert d3[2].split("\t")[3] == "del:3..end:0"
    # nomapping: header only, npaths 0
    assert by_acc["nohit"].splitlines()[0].split("\t")[1] == "0"
    assert len(by_acc["nohit"].splitlines()) == 1


@need_oracle
def test_native_oracle_parity(world, tmp_path):
    subprocess.run([str(GMAP_BUILD), "-B", str(REFBIN), "-D",
                    str(tmp_path / "refdb"), "-d", "g", "-k", "12",
                    "-q", "3", "--local=0", str(world / "g.fa")],
                   check=True, capture_output=True)
    ref = subprocess.run([str(REFBIN / "gsnap"), "-D",
                          str(tmp_path / "refdb"), "-d", "g",
                          str(world / "reads.fa")],
                         capture_output=True, text=True).stdout
    mine = run_native(world)
    assert mine == ref
