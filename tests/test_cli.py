"""CLI tools: build, gsnap (sam/m8), get-genome; parity with reference."""
import io
import pathlib
import subprocess
import sys
from contextlib import redirect_stdout

import numpy as np
import pytest

REFBIN = pathlib.Path("/tmp/refbin")
GMAP_BUILD = pathlib.Path("/root/reference/bin/gmap_build")

need_oracle = pytest.mark.skipif(
    not (REFBIN / "gsnap").exists() or not GMAP_BUILD.exists(),
    reason="reference oracle binaries unavailable")


def run_cli(module_main, args):
    buf = io.StringIO()
    with redirect_stdout(buf):
        module_main(args)
    return buf.getvalue()


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(42)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 20000))
    (d / "g.fa").write_text(">chr1\n" + "\n".join(
        seq[i:i + 60] for i in range(0, len(seq), 60)) + "\n")
    comp = str.maketrans("ACGT", "TGCA")
    lines = []
    for r in range(20):
        p = int(rng.integers(0, len(seq) - 100))
        s = seq[p:p + 100]
        if r % 2:
            s = s.translate(comp)[::-1]
        lines.append(f">q{r}\n{s}\n")
    (d / "reads.fa").write_text("".join(lines))
    from tpumap.cli.build_cli import main as build_main
    build_main(["-D", str(d), "-d", "g", "-k", "12", "-q", "3",
                str(d / "g.fa")])
    return d, seq


def test_build_and_gsnap_sam(world):
    d, seq = world
    from tpumap.cli.gsnap_cli import main as gsnap_main
    out = run_cli(gsnap_main, ["-D", str(d / "g"), "-d", "g",
                               str(d / "reads.fa")])
    lines = [l for l in out.splitlines() if not l.startswith("@")]
    assert len(lines) == 20
    assert all(not int(l.split("\t")[1]) & 4 for l in lines)


@need_oracle
def test_gsnap_m8_parity(world):
    d, seq = world
    subprocess.run([str(GMAP_BUILD), "-B", str(REFBIN), "-D", str(d / "refdb"),
                    "-d", "g", "-k", "12", "-q", "3", "--local=0",
                    str(d / "g.fa")], check=True, capture_output=True)
    ref = subprocess.run([str(REFBIN / "gsnap"), "-D", str(d / "refdb"),
                          "-d", "g", "-A", "m8", str(d / "reads.fa")],
                         capture_output=True, text=True).stdout
    from tpumap.cli.gsnap_cli import main as gsnap_main
    mine = run_cli(gsnap_main, ["-D", str(d / "g"), "-d", "g", "-A", "m8",
                                str(d / "reads.fa")])
    ref_first = {}
    for line in ref.splitlines():
        f = line.split("\t")
        ref_first.setdefault(f[0], line)
    for line in mine.splitlines():
        assert line == ref_first[line.split("\t")[0]], line


@need_oracle
def test_get_genome_parity(world):
    d, seq = world
    from tpumap.cli.get_genome_cli import main as gg_main
    for region in ["chr1:101..160", "chr1:160..101", "chr1:19941..20000"]:
        mine = run_cli(gg_main, ["-D", str(d / "g"), "-d", "g", region])
        ref = subprocess.run([str(REFBIN / "get-genome"), "-D",
                              str(d / "refdb"), "-d", "g", region],
                             capture_output=True, text=True).stdout
        assert mine == ref, region
