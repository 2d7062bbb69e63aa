"""All remaining GMAP output formats: byte parity vs the oracle on HER2."""
import io
import pathlib
import subprocess
from contextlib import redirect_stdout

import pytest

REF_TESTS = pathlib.Path("/root/reference/tests")
REFBIN = pathlib.Path("/tmp/refbin")

need = pytest.mark.skipif(
    not REF_TESTS.is_dir() or not (REFBIN / "gmap").exists(),
    reason="reference fixtures/oracle unavailable")

CASES = [["-f", "1"], ["-f", "4"], ["-f", "6"], ["-f", "introns"],
         ["-f", "samse"], ["-E", "cdna"], ["-E", "genomic"],
         ["-E", "cdna+introns"], ["-E", "genomic+introns"], ["-P"], ["-Q"]]


@need
@pytest.mark.parametrize("args", CASES, ids=["".join(c) for c in CASES])
def test_format_parity_her2(args):
    from tpumap.cli.gmap_cli import main
    G = str(REF_TESTS / "ss.chr17test")
    Q = str(REF_TESTS / "ss.her2")
    buf = io.StringIO()
    with redirect_stdout(buf):
        main(args + ["-g", G, Q])
    mine = [l for l in buf.getvalue().splitlines() if not l.startswith("#")]
    ref = subprocess.run([str(REFBIN / "gmap")] + args + ["-g", G, Q],
                         capture_output=True, text=True).stdout
    refl = [l for l in ref.splitlines()
            if not (l.startswith("#") or l.startswith("@"))]
    assert mine == refl
