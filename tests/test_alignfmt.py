"""-A / -S text format: byte parity with align.test.ok and the oracle."""
import io
import pathlib
import subprocess
from contextlib import redirect_stdout

import pytest

REF_TESTS = pathlib.Path("/root/reference/tests")
REFBIN = pathlib.Path("/tmp/refbin")

need_fixtures = pytest.mark.skipif(not REF_TESTS.is_dir(),
                                   reason="reference fixtures unavailable")
need_oracle = pytest.mark.skipif(not (REFBIN / "gmap").exists(),
                                 reason="oracle gmap unavailable")


def run_cli(args):
    from tpumap.cli.gmap_cli import main
    buf = io.StringIO()
    with redirect_stdout(buf):
        main(args)
    return buf.getvalue()


@need_fixtures
def test_align_format_matches_golden():
    """THE reference end-to-end oracle: tests/align.test byte equality."""
    out = run_cli(["-A", "-g", str(REF_TESTS / "ss.chr17test"),
                   str(REF_TESTS / "ss.her2")])
    assert out == (REF_TESTS / "align.test.ok").read_text()


@need_fixtures
@need_oracle
def test_summary_format_matches_oracle():
    out = run_cli(["-S", "-g", str(REF_TESTS / "ss.chr17test"),
                   str(REF_TESTS / "ss.her2")])
    ref = subprocess.run([str(REFBIN / "gmap"), "-S", "-g",
                          str(REF_TESTS / "ss.chr17test"),
                          str(REF_TESTS / "ss.her2")],
                         capture_output=True, text=True).stdout
    assert out == ref
