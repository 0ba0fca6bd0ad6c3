"""CLI export-dump switches (-x family) and -v: the reference
a2play's full dump tree (a2play/a2play.c:116-273, 566-575) — module
exports, root exports, private symbols, object handles, VM assembly.
"""

import audiality2_tpu  # noqa: F401  (engine import sanity)
from audiality2_tpu import cli

BENCH = "/root/reference/benchmark"
DATA = "/root/reference/test/data"


def _run(capsys, argv):
    rc = cli.main(argv)
    out = capsys.readouterr().out
    assert not rc
    return out


def test_dump_module_exports(capsys):
    out = _run(capsys, [f"{DATA}/testprograms.a2s", "-x", "-st", "0"])
    assert "PlayTestWave" in out and "program" in out
    assert "(exports)" in out
    # private symbols stay hidden without -xp
    assert "a2sversion" not in out


def test_dump_private_and_handles(capsys):
    out = _run(capsys, [f"{DATA}/testprograms.a2s", "-xp", "-xh",
                        "-st", "0"])
    assert "(private symbols)" in out
    assert "a2sversion" in out and "title" in out
    # -xh: every line carries the numeric handle column
    line = next(ln for ln in out.splitlines()
                if "PlayTestWave " in ln)
    assert any(tok.isdigit() for tok in line.split())


def test_dump_root_exports(capsys):
    out = _run(capsys, [f"{DATA}/testprograms.a2s", "-xr",
                        "-st", "0"])
    # built-in waves with geometry, all 22 units with I/O + registers
    assert "MIPWAVE" in out and "LOOPED" in out
    assert "wtosc" in out and "R: w p a phase" in out
    assert "a2_rootdriver" in out


def test_dump_asm(capsys):
    out = _run(capsys, [f"{BENCH}/k2trance.a2s", "-xa", "-st", "0"])
    assert "INITV" in out or "LOAD" in out


def test_version(capsys):
    out = _run(capsys, ["-v"])
    assert "a2play" in out and "Engine v" in out
