"""A2S compiler tests: corpus coverage + targeted grammar checks."""

import glob
import os

import pytest

import audiality2_tpu as a2
from audiality2_tpu.errors import A2CompileError

CORPUS = sorted(
    glob.glob("/root/reference/benchmark/*.a2s")
    + glob.glob("/root/reference/test/data/*.a2s"))


@pytest.mark.parametrize("path", CORPUS, ids=[os.path.basename(p)
                                              for p in CORPUS])
def test_corpus_compiles(path):
    i = a2.open_engine(44100, 1024, 1)
    h = i.load(path)
    assert h > 0


def _compile(src):
    i = a2.open_engine(44100, 1024, 1)
    return i, i.load_string(src, "test")


def test_exports_visible():
    i, h = _compile("export Prog(a b=1) { end }\n")
    assert i.get(h, "Prog") > 0


def test_private_not_exported_elsewhere():
    i, h = _compile("Local() { end }\nexport Pub() { :Local; end }\n")
    assert i.get(h, "Pub") > 0
    # private objects are recorded in the private table, not exports
    bank = i.bank_of(h)
    assert "Local" in bank.private
    assert "Local" not in bank.exports


def test_def_constant_folding():
    i, h = _compile("def X 2.5\nexport P() { !v (X * 2 + 1); end }\n")
    assert i.get(h, "P") > 0


def test_expression_left_to_right():
    # no precedence: 2 + 3 * 4 == 20, not 14
    i, h = _compile("export def R (2 + 3 * 4)\n")
    c = i.get(h, "R")
    assert i.value_of(c) == 20.0


def test_note_suffix():
    i, h = _compile("export def N 12n\n")
    assert i.value_of(i.get(h, "N")) == 1.0


def test_freq_suffix():
    import math
    i, h = _compile("export def F 261.626f\n")
    assert abs(i.value_of(i.get(h, "F"))) < 1e-5


def test_struct_chain():
    i, h = _compile(
        "export P() { struct { wtosc; panmix } w sine; a 1; d 10; end }\n")
    p = i.get_program(i.get(h, "P"))
    assert len(p.units) == 2
    assert p.buffers == 1


def test_struct_autowire_inline():
    i, h = _compile(
        "export P() { struct { inline 0 *; panmix * > } d 10; end }\n")
    p = i.get_program(i.get(h, "P"))
    from audiality2_tpu.a2s.program import A2_SUBINLINE
    assert p.vflags & A2_SUBINLINE


def test_message_handler_eps():
    # NOTE: no code may follow a message handler (nocode rule)
    i, h = _compile("export P() {\n struct { wtosc }\n d 10; end\n"
                    " 1(x) { a x }\n}\n")
    p = i.get_program(i.get(h, "P"))
    assert p.eps[0] == 0
    assert p.eps[1] >= 1


def test_error_position():
    i = a2.open_engine(44100, 1024, 1)
    with pytest.raises(A2CompileError) as e:
        i.load_string("export P() {\n  $bogus\n}\n", "errtest")
    assert e.value.line == 2


def test_undefined_symbol_fails():
    i = a2.open_engine(44100, 1024, 1)
    with pytest.raises(A2CompileError):
        i.load_string("export P() { q 1; end }\n", "errtest")


def test_timing_not_in_handler():
    i = a2.open_engine(44100, 1024, 1)
    with pytest.raises(A2CompileError):
        i.load_string("export P() { 1() { d 10 } end }\n", "errtest")


def test_negative_literal_lexing():
    # '-1' with no space is a negative literal, so "(1 -1)" is two
    # terms with no operator -> EXPOP error; "(1 - 1)" subtracts.
    i, h = _compile("export def B (1 - 1)\n")
    assert i.value_of(i.get(h, "B")) == 0.0
    with pytest.raises(A2CompileError):
        _compile("export def A (1 -1)\n")


def test_wave_def_renders():
    src = """
W(F) { struct { wtosc } w sine; p F; a 1; d 50; end }
wave MyWave { wavetype MIPWAVE; samplerate 44100; length 441; W 0 }
export P() { struct { wtosc } w MyWave; a 1; d 10; end }
"""
    i, h = _compile(src)
    assert i.get(h, "MyWave") > 0
    w = i.get_wave(i.get(h, "MyWave"))
    assert w.size[0] == 441


def test_builtin_square_alias():
    i = a2.open_engine(44100, 1024, 1)
    sq = i.get(0, "square")
    p50 = i.get(0, "pulse50")
    assert sq == p50


def test_error_codes_match_reference():
    """Error codes verified against the reference binary's output for
    the same inputs (a2_ErrorString names)."""
    cases = [
        ('export P() { q 1; end }', "UNDEFSYM"),
        ('export P() { foo 1; end }', "UNDEFSYM"),
        ('export P() { q (1 + 1); end }', "EXPNAME"),
        ('export P() { struct { wtosc } 1() { a 1 } a 0; end }',
         "NOCODE"),
        ('export P() { 1() { d 10 } end }', "NOTIMING"),
        ('export def A (1 -1)', "EXPOP"),
        ('export P() { end } export P() { end }', "EXPEOS"),
    ]
    i = a2.open_engine(44100, 1024, 1)
    for src, code in cases:
        with pytest.raises(A2CompileError) as e:
            i.load_string(src + "\n", "errcase")
        assert e.value.code.name == code, src
