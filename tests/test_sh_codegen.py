"""The offline sympy SH generator (tools/sh_codegen.py, the analog of the
reference's sh_gen.py) must agree with the hand-written runtime table."""

import pathlib
import sys

import pytest

sympy = pytest.importorskip("sympy")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tools"))


def test_symbolic_basis_matches_runtime_table():
    import sh_codegen

    err = sh_codegen.check_against_table(degree=4, samples=128)
    assert err < 1e-5, err


def test_emit_python_is_valid_code():
    import sh_codegen

    src = sh_codegen.emit_python(sh_codegen.generate(2))
    ns = {}
    exec(src, {"math": __import__("math")}, ns)
    basis = ns["BASIS"]
    assert len(basis) == 9
    import math

    v = basis[0](0.0, 0.0, 1.0)
    assert abs(v - 0.28209479177387814) < 1e-12
