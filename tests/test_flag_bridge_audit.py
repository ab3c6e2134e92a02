"""Machine-checked CLI flag-bridge audit.

The reference's four entry points (train_teacher.py, train_student_moma.py,
train_student_comparison.py, test.py) each define their flags with argparse.
This audit extracts every option string straight from the reference SOURCE
(the files cannot be imported — train_teacher.py:29 / test.py:30 carry the
broken `helper.loops_RFF` import, SURVEY.md §4) and asserts the matching
moma_tpu parser accepts it, either as a wired flag or as a documented
reference-compatibility no-op (core/config.py / cli/test_eval.py).

This pins the "a user of the reference can switch and find everything"
contract at the CLI surface: any flag the reference grows (or we drop)
fails here, with the flag named.
"""

from __future__ import annotations

import os
import re

import pytest

REF = "/root/reference"

# add_argument('--flag', ...) / add_argument('-f', '--factor', ...)
_OPT = re.compile(
    r"add_argument\(\s*'(-{1,2}[A-Za-z0-9_\-]+)'(?:\s*,\s*'(-{1,2}[A-Za-z0-9_\-]+)')?"
)


def reference_flags(fname: str) -> set:
    path = os.path.join(REF, fname)
    if not os.path.exists(path):
        pytest.skip(f"reference file {fname} not present")
    with open(path) as f:
        src = f.read()
    flags = set()
    for m in _OPT.finditer(src):
        flags.add(m.group(1))
        if m.group(2):
            flags.add(m.group(2))
    assert flags, f"no argparse flags parsed from {fname} — regex drift?"
    return flags


def accepted(parser) -> set:
    return set(parser._option_string_actions)


def _assert_bridged(ref_file: str, parser):
    missing = sorted(reference_flags(ref_file) - accepted(parser))
    assert not missing, (
        f"reference {ref_file} flags not accepted by the moma_tpu parser: "
        f"{missing} — wire them or add them to the documented "
        f"reference-compatibility no-op table"
    )


def test_train_teacher_flags_bridged():
    from moma_tpu.core.config import teacher_parser

    _assert_bridged("train_teacher.py", teacher_parser())


def test_train_student_moma_flags_bridged():
    from moma_tpu.core.config import student_parser

    _assert_bridged("train_student_moma.py", student_parser())


def test_train_student_comparison_flags_bridged():
    from moma_tpu.core.config import student_parser

    _assert_bridged("train_student_comparison.py", student_parser())


def test_test_py_flags_bridged():
    from moma_tpu.cli.test_eval import build_parser

    _assert_bridged("test.py", build_parser())


def test_parsers_still_parse_reference_command_lines():
    """The canonical scripts/run_moma.sh command line (reference flags only)
    must parse into a Config — guards the refactor that exposed the parsers."""
    from moma_tpu.core.config import parse_student_args, parse_teacher_args

    cfg = parse_student_args(
        "--dataset prostate_hv --model_s effiB0 --model_t effiB0 "
        "--distill cmo -c 1 -d 1 -b 1 --feat_dim 512 --head mlp --attn self "
        "--std_pre PANDA --tec_pre PANDA --batch_size 4 --epochs 1 "
        "--gpu_id 0,1 --deterministic --multiprocessing-distributed "
        "--dist-url tcp://127.0.0.1:23451".split()
    )
    assert cfg.distill.distill in ("cmo", "moma")
    assert cfg.moma.head == "mlp"
    tcfg = parse_teacher_args(
        "--dataset cifar100 --model resnet32x4 --batch_size 4 --epochs 1 "
        "--dali gpu --weight 1e-4".split()
    )
    assert tcfg.model_s.name == "resnet32x4"
