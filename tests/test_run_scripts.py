"""The scripts/run_*.sh sweeps must stay launchable: every flag they
pass has to be accepted by the real CLI parsers (the reference's own
run_moma.sh calls a file that does not exist — SURVEY §4's class of
drift this test prevents).

Each `python -m moma_tpu.cli.<entry>` invocation is extracted from the
shell text (continuations joined, $COMMON inlined, ${VAR:+...} optional
groups dropped, loop/env vars stubbed) and fed verbatim to
parse_teacher_args / parse_student_args.
"""

import re
import shlex
import subprocess
from pathlib import Path

import pytest

from moma_tpu.core.config import parse_student_args, parse_teacher_args

SCRIPTS = sorted((Path(__file__).parent.parent / "scripts").glob("run_*.sh"))


def _invocations(text: str):
    text = text.replace("\\\n", " ")
    # inline COMMON="..."
    m = re.search(r'^COMMON="([^"]*)"', text, re.M)
    if m:
        text = text.replace("$COMMON", m.group(1))
    # drop ${VAR:+...} optional groups, stub loop/env vars
    text = re.sub(r"\$\{\w+:\+[^}]*\}", "", text)
    text = text.replace('"$trial"', "0").replace("$trial", "0")
    text = re.sub(r'"\$\w+"', "/tmp/stub", text)
    text = re.sub(r"\$\w+", "/tmp/stub", text)
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("python -m moma_tpu.cli."):
            toks = shlex.split(line)
            yield toks[2].rsplit(".", 1)[-1], toks[3:]


def test_scripts_exist():
    assert {p.name for p in SCRIPTS} == {
        "run_vanilla.sh", "run_moma.sh", "run_comparison.sh"}


@pytest.mark.parametrize("script", SCRIPTS, ids=lambda p: p.name)
def test_bash_syntax(script):
    subprocess.run(["bash", "-n", str(script)], check=True)


@pytest.mark.parametrize("script", SCRIPTS, ids=lambda p: p.name)
def test_every_flag_parses(script):
    parsers = {"train_teacher": parse_teacher_args,
               "train_student": parse_student_args}
    invocations = list(_invocations(script.read_text()))
    assert invocations, f"no CLI invocation found in {script.name}"
    for entry, argv in invocations:
        cfg = parsers[entry](argv)  # SystemExit here = flag drift
        assert cfg.data.dataset == "prostate_hv"
        assert cfg.data.batch_size == 64
        assert cfg.data.image_size == 512


def test_comparison_tuned_weights():
    """The reference's tuned c/d/b weights (scripts/run_comparison.sh)."""
    text = (Path(__file__).parent.parent / "scripts" /
            "run_comparison.sh").read_text()
    got = {}
    for entry, argv in _invocations(text):
        cfg = parse_student_args(argv)
        got[cfg.distill.distill] = (
            cfg.distill.cls, cfg.distill.div, cfg.distill.beta)
    assert got == {
        "kd": (1, 0, 1), "hint": (1, 1, 100), "correlation": (1, 1, 0.02),
        "crd": (1, 1, 0.8), "attention": (1, 1, 1000),
        "semckd": (1, 0, 50), "simkd": (0, 0, 1),
    }


def test_moma_sweep_config():
    text = (Path(__file__).parent.parent / "scripts" /
            "run_moma.sh").read_text()
    (entry, argv), = _invocations(text)
    cfg = parse_student_args(argv)
    assert cfg.distill.distill == "moma"
    assert cfg.moma.nce_k == 16384
    assert cfg.moma.head == "mlp"
    assert cfg.moma.feat_dim == 512


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
