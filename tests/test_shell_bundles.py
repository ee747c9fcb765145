"""The shell entry points' flag bundles must parse through config.py.

The reference drives everything through train.sh/eval.sh/test.sh flag
bundles (/root/reference/train.sh:2-26, eval.sh:1-20, test.sh:1-18); our
scripts mirror that surface. This smoke test extracts the exact argv each
script would hand to main.py and runs it through the real parser + the
config constructors, so the shell surface cannot drift from config.py.
"""

import pathlib
import re
import shlex

import pytest

from crfp_tpu.config import model_config, parse_args, train_config

REPO = pathlib.Path(__file__).resolve().parents[1]

pytestmark = pytest.mark.fast


def _script_argv(name: str) -> list[str]:
    """Extract the `python3 main.py ...` argv from a shell script."""
    text = (REPO / name).read_text()
    # join backslash-continued lines, drop comments
    text = text.replace("\\\n", " ")
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("python3 main.py") or line.startswith("python main.py"):
            toks = shlex.split(line)
            return toks[2:]  # after `python3 main.py`
    raise AssertionError(f"no main.py invocation found in {name}")


@pytest.mark.parametrize("script", ["train.sh", "eval.sh", "test.sh"])
def test_shell_bundle_parses(script):
    argv = _script_argv(script)
    args = parse_args(argv)
    # every --flag in the script must be a real parser option (argparse
    # would have raised), and the config constructors must accept the result
    mcfg = model_config(args)
    assert mcfg.variant in {"v13", "v15", "v18", "v18_cra", "no_dcn", "basic_fvsr"}
    tcfg = train_config(args)
    assert tcfg.lr_rate > 0


def test_train_bundle_is_recipe_of_record():
    args = parse_args(_script_argv("train.sh"))
    # the reference recipe of record: /root/reference/train.sh:2-26
    assert args.variant == "v18"
    assert args.mid_channels == 32
    assert args.batch_size == 8
    assert args.GT_size == 256
    assert args.FV_size == 128
    assert args.N_frames == 15
    assert args.scale == 8
    assert float(args.lr_rate) == 2e-4
    assert float(args.lr_rate_flow) == 2.5e-5


def test_eval_test_bundles_set_modes():
    ev = parse_args(_script_argv("eval.sh"))
    assert ev.eval is True
    te = parse_args(_script_argv("test.sh"))
    assert te.test is True


def test_every_script_flag_is_a_parser_option():
    """No script may pass a flag the parser silently ignores via REMAINDER
    etc. — collect the option strings and compare."""
    from crfp_tpu.config import build_parser

    known = set()
    for action in build_parser()._actions:
        known.update(action.option_strings)
    for script in ("train.sh", "eval.sh", "test.sh"):
        flags = {t for t in _script_argv(script) if t.startswith("--")}
        unknown = flags - known
        assert not unknown, f"{script} passes unknown flags: {unknown}"
