"""Flag-surface regression gate: every CLI flag of every reference subcommand
must be accepted by the corresponding ccsmeth-tpu subcommand (docs/PARITY.md
"Every reference flag of every subcommand is accepted").

The reference parser is built by importing /root/reference/ccsmeth/ccsmeth.py
(pysam stubbed, tests/refmodels.py pattern) and intercepting `main()`'s
`parse_args` call to capture the fully-constructed ArgumentParser; both sides
are then introspected via argparse internals (subparser choices ->
option_strings). Documented deliberate deviations (docs/PARITY.md §6) are the
only allowed gaps."""

import argparse

from tests.refmodels import import_reference_models


# docs/PARITY.md §6: trainm's NCCL rendezvous quartet is replaced by
# jax.distributed's coordinator/world flags.
ALLOWED_MISSING = {
    "trainm": {"--nodes", "--ngpus_per_node", "--dist-url", "--node_rank",
               "--epoch_sync"},
}


def _capture_parser(build_main):
    """Run a main() that constructs an ArgumentParser and calls parse_args();
    intercept parse_args to capture the parser without executing anything."""
    captured = {}

    class _Stop(Exception):
        pass

    orig = argparse.ArgumentParser.parse_args

    def fake_parse_args(self, *a, **k):
        captured["parser"] = self
        raise _Stop

    argparse.ArgumentParser.parse_args = fake_parse_args
    try:
        build_main()
    except _Stop:
        pass
    finally:
        argparse.ArgumentParser.parse_args = orig
    return captured["parser"]


def _sub_flags(parser):
    """{subcommand: set(option_strings)} from a top-level argparse parser."""
    subs = {}
    for action in parser._actions:
        if isinstance(action, argparse._SubParsersAction):
            for name, sp in action.choices.items():
                flags = set()
                for act in sp._actions:
                    flags.update(act.option_strings)
                subs[name] = flags
    return subs


def test_reference_flags_are_subset():
    import_reference_models()  # installs the pysam stub + sys.path
    import ccsmeth.ccsmeth as ref_cli

    from ccsmeth_tpu.cli import get_parser

    ref = _sub_flags(_capture_parser(ref_cli.main))
    ours = _sub_flags(get_parser())

    assert set(ref) <= set(ours), "missing subcommands: {}".format(
        set(ref) - set(ours))
    problems = []
    for sub, flags in ref.items():
        missing = flags - ours[sub] - ALLOWED_MISSING.get(sub, set())
        if missing:
            problems.append("{}: {}".format(sub, sorted(missing)))
    assert not problems, "reference flags not accepted:\n" + "\n".join(problems)
