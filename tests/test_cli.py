# CLI argument-surface smoke tests (parser wiring only — the heavy
# subcommands are exercised by their own suites / on-chip runs).
import pytest

from sherpa_vietnamese_asr_tpu import cli


def _parse(argv):
    """Parse argv through the real parser; intercept dispatch."""
    captured = {}

    class _P:
        def __call__(self, args):
            captured.update(vars(args))
            return 0

    # main() dispatches to args.fn(args); swap in a capture shim by
    # parsing through a parser clone from main's own wiring.
    import argparse

    orig = argparse.ArgumentParser.parse_args

    def spy(self, a=None, ns=None):
        args = orig(self, a, ns)
        if hasattr(args, "fn"):
            captured.update(vars(args))
            args.fn = _P()
        return args

    argparse.ArgumentParser.parse_args = spy
    try:
        rc = cli.main(argv)
    finally:
        argparse.ArgumentParser.parse_args = orig
    assert rc == 0
    return captured


def test_transcribe_args_roundtrip():
    a = _parse(["transcribe", "x.wav", "--beam", "4", "--dtype", "bfloat16",
                "--rover", "--diarize", "--punctuate", "--quality",
                "--hotwords-file", "hw.txt", "--hotwords-score", "2.5",
                "--max-batch", "16", "--no-vad", "--resume",
                "--allow-random"])
    assert a["audio"] == "x.wav" and a["beam"] == 4
    assert a["dtype"] == "bfloat16" and a["rover"] and a["diarize"]
    assert a["hotwords_score"] == 2.5 and a["max_batch"] == 16
    assert a["enable_resume"] and a["allow_random"]


def test_all_subcommands_parse():
    for argv in (["serve", "--port", "9000", "--warmup"],
                 ["warmup", "--stages", "decode,streaming"],
                 ["verify-assets", "--json"],
                 ["install-service", "--output", "u.service"],
                 ["calibrate", "--autotune", "--candidates", "8,48"],
                 ["monitor", "--samples", "2"]):
        a = _parse(argv)
        assert a["cmd"] == argv[0]


def test_rejects_unknown_dtype():
    with pytest.raises(SystemExit):
        _parse(["transcribe", "x.wav", "--dtype", "float16"])


def test_requires_subcommand():
    with pytest.raises(SystemExit):
        _parse([])
