"""Golden TX determinism pins: the byte-exact WAV output for fixed inputs
is part of the product contract (reference: tests/16-verify-tx-consistent);
these hashes pin it across code changes.  If a synthesis change is
intentional, regenerate with:

    python -m tests.test_golden
"""

import hashlib
import os

from .helpers import run_cli

PAYLOAD = b"golden determinism pin 0123456789\n"

EXPECTED = {
    ("1200",):
        "b9f5d98c9433660f1bf546f7f3696a24596253e2ea0c83a7bee592c05d617ea0",
    ("300",):
        "25044ba40b3ddca71405377d9e8b45482b0b3358393530d50f1ae2336dc6b33e",
    ("rtty",):
        "88d16802a459b2906f87dae4a2a8be0faac7ade229e4e1cea9294936360b5b99",
    ("same",):
        "54b02c1e5c2d789300839101313b68cf740c09ec8458d389e5c1f5d564f4f9a0",
    ("1200", "--float-samples"):
        "0c14506cc9ab547acf1aef9fafeb7d76794fd364b50e9314aeee87c850497deb",
    ("1200", "--lut=0"):
        "d5eecb830365600bdd94169ffdfccd0b5e041e9c73d54ed6c387453d7001e141",
}


def _tx_hash(tmp_path, args) -> str:
    wav = str(tmp_path / "g.wav")
    code, _, err = run_cli(["--tx", "--file", wav, *args], PAYLOAD)
    assert code == 0, err
    with open(wav, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def test_golden_tx_hashes(tmp_path):
    mismatches = {}
    for args, want in EXPECTED.items():
        got = _tx_hash(tmp_path, list(args))
        if got != want:
            mismatches[args] = got
    assert not mismatches, (
        f"TX output changed for {mismatches} — if intentional, regenerate "
        f"with `python -m tests.test_golden`")


if __name__ == "__main__":
    import pathlib
    import sys
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        print("EXPECTED = {")
        for args in EXPECTED:
            h = _tx_hash(pathlib.Path(td), list(args))
            print(f"    {args!r}:\n        \"{h}\",")
        print("}")
