"""Perfection tests: with integer-ratio frequencies the decode must report
confidence=inf and "(rate perfect)" (reference: tests/10-15)."""

import pytest

from .conftest import ASCII_FIXTURE, read_fixture
from .helpers import self_test

PERFECT_ARGS = ["1200", "--samplerate", "24000", "-M", "1200", "-S", "2400"]


@pytest.mark.parametrize("extra", [
    [],                                 # reference: tests/10
    ["--lut=0"],                        # reference: tests/11
    ["--lut=16"],                       # reference: tests/12
    ["--lut=0", "--float-samples"],     # reference: tests/13
    ["--lut=16", "--float-samples"],    # reference: tests/14
    ["--float-samples"],                # reference: tests/15
], ids=["default", "nolut", "lut16", "nolut-float", "lut16-float", "float"])
def test_perfect(tmp_wav, extra):
    self_test(read_fixture(ASCII_FIXTURE), tmp_wav(),
              PERFECT_ARGS + extra, perfect=True)
