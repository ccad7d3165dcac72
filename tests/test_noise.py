"""Noise injection: exact decode must survive uniform read-noise up to
factor 0.5 against TX volume 0.5 (reference: tests/40-noise.test,
41-noise-purefreqs.test; noise knob at src/simpleaudio-sndfile.c:64-70 —
note this build injects genuine uniform noise from a seeded PRNG, which is
strictly harder than the reference's integer-division DC offset)."""

import pytest

from .conftest import ASCII_FIXTURE, read_fixture
from .helpers import self_test


@pytest.mark.parametrize("noise", ["0.00", "0.05", "0.10", "0.50"])
@pytest.mark.parametrize("flags", [["1200"], ["1200", "-M", "1200", "-S", "2400"]],
                         ids=["default", "purefreqs"])
def test_noise(tmp_wav, noise, flags):
    self_test(read_fixture(ASCII_FIXTURE), tmp_wav(),
              [*flags, "--volume", "0.5"],
              rx_args=[*flags, "--Xrxnoise", noise, "--rx-one"])
