"""Round-trip self-tests per mode/rate.

Mirrors the reference test corpus (reference: tests/01..09, 60, 80, 81):
byte-exact TX->WAV->RX loopback across baud rates, framing modes, LUT
configurations, and sample formats.
"""

import pytest

from .conftest import ASCII_FIXTURE, BAUDOT_FIXTURE, MULTIBYTE_FIXTURE, read_fixture
from .helpers import self_test


@pytest.mark.smoke
def test_1200(tmp_wav):
    # reference: tests/01-self-test-1200.test
    self_test(read_fixture(ASCII_FIXTURE), tmp_wav(), ["1200"])


def test_300(tmp_wav):
    # reference: tests/02-self-test-300.test
    self_test(read_fixture(ASCII_FIXTURE), tmp_wav(), ["300"])


@pytest.mark.smoke
def test_rtty(tmp_wav):
    # reference: tests/03-self-test-rtty.test
    self_test(read_fixture(BAUDOT_FIXTURE), tmp_wav(), ["rtty"])


def test_0p5_baud(tmp_wav):
    # reference: tests/04-self-test-0.5.test
    self_test(b"KAMAL\n", tmp_wav(), ["0.5"])


def test_12000(tmp_wav):
    # reference: tests/05-self-test-12000.test
    self_test(read_fixture(ASCII_FIXTURE), tmp_wav(), ["12000"])


def test_float_samples(tmp_wav):
    # reference: tests/06-self-test-float-samples.test
    self_test(read_fixture(ASCII_FIXTURE), tmp_wav(), ["--float-samples", "12000"])


def test_no_lut(tmp_wav):
    # reference: tests/07-self-test-no-lut.test
    self_test(read_fixture(ASCII_FIXTURE), tmp_wav(), ["1200", "--lut=0"])


def test_lut16(tmp_wav):
    # reference: tests/08-self-test-lut16.test
    self_test(read_fixture(ASCII_FIXTURE), tmp_wav(), ["1200", "--lut=16"])


def test_lut16_float(tmp_wav):
    # reference: tests/09-self-test-lut16-float.test
    self_test(read_fixture(ASCII_FIXTURE), tmp_wav(),
              ["1200", "--lut=16", "--float-samples"])


def test_multibyte(tmp_wav):
    # reference: tests/60-multibyte.test
    self_test(read_fixture(MULTIBYTE_FIXTURE), tmp_wav(), ["1200"])


@pytest.mark.smoke
def test_same(tmp_wav):
    # reference: tests/80-SAME.test
    self_test(read_fixture(ASCII_FIXTURE), tmp_wav(), ["same"])


def test_ascii7(tmp_wav):
    # reference: tests/81-ascii7.test  (smoke keeps test_1200 for the
    # ascii geometry and test_rtty for baudot/fractional stop bits)
    self_test(read_fixture(ASCII_FIXTURE), tmp_wav(), ["-7", "1200"])


def test_tdd(tmp_wav):
    # reference: tests/81-tdd.test
    self_test(read_fixture(BAUDOT_FIXTURE), tmp_wav(), ["tdd"])
