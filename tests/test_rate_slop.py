"""Baud-rate tolerance: TX at 292..308 baud must decode exactly with RX
fixed at 300 baud (reference: tests/21-rate-slop.test) — exercises the
overscan/tracking machinery (reference: src/minimodem.c:1090-1110,1236-1241).
"""

import pytest

from .conftest import ASCII_FIXTURE, read_fixture
from .helpers import self_test


@pytest.mark.parametrize("tx_rate", [292, 299, 300, 301, 308])
def test_rate_slop(tmp_wav, tx_rate):
    self_test(read_fixture(ASCII_FIXTURE), tmp_wav(),
              [str(tx_rate)], rx_args=["300"])
