"""Long-stream decode crosses the internal scoring-tile boundary
(T_TILE = 2^18 offsets); output must stay byte-exact across it."""

import numpy as np

from minimodem_tpu.models.modem import FskModem


def test_decode_across_tile_boundary():
    m = FskModem("1200")
    # ~7 s of audio -> t_total 2*2^18 -> two scoring tiles
    payload = bytes((33 + (i % 94)) for i in range(760))
    samples = m.modulate(payload)
    assert len(samples) > (1 << 18) + 1000
    assert m.demodulate(samples) == payload
