"""Pallas megakernel receiver: interpret-mode event-for-event parity with
the XLA device receiver (the TPU-compiled path is round-2 work; see
ops/pallas_rx.py docstring)."""

import numpy as np
import pytest

from minimodem_tpu.models.modem import FskModem
from minimodem_tpu.ops.device_rx import DeviceReceiver


def test_mega_interpret_parity(monkeypatch):
    from jax.experimental import pallas as pl

    orig_call = pl.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return orig_call(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", interp_call)

    from minimodem_tpu.ops import pallas_rx as P

    P.build_mega_rx.cache_clear()
    try:
        m = FskModem("1200")
        payloads = [b"mega kernel parity", b"second stream, other text"]
        waves = [m.modulate(p) for p in payloads]
        L = max(len(w) for w in waves)
        batch = np.zeros((2, L), np.float32)
        for i, w in enumerate(waves):
            batch[i, :len(w)] = w
        totals = [len(w) for w in waves]

        ref_events, _ = DeviceReceiver(m.cfg).run_events_batch(
            batch, totals, 1.5, 2.3)
        mega_events = P.MegaReceiver(m.cfg).run_events_batch(
            batch, totals, 1.5, 2.3)
        for i in range(2):
            for a, b in zip(ref_events[i], mega_events[i]):
                assert np.array_equal(a, b)
    finally:
        P.build_mega_rx.cache_clear()
