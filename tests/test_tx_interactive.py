"""Interactive TX semantics (reference: src/minimodem.c:114-250):

- select()-driven idle detection injects an idle carrier tone while stdin
  stalls (--tx-carrier / file mode with a slow pipe),
- the SIGALRM-armed trailer fires mid-stream in interactive mode,
- and the fallback bulk path keeps byte-determinism for non-selectable
  stdin (in-process tests, `< file` redirects buffered by the runner).
"""

import os
import threading
import time

import numpy as np
import pytest

from minimodem_tpu.codecs import get_codec
from minimodem_tpu.config import TxOptions
from minimodem_tpu.models.modem import FskModem
from minimodem_tpu.ops.tx import Transmitter
from minimodem_tpu.sigio import SampleFormat


class CaptureStream:
    def __init__(self):
        self.chunks = []

    def write(self, samples):
        self.chunks.append(np.asarray(samples, np.float32))

    def samples(self):
        return (np.concatenate(self.chunks) if self.chunks
                else np.zeros(0, np.float32))


def _tx(interactive, tx_carrier, writes, gap_sec):
    """Run transmit_stdin over a real pipe with a writer thread that
    pauses gap_sec between writes."""
    m = FskModem("1200")
    opts = TxOptions(interactive=interactive, tx_carrier=tx_carrier)
    txer = Transmitter(m.cfg, opts, get_codec("ascii8"), SampleFormat.FLOAT)
    r, w = os.pipe()

    def writer():
        for i, chunk in enumerate(writes):
            if i:
                time.sleep(gap_sec)
            os.write(w, chunk)
        os.close(w)

    th = threading.Thread(target=writer)
    th.start()
    stream = CaptureStream()
    with os.fdopen(r, "rb", buffering=0) as stdin:
        txer.transmit_stdin(stdin, stream, interactive, tx_carrier)
    th.join()
    return m, stream.samples()


def _baseline_len(payload: bytes) -> int:
    m = FskModem("1200")
    opts = TxOptions()
    txer = Transmitter(m.cfg, opts, get_codec("ascii8"), SampleFormat.FLOAT)
    stream = CaptureStream()
    txer.transmit_bytes(payload, stream)
    return len(stream.samples())


def test_idle_carrier_between_writes():
    """File mode (non-interactive): a stalled pipe produces idle carrier
    tone between the two bursts (reference: src/minimodem.c:230-237); the
    decoded bytes are unchanged."""
    m, samples = _tx(False, False, [b"AB", b"CD"], gap_sec=0.3)
    base = _baseline_len(b"ABCD")
    idle_unit = int(m.cfg.sample_rate / 25)        # 1/25 s of carrier
    assert len(samples) >= base + 2 * idle_unit, (len(samples), base)
    # idle span is pure mark carrier: nonzero amplitude throughout the gap
    assert m.demodulate(samples) == b"ABCD"


def test_txcarrier_idle_before_data():
    """--tx-carrier in interactive mode emits carrier while stdin has no
    data yet (reference: src/minimodem.c:156,230-237)."""
    m, samples = _tx(True, True, [b"", b"XY"], gap_sec=0.1)
    base = _baseline_len(b"XY")
    assert len(samples) > base  # leading idle carrier present
    assert m.demodulate(samples) == b"XY"


def test_interactive_sigalrm_trailer():
    """Interactive mode without --tx-carrier: a mid-stream stdin gap fires
    the SIGALRM trailer + 0.5 s flush (reference: src/minimodem.c:59-74,
    139-158), then TX restarts with a fresh leader on the next byte."""
    m, samples = _tx(True, False, [b"AB", b"CD"], gap_sec=0.3)
    # the 0.5 s zero-sample flush only exists in interactive mode
    flush = m.cfg.sample_rate // 2
    assert len(samples) >= _baseline_len(b"ABCD") + flush
    z = (samples == 0.0).astype(np.int8)
    edges = np.diff(np.concatenate([[0], z, [0]]))
    starts = np.where(edges == 1)[0]
    ends = np.where(edges == -1)[0]
    zero_run = int((ends - starts).max()) if len(starts) else 0
    assert zero_run >= flush  # a contiguous 0.5 s silence block
    assert m.demodulate(samples) == b"ABCD"


def test_bulk_fallback_matches_transmit_bytes():
    """Non-selectable stdin (BytesIO) falls back to the deterministic bulk
    path — byte-identical to transmit_bytes."""
    import io

    m = FskModem("1200")
    opts = TxOptions()
    t1 = Transmitter(m.cfg, opts, get_codec("ascii8"), SampleFormat.FLOAT)
    s1 = CaptureStream()
    t1.transmit_stdin(io.BytesIO(b"hello"), s1, False, False)
    t2 = Transmitter(m.cfg, opts, get_codec("ascii8"), SampleFormat.FLOAT)
    s2 = CaptureStream()
    t2.transmit_bytes(b"hello", s2)
    assert np.array_equal(s1.samples(), s2.samples())
