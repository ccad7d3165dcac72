"""In-process CLI test harness.

Python counterpart of the reference's tests/self-test bash driver
(reference: tests/self-test:52-84): TX text -> WAV, RX WAV -> text, require
byte equality, parse the NOCARRIER stats line, and optionally require the
"confidence=inf ... (rate perfect)" marker for perfection tests.
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import contextmanager

from minimodem_tpu import cli


class _StdinShim:
    def __init__(self, data: bytes):
        self.buffer = io.BytesIO(data)


class _StdoutShim:
    def __init__(self):
        self.buffer = io.BytesIO()
        self._text = io.StringIO()

    def write(self, s):
        return self._text.write(s)

    def flush(self):
        pass


@contextmanager
def _redirect(stdin_bytes: bytes):
    old = sys.stdin, sys.stdout, sys.stderr
    sys.stdin = _StdinShim(stdin_bytes)
    sys.stdout = _StdoutShim()
    sys.stderr = io.StringIO()
    try:
        yield sys.stdout, sys.stderr
    finally:
        sys.stdin, sys.stdout, sys.stderr = old


def run_cli(argv, stdin_bytes: bytes = b""):
    """Run the CLI in-process.  Returns (exit_code, stdout_bytes, stderr_str)."""
    with _redirect(stdin_bytes) as (out, err):
        try:
            code = cli.main(list(argv))
        except SystemExit as e:
            code = e.code if isinstance(e.code, int) else 1
        return code, out.buffer.getvalue(), err.getvalue()


def parse_stats(stderr_text: str) -> str:
    """Extract the '### NOCARRIER <stats> ###' payload."""
    m = re.search(r"### NOCARRIER (.*) ###", stderr_text)
    assert m, f"no NOCARRIER stats in stderr:\n{stderr_text}"
    return m.group(1)


def self_test(text: bytes, wav_path: str, tx_args, rx_args=None,
              perfect: bool = False) -> str:
    """TX text->wav, RX wav->text, assert byte-exact; return stats payload."""
    rx_args = list(tx_args) if rx_args is None else list(rx_args)

    code, _, tx_err = run_cli(["--tx", "--file", wav_path, *tx_args], text)
    assert code == 0, f"tx failed ({code}): {tx_err}"

    code, out, err = run_cli(["--rx", "--file", wav_path, *rx_args])
    assert code == 0, f"rx failed ({code}): {err}"
    assert out == text, (
        f"decode mismatch:\n expected {text!r}\n got      {out!r}\n"
        f"stderr: {err}")

    if perfect:
        assert re.search(r"confidence=inf .*\(rate perfect\)", err), (
            f"not a perfect decode: {err}")
    return parse_stats(err)
