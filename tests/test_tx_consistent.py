"""TX determinism: repeated runs must produce byte-identical audio files
(reference: tests/16-verify-tx-consistent.test, 17-...-float.test)."""

import pytest

from .conftest import ASCII_FIXTURE, read_fixture
from .helpers import run_cli


@pytest.mark.parametrize("extra", [[], ["--float-samples"]],
                         ids=["s16", "float"])
def test_tx_consistent(tmp_path, extra):
    text = read_fixture(ASCII_FIXTURE)
    blobs = []
    for i in range(3):
        wav = str(tmp_path / f"c{i}.wav")
        code, _, err = run_cli(["--tx", "--file", wav, "1200", *extra], text)
        assert code == 0, err
        with open(wav, "rb") as f:
            blobs.append(f.read())
    assert blobs[0] == blobs[1] == blobs[2], "TX output not byte-deterministic"
