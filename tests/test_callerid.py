"""Caller-ID golden decode tests: TX the raw CID byte vector as plain
1200/ascii, RX in callerid mode, compare rendered output
(reference: tests/70-callerid-mdmf.test, 71-callerid-sdmf.test)."""

import pytest

from .helpers import run_cli

MDMF_BODY = (
    b"\x01\x08" + b"07040831" +
    b"\x07\x09" + b"ADA LOVEL" +
    b"\x02\x0a" + b"4155550142"
)
MDMF_BYTES = bytes([0x80, len(MDMF_BODY)]) + MDMF_BODY + b"\x11"
MDMF_GOLDEN = (b"CALLER-ID\n"
               b"Time:  07/04 08:31\n"
               b"Name:  ADA LOVEL\n"
               b"Phone: 415-555-0142\n")

SDMF_BODY = b"12311159" + b"2125550199"
SDMF_BYTES = bytes([0x04, len(SDMF_BODY)]) + SDMF_BODY + b"\x22"
SDMF_GOLDEN = (b"CALLER-ID\n"
               b"Time:  12/31 11:59\n"
               b"Phone: 212-555-0199\n")


def _cid_roundtrip(tmp_wav, payload: bytes, golden: bytes):
    wav = tmp_wav()
    code, _, err = run_cli(["--tx", "--file", wav, "1200", "--ascii"], payload)
    assert code == 0, err
    code, out, err = run_cli(["--rx", "--file", wav, "callerid"])
    assert code == 0, err
    assert out == golden, (out, err)


@pytest.mark.smoke
def test_callerid_mdmf(tmp_wav):
    _cid_roundtrip(tmp_wav, MDMF_BYTES, MDMF_GOLDEN)


def test_callerid_sdmf(tmp_wav):
    _cid_roundtrip(tmp_wav, SDMF_BYTES, SDMF_GOLDEN)


# ---- upstream golden vectors (tests/data/README.md): the exact .bytes
# files the reference ships must decode to its exact .txt goldens
# (reference: tests/70-callerid-mdmf.test:24-42, 71-callerid-sdmf.test) ----

def _reference_fixture(tmp_wav, name: str):
    import pathlib

    d = pathlib.Path(__file__).parent / "data"
    payload = (d / f"testdata-callerid-{name}.bytes").read_bytes()
    golden = (d / f"testdata-callerid-{name}.txt").read_bytes()
    _cid_roundtrip(tmp_wav, payload, golden)


def test_callerid_mdmf_reference_fixture(tmp_wav):
    _reference_fixture(tmp_wav, "mdmf")


def test_callerid_sdmf_reference_fixture(tmp_wav):
    _reference_fixture(tmp_wav, "sdmf")
