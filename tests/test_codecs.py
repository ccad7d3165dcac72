"""Unit tests for the databits codec layer (beyond the reference's
end-to-end-only strategy; these pin the byte-level contracts)."""

import pytest

from minimodem_tpu.codecs import (
    Ascii8Codec,
    BaudotCodec,
    BinaryCodec,
    CallerIdCodec,
    UicCodec,
    bit_reverse,
    bit_window,
)


def test_bit_utils():
    # reference: src/databits.h:21-46
    assert bit_reverse(0b1011, 4) == 0b1101
    assert bit_reverse(1, 8) == 0x80
    assert bit_window(0xABCD, 4, 8) == 0xBC
    assert bit_window(0xFFFFFFFFFFFFFFFF, 0, 64) == 0xFFFFFFFFFFFFFFFF


def test_ascii8():
    c = Ascii8Codec()
    assert c.encode(0x41) == [0x41]
    assert c.decode(0x141, 8) == b"A"  # masks to 8 bits


def test_baudot_roundtrip_with_shifts():
    enc = BaudotCodec()
    dec = BaudotCodec()
    dec.reset()
    msg = b"HELLO 42 WORLD? OK, 10:30!\nNEXT"
    out = bytearray()
    for byte in msg:
        for w in enc.encode(byte):
            out += dec.decode(w, 5)
    assert bytes(out) == msg


def test_baudot_usos():
    # after a space with USOS on, figures must be re-shifted
    enc = BaudotCodec(usos=True)
    words_a = enc.encode(ord("1"))     # FIGS + '1'
    words_b = enc.encode(ord(" "))     # space -> unshift
    words_c = enc.encode(ord("2"))     # must re-emit FIGS
    assert len(words_a) == 2 and len(words_c) == 2
    enc2 = BaudotCodec(usos=False)
    enc2.encode(ord("1"))
    enc2.encode(ord(" "))
    assert len(enc2.encode(ord("2"))) == 1  # still in FIGS


def test_baudot_skip_nonencodable(capsys):
    enc = BaudotCodec()
    assert enc.encode(ord("~")) == []
    assert "skipping non-encodable" in capsys.readouterr().err


def test_binary():
    c = BinaryCodec()
    assert c.decode(0b1011, 4) == b"1101\n"  # LSB first then newline


def _feed_cid(codec, payload: bytes) -> bytes:
    out = b""
    for b in payload:
        out += codec.decode(b, 8)
    return out


def test_callerid_mdmf():
    # MDMF: type 0x80, len, then TLVs: datetime, name, phone; checksum junk
    body = (
        b"\x01\x08" + b"03240902" +
        b"\x07\x08" + b"JOHN DOE" +
        b"\x02\x0a" + b"8005551212"
    )
    msg = bytes([0x80, len(body)]) + body + b"\x00"  # checksum not verified
    out = _feed_cid(CallerIdCodec(), msg)
    assert out == (b"CALLER-ID\n"
                   b"Time:  03/24 09:02\n"
                   b"Name:  JOHN DOE\n"
                   b"Phone: 800-555-1212\n")


def test_callerid_sdmf():
    body = b"09301224" + b"6095551212"
    msg = bytes([0x04, len(body)]) + body + b"\x00"
    out = _feed_cid(CallerIdCodec(), msg)
    assert out == (b"CALLER-ID\n"
                   b"Time:  09/30 12:24\n"
                   b"Phone: 609-555-1212\n")


def test_callerid_blocked_and_na():
    body = b"\x04\x01O" + b"\x08\x01P"
    msg = bytes([0x80, len(body)]) + body + b"\x00"
    out = _feed_cid(CallerIdCodec(), msg)
    assert out == b"CALLER-ID\nPhone: [N/A]\nName:  [blocked]\n"


def test_callerid_ignores_leading_junk():
    c = CallerIdCodec()
    assert c.decode(0x55, 8) == b""  # not a message-type byte
    assert c.decode(0x00, 8) == b""


def test_uic_decode():
    # train ID nibbles 1..6 LSB-first, message code 0x09 (MSB-first in frame)
    frame = 0
    for i, nib in enumerate([1, 2, 3, 4, 5, 6]):
        frame |= nib << (4 * i)
    frame |= bit_reverse(0x09, 8) << 24
    out = UicCodec("ground").decode(frame, 39)
    assert out == b"Train ID: 123456 - Message: 09 (Emergency stop)\n"
    out2 = UicCodec("train").decode(frame, 39)
    assert out2 == b"Train ID: 123456 - Message: 09 (Train staff wish to comm.)\n"
