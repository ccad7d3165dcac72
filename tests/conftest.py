"""Test fixtures.  (Environment cleanup — clean CPU jax with 8 virtual
devices — happens in the repo-root conftest.py, which re-execs pytest
before output capture starts.)"""

from __future__ import annotations

import os

import pytest


@pytest.fixture
def tmp_wav(tmp_path):
    def _mk(name="t.wav"):
        return str(tmp_path / name)
    return _mk


ASCII_FIXTURE = os.path.join(os.path.dirname(__file__), "data", "ascii.txt")
BAUDOT_FIXTURE = os.path.join(os.path.dirname(__file__), "data", "baudot.txt")
MULTIBYTE_FIXTURE = os.path.join(os.path.dirname(__file__), "data", "multibyte.txt")


def read_fixture(path: str) -> bytes:
    with open(path, "rb") as f:
        return f.read()
