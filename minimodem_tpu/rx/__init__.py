"""Receiver: carrier state machine + score provider."""

from .engine import Receiver, ScoreProvider  # noqa: F401
