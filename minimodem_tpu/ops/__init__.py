"""Compute ops: TX synthesis and RX demod scoring (JAX/XLA/Pallas)."""
