"""Brotli encode pipeline (quality-tiered, host golden path + device kernels)."""

from .api import Encoder, encode

__all__ = ["encode", "Encoder"]
