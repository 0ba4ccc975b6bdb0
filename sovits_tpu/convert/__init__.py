"""Checkpoint conversion: torch reference state_dicts -> sovits_tpu params."""

from . import from_torch
