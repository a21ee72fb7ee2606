"""Verification / measurement tools (not part of the serving path)."""
