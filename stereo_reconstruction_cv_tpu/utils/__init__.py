"""Utilities: drawing, profiling, misc host helpers."""
