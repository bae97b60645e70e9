"""Pallas TPU kernels for the hot dense-stereo path."""
