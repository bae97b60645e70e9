"""Learned models: XFeat-style feature detector/descriptor network."""
