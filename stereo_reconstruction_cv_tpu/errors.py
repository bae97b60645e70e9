"""Typed errors and result handling at the API boundary (SURVEY §5).

The reference signals failure three ways: string returns for missing data
(gui.py:99-100, 217-218), try/except returning None (main.ipynb cell 11
+17-22), and Tk message boxes for bad input (gui.py:465-472). This module
gives the framework one coherent contract:

- Stage functions that mirror the reference's dict surface keep returning
  ``{"error": "..."}`` (bug-for-bug parity where callers expect it), but
  every such dict can be promoted to a typed exception with
  :func:`raise_on_error`.
- Everything that raises, raises a :class:`StereoError` subclass so
  callers can catch one family: ``DataError`` (missing/invalid inputs),
  ``CalibrationError`` (detection/optimization failures),
  ``GeometryError`` (degenerate/underdetermined estimation).
"""

from __future__ import annotations

from typing import Any, Dict


class StereoError(Exception):
    """Base class for every error this framework raises."""


class DataError(StereoError, FileNotFoundError):
    """Missing or malformed input data (images, pair folders, baselines).

    Subclasses FileNotFoundError so pre-round-3 callers that caught the
    stdlib type keep working."""


class CalibrationError(StereoError):
    """Chessboard detection or calibration optimization failed."""


class GeometryError(StereoError):
    """Two-view estimation failed or is degenerate (too few matches,
    rank-deficient solve)."""


_KIND = {
    "data": DataError,
    "calibration": CalibrationError,
    "geometry": GeometryError,
}


def error_dict(message: str, kind: str = "data") -> Dict[str, str]:
    """Reference-parity error return with a typed tag for promotion."""
    return {"error": message, "error_kind": kind}


def raise_on_error(result: Dict[str, Any]) -> Dict[str, Any]:
    """Promote a stage's ``{"error": ...}`` return to its typed exception;
    pass non-error results through unchanged."""
    if isinstance(result, dict) and "error" in result:
        cls = _KIND.get(result.get("error_kind", "data"), StereoError)
        raise cls(result["error"])
    return result
