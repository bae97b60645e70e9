"""Camera calibration: chessboard detection, Zhang init, LM refinement."""
