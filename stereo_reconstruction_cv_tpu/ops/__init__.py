"""TPU-native compute ops: geometry, robust estimation, matching, disparity."""
