"""Host-side I/O: image loading, PLY export, artifact caching."""
