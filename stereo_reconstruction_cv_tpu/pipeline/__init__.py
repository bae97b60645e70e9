"""High-level pipeline stages mirroring the reference's API surface."""
