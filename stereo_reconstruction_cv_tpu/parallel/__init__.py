"""Multi-chip parallelism: device meshes, sharded SGM, batched pipelines."""
