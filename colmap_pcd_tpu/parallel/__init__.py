"""Multi-chip scale-out: meshes, distributed Schur BA, sharded matching."""
