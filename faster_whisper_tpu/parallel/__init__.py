"""Multi-chip execution: device meshes and sharding layouts."""
