"""Device meshes, shardings, multi-stream batching."""
