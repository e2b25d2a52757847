"""L6 benchmark harness: corpus synthesis + GB/s measurement."""
