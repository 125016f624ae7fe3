"""Host runtime: options, logging, timing, pipeline threading."""
