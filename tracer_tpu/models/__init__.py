"""Ready-made optical models (parity with reference tracer/models/)."""
