"""Structured Streaming layer: sources, watermarked aggregations, sinks."""
