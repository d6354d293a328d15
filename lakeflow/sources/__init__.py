"""Batch and streaming source abstractions."""
