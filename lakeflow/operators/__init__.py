"""Batch relational operators: transforms, joins, aggregates, windows, merges."""
