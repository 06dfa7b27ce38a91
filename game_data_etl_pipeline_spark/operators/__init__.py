"""Relational operator families (scans, joins, aggregates, windows, set ops)."""
