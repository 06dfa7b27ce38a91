"""Reference-parity game-data ETL pipeline (extract -> transform -> load)."""
