"""Scalar / array / JSON / UDF function surfaces."""
