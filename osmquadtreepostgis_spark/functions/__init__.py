"""Spark column-function surface: cells, geometry, tags, text, sketches."""
