"""Structured-streaming variants of the engine's pipelines."""
