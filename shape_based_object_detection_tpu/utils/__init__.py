"""Shared utilities: image normalization, torch weight conversion, metrics."""
