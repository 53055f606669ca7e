"""Thin argparse wrappers over the library API (SURVEY.md §1 entry layer)."""
