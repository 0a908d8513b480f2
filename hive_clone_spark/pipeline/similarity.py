"""Similarity-search operators (M5) — filled in after the relational core."""
