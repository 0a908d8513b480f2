"""Streaming window operators (M4) — filled in after the relational core."""
