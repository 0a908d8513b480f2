"""Multimodal binary-column operators (M5) — filled in after the relational core."""
