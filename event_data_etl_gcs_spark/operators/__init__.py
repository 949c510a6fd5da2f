from .relational import argmax_latest, latest_row_per_key

__all__ = ["argmax_latest", "latest_row_per_key"]
