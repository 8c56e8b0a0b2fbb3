"""Composed end-to-end jobs: one scheduling round, a crawl-to-quiescence
driver loop, and the control-plane pass."""
