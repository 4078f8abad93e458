"""Reusable distributed operators (dedup, bloom, robots, topk, budget,
similarity, text analysis)."""
