"""Analytic operators: vitality scoring, dedup, similarity, text stats."""
