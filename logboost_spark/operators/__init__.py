"""Relational operators: enrichment joins, dedup, similarity, combine."""
