"""Embedding similarity workload (cosine near-dup, ANN top-k).
Filled in M-vectors."""
