"""Deduplication workload (exact, MinHash-LSH, SimHash, n-gram Jaccard).
Filled in M-dedup."""
