"""Text-analysis workload over the documents table (training-data pipeline
operators mandated by BASELINE.json's north star). Filled in M-text."""
