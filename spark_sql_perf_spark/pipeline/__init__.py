"""LLM-data-pipeline operators (north-star extension, not reference parity).

Deduplication (exact, MinHash+LSH, SimHash, embedding near-dup), similarity
search (brute-force + LSH-bucketed ANN), text analysis (stats, language-ID,
token counting, fingerprinting), corpus curation (benchmark
decontamination, blocklist/repetition filters, deterministic splits and
mixtures, sequence packing), and multimodal binary-column plumbing —
the operations a 100 TB training-data pipeline needs (BASELINE.json
north_star).
"""
