"""Column-expression libraries shared by the operator corpus.

``text``    — tokenization, shingling, cross-engine deterministic hashing
``vectors`` — dot product / norm / cosine over array<float> embeddings
"""
