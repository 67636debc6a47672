"""Column-expression libraries shared by the operator corpus.

``text``     — tokenization, shingling, cross-engine deterministic hashing
``vectors``  — dot product / norm / cosine over array<float> embeddings
``sketches`` — mergeable HLL/Count-Min/quantile sketches (scale path for
               cardinality and frequency questions)
"""
