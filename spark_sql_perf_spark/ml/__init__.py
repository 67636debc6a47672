"""pyspark.ml benchmark battery (SURVEY.md §2.11 parity).

``datagen``     — deterministic feature/label/rating generators (replaces
                  mllib/data/dataGeneration.scala; labels come from known
                  ground-truth expressions since PySpark can't reach the
                  private ModelBuilder constructors).
``benchmarks``  — fit/transform/evaluate template per algorithm
                  (BenchmarkAlgorithm.scala:23-47 shape) with cartesian
                  param expansion (mllib/yaml.scala semantics, plain dicts).
"""
