"""Planning layer: statistics-driven multi-join strategy choice.

The reference fork's research contribution is a modified-Spark HyperCube
multiway shuffle (MultiJoinSelection / HyperCubeExchangeCoordinator,
performance-log:155,416) toggled by `spark.sql.hypercube.strategiesChoosing`
with sketch params (sampleCardinality=1000, sketchTries=500). A physical
shuffle operator can't be added from Python; the idiomatic re-expression
(SURVEY.md §4) is the *decision layer*: sample-based cardinality
estimation feeding join-order + broadcast/repartition choices, exposed as
the same toggleable variation.
"""
