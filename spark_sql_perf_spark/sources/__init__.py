"""Data sources: pure-Spark deterministic generators + file readers.

``datagen``  — replaces the reference's external dsdgen pipeline
               (tpcds/Tables.scala:45-104) with spark.range + hash-derived
               column expressions: deterministic at ANY parallelism, no
               child processes, no text parsing.
``readers``  — edge-list / JSON / text sources (ego-net, whitespace pairs,
               skewed JSON — SURVEY.md §2.1 S2-S4).
"""
