"""Single-process NumPy oracle.

Plays the role R's ``stats::*`` / ``urca`` play for the reference's test
suite (SURVEY.md §5): an independent, simple, sequential implementation of
every kernel, used to pin the distributed Ray pipelines bit-exactly
(rollups) or to golden tolerances (features, decompositions).
"""
