"""Scalar function library (SURVEY.md §2.9–§2.11).

Everything here is a pure ``Column -> Column`` builder over
``pyspark.sql.functions`` — JVM-side, codegen-friendly, no Python in
the hot path. The NLP family (``nlp``) adds deterministic heuristic
models where the reference called external APIs."""
