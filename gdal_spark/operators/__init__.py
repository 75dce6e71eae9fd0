"""Distributed operators: the Spark-facing API of the engine."""
