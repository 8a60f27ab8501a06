"""Structured Streaming side of the engine: the stateful controller
(reference G2, SparkStructuredController.scala:74,96-118) and streaming
variants of the batch operators. Batch and streaming share one semantics —
the batch twin in operators/controller.py is the executable spec."""
