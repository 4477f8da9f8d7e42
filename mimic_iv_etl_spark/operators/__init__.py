"""Operator library: the reference's analytic inventory (SURVEY.md §2)
re-expressed Spark-first, plus large-scale training-data operators."""
