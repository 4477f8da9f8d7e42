"""Drop-in compatibility facade: the reference package's public surface
(``mimicfouretl.*``) re-implemented on this engine's operators.

A user of ``kevinmenear/mimic-iv-etl`` can switch imports
(``import mimic_iv_etl_spark.compat as mimicfouretl``-style) and run the same
calls: same function/method names, same parameters, same output column names.
Internals are NOT ports: SQL-string templates became typed Column expressions,
aggregate-and-join-back became window functions, per-query CSV re-registration
became one-time view registration — each function's docstring cites the
reference ``file:line`` it is behavior-compatible with, and notes deliberate
defect fixes (SURVEY.md §2.12).
"""
