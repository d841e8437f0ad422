"""CaseGuardDataPipeline-Spark: a PySpark-native analytics engine.

A from-scratch re-expression of the query/data-processing semantics of the
reference multi-tenant ETL pipeline (hamzavynta/CaseGuardDataPipeline) as
idiomatic Spark DataFrame/SQL operators, plus the large-scale training-data
operators (dedup, similarity search, text analysis, multimodal columns) that a
100 TB pipeline needs.

Design principles (see SURVEY.md §4/§7):
- Declarative DataFrame/SQL plans; Catalyst/AQE pick physical strategies.
- No driver-side collects inside operator paths.
- Broadcast small dimensions; shuffle only on true aggregation/join keys.
- Python stays out of the hot path: built-in functions first, Arrow-batched
  pandas UDFs only for genuinely external computation (LLM/embedding stubs).
"""

__version__ = "0.1.0"
