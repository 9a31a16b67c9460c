"""PySpark-native analytics/ingestion engine.

A from-scratch, Spark-first reimplementation of the capabilities of the
reference repo ``Oatmeal-Farm-Network/Data-Ingestion-tool-Bakasura-``
(see SURVEY.md): document ingestion (extract -> normalize -> chunk ->
hash -> dedup -> embed -> index) plus the query surface the reference
delegates to Azure AI Search (filter / project / top / count / facet /
sort / full-text / vector KNN), plus the LLM-data-pipeline extension
surface (dedup families, similarity search, multimodal columns, text
analysis) and a full relational layer.

Everything is declared as lazy DataFrame transforms so Catalyst picks
physical strategy; Python appears only in Arrow-batched pandas UDFs for
genuinely non-relational steps (chunking, embedding providers, media
decode stubs).
"""

from data_ingestion_tool_bakasura__spark.session import get_spark, validate_config

__all__ = ["get_spark", "validate_config"]
