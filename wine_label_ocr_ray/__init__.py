"""Ray-Data-native extraction + data-processing engine.

A from-scratch re-expression of the query/data-processing capabilities
of the reference repo ``SrikarG30/wine-label-ocr`` (see SURVEY.md) as
idiomatic Ray Data pipelines over Arrow tables of interleaved
text+media documents, plus the bulk operators a large-scale
training-data pipeline needs (dedup, similarity search, text analysis).
"""

__version__ = "0.1.0"
