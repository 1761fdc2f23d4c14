"""Sources & ingest — SURVEY.md §2.1 (S5-S7) and §1.3.

CSV → Parquet pipelines replacing the reference's LoadFileCommand /
CreateColStoreCommand, plus an encoding-analysis report mirroring
``storage/FileAnalyzer.java:48-238`` (which picks RLE / DICTIONARY / NONE
per column from cardinality, run count, and sortedness in one pass).
Parquet makes those encodings automatic, but the *report* is still useful
for layout decisions (sort keys, partition columns), so `analyze_encoding`
computes the same three signals with distributed aggregates.
"""

from maple_spark.sources.ingest import csv_to_parquet, jsonl_to_parquet, analyze_encoding

__all__ = ["csv_to_parquet", "jsonl_to_parquet", "analyze_encoding"]
