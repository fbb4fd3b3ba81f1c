"""sparksync — a PySpark-native database-sync & data-pipeline engine.

Re-expresses the capabilities of iverycd/OracleSync2MySQL (a Go CLI that
migrates a full Oracle database into MySQL-family targets and verifies row
counts) as an idiomatic Spark library: partitioned JDBC/parquet extract,
schema/type translation, DDL synthesis, parallel batched load, object
migration, source<->target verification, plus LLM-data-pipeline extensions
(dedup, similarity search, text analysis, streaming incremental sync)
designed for 100 TB scale.

Layout (SURVEY.md section 7):
  config    YAML -> Config                 [~ reference cmd/root.go:536-571]
  session   SparkSession builder
  typemap   Oracle -> (Spark, MySQL) types [~ reference cmd/tablemeta.go:93-158]
  ddl       CREATE TABLE/INDEX/FK/... synthesis + dialect rewrites
  catalog   SchemaExtractor / TableSpec
  source    partitioned reads (jdbc | parquet)
  sink      batched writes (jdbc | parquet) + sink-side DDL executor
  sync      orchestration of the migration phases
  compare   count / checksum / row-diff verification
  ext       dedup, similarity, textops, jsonops, stream
"""

__version__ = "0.1.0"
