"""PySpark-native analytics engine with the query and data-processing
capabilities of mat3usz-mk/End-to-End-DataPipeline-Project, re-expressed
Spark-first (DataFrame/SQL/Catalyst/Structured Streaming).

Layout (SURVEY.md §7.1):

- ``session``    — SparkSession factory (ANSI, UTC, AQE, Arrow)
- ``schemas``    — Bronze/Silver/Gold StructTypes + testdata schemas
- ``sources``    — partition-aware JSON/Parquet readers
- ``sinks``      — partitioned parquet writers, pandas edge
- ``cleanse``    — Silver ops: explode/trim/cast/dropna/box/date/dedup
- ``geo``        — haversine Column fn + bounding-box predicate
- ``trajectory`` — lag-window enrichment: dist/fuel/cost/dt/speed
- ``reports``    — per-group aggregate report + top-k drilldowns
- ``relational`` — general join/set-op/window surface (TPC-H-ish)
- ``llm_ops``    — dedup / similarity / text-analysis / multimodal
- ``streaming``  — Structured Streaming bronze→silver with watermark
"""

__version__ = "0.1.0"
