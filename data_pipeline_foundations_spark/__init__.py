"""data_pipeline_foundations_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the public reference repo nsaracino02/data-pipeline-foundations
("Pypeline", surveyed in SURVEY.md), extended with large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal
plumbing).

Layout:
    session    — SparkSession factory (AQE, UTC session tz, local tuning)
    tables     — testdata table loading / temp-view registration
    registry   — query registry powering __spark_entry__.queries()
    functions/ — reusable column-expression libraries (money, datetime, enums,
                 text, hashing)
    operators/ — composite operators (waterfall apportionment, dedup-latest,
                 MinHash/SimHash dedup, ANN similarity, calendar generation)
    plans/     — the query inventory over the TESTDATA star schema; every
                 SURVEY.md §2 operator appears here as a registered query
    sources/   — IO: parquet/CSV/JSON readers & writers, warehouse catalog ops,
                 driver-side connector stubs (Drive/JDBC/Excel)
    streaming/ — Structured Streaming equivalents of the incremental paths
    pipelines/ — end-to-end reference-pipeline re-implementations over fixtures
"""

__version__ = "0.1.0"
