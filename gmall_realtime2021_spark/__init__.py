"""gmall_realtime2021_spark — a PySpark-native analytics engine.

A ground-up re-expression of the query and data-processing
capabilities of the reference streaming warehouse
``SunZhipengBigData/gmall-realtime2021`` (Flink 1.12 DataStream +
Flink SQL) as idiomatic Spark: DataFrame / Spark SQL for the batch
semantics, Structured Streaming for the streaming skin.

Layout (mirrors SURVEY.md §2's operator inventory):

- ``session``    — SparkSession factory with the engine's conventions
- ``tables``     — loaders/views for the test star schema
- ``schemas``    — StructTypes for the reference's JSON topics
- ``functions``  — scalar/UDTF surface (tokenizer F1, hashes, vectors)
- ``operators``  — reusable operator builders (routing R3, dedup, ANN,
                   sessionization T1-T3, unpivot R5)
- ``plans``      — the DWD/DWM/DWS query catalog (each with a DuckDB
                   oracle twin) exported to ``__spark_entry__``
- ``streaming``  — Structured Streaming sources/sinks/jobs (S1-S6, W3-W8)
- ``multimodal`` — binary-column (image/audio) plumbing with stubbed codecs
"""

__version__ = "0.1.0"
