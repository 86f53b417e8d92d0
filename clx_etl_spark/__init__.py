"""clx-spark: a PySpark-native analytics / data-pipeline engine.

Re-expresses the full query and data-processing surface of the reference
ETL system (codeluxer/clx-etl, see SURVEY.md) as an idiomatic Spark
DataFrame operator library, plus the large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing)
that a 100 TB corpus pipeline needs.

Layout:
    session     SparkSession factory with scale-tuned defaults
    catalog     testdata loading + canonical views
    schemas     explicit StructTypes for the domain catalog (SURVEY §1.2)
    functions   reusable Column helpers (alignment, decimals, hashing, tokens)
    operators   pure DataFrame -> DataFrame operators (SURVEY §2)
    sources     rate-limited REST adapters + payload normalizers
    sinks       idempotent MERGE upsert + partitioned writers
    streaming   Structured Streaming wrappers of the batch operators
    queries     the oracle-checked query registry driving __spark_entry__
    plans       flow compositions + the declarative job schedule
    api         Engine facade (the user-landing surface)
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy so `import clx_etl_spark` stays cheap and session-free
    if name == "Engine":
        from .api import Engine

        return Engine
    raise AttributeError(name)
