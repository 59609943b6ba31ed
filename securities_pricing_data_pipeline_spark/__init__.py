"""securities_pricing_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference pipeline ``zooviee/Securities-Pricing-Data-Pipeline`` (an
Airflow + Snowflake + S3 daily EOD-prices ELT): medallion batch tables
(bronze → silver → gold star schema → serving), data-quality gates with a
reject/audit path, idempotent per-trading-date upserts, surrogate keys,
pre/post-merge reconciliation metrics, pluggable alerting — plus the
large-scale training-data operators (dedup, similarity search, text
analysis, multimodal columns) a 100 TB pipeline needs.

Everything is declared through the DataFrame/SQL API so Catalyst plans the
physical execution; Python UDFs appear only where built-ins genuinely cannot
express the semantics (Arrow-batched ``pandas_udf`` / ``mapInPandas``).
"""

__version__ = "0.1.0"
