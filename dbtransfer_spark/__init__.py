"""dbtransfer_spark — PySpark-native transfer + analytics engine.

A from-scratch re-expression of the capabilities of the reference tool
aricy/dbtransfer (connector bulk transfer with pushdown transforms,
idempotent upserts, checkpoint/resume, rate governance — see SURVEY.md)
on the Spark DataFrame/SQL stack, extended with the relational query
surface (joins/aggregations/windows via Catalyst) and LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns)
designed for 100 TB scale.
"""

__version__ = "0.1.0"

from dbtransfer_spark.config import Config, load_config
from dbtransfer_spark.engine import TransferEngine
from dbtransfer_spark.session import get_spark

__all__ = ["Config", "load_config", "TransferEngine", "get_spark", "__version__"]
