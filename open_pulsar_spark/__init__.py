"""open_pulsar_spark — a PySpark-native streaming/batch dataflow engine.

A from-scratch engine whose operator surface covers everything the
reference (`ChristianGhe/open-pulsar`, see SURVEY.md) computes, plus the
relational / dedup / similarity / text-analysis operators a 100 TB
training-data pipeline needs.  Architecture: declare logical plans with
the DataFrame/SQL API, let Catalyst + Tungsten pick physical strategies;
Pandas UDFs only where built-ins can't express the semantics.

Layers (SURVEY.md §7.0):
  L1 relational core      — open_pulsar_spark.operators.relational
  L2 streaming core       — open_pulsar_spark.streaming
  L3 orchestration        — open_pulsar_spark.operators.tasks / .state
  L4 LLM-pipeline ops     — open_pulsar_spark.operators.{dedup,similarity,text}
"""

from open_pulsar_spark.session import get_spark
from open_pulsar_spark.tables import TABLE_NAMES, load_table, load_tables

__all__ = ["get_spark", "load_table", "load_tables", "TABLE_NAMES"]
__version__ = "0.1.0"
