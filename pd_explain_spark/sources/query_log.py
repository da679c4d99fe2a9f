"""S4: query log sink + S3: exploration-session save/load.

Reference: experimental/query_recommenders/query_logger.py:10-120 appends
(df_name, query, interestingness, ts) rows to a CSV, gated by env vars
(consts.py:1-3: PD_EXPLAIN_LOG_QUERIES / PD_EXPLAIN_LOG_PATH). We keep the
same env gates and row shape but append to a parquet directory (atomic
per-append files — safe under concurrent writers, unlike CSV append) with
CSV still available for interop.

Reference: core/explainable_data_frame.py:211-260 dill-dumps the session
(history, query tree, report). Spark plans don't serialize usefully —
we persist the *metadata* as JSON (queries are re-derivable: plans are
lazy and re-built from the logged query strings on load).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field
from typing import Any

ENV_ENABLE = "PD_EXPLAIN_LOG_QUERIES"
ENV_PATH = "PD_EXPLAIN_LOG_PATH"


@dataclass
class QueryLogger:
    path: str | None = None
    fmt: str = "parquet"  # or 'csv'
    enabled: bool | None = None

    def __post_init__(self):
        if self.enabled is None:
            self.enabled = os.environ.get(ENV_ENABLE, "").lower() in ("1", "true", "yes")
        if self.path is None:
            self.path = os.environ.get(ENV_PATH, "/tmp/pd_explain_spark_query_log")

    def log(self, df_name: str, query: str, interestingness: float) -> None:
        if not self.enabled:
            return
        import pandas as pd

        row = pd.DataFrame(
            [
                {
                    "df_name": df_name,
                    "query": query,
                    "interestingness": float(interestingness),
                    "ts": time.time(),
                }
            ]
        )
        os.makedirs(self.path, exist_ok=True)
        fname = f"log-{int(time.time() * 1000)}-{uuid.uuid4().hex[:8]}"
        if self.fmt == "csv":
            row.to_csv(os.path.join(self.path, fname + ".csv"), index=False)
        else:
            row.to_parquet(os.path.join(self.path, fname + ".parquet"), index=False)

    def read(self, spark):
        """The log as a Spark DataFrame (empty schema-correct frame if none)."""
        from pyspark.sql import types as T

        schema = T.StructType(
            [
                T.StructField("df_name", T.StringType()),
                T.StructField("query", T.StringType()),
                T.StructField("interestingness", T.DoubleType()),
                T.StructField("ts", T.DoubleType()),
            ]
        )
        if not os.path.isdir(self.path) or not os.listdir(self.path):
            return spark.createDataFrame([], schema)
        reader = spark.read.schema(schema)
        if self.fmt == "csv":
            return reader.option("header", True).csv(self.path + "/*.csv")
        return spark.read.parquet(self.path + "/*.parquet")


# ---------------------------------------------------------------------------
# session save/load (S3)
# ---------------------------------------------------------------------------


@dataclass
class ExplorationSession:
    """History of (query, score, explanation texts) + the query tree."""

    root_name: str = "df"
    history: list[dict[str, Any]] = field(default_factory=list)
    tree: dict[str, Any] = field(default_factory=dict)  # node_id -> {query, parent}
    report: str = ""

    def add(self, query: str, score: float, texts: list[str], parent: int | None = None) -> int:
        node_id = len(self.history)
        self.history.append(
            {"id": node_id, "query": query, "score": float(score), "explanations": texts}
        )
        self.tree[str(node_id)] = {"query": query, "parent": parent}
        return node_id

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(
                {
                    "root_name": self.root_name,
                    "history": self.history,
                    "tree": self.tree,
                    "report": self.report,
                },
                f,
                indent=1,
            )

    @classmethod
    def load(cls, path: str) -> "ExplorationSession":
        with open(path) as f:
            d = json.load(f)
        return cls(
            root_name=d.get("root_name", "df"),
            history=d.get("history", []),
            tree=d.get("tree", {}),
            report=d.get("report", ""),
        )

    def replay(self, frame):
        """Re-execute every history query against a frame (plans are lazy —
        this rebuilds the DataFrames the dill dump would have pickled)."""
        from ..llm.query_language import execute_query

        return {h["id"]: execute_query(frame, h["query"]) for h in self.history}
