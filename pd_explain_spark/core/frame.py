"""ExplainableDataFrame: the Spark-native explainable dataframe.

The Spark re-expression of the reference's ExpDataFrame
(core/explainable_data_frame.py:46): a thin wrapper over a *lazy*
pyspark.sql.DataFrame plus sidecar lineage state (``operation``,
``filter_items``, ``last_used_explainer`` — reference :80-84). Unlike the
reference (eager pandas, operation recorded post-hoc), capture here
records the plan before any job runs; explainers are the only consumers
that trigger Spark jobs.

Divergence from the reference, by design (SURVEY.md §7 risk register):
frame names come from an explicit ``name=`` parameter, not call-stack
inspection (get_calling_params_name, reference :869-870).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .groupby import ExplainableGroupedData
from .operations import Comparison, FilterOp, JoinOp, BJoinOp, Operation, PredicateNode
from .series import ExplainableColumn, ExplainablePredicate


class ExplainableDataFrame:
    def __init__(
        self,
        df: DataFrame,
        name: str = "df",
        operation: Operation | None = None,
    ):
        self.df = df
        self.name = name
        self.operation = operation
        self.filter_items: list[str] = []
        self.last_used_explainer = None

    # ------------------------------------------------------------------
    # projection / filter (reference R1/R2, explainable_data_frame.py:343-396,783-807)
    # ------------------------------------------------------------------
    def __getitem__(self, key):
        if isinstance(key, str):
            if key not in self.df.columns:
                raise KeyError(key)
            # candidate filter column, as the reference records (ref :351-354)
            self.filter_items.append(key)
            return ExplainableColumn(self, key)
        if isinstance(key, (list, tuple)):
            missing = [c for c in key if c not in self.df.columns]
            if missing:
                raise KeyError(f"column(s) not found: {missing}")
            out = ExplainableDataFrame(self.df.select(*key), name=self.name, operation=self.operation)
            return out
        if isinstance(key, ExplainablePredicate):
            return self._apply_filter(key)
        raise TypeError(f"unsupported key type: {type(key).__name__}")

    def _apply_filter(self, pred: ExplainablePredicate) -> "ExplainableDataFrame":
        result = self.df.filter(pred.tree.to_spark(self.df))
        tree = pred.tree
        attribute = tree.columns()[0] if tree.columns() else None
        op_str, value = None, None
        if isinstance(tree, Comparison):
            op_str, value = tree.op, tree.value
        op = FilterOp(
            source=self.df,
            result=result,
            source_name=self.name,
            attribute=attribute,
            op_str=op_str,
            value=value,
            predicate=tree,
        )
        return ExplainableDataFrame(result, name=f"{self.name}_filtered", operation=op)

    def filter(self, pred) -> "ExplainableDataFrame":
        if isinstance(pred, ExplainablePredicate):
            return self._apply_filter(pred)
        # raw Spark Column / SQL string: untracked fallback
        return ExplainableDataFrame(self.df.filter(pred), name=f"{self.name}_filtered")

    def where(self, pred) -> "ExplainableDataFrame":
        """pandas ``where`` semantics (reference R3,
        explainable_data_frame.py:671-714): the frame KEEPS its shape and
        every column of a non-matching row becomes NULL (pandas NaN).
        The operation is still recorded as a Filter for explanation
        purposes, exactly as the reference does."""
        if not isinstance(pred, ExplainablePredicate):
            # raw Spark Column / SQL string: untracked NULL-replace
            cond = F.expr(pred) if isinstance(pred, str) else pred
            masked = self.df.select(
                *[F.when(cond, F.col(c)).otherwise(F.lit(None)).alias(c) for c in self.df.columns]
            )
            return ExplainableDataFrame(masked, name=f"{self.name}_where")
        tree = pred.tree
        cond = tree.to_spark(self.df)
        masked = self.df.select(
            *[F.when(cond, F.col(c)).otherwise(F.lit(None)).alias(c) for c in self.df.columns]
        )
        attribute = tree.columns()[0] if tree.columns() else None
        op_str, value = None, None
        if isinstance(tree, Comparison):
            op_str, value = tree.op, tree.value
        op = FilterOp(
            source=self.df,
            result=self.df.filter(cond),  # explainers see the filter semantics
            source_name=self.name,
            attribute=attribute,
            op_str=op_str,
            value=value,
            predicate=tree,
        )
        return ExplainableDataFrame(masked, name=f"{self.name}_where", operation=op)

    def query(self, predicate: "PredicateNode | str") -> "ExplainableDataFrame":
        """pandas ``df.query``: accepts either a pre-built predicate tree
        (used by the mini-language parser) or a pandas-style boolean
        expression string ("a > 3 and b == 'x'"), which is ast-parsed
        against a whitelist — never eval'd — and recorded into lineage
        like any tracked filter."""
        if isinstance(predicate, str):
            from .operations import parse_query_string

            predicate = parse_query_string(predicate, self.df.columns)
        return self._apply_filter(
            ExplainablePredicate(self, predicate.to_spark(self.df), predicate)
        )

    # ------------------------------------------------------------------
    # group-by (reference R4, explainable_data_frame.py:716-781)
    # ------------------------------------------------------------------
    def groupby(self, by, **_ignored) -> ExplainableGroupedData:
        keys = [by] if isinstance(by, str) else list(by)
        return ExplainableGroupedData(self, keys)

    groupBy = groupby

    # ------------------------------------------------------------------
    # joins (reference R6/R7/R8, explainable_data_frame.py:809-1030)
    # ------------------------------------------------------------------
    def merge(
        self,
        right: "ExplainableDataFrame",
        on: str | list[str] | None = None,
        how: str = "inner",
        broadcast_right: bool = False,
        indicator: bool | str = False,
        validate: str | None = None,
    ) -> "ExplainableDataFrame":
        """Equi-join with the reference's column-prefix contract: non-key
        columns are prefixed ``<frame_name>_`` (reference prefixes with the
        calling variable's name, :809-887; we use the explicit frame name).

        ``broadcast_right=True`` adds a broadcast hint for small dims —
        Catalyst/AQE auto-broadcasts below the threshold anyway.

        ``indicator`` adds pandas' ``_merge`` column (``left_only`` /
        ``right_only`` / ``both``) from presence flags carried through the
        join — no extra pass. ``validate`` checks '1:1'/'1:m'/'m:1'/'m:m'
        like pandas, via one tiny duplicate-key aggregate per constrained
        side (``.limit(1)`` probe, not a full count), raising
        ``MergeError``-style ValueError on violation."""
        if on is None:
            raise ValueError("merge requires `on` (equi-join keys); cross joins are not tracked")
        keys = [on] if isinstance(on, str) else list(on)
        for k in keys:
            if k not in self.df.columns:
                raise KeyError(f"join key {k!r} not in left frame")
            if k not in right.df.columns:
                raise KeyError(f"join key {k!r} not in right frame")

        if validate is not None:
            if validate not in ("1:1", "1:m", "m:1", "m:m"):
                raise ValueError(f"validate must be 1:1/1:m/m:1/m:m, got {validate!r}")
            lcard, rcard = validate.split(":")
            for side, card, df_side in (("left", lcard, self.df), ("right", rcard, right.df)):
                if card != "1":
                    continue
                dup = (
                    df_side.groupBy(*keys)
                    .agg(F.count(F.lit(1)).alias("__n"))
                    .filter(F.col("__n") > 1)
                    .limit(1)
                )
                if dup.count() > 0:
                    raise ValueError(
                        f"merge validate={validate!r}: {side} side has duplicate join keys"
                    )

        def prefixed(df: DataFrame, name: str) -> DataFrame:
            cols = [
                F.col(c).alias(c if c in keys else f"{name}_{c}") for c in df.columns
            ]
            return df.select(*cols)

        l = prefixed(self.df, self.name)
        r = prefixed(right.df, right.name)
        ind_col = "_merge" if indicator is True else indicator
        if indicator:
            l = l.withColumn("__l_present", F.lit(1))
            r = r.withColumn("__r_present", F.lit(1))
        if broadcast_right:
            r = F.broadcast(r)
        result = l.join(r, on=keys, how=how)
        if indicator:
            result = result.withColumn(
                ind_col,
                F.when(
                    F.col("__l_present").isNotNull() & F.col("__r_present").isNotNull(),
                    F.lit("both"),
                )
                .when(F.col("__l_present").isNotNull(), F.lit("left_only"))
                .otherwise(F.lit("right_only")),
            ).drop("__l_present", "__r_present")
        op = JoinOp(
            source=self.df,
            result=result,
            source_name=self.name,
            left=self.df,
            right=right.df,
            on=keys,
            how=how,
            left_name=self.name,
            right_name=right.name,
        )
        return ExplainableDataFrame(result, name=f"{self.name}_x_{right.name}", operation=op)

    def join(self, other: "ExplainableDataFrame", on=None, how: str = "inner", **kw):
        """Reference R7 implements join AS merge (explainable_data_frame.py:939-940)."""
        if on is None:
            raise ValueError("join requires `on` — the reference warns and fails here too (ref :927-929)")
        return self.merge(other, on=on, how=how, **kw)

    def b_join(self, other: "ExplainableDataFrame", on=None, how: str = "left") -> "ExplainableDataFrame":
        """Boolean-query explain join (reference R8, explainable_data_frame.py:971-1030)."""
        out = self.merge(other, on=on, how=how)
        op = out.operation
        out.operation = BJoinOp(
            source=op.source,
            result=op.result,
            source_name=op.source_name,
            left=op.left,
            right=op.right,
            on=op.on,
            how=how,
            left_name=op.left_name,
            right_name=op.right_name,
        )
        return out

    # ------------------------------------------------------------------
    # passthroughs (reference R9-R14)
    # ------------------------------------------------------------------
    def drop(self, columns: str | list[str]) -> "ExplainableDataFrame":
        cols = [columns] if isinstance(columns, str) else list(columns)
        missing = [c for c in cols if c not in self.df.columns]
        if missing:
            raise KeyError(f"cannot drop missing column(s): {missing}")
        return ExplainableDataFrame(self.df.drop(*cols), name=self.name, operation=self.operation)

    def rename(self, columns: dict[str, str], inplace: bool = False):
        """Reference R10 also rewrites lineage metadata through the mapping;
        ``inplace=True`` rebinds this wrapper (the reference's pandas
        inplace path — Spark plans stay immutable underneath)."""
        out_df = self.df.withColumnsRenamed(columns)
        op = self.operation
        if op is not None:
            import copy as _copy

            op = _copy.copy(op)
            if isinstance(op, FilterOp) and op.attribute in columns:
                op.attribute = columns[op.attribute]
            if hasattr(op, "keys") and getattr(op, "keys", None):
                op.keys = [columns.get(k, k) for k in op.keys]
        if inplace:
            self.df, self.operation = out_df, op
            return None
        return ExplainableDataFrame(out_df, name=self.name, operation=op)

    def sample(
        self,
        frac: float | None = None,
        n: int | None = None,
        seed: int = 42,
        replace: bool = False,
        weights: str | None = None,
        random_state: int | None = None,
    ) -> "ExplainableDataFrame":
        """Reference R11 with the pandas passthrough flavors
        (core/explainable_data_frame.py:636-669): ``weights`` (a column
        name) takes an Efraimidis–Spirakis weighted top-n; ``replace``
        uses Poisson row replication; plain exact-n sorts by a seeded
        hash then limits — all deterministic across partitionings
        (SURVEY §7 risk register) and free of full sorts.
        ``random_state`` is accepted as a pandas-named alias for seed.
        ``weights`` + ``replace`` together are not supported (exact
        weighted with-replacement draws need a global cumulative-weight
        index; documented divergence)."""
        from ..operators.sampling import (
            deterministic_sample,
            replacement_sample,
            weighted_sample,
        )

        if random_state is not None:
            seed = random_state
        if weights is not None:
            if replace:
                raise NotImplementedError(
                    "sample(weights=..., replace=True) is not supported; "
                    "use weights without replacement"
                )
            if weights not in self.df.columns:
                raise KeyError(f"weights column {weights!r} not in frame")
            if n is None:
                n = int(round((frac or 1.0) * self.df.count()))
            return ExplainableDataFrame(
                weighted_sample(self.df, n, weights, seed),
                name=self.name, operation=self.operation,
            )
        if replace:
            if n is None:
                n = int(round((frac or 1.0) * self.df.count()))
            return ExplainableDataFrame(
                replacement_sample(self.df, n, seed), name=self.name, operation=self.operation
            )
        if n is not None:
            return ExplainableDataFrame(
                deterministic_sample(self.df, n, seed), name=self.name, operation=self.operation
            )
        return ExplainableDataFrame(
            self.df.sample(fraction=frac or 1.0, seed=seed), name=self.name, operation=self.operation
        )

    def reset_index(self, **_ignored) -> "ExplainableDataFrame":
        """No-op: Spark has no row index (reference R12)."""
        return self

    def drop_duplicates(self, subset: list[str] | None = None) -> "ExplainableDataFrame":
        return ExplainableDataFrame(
            self.df.dropDuplicates(subset=subset), name=self.name, operation=self.operation
        )

    def copy(self) -> "ExplainableDataFrame":
        out = ExplainableDataFrame(self.df, name=self.name, operation=self.operation)
        out.filter_items = list(self.filter_items)
        return out

    # ------------------------------------------------------------------
    # explain (reference core/explainable_data_frame.py:1085-1274)
    # ------------------------------------------------------------------
    def explain(self, explainer: str = "fedex", **kwargs):
        """Run an explanation operator over the captured lineage.

        explainer in {'fedex', 'shapley', 'outlier', 'many_to_one', 'metainsight'}
        (reference explainers/explainer_factory.py:15-33). Returns an
        Explanation object; ``.to_df(spark)`` gives the result DataFrame.
        """
        from ..explainers.factory import create_explainer

        measure_only = kwargs.pop("measure_only", False)
        exp = create_explainer(explainer, self, **kwargs)
        self.last_used_explainer = explainer
        result = exp.generate_explanation()
        self.explanation = result
        if measure_only:
            # E8 hook (reference llm_based_query_recommender.py:63-64):
            # just the query interestingness score
            from ..functions.scoring import interestingness

            return interestingness(result.scores)
        return result

    def present_deleted_correlated(self):
        """Correlated columns excluded from the last FEDEX explain
        (reference core/explainable_data_frame.py:1082-1083): dict of
        {column: |corr with filter attribute|}."""
        exp = getattr(self, "explanation", None)
        if exp is None:
            raise ValueError("run .explain() first")
        return dict(exp.extras.get("cor_deleted_atts", {}))

    def automated_data_exploration(
        self,
        user_query: str = "",
        num_iterations: int = 3,
        queries_per_iteration: int = 3,
        top_k: int = 2,
        client=None,
    ):
        """Plan -> generate -> execute -> analyze loop (reference
        core/explainable_data_frame.py:137-209). Returns an
        ExplorationSession (history + query tree + report)."""
        from ..llm.client import Client
        from ..llm.exploration import AutomatedDataExploration

        ade = AutomatedDataExploration(frame=self, client=client or Client())
        session = ade.run(
            user_query=user_query,
            num_iterations=num_iterations,
            queries_per_iteration=queries_per_iteration,
            top_k=top_k,
        )
        self.data_explorer = session  # reference keeps the explorer on the frame
        return session

    def save_data_exploration(self, file_path: str) -> None:
        """Reference core/explainable_data_frame.py:211-236 — persist the
        last exploration session (JSON, not dill — documented divergence:
        queries/scores/texts serialize; result frames are lazy plans and
        are re-derived on replay)."""
        session = getattr(self, "data_explorer", None)
        if session is None:
            raise ValueError(
                "No data exploration has been performed yet. "
                "Please run automated_data_exploration() first."
            )
        session.save(file_path)

    @staticmethod
    def visualize_from_saved_data_exploration(file_path: str) -> str:
        """Reference core/explainable_data_frame.py:238-260 — render a
        saved exploration without the source frame: returns the report
        plus the query tree as indented text (the engine is headless;
        notebook carousels live in explainers/visualize.py)."""
        from ..sources.query_log import ExplorationSession

        session = ExplorationSession.load(file_path)
        lines = [session.report or "(no report)"]
        lines.append("Query tree:")
        for h in session.history:
            lines.append(f"  (Query {h['id']}) {h['query']} — score {h['score']:.3f}")
            for t in h.get("explanations", [])[:2]:
                lines.append(f"      {t}")
        return "\n".join(lines)

    def follow_up_with_automated_data_exploration(
        self,
        explanation_index: int | None = None,
        num_iterations: int = 3,
        top_k: int = 2,
        client=None,
    ):
        """Reference core/explainable_data_frame.py:262-300 — continue
        exploring FROM the last .explain() output: the chosen explanation
        text seeds the loop's goal so follow-up queries contextualize it."""
        exp = getattr(self, "explanation", None)
        if exp is None:
            raise ValueError("run .explain() first, then follow up on its output")
        texts = exp.texts()
        if not texts:
            raise ValueError("the last explanation produced no explanation texts")
        idx = 0 if explanation_index is None else explanation_index
        if not (0 <= idx < len(texts)):
            raise IndexError(f"explanation_index {idx} out of range ({len(texts)} texts)")
        return self.automated_data_exploration(
            user_query=f"Follow up on: {texts[idx]}",
            num_iterations=num_iterations,
            top_k=top_k,
            client=client,
        )

    def llm_recommend_experimental(
        self,
        custom_requests=None,
        num_recommendations: int = 5,
        num_iterations: int = 3,
        return_all_options: bool = True,
        client=None,
    ):
        """Reference core/explainable_data_frame.py:101-135 — recommend +
        actor-critic-refine queries (llm/refiner.py; deterministic offline
        fallback when no key is configured). Returns [(query, score)]."""
        from ..llm.client import Client
        from ..llm.refiner import LLMQueryRecommender, QueryRefiner

        client = client or Client()
        reqs = list(custom_requests or [])
        rec = LLMQueryRecommender(
            frame=self, df_name=self.name, user_requests=reqs,
            k=num_recommendations, client=client,
        )
        refiner = QueryRefiner(
            frame=self, df_name=self.name, recommendations=rec.recommend(),
            k=num_recommendations, user_requests=reqs, n=num_iterations,
            return_all_options=return_all_options, client=client,
        )
        return refiner.refine()

    # ------------------------------------------------------------------
    # delegation: any unknown attr goes to the Spark DataFrame, and
    # DataFrame-returning methods are re-wrapped (reference _constructor
    # magic, explainable_data_frame.py:86-99)
    # ------------------------------------------------------------------
    def __getattr__(self, item: str) -> Any:
        attr = getattr(self.df, item)
        if callable(attr):
            def wrapper(*args, **kwargs):
                out = attr(*args, **kwargs)
                if isinstance(out, DataFrame):
                    return ExplainableDataFrame(out, name=self.name, operation=self.operation)
                return out

            return wrapper
        return attr

    @property
    def columns(self) -> list[str]:
        return self.df.columns

    @property
    def shape(self) -> tuple[int, int]:
        """pandas-surface parity (reference R16 delegates to the pandas
        frame). Row count triggers a Spark job — documented, like pandas
        users expect shape to be cheap but Spark cannot make it free."""
        return (self.df.count(), len(self.df.columns))

    def head(self, n: int = 5) -> "ExplainableDataFrame":
        """pandas-style head: a *frame* of the first n rows (Spark's own
        .head returns driver-side Rows). Prefix-limit is the only
        well-defined positional operation on an unordered frame."""
        return ExplainableDataFrame(self.df.limit(n), name=self.name, operation=self.operation)

    @property
    def iloc(self) -> "_ILoc":
        """Positional indexer (reference R16 pandas surface). On a
        distributed, unordered frame only prefix slices are distributed
        (``iloc[:n]`` -> limit(n)); other int/slice forms fetch a bounded
        prefix to the driver and slice there, erroring on negative or
        unbounded requests rather than silently collecting the frame."""
        return _ILoc(self)

    def sort_values(self, by, ascending: bool | list[bool] = True) -> "ExplainableDataFrame":
        """pandas sort_values → orderBy. Spark keeps the sort lazy; a
        following limit() turns it into a distributed top-k (TakeOrdered),
        so sort_values(...).head(n) never materializes a full sort."""
        cols = [by] if isinstance(by, str) else list(by)
        flags = [ascending] * len(cols) if isinstance(ascending, bool) else list(ascending)
        order = [F.col(c).asc() if a else F.col(c).desc() for c, a in zip(cols, flags)]
        return ExplainableDataFrame(self.df.orderBy(*order), name=self.name, operation=self.operation)

    def nlargest(self, n: int, columns) -> "ExplainableDataFrame":
        """Top-n by columns desc — compiles to TakeOrderedAndProject
        (per-partition heap + driver merge), never a global sort."""
        return self.sort_values(columns, ascending=False).head(n)

    def nsmallest(self, n: int, columns) -> "ExplainableDataFrame":
        return self.sort_values(columns, ascending=True).head(n)

    def squeeze(self):
        """pandas squeeze: a single-column frame collapses to its series
        (reference tests use it to round-trip frame<->series). Multi-column
        frames return self, like pandas."""
        if len(self.df.columns) == 1:
            return ExplainableColumn(self, self.df.columns[0])
        return self

    # ------------------------------------------------------------------
    # missing-data / dtype / reshaping pandas surface (reference R16:
    # ExpDataFrame inherits the full pandas API, so reference users call
    # these directly; each maps to a single declarative Spark plan)
    # ------------------------------------------------------------------
    def fillna(self, value, subset=None) -> "ExplainableDataFrame":
        """pandas fillna with a scalar or a {column: value} dict. Pure
        projection (no shuffle); Spark fills only type-compatible columns,
        matching pandas' skip-incompatible behavior."""
        if isinstance(value, dict):
            out = self.df.na.fill(value)
        else:
            cols = [subset] if isinstance(subset, str) else subset
            out = self.df.na.fill(value, subset=cols)
        return ExplainableDataFrame(out, name=self.name, operation=self.operation)

    def dropna(self, subset=None, how: str = "any", thresh: int | None = None) -> "ExplainableDataFrame":
        """pandas dropna → na.drop. ``thresh`` is the pandas meaning (min
        non-null values required to keep the row), which is also Spark's."""
        cols = [subset] if isinstance(subset, str) else subset
        if thresh is not None:
            out = self.df.na.drop(thresh=thresh, subset=cols)
        else:
            out = self.df.na.drop(how=how, subset=cols)
        return ExplainableDataFrame(out, name=self.name, operation=self.operation)

    def astype(self, dtype) -> "ExplainableDataFrame":
        """pandas astype with a single dtype or {column: dtype} dict.
        Accepts pandas dtype names ('int64', 'float64', 'str', ...) and
        Spark type strings; compiles to casts inside one projection."""
        mapping = dtype if isinstance(dtype, dict) else {c: dtype for c in self.df.columns}
        missing = [c for c in mapping if c not in self.df.columns]
        if missing:
            raise KeyError(f"astype: column(s) not found: {missing}")
        casts = {c: F.col(c).cast(_spark_type(t)) for c, t in mapping.items()}
        return ExplainableDataFrame(self.df.withColumns(casts), name=self.name, operation=self.operation)

    def clip(self, lower=None, upper=None) -> "ExplainableDataFrame":
        """pandas clip over the numeric columns (non-numerics pass
        through untouched, as pandas does with numeric_only data)."""
        from ..operators.aggregates import is_numeric_type

        cols = {}
        for f in self.df.schema.fields:
            if not is_numeric_type(f.dataType):
                continue
            c = F.col(f.name)
            if lower is not None:
                c = F.greatest(c, F.lit(lower).cast(f.dataType))
            if upper is not None:
                c = F.least(c, F.lit(upper).cast(f.dataType))
            cols[f.name] = c
        return ExplainableDataFrame(self.df.withColumns(cols), name=self.name, operation=self.operation)

    def quantile(
        self, q=0.5, columns: list[str] | None = None, approx: bool = False,
    ) -> "ExplainableDataFrame":
        """pandas quantile (linear interpolation — Spark ``percentile`` and
        DuckDB ``quantile_cont`` compute the same estimator). One agg job
        for every (column, q) pair; result is a tiny frame with one row per
        q: (quantile, <col>...). ``approx=True`` uses ``approx_percentile``
        (t-digest sketch, map-side partial aggregation) — the 100 TB path;
        exact ``percentile`` buffers each group's values.
        """
        from ..operators.aggregates import is_numeric_type

        qs = [q] if isinstance(q, (int, float)) else list(q)
        num_cols = columns or [
            f.name for f in self.df.schema.fields if is_numeric_type(f.dataType)
        ]
        pfn = F.approx_percentile if approx else F.percentile
        aggs = [
            pfn(F.col(c), F.lit(float(p))).alias(f"{c}__{i}")
            for i, p in enumerate(qs)
            for c in num_cols
        ]
        row = self.df.agg(*aggs).first()
        out_rows = [
            tuple([float(p)] + [row[f"{c}__{i}"] for c in num_cols])
            for i, p in enumerate(qs)
        ]
        schema = ", ".join(["quantile double"] + [f"`{c}` double" for c in num_cols])
        out = self.df.sparkSession.createDataFrame(out_rows, schema=schema)
        return ExplainableDataFrame(out, name=f"{self.name}.quantile")

    def mode(self, column: str) -> "ExplainableDataFrame":
        """pandas mode for one column: the most frequent value(s), ties
        all kept, sorted ascending, NULLs excluded — delegates to the
        series flavor (one value count + a broadcast max filter; the
        mode set is never found by sorting the data)."""
        return self[column].mode()

    def nunique(self, approx: bool = False, rsd: float = 0.05) -> "ExplainableDataFrame":
        """pandas frame-level nunique: distinct count per column, all
        columns in ONE aggregation pass. Exact by default (a single
        Expand shuffle, oracle-comparable); ``approx=True`` switches to
        HyperLogLog++ (``approx_count_distinct``), which partially
        aggregates map-side — the 100 TB path when a ±rsd estimate is
        acceptable. Returns a one-row frame."""
        if approx:
            aggs = [F.approx_count_distinct(F.col(c), rsd).alias(c) for c in self.df.columns]
        else:
            aggs = [F.count_distinct(F.col(c)).alias(c) for c in self.df.columns]
        return ExplainableDataFrame(self.df.agg(*aggs), name=f"{self.name}.nunique")

    def describe(self, columns: list[str] | None = None) -> "ExplainableDataFrame":
        """pandas describe over the numeric columns: count / mean / std /
        min / 25% / 50% / 75% / max, all statistics for all columns in one
        aggregation pass (Spark's own ``summary()`` uses approximate
        percentiles; this is exact, matching pandas)."""
        from ..operators.aggregates import is_numeric_type

        num_cols = columns or [
            f.name for f in self.df.schema.fields if is_numeric_type(f.dataType)
        ]
        aggs = []
        for c in num_cols:
            col = F.col(c)
            aggs += [
                F.count(col).cast("double").alias(f"{c}__count"),
                F.avg(col).alias(f"{c}__mean"),
                F.stddev_samp(col).alias(f"{c}__std"),
                F.min(col).cast("double").alias(f"{c}__min"),
                F.percentile(col, F.lit(0.25)).alias(f"{c}__p25"),
                F.percentile(col, F.lit(0.5)).alias(f"{c}__p50"),
                F.percentile(col, F.lit(0.75)).alias(f"{c}__p75"),
                F.max(col).cast("double").alias(f"{c}__max"),
            ]
        row = self.df.agg(*aggs).first()
        stats = [("count", "count"), ("mean", "mean"), ("std", "std"), ("min", "min"),
                 ("25%", "p25"), ("50%", "p50"), ("75%", "p75"), ("max", "max")]
        out_rows = [
            tuple([label] + [row[f"{c}__{key}"] for c in num_cols]) for label, key in stats
        ]
        schema = ", ".join(["statistic string"] + [f"`{c}` double" for c in num_cols])
        out = self.df.sparkSession.createDataFrame(out_rows, schema=schema)
        return ExplainableDataFrame(out, name=f"{self.name}.describe")

    def explode(self, column: str, keep_empty: bool = True) -> "ExplainableDataFrame":
        """pandas df.explode(column): one row per array element, other
        columns repeated. A Generate node inside the scan stage — no
        shuffle. ``keep_empty=True`` matches pandas (empty/NULL arrays
        keep one row with NULL), via explode_outer."""
        fn = F.explode_outer if keep_empty else F.explode
        others = [c for c in self.df.columns if c != column]
        out = self.df.select(*others, fn(F.col(column)).alias(column))
        return ExplainableDataFrame(out, name=self.name)

    def corr(self, columns: list[str] | None = None, method: str = "pearson") -> "ExplainableDataFrame":
        """pandas df.corr(): the full pairwise Pearson matrix in ONE
        aggregation pass (k·(k-1)/2 ``corr`` aggregates share a single
        scan + partial aggregation — not a job per pair). Rows are
        (column, <col1>, <col2>, ...) like pandas' labeled matrix."""
        from ..operators.aggregates import is_numeric_type

        if method != "pearson":
            raise ValueError("only pearson correlation is supported")
        cols = columns or [
            f.name for f in self.df.schema.fields if is_numeric_type(f.dataType)
        ]
        aggs = [
            F.corr(F.col(a), F.col(b)).alias(f"{a}__{b}")
            for i, a in enumerate(cols)
            for b in cols[i + 1 :]
        ]
        row = self.df.agg(*aggs).first() if aggs else None
        out_rows = []
        for a in cols:
            vals = []
            for b in cols:
                if a == b:
                    vals.append(1.0)
                else:
                    key = f"{a}__{b}" if f"{a}__{b}" in (row.asDict() if row else {}) else f"{b}__{a}"
                    vals.append(float(row[key]) if row and row[key] is not None else None)
            out_rows.append(tuple([a] + vals))
        schema = ", ".join(["column string"] + [f"`{c}` double" for c in cols])
        out = self.df.sparkSession.createDataFrame(out_rows, schema=schema)
        return ExplainableDataFrame(out, name=f"{self.name}.corr")

    def cov(self, columns: list[str] | None = None, ddof: int = 1) -> "ExplainableDataFrame":
        """pandas df.cov(): pairwise sample covariance matrix, one pass."""
        from ..operators.aggregates import is_numeric_type

        if ddof != 1:
            raise ValueError("only ddof=1 (sample covariance) is supported")
        cols = columns or [
            f.name for f in self.df.schema.fields if is_numeric_type(f.dataType)
        ]
        aggs = [
            F.covar_samp(F.col(a), F.col(b)).alias(f"{a}__{b}")
            for i, a in enumerate(cols)
            for b in cols[i:]
        ]
        row = self.df.agg(*aggs).first() if aggs else None
        out_rows = []
        for a in cols:
            vals = []
            for b in cols:
                key = f"{a}__{b}" if f"{a}__{b}" in (row.asDict() if row else {}) else f"{b}__{a}"
                vals.append(float(row[key]) if row and row[key] is not None else None)
            out_rows.append(tuple([a] + vals))
        schema = ", ".join(["column string"] + [f"`{c}` double" for c in cols])
        out = self.df.sparkSession.createDataFrame(out_rows, schema=schema)
        return ExplainableDataFrame(out, name=f"{self.name}.cov")

    def duplicated(self, subset: list[str] | str | None = None, keep: str = "first") -> "ExplainableDataFrame":
        """pandas duplicated(): adds a boolean ``duplicated`` column. keep=
        'first' marks all but the first occurrence (ordered by the subset
        then all remaining columns for determinism), 'last' the mirror,
        False marks every member of any duplicate group. One shuffle on
        the subset keys."""
        from pyspark.sql import Window

        cols = [subset] if isinstance(subset, str) else list(subset or self.df.columns)
        if keep is False:
            w = Window.partitionBy(*cols)
            flag = F.count(F.lit(1)).over(w) > 1
        elif keep in ("first", "last"):
            tie = [c for c in self.df.columns if c not in cols]
            order = [F.col(c).asc() if keep == "first" else F.col(c).desc() for c in tie] or [
                F.lit(1).asc()
            ]
            w = Window.partitionBy(*cols).orderBy(*order)
            flag = F.row_number().over(w) > 1
        else:
            raise ValueError("keep must be 'first', 'last', or False")
        return ExplainableDataFrame(
            self.df.withColumn("duplicated", flag), name=self.name, operation=self.operation
        )

    def crosstab(self, index: str, columns: str, pivot_values: list | None = None) -> "ExplainableDataFrame":
        """pandas.crosstab(index, columns): contingency counts with 0 fill.
        One groupBy+pivot pass (map-side partial aggregation; the pivot is
        a projection over the grouped rows, no second shuffle). Pass
        ``pivot_values`` with the known category values at scale to skip
        Spark's distinct-values discovery job."""
        gb = self.df.groupBy(index)
        piv = gb.pivot(columns, values=pivot_values) if pivot_values else gb.pivot(columns)
        out = piv.count().na.fill(0).orderBy(index)
        return ExplainableDataFrame(out, name=f"{self.name}.crosstab")

    def pivot_table(
        self,
        index: str,
        columns: str,
        values: str,
        aggfunc: str = "mean",
        pivot_values: list | None = None,
    ) -> "ExplainableDataFrame":
        """pandas pivot_table for a single index/columns/values triple with
        a named agg (the §2.2 R5 set). Same one-pass groupBy+pivot shape as
        crosstab; cells with no rows stay NULL like pandas."""
        from ..operators.aggregates import agg_column

        gb = self.df.groupBy(index)
        piv = gb.pivot(columns, values=pivot_values) if pivot_values else gb.pivot(columns)
        out = piv.agg(agg_column(values, aggfunc)).orderBy(index)
        return ExplainableDataFrame(out, name=f"{self.name}.pivot_table")

    def rolling(self, window, on: str, by=None, min_periods: int = 1) -> "_Rolling":
        """pandas rolling: ``window`` is an int (trailing rows) or a
        duration string ('1 hour') over the ``on`` column. Returns a
        helper exposing mean/sum/min/max/count/std/var/median. See
        operators/rolling.py for the partitioned/bucketed window design."""
        return _Rolling(self, window, on, by, min_periods)

    def expanding(self, on: str, by=None, min_periods: int = 1) -> "_Expanding":
        """pandas expanding (cumulative-from-start) windows in ``on``
        order: helper exposing sum/mean/min/max/count/std/var. Keyless
        frames ride the bucketed two-phase prefix scan; all metrics of
        one call share a single pass (operators/rolling.py
        expanding_agg)."""
        return _Expanding(self, on, by, min_periods)

    def ffill(self, columns, on: str, by=None) -> "ExplainableDataFrame":
        """pandas ffill in ``on`` order: NULLs take the nearest preceding
        non-NULL value (operators/rolling.py fill_ordered — bucketed
        boundary carry keyless, partitioned window with by-keys)."""
        from ..operators.rolling import fill_ordered

        return ExplainableDataFrame(
            fill_ordered(self.df, columns, on=on, method="ffill", by=by), name=self.name
        )

    def bfill(self, columns, on: str, by=None) -> "ExplainableDataFrame":
        """pandas bfill in ``on`` order (mirror of ffill)."""
        from ..operators.rolling import fill_ordered

        return ExplainableDataFrame(
            fill_ordered(self.df, columns, on=on, method="bfill", by=by), name=self.name
        )

    def interpolate(self, columns, on: str, by=None) -> "ExplainableDataFrame":
        """pandas interpolate(method='time'/'index') in ``on`` order:
        interior NULL runs linearly interpolated by actual ``on``
        distance, leading NULLs kept, trailing forward-filled
        (operators/rolling.py interpolate_ordered)."""
        from ..operators.rolling import interpolate_ordered

        return ExplainableDataFrame(
            interpolate_ordered(self.df, columns, on=on, by=by), name=self.name
        )

    def ewm(self, alpha: float, on: str, by=None) -> "_Ewm":
        """pandas ewm(alpha=..., adjust=True) in ``on`` order — helper
        exposing mean(). Tiled trailing-N window construction, exact to
        double precision (operators/ewm.py)."""
        return _Ewm(self, alpha, on, by)

    def shift(self, column: str, on: str, periods: int = 1, by=None) -> "ExplainableDataFrame":
        """pandas shift (lag) in ``on`` order; adds ``<column>_shift``."""
        from ..operators.rolling import shift_col

        return ExplainableDataFrame(
            shift_col(self.df, column, on=on, periods=periods, by=by), name=self.name
        )

    def diff(self, column: str, on: str, periods: int = 1, by=None) -> "ExplainableDataFrame":
        """pandas diff in ``on`` order; adds ``<column>_diff``."""
        from ..operators.rolling import diff_col

        return ExplainableDataFrame(
            diff_col(self.df, column, on=on, periods=periods, by=by), name=self.name
        )

    def cumsum(self, column: str, on: str, by=None) -> "ExplainableDataFrame":
        """pandas cumsum in ``on`` order; adds ``<column>_cumsum``."""
        from ..operators.rolling import cumsum_col

        return ExplainableDataFrame(
            cumsum_col(self.df, column, on=on, by=by), name=self.name
        )

    def cummax(self, column: str, on: str, by=None) -> "ExplainableDataFrame":
        """pandas cummax in ``on`` order; adds ``<column>_cummax``."""
        from ..operators.rolling import cumagg_col

        return ExplainableDataFrame(
            cumagg_col(self.df, column, on=on, agg="max", by=by), name=self.name
        )

    def cummin(self, column: str, on: str, by=None) -> "ExplainableDataFrame":
        """pandas cummin in ``on`` order; adds ``<column>_cummin``."""
        from ..operators.rolling import cumagg_col

        return ExplainableDataFrame(
            cumagg_col(self.df, column, on=on, agg="min", by=by), name=self.name
        )

    def rank(self, column: str, method: str = "min", ascending: bool = True) -> "ExplainableDataFrame":
        """pandas rank (min/dense/first) — global rank with NO global sort
        partition (value-bucketed; operators/rolling.py rank_col). Adds
        ``<column>_rank``."""
        from ..operators.rolling import rank_col

        return ExplainableDataFrame(
            rank_col(self.df, column, method=method, ascending=ascending), name=self.name
        )

    def pct_change(self, column: str, on: str, periods: int = 1, by=None) -> "ExplainableDataFrame":
        """pandas pct_change: (v - lag) / lag in ``on`` order; adds
        ``<column>_pct_change``. A zero lag follows pandas / IEEE-754
        (v/0 -> +-inf, 0/0 -> NaN) spelled out explicitly: Spark 4 runs
        ANSI mode, where a raw ``/`` RAISES on the first zero divisor —
        which the old count()-based bench never executed (terminal
        projection, column-pruned) and sf0.01 correctness never hit (no
        zero values); the r8 noop-write bench surfaced it at sf0.1."""
        from ..operators.rolling import shift_col

        shifted = shift_col(self.df, column, on=on, periods=periods, by=by, out_name="__pc_lag")
        v, lag = F.col(column), F.col("__pc_lag")
        # Spark comparisons treat -0.0 == 0.0, so the explicit zero-lag
        # branch must recover the IEEE sign itself: v / -0.0 is the
        # OPPOSITE infinity of v / 0.0 (string render of the double is
        # the one portable negative-zero probe — only reached when
        # lag == 0, where it reads "-0.0" or "0.0")
        negz = lag.cast("string").startswith("-")
        inf, ninf = F.lit(float("inf")), F.lit(float("-inf"))
        out = shifted.withColumn(
            f"{column}_pct_change",
            F.when(lag != 0, (v - lag) / lag).when(
                lag.isNotNull() & v.isNotNull(),
                F.when(v > 0, F.when(negz, ninf).otherwise(inf))
                .when(v < 0, F.when(negz, inf).otherwise(ninf))
                .otherwise(F.lit(float("nan"))),
            ),
        ).drop("__pc_lag")
        return ExplainableDataFrame(out, name=self.name)

    def idxmax(self, value_col: str, id_col: str):
        """pandas idxmax with an explicit identifier column: the id of the
        row holding the max value — one ``max_by`` aggregation."""
        return self.df.agg(F.max_by(F.col(id_col), F.col(value_col)).alias("v")).first()["v"]

    def idxmin(self, value_col: str, id_col: str):
        return self.df.agg(F.min_by(F.col(id_col), F.col(value_col)).alias("v")).first()["v"]

    def resample(self, freq: str, on: str, by=None) -> "_Resampler":
        """pandas resample over a time column: fixed windows via Spark's
        ``window()`` (a scan-stage projection + one grouped agg — the same
        plan Structured Streaming uses, so batch/stream parity is free).
        ``freq`` uses Spark duration strings ('1 hour', '30 minutes')."""
        return _Resampler(self, freq, on, by)

    def melt(
        self,
        id_vars: list[str] | str | None = None,
        value_vars: list[str] | str | None = None,
        var_name: str = "variable",
        value_name: str = "value",
    ) -> "ExplainableDataFrame":
        """pandas melt → Spark ``unpivot`` (an Expand node: rows fan out
        inside the scan stage, no shuffle). Numeric value columns are
        unified to double, otherwise everything is cast to string, since
        unpivot needs one common value type (pandas uses object)."""
        from ..operators.aggregates import is_numeric_type

        ids = [id_vars] if isinstance(id_vars, str) else list(id_vars or [])
        vals = [value_vars] if isinstance(value_vars, str) else list(
            value_vars or [c for c in self.df.columns if c not in ids]
        )
        types = {f.name: f.dataType for f in self.df.schema.fields}
        all_num = all(is_numeric_type(types[c]) for c in vals)
        cast_to = "double" if all_num else "string"
        src = self.df.withColumns({c: F.col(c).cast(cast_to) for c in vals})
        out = src.unpivot(ids, vals, var_name, value_name)
        return ExplainableDataFrame(out, name=f"{self.name}.melt")

    def get_dummies(
        self,
        column: str,
        values: list | None = None,
        prefix: str | None = None,
        max_categories: int = 10_000,
    ) -> "ExplainableDataFrame":
        """pandas get_dummies for one categorical column: indicator
        columns, pure projection. Pass ``values`` (the known categories)
        at scale to skip the distinct-discovery job, same contract as
        crosstab/pivot_table. The discovery collect is BOUNDED: more
        than ``max_categories`` distinct values raises instead of
        pulling an unbounded category list onto the driver (the Spark
        pivotMaxValues contract applied here — a 10k-wide one-hot frame
        is already a modeling bug, not a projection)."""
        if values is None:
            rows = (
                self.df.select(column)
                .distinct()
                .limit(int(max_categories) + 1)
                .collect()
            )
            if len(rows) > max_categories:
                raise ValueError(
                    f"get_dummies: column {column!r} has more than "
                    f"max_categories={max_categories} distinct values — pass "
                    "values= with the known categories or raise the ceiling"
                )
            values = sorted(r[0] for r in rows if r[0] is not None)
        pfx = f"{prefix}_" if prefix else f"{column}_"
        cols = {
            f"{pfx}{v}": F.when(F.col(column) == F.lit(v), F.lit(1)).otherwise(F.lit(0))
            for v in values
        }
        return ExplainableDataFrame(self.df.withColumns(cols), name=self.name, operation=self.operation)

    def merge_asof(
        self,
        right: "ExplainableDataFrame",
        on: str,
        by=None,
        direction: str = "backward",
        tolerance=None,
        suffixes: tuple = ("", "_right"),
        allow_exact_matches: bool = True,
    ) -> "ExplainableDataFrame":
        """pandas ``pd.merge_asof`` parity (see operators/asof.py for the
        distributed construction). Untracked by lineage, like concat."""
        from ..operators.asof import merge_asof as _asof

        out = _asof(
            self.df,
            right.df if isinstance(right, ExplainableDataFrame) else right,
            on=on,
            by=by,
            direction=direction,
            tolerance=tolerance,
            suffixes=suffixes,
            allow_exact_matches=allow_exact_matches,
        )
        return ExplainableDataFrame(out, name=f"{self.name}_asof")

    def to_parquet(
        self,
        path: str,
        partition_by: list[str] | str | None = None,
        mode: str = "error",
        max_records_per_file: int | None = None,
        cluster_by: list[str] | str | None = None,
        cluster_partitions: int | None = None,
        layout: str = "linear",
    ) -> None:
        """pandas ``to_parquet`` → distributed parquet write. ``partition_by``
        produces hive-style directory partitioning (the layout that gives
        downstream readers partition pruning for free);
        ``max_records_per_file`` bounds file sizes at scale.

        ``cluster_by`` writes globally range-clustered, within-file sorted
        data (``repartitionByRange`` + ``sortWithinPartitions`` — a
        parallel range Exchange, never a single-partition sort): each
        parquet file covers a disjoint key range and its row-group
        min/max stats are tight, so downstream point/range predicates on
        those keys skip whole files and row groups.

        ``layout='zorder'`` (multi-column ``cluster_by``) interleaves the
        columns' rank bits instead of sorting lexicographically: files
        cover small hyper-rectangles of the key space, so predicates on
        ANY clustered column prune files — linear layout only prunes on
        the leading column (operators/zorder.py)."""
        if layout not in ("linear", "zorder"):
            raise ValueError(f"layout must be linear/zorder, got {layout!r}")
        out = self.df
        if cluster_by:
            ccols = [cluster_by] if isinstance(cluster_by, str) else list(cluster_by)
            sort_cols = ccols
            if layout == "zorder":
                from ..operators.zorder import zorder_value

                out, z = zorder_value(out, ccols)
                out = out.withColumn("__zv", z)
                sort_cols = ["__zv"]
            # explicit cluster_partitions pins the output file count (AQE
            # otherwise coalesces small data to one file, which is right
            # for bytes but wrong when the caller wants a fixed layout)
            if cluster_partitions:
                out = out.repartitionByRange(cluster_partitions, *sort_cols)
            else:
                out = out.repartitionByRange(*sort_cols)
            out = out.sortWithinPartitions(*sort_cols)
            if layout == "zorder":
                out = out.drop("__zv", *[f"__z_{c}" for c in ccols])
        w = out.write.mode(mode)
        if max_records_per_file:
            w = w.option("maxRecordsPerFile", max_records_per_file)
        cols = [partition_by] if isinstance(partition_by, str) else partition_by
        if cols:
            w = w.partitionBy(*cols)
        w.parquet(path)

    def to_bucketed_table(
        self,
        table: str,
        bucket_by: list[str] | str,
        num_buckets: int = 32,
        sort_by: list[str] | str | None = None,
        mode: str = "error",
        path: str | None = None,
    ) -> None:
        """Bucketed parquet table write — the co-located-join layout.

        Two tables bucketed by the same key into the same bucket count
        join WITHOUT a shuffle (each side's scan already satisfies the
        hash-partitioning requirement), which at 100 TB turns the
        dominant fact⋈fact cost from two full shuffles into zero. Spark
        buckets only exist through the catalog, hence ``saveAsTable``;
        ``path`` makes it an external table (data outlives the catalog
        entry). ``sort_by`` additionally sorts within buckets, enabling
        merge-join without the per-task sort.

        Plan proof: `tests/test_plans.py::test_bucketed_join_no_shuffle`.
        """
        cols = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
        w = self.df.write.mode(mode).format("parquet").bucketBy(num_buckets, *cols)
        if sort_by:
            scols = [sort_by] if isinstance(sort_by, str) else list(sort_by)
            w = w.sortBy(*scols)
        if path:
            w = w.option("path", path)
        w.saveAsTable(table)

    def to_csv(self, path: str, mode: str = "error", header: bool = True, **options) -> None:
        """pandas ``to_csv`` → distributed CSV write (a directory of part
        files, not one driver-funneled file — coalesce(1) is the
        anti-pattern; merge downstream if a single file is really needed)."""
        self.df.write.mode(mode).options(header=str(header).lower(), **options).csv(path)

    def to_pandas(self):
        return self.df.toPandas()

    def to_html(self, n: int = 20) -> str:
        """Reference S5 (core/explainable_series.py:421-427) — display only."""
        return self.df.limit(n).toPandas().to_html()

    def __repr__(self) -> str:
        op = f", op={self.operation.kind}" if self.operation else ""
        return f"ExplainableDataFrame({self.name}{op}, cols={self.df.columns})"


class _Resampler:
    """Fixed time-window resampling helper (ExplainableDataFrame.resample)."""

    def __init__(self, frame: "ExplainableDataFrame", freq: str, on: str, by):
        self._frame, self._freq, self._on = frame, freq, on
        self._by = [by] if isinstance(by, str) else list(by or [])

    def agg(self, spec: dict[str, str | list[str]]) -> "ExplainableDataFrame":
        """spec maps column -> agg name (or list of names); output columns
        ``<col>_<agg>`` plus ``window_start`` (and the by-keys)."""
        from ..operators.aggregates import agg_column, output_name

        exprs = [
            agg_column(col, agg).alias(output_name(col, agg))
            for col, aggs in spec.items()
            for agg in ([aggs] if isinstance(aggs, str) else aggs)
        ]
        grouped = (
            self._frame.df.groupBy(
                F.window(F.col(self._on), self._freq).alias("__w"), *self._by
            )
            .agg(*exprs)
            .withColumn("window_start", F.col("__w.start"))
            .drop("__w")
        )
        return ExplainableDataFrame(grouped, name=f"{self._frame.name}.resample")

    def mean(self, column: str):
        return self.agg({column: "mean"})

    def sum(self, column: str):
        return self.agg({column: "sum"})

    def count(self, column: str):
        return self.agg({column: "count"})


class _Rolling:
    """Rolling-window helper returned by ExplainableDataFrame.rolling."""

    def __init__(self, frame: "ExplainableDataFrame", window, on: str, by, min_periods: int):
        self._frame, self._window, self._on, self._by, self._mp = frame, window, on, by, min_periods

    def _agg(self, column: str, func: str) -> "ExplainableDataFrame":
        from ..operators.rolling import rolling_agg

        out = rolling_agg(
            self._frame.df,
            on=self._on,
            window=self._window,
            aggs={f"{column}_roll_{func}": (column, func)},
            by=self._by,
            min_periods=self._mp,
        )
        return ExplainableDataFrame(out, name=self._frame.name)

    def mean(self, column: str):
        return self._agg(column, "mean")

    def sum(self, column: str):
        return self._agg(column, "sum")

    def min(self, column: str):
        return self._agg(column, "min")

    def max(self, column: str):
        return self._agg(column, "max")

    def count(self, column: str):
        return self._agg(column, "count")

    def std(self, column: str):
        return self._agg(column, "std")

    def var(self, column: str):
        return self._agg(column, "var")

    def median(self, column: str):
        return self._agg(column, "median")


class _Expanding:
    """Expanding-window helper returned by ExplainableDataFrame.expanding."""

    def __init__(self, frame: "ExplainableDataFrame", on: str, by, min_periods: int):
        self._frame, self._on, self._by, self._mp = frame, on, by, min_periods

    def _agg(self, column: str, func: str) -> "ExplainableDataFrame":
        from ..operators.rolling import expanding_agg

        out = expanding_agg(
            self._frame.df,
            on=self._on,
            aggs={f"{column}_exp_{func}": (column, func)},
            by=self._by,
            min_periods=self._mp,
        )
        return ExplainableDataFrame(out, name=self._frame.name)

    def sum(self, column: str):
        return self._agg(column, "sum")

    def mean(self, column: str):
        return self._agg(column, "mean")

    def min(self, column: str):
        return self._agg(column, "min")

    def max(self, column: str):
        return self._agg(column, "max")

    def count(self, column: str):
        return self._agg(column, "count")

    def std(self, column: str):
        return self._agg(column, "std")

    def var(self, column: str):
        return self._agg(column, "var")


class _Ewm:
    """ewm helper returned by ExplainableDataFrame.ewm."""

    def __init__(self, frame: "ExplainableDataFrame", alpha: float, on: str, by):
        self._frame, self._alpha, self._on, self._by = frame, alpha, on, by

    def mean(self, column: str) -> "ExplainableDataFrame":
        from ..operators.ewm import ewm_mean

        out = ewm_mean(
            self._frame.df, column, on=self._on, alpha=self._alpha, by=self._by
        )
        return ExplainableDataFrame(out, name=self._frame.name)


_PANDAS_TO_SPARK_TYPE = {
    "int64": "bigint", "int32": "int", "int16": "smallint", "int8": "tinyint",
    "int": "bigint", "float64": "double", "float32": "float", "float": "double",
    "str": "string", "object": "string", "string": "string",
    "bool": "boolean", "datetime64[ns]": "timestamp", "datetime64": "timestamp",
}


def _spark_type(t) -> str:
    """pandas dtype name → Spark SQL type string (unknown names pass
    through so Spark type strings work directly)."""
    name = t.__name__ if isinstance(t, type) else str(t)
    return _PANDAS_TO_SPARK_TYPE.get(name, name)


def concat(frames: list["ExplainableDataFrame"], name: str | None = None) -> "ExplainableDataFrame":
    """pandas ``pd.concat(axis=0)`` analogue: row-wise union by column
    name, missing columns NULL-filled. Untracked (the reference's lineage
    contract covers only filter/groupby/join); unions are partition-local
    in Spark — no shuffle.
    """
    if not frames:
        raise ValueError("concat requires at least one frame")
    out = frames[0].df
    for f in frames[1:]:
        out = out.unionByName(f.df, allowMissingColumns=True)
    return ExplainableDataFrame(out, name=name or f"concat_{len(frames)}")


class _ILoc:
    """Bounded positional indexer for ExplainableDataFrame.iloc.

    Supported forms (everything else raises, instead of collecting an
    unbounded frame to the driver):
      * ``iloc[:n]``          -> distributed ``limit(n)`` frame
      * ``iloc[a:b]`` (a<b)   -> fetch first b rows, slice -> frame
      * ``iloc[i]`` (i >= 0)  -> fetch first i+1 rows -> Row
    """

    def __init__(self, frame: ExplainableDataFrame):
        self._frame = frame

    def __getitem__(self, key):
        f = self._frame
        if isinstance(key, slice):
            if key.step not in (None, 1):
                raise ValueError("iloc: step slices are not supported on a distributed frame")
            start = key.start or 0
            stop = key.stop
            if start < 0 or (stop is not None and stop < 0):
                raise ValueError("iloc: negative positions need a total row count; use .shape first")
            if stop is None:
                raise ValueError("iloc: unbounded slices would collect the whole frame; use the frame itself")
            if start == 0:
                return ExplainableDataFrame(f.df.limit(stop), name=f.name, operation=f.operation)
            rows = f.df.limit(stop).collect()[start:stop]
            out = f.df.sparkSession.createDataFrame(rows, schema=f.df.schema)
            return ExplainableDataFrame(out, name=f.name, operation=f.operation)
        if isinstance(key, int):
            if key < 0:
                raise ValueError("iloc: negative positions need a total row count; use .shape first")
            rows = f.df.limit(key + 1).collect()
            if len(rows) <= key:
                raise IndexError(f"iloc: position {key} out of bounds ({len(rows)} rows)")
            return rows[key]
        raise TypeError(f"iloc: unsupported key type {type(key).__name__}")
