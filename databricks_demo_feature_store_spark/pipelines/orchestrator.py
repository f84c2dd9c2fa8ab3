"""Pipeline orchestrator: parameter resolution + dependency-ordered runs.

Parity target: ``notebooks/notebooks_orchestator.py`` and the job DAGs in
``config/*/job_resources/*.yml`` — the reference launches each feature
notebook through ``dbutils.notebook.run`` with base parameters (env,
start/end dates, overwrite flags) in a Jobs DAG
(demographic → credit_risk; holding_products → {payment, transactions}).
Here the process boundary becomes a plain function call, the DAG a
topological sort, and the ``end_date: "actual"`` keyword resolves to the
first of the current month (``notebooks_orchestator.py:9-16,50-114``).
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Callable, Mapping, Sequence
from dataclasses import dataclass, field
from graphlib import TopologicalSorter

from pyspark.sql import DataFrame, SparkSession


def resolve_parameters(
    params: Mapping[str, str], today: _dt.date | None = None
) -> dict[str, str]:
    """Resolve parameter keywords — ``end_date: "actual"`` → first of the
    current month (reference ``get_actual_date``, :9-16)."""
    today = today or _dt.date.today()
    out = dict(params)
    for key, value in out.items():
        if isinstance(value, str) and value == "actual":
            out[key] = today.replace(day=1).isoformat()
    return out


@dataclass(frozen=True)
class PipelineJob:
    name: str
    run: Callable[[SparkSession, str], DataFrame]
    depends_on: tuple[str, ...] = ()
    params: Mapping[str, str] = field(default_factory=dict)


@dataclass
class JobResult:
    name: str
    ok: bool
    rows: int | None = None
    error: str | None = None


class Orchestrator:
    """Run registered pipeline jobs in dependency order.

    A failed job skips its downstream dependents (the reference's Jobs DAG
    semantics) but independent branches continue.
    """

    def __init__(self, jobs: Sequence[PipelineJob]):
        names = [j.name for j in jobs]
        if len(set(names)) != len(names):
            raise ValueError("duplicate job names")
        self.jobs = {j.name: j for j in jobs}
        missing = {d for j in jobs for d in j.depends_on} - set(names)
        if missing:
            raise ValueError(f"unknown dependencies: {sorted(missing)}")

    def order(self) -> list[str]:
        ts = TopologicalSorter({j.name: set(j.depends_on) for j in self.jobs.values()})
        return list(ts.static_order())

    def run_all(
        self,
        spark: SparkSession,
        sf_dir: str,
        materialize: Callable[[str, DataFrame], None] | None = None,
        count_rows: bool = False,
    ) -> dict[str, JobResult]:
        """Execute every job; ``materialize(name, df)`` is the sink hook
        (e.g. FeatureStoreManager.save). ``count_rows=True`` opts into a
        per-job ``count()`` action for ``JobResult.rows`` — off by default
        because it forces a full extra job per pipeline (the reference's
        eager-logging anti-pattern, SURVEY §4.3); without it (and without
        a sink) jobs are only planned, which still surfaces analysis
        errors but runs nothing."""
        results: dict[str, JobResult] = {}
        failed: set[str] = set()
        for name in self.order():
            job = self.jobs[name]
            if any(d in failed for d in job.depends_on):
                results[name] = JobResult(name, ok=False, error="upstream failed")
                failed.add(name)
                continue
            try:
                df = job.run(spark, sf_dir)
                if materialize is not None:
                    materialize(name, df)
                results[name] = JobResult(
                    name, ok=True, rows=df.count() if count_rows else None
                )
            except Exception as exc:  # noqa: BLE001 - job isolation boundary
                results[name] = JobResult(name, ok=False, error=str(exc))
                failed.add(name)
        return results


def default_orchestrator() -> Orchestrator:
    """The engine's standing DAG over the bundled pipelines (mirrors the
    reference's two-workspace DAG shape)."""
    from databricks_demo_feature_store_spark.pipelines.customer_features import (
        customer_transaction_features,
    )
    from databricks_demo_feature_store_spark.pipelines.demographic_features import (
        customer_demographic_features,
    )
    from databricks_demo_feature_store_spark.pipelines.payment_behavior_features import (
        payment_behavior_features,
    )
    from databricks_demo_feature_store_spark.pipelines.product_holdings_features import (
        product_holdings_features,
    )
    from databricks_demo_feature_store_spark.pipelines.supplier_risk_features import (
        supplier_risk_features,
    )

    # mirrors the reference's two-workspace DAG: demographic -> credit_risk;
    # holding_products -> transactions
    return Orchestrator(
        [
            PipelineJob("fs_cus_demographic", customer_demographic_features),
            PipelineJob(
                "fs_supplier_risk",
                supplier_risk_features,
                depends_on=("fs_cus_demographic",),
            ),
            PipelineJob("fs_cus_holding_products", product_holdings_features),
            PipelineJob(
                "fs_cus_transactions",
                customer_transaction_features,
                depends_on=("fs_cus_holding_products",),
            ),
            # reference DAG: holding_products -> {payment, transactions}
            PipelineJob(
                "fs_cus_payment_behavior",
                payment_behavior_features,
                depends_on=("fs_cus_holding_products",),
            ),
        ]
    )
