"""Superstep checkpoint/resume protocol with per-superstep lineage + metrics.

Reference analog: PLP's per-sweep `timing` vector (networkit/cpp/community/
PLP.cpp:108-109) and the north rule's requirement that every superstep
checkpoints state so runs resume mid-iteration.

Layout (Parquet directory protocol; an Iceberg catalog slot in the same
interface when one is configured — table snapshots instead of dirs):

    {base}/{algo}/state/step=<k>/<name>/   — parquet state DataFrames
    {base}/{algo}/state/step=<k>/_DONE     — atomic completion marker
    {base}/{algo}/metrics.jsonl            — one row per superstep:
        {superstep, n_updated, delta_norm, wall_ms, lineage}

`lineage` records the input partition fingerprint (count + per-state
schema) so a resumed run can verify it is continuing the same computation.

Write protocol: state parquet first, marker last — a crash mid-write leaves
no marker, so resume picks the previous complete superstep. This is the
same commit discipline an Iceberg snapshot gives for free.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession


class SuperstepCheckpointer:
    def __init__(self, spark: SparkSession, base_dir: str, algo: str):
        self.spark = spark
        self.dir = os.path.join(base_dir, algo)
        self.state_dir = os.path.join(self.dir, "state")
        self.metrics_path = os.path.join(self.dir, "metrics.jsonl")
        os.makedirs(self.state_dir, exist_ok=True)

    # ------------------------------------------------------------------ write
    def save(
        self,
        superstep: int,
        dfs: dict[str, DataFrame],
        metrics: dict | None = None,
    ) -> dict[str, DataFrame]:
        """Write state DataFrames for a superstep; returns re-read DataFrames
        (lineage fully truncated — the parquet files ARE the new lineage)."""
        step_dir = os.path.join(self.state_dir, f"step={superstep}")
        if os.path.exists(step_dir):
            shutil.rmtree(step_dir)
        out = {}
        lineage = {}
        for name, df in dfs.items():
            path = os.path.join(step_dir, name)
            df.write.mode("overwrite").parquet(path)
            out[name] = self.spark.read.parquet(path)
            lineage[name] = {"schema": df.schema.simpleString()}
        with open(os.path.join(step_dir, "_DONE"), "w") as f:
            f.write(str(time.time()))
        if metrics is not None:
            self.log_metrics(superstep, metrics, lineage=lineage)
        else:
            self._lineage_cache = lineage
        return out

    def log_metrics(self, superstep: int, metrics: dict, lineage=None) -> None:
        row = {
            "superstep": superstep,
            **metrics,
            "lineage": lineage
            if lineage is not None
            else getattr(self, "_lineage_cache", None),
            "ts": time.time(),
        }
        with open(self.metrics_path, "a") as f:
            f.write(json.dumps(row) + "\n")

    # ------------------------------------------------------------------- read
    def completed_steps(self) -> list[int]:
        if not os.path.isdir(self.state_dir):
            return []
        steps = []
        for d in os.listdir(self.state_dir):
            if d.startswith("step=") and os.path.exists(
                os.path.join(self.state_dir, d, "_DONE")
            ):
                steps.append(int(d.split("=", 1)[1]))
        return sorted(steps)

    def latest_state(self) -> dict | None:
        """{'superstep': k, 'dfs': {name: DataFrame}} for the max complete
        superstep, or None if no checkpoint exists."""
        steps = self.completed_steps()
        if not steps:
            return None
        k = steps[-1]
        step_dir = os.path.join(self.state_dir, f"step={k}")
        dfs = {}
        for name in os.listdir(step_dir):
            p = os.path.join(step_dir, name)
            if os.path.isdir(p):
                dfs[name] = self.spark.read.parquet(p)
        return {"superstep": k, "dfs": dfs}

    def metrics(self) -> list[dict]:
        if not os.path.exists(self.metrics_path):
            return []
        with open(self.metrics_path) as f:
            return [json.loads(line) for line in f if line.strip()]

    def clear(self) -> None:
        if os.path.isdir(self.dir):
            shutil.rmtree(self.dir)
        os.makedirs(self.state_dir, exist_ok=True)


def stats_safe_checkpoint(df: DataFrame) -> DataFrame:
    """persist → count → localCheckpoint(eager) → unpersist: lineage
    truncation whose LogicalRDD carries the REAL materialized size instead
    of the origin plan's estimate.

    Why this exists (measured, round 4): Catalyst MULTIPLIES sizeInBytes
    across join trees, and localCheckpoint's LogicalRDD preserves the
    origin plan's stats. In level-on-level constructions (agglomerative
    coarsening: each level's edge table is several joins over the previous
    level's checkpointed tables) the stat VALUE therefore grows
    super-exponentially even while the plan TEXT stays bounded — measured
    295 → 4,151 BigInteger digits for ONE karate coarsening level, minutes
    of ToomCook multiplication inside stats estimation by level 5, then a
    driver OOM inside LogicalPlanStats. Materializing the cache first makes
    the checkpoint inherit the true cached size (a small number), resetting
    the estimate at every level boundary. Cost: one extra count job against
    cached rows, exactly the persist-before-checkpoint discipline the
    superstep kernels already follow (CLAUDE.md rule 11)."""
    cached = df.persist()
    cached.count()
    out = cached.localCheckpoint(eager=True)
    cached.unpersist()
    return out
