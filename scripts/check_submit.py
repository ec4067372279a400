"""spark-submit --py-files smoke — the north rule's deployment surface.

Packages networkit_spark into a zip, synthesizes a tiny transcript table,
then launches jobs/job_pagerank.py through a REAL spark-submit (fresh JVM,
package shipped via --py-files, exactly the cluster invocation) and
validates the output parquet. Run on an idle machine:

    python scripts/check_submit.py
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def _zip_package(dest: str) -> str:
    zpath = os.path.join(dest, "networkit_spark.zip")
    pkg = os.path.join(REPO, "networkit_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    return zpath


def main() -> int:
    tmp = tempfile.mkdtemp(prefix="nk_submit_")
    try:
        zpath = _zip_package(tmp)
        in_dir = os.path.join(tmp, "transcripts")
        out_dir = os.path.join(tmp, "scores")
        ckpt = os.path.join(tmp, "ckpt")

        # synthesize the input in a separate session that exits first
        sys.path.insert(0, REPO)
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[4]")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        from networkit_spark.sources.transcripts import synthesize_transcripts

        synthesize_transcripts(spark, n_convs=50).write.mode(
            "overwrite"
        ).parquet(in_dir)
        spark.stop()

        cmd = [
            _spark_submit(),
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zpath,
            os.path.join(REPO, "jobs", "job_pagerank.py"),
            "--input", in_dir,
            "--graph", "reply",
            "--output", out_dir,
            "--checkpoint", ckpt,
            "--tol", "1e-8",
        ]
        print("+", " ".join(cmd), flush=True)
        env = dict(os.environ)
        env.pop("PYTHONPATH", None)  # the zip must be the only package source
        r = subprocess.run(cmd, cwd=tmp, env=env, capture_output=True,
                           text=True, timeout=900)
        if r.returncode != 0:
            print(r.stdout[-4000:])
            print(r.stderr[-4000:])
            print("FAIL: spark-submit exited", r.returncode)
            return 1

        import duckdb

        n, s = duckdb.sql(
            f"SELECT COUNT(*), SUM(score) FROM '{out_dir}/*.parquet'"
        ).fetchone()
        ok = n > 0 and abs(s - 1.0) < 1e-6
        print(f"rows={n} sum(score)={s:.9f}")
        print("PASS" if ok else "FAIL: bad output")
        return 0 if ok else 1
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
