"""spark-submit --py-files packaging smoke (north rule: the engine must run
as a packaged job on a cluster manager, not only as a repo import).

Packages elasticsearch_spark into a zip, then runs scripts/submit_job.py
via spark-submit from a NEUTRAL working directory with PYTHONPATH unset —
so the zip alone must supply the package to the driver AND to the Python
UDF workers (the mapInPandas segment-build kernels unpickle there).
"""

import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)
def test_spark_submit_py_files_package(tmp_path):
    zip_path = tmp_path / "es_spark.zip"
    subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "package.sh"), str(zip_path)],
        check=True,
        capture_output=True,
        cwd=REPO,
    )
    job = tmp_path / "job.py"
    shutil.copy(os.path.join(REPO, "scripts", "submit_job.py"), job)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", str(zip_path),
            str(job),
            "synthetic:50", str(tmp_path / "idx"), "error timeout",
        ],
        cwd=tmp_path,
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "BUILD n_turns=499" in out.stdout
    assert "QUERY 'error timeout' top-" in out.stdout
    # deterministic corpus (seed 42) -> deterministic top hit + BM25 score
    assert "('conv-000002', 1, 3.69" in out.stdout
