"""spark-submit --py-files deployment smoke test (north_rule: "runs via
spark-submit --py-files").  Packages the library with scripts/package.sh,
then launches scripts/submit_crawl.py through real spark-submit from a
NEUTRAL working directory — the engine import must resolve from the zip,
so a missing module or non-py-files-safe import breaks this test, not a
cluster deploy."""

import json
import os
import shutil
import subprocess
import tempfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(shutil.which("spark-submit") is None, reason="no spark-submit on PATH")
def test_spark_submit_py_files_crawl():
    subprocess.run(["bash", os.path.join(REPO, "scripts", "package.sh")], check=True)
    zip_path = os.path.join(REPO, "dist", "scrapy_cluster_spark.zip")
    assert os.path.exists(zip_path)
    store = tempfile.mkdtemp(prefix="scs-submit-", dir="/dev/shm" if os.path.isdir("/dev/shm") else None)
    neutral_cwd = tempfile.mkdtemp(prefix="scs-cwd-")
    try:
        out = subprocess.run(
            [
                "spark-submit", "--master", "local[4]",
                "--conf", "spark.sql.shuffle.partitions=8",
                "--py-files", zip_path,
                os.path.join(REPO, "scripts", "submit_crawl.py"),
                "--store", store, "--domains", "4", "--base-pages", "30",
                "--rounds", "2", "--hits", "50",
            ],
            capture_output=True, text=True, timeout=420, cwd=neutral_cwd,
        )
        assert out.returncode == 0, out.stderr[-3000:]
        line = next(
            (l for l in out.stdout.splitlines() if l.startswith("CRAWL_SUMMARY ")), None
        )
        assert line, out.stdout[-2000:]
        summary = json.loads(line[len("CRAWL_SUMMARY "):])
        assert summary["rounds"] >= 1
        assert summary["scheduled"] > 0
        assert summary["crawled_ok"] > 0
    finally:
        shutil.rmtree(store, ignore_errors=True)
        shutil.rmtree(neutral_cwd, ignore_errors=True)
